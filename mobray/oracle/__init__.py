"""Single-node naive oracles for the near-dup operator family."""
from mobray.oracle.naive import (  # noqa: F401
    naive_minhash_clusters,
    naive_ngram_jaccard_pairs,
    naive_simhash_pairs,
)
