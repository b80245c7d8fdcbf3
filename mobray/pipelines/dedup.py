"""Deduplication pipelines: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Shared shape: a vectorized ``map_batches`` computes a compact key/sketch
per row (hashes, signatures — never the raw payload), a ``groupby`` on
the key co-locates candidates (the only shuffle; key size is bytes, so
the exchange is tiny relative to the corpus), and a per-group vectorized
function picks survivors / emits pairs.

PARTITIONING ASSUMPTION (all ops): rows with equal keys land in one
group. Near-dup ops additionally assume the candidate-pair set is sparse
(<< corpus size), which banding/threshold parameters control. The final
cluster merge defaults to a driver-side union-find over the (sparse)
pair list, but every near-dup op also offers a Dataset-returning scale
path — minhash via ``cluster_backend="distributed"``, the pair ops via
``output="dataset"`` / ``output="clusters"`` (see ``_finalize_pairs``)
— so nothing is forced through the driver at 100-TB pair volumes.

GROUP GRANULARITY: keys (band/chunk/content hashes) are near-unique, so
``groupby(key).map_groups`` would invoke one Ray-level UDF per key —
tens of thousands of per-group calls dominated wall time. Every op
therefore groups by a coarse HASH BUCKET of the key (~auto-sized from
input bytes) and vectorizes across the real key groups inside the
bucket with a pandas groupby; per-key semantics are unchanged because a
bucket is a superset partition of its keys.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

from mobray.functions.arrowutils import embedding_matrix, table_from_pandas
from mobray.functions.phash import hamming64
from mobray.functions.hashing import (
    band_keys_matrix,
    estimate_jaccard,
    jaccard,
    minhash_params,
    minhash_signatures,
    shingle_hash_stream,
    simhash64_batch,
    stable_hash64,
    word_ngrams,
)


def _mix64(k: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (vectorized, uint64 wraparound): whitens
    structured keys so the mod-bucket below is load-balanced even for
    callers whose keys carry structure in the low bits (simhash chunk
    keys are c*65536+chunk, embedding buckets are small sign
    integers)."""
    k = k ^ (k >> np.uint64(30))
    k = k * np.uint64(0xBF58476D1CE4E5B9)
    k = k ^ (k >> np.uint64(27))
    k = k * np.uint64(0x94D049BB133111EB)
    return k ^ (k >> np.uint64(31))


def _with_dedup_bucket(ds, key_col: str, num_buckets: Optional[int] = None):
    """Append ``__dbkt`` = splitmix64(key) mod nb and resolve nb from
    the input bytes when not given. Returns (bucketed_ds, nb)."""
    from mobray.pipelines.temporal import auto_num_buckets

    nb = num_buckets if num_buckets is not None else auto_num_buckets(ds)

    def add(t: pa.Table) -> pa.Table:
        k = _mix64(t[key_col].to_numpy(zero_copy_only=False).astype(np.uint64))
        return t.append_column(
            "__dbkt", pa.array((k % np.uint64(nb)).astype(np.int32), pa.int32())
        )

    return ds.map_batches(add, batch_format="pyarrow"), nb


def exact_dedup(ds, col: str, id_col: str, keep: str = "min"):
    """Exact dedup on ``col``: one surviving row (min/max ``id_col``) per
    distinct value. Hash-partition on a 64-bit content hash, keep-first
    per group. SQL-equivalent: GROUP BY col -> min(id)."""

    def add_key(batch: pa.Table) -> pa.Table:
        key = stable_hash64(batch[col].to_pylist()).astype(np.int64)
        return batch.append_column("__key", pa.array(key, pa.int64()))

    def keep_one_per_key(g: pd.DataFrame):
        # whole BUCKET of keys at once: sort + drop_duplicates is the
        # vectorized per-key keep-first (no per-key UDF invocations)
        g = g.sort_values(
            ["__key", id_col], ascending=[True, keep == "min"], kind="stable"
        )
        out = g.drop_duplicates("__key").copy()
        out["n_dups"] = g.groupby("__key").size().reindex(out["__key"]).to_numpy()
        # Arrow out: empty pandas blocks would bypass downstream
        # map_batches conversion (see _per_bucket)
        return table_from_pandas(
            out.drop(columns=["__key", "__dbkt"]), preserve_index=False
        )

    keyed, _ = _with_dedup_bucket(
        ds.map_batches(add_key, batch_format="pyarrow"), "__key"
    )
    return keyed.groupby("__dbkt").map_groups(keep_one_per_key, batch_format="pandas")


def _union_find(pairs: List[tuple]) -> Dict:
    parent: Dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def minhash_lsh_dedup(
    ds,
    text_col: str,
    id_col: str,
    *,
    num_perm: int = 64,
    bands: int = 8,
    shingle_k: int = 5,
    threshold: float = 0.8,
    cluster_backend: str = "driver",
):
    """MinHash + LSH near-dup clustering.

    shingle -> minhash signature (per batch, vectorized) -> explode to
    (band_key, id, signature) rows -> groupby(band_key) -> candidate
    pairs whose signature-estimated Jaccard >= threshold -> union-find
    over the pair list.

    ``cluster_backend``: 'driver' (default) collects the pair list and
    runs union-find on the driver — right while pairs are sparse;
    'distributed' keeps the pairs in a Dataset and runs
    ``connected_components_distributed`` (min-label propagation) — the
    100-TB path when the pair list itself is too big for one machine,
    returning a Dataset (doc, cluster) instead of a DataFrame.

    Returns (id, cluster) for ids that belong to a near-dup cluster;
    singletons are omitted. Only signatures (8 bytes x num_perm) travel
    through the shuffle — never the documents.

    PARALLELISM CAVEAT: Ray fuses ReadParquet into the signature
    map_batches, so a single-file input runs the CPU-heavy signature
    kernel in ONE task regardless of declared block count. Callers with
    few input files should ``ds.repartition(~2x cpus)`` first (the text
    shuffle is trivial next to the kernel).
    """
    a, b = minhash_params(num_perm)

    def sig_rows(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # fully batched shingling + hashing: arrow kernels normalize the
        # whole column, one repeat/arange expansion enumerates every
        # k-byte window over the concatenated buffer, the rolling FNV +
        # splitmix hash is k vectorized passes (shingle_hash_stream),
        # then one vectorized minhash pass (reduceat over per-doc
        # offsets) and one vectorized band-key combine — no per-row
        # Python anywhere in the signature stage
        hashes, offsets = shingle_hash_stream(batch[text_col], shingle_k)
        sigs = minhash_signatures(hashes, offsets, a, b)
        keys = band_keys_matrix(sigs, bands)  # (n_docs, bands)
        n = batch.num_rows
        # sigs ship as ONE fixed-size-binary buffer (row-major uint64
        # bytes) + a take per band — no per-row .tobytes() Python objects
        sig_arr = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(sigs.shape[1] * 8), n,
            [None, pa.py_buffer(np.ascontiguousarray(sigs).tobytes())],
        )
        idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), bands))
        return pa.table(
            {
                "band_key": pa.array(keys.ravel(), pa.int64()),
                "doc": pc.take(batch[id_col].combine_chunks(), idx),
                "sig": pc.take(sig_arr, idx),
            }
        )

    def _pairs_in_group(docs, sigs, pairs: list):
        m = len(docs)
        # vectorized pairwise signature agreement, row-chunked so the
        # (chunk x m x num_perm) bool tensor stays bounded
        chunk = max(1, (8 << 20) // max(1, m * sigs.shape[1]))
        for start in range(0, m, chunk):
            end = min(m, start + chunk)
            est = (sigs[start:end, None, :] == sigs[None, :, :]).mean(axis=2)
            ii, jj = np.where(est >= threshold)
            for i_off, j in zip(ii, jj):
                i = start + i_off
                if j <= i or docs[i] == docs[j]:
                    continue
                lo, hi = sorted((docs[i], docs[j]))
                pairs.append((lo, hi, float(est[i_off, j])))

    def candidate_pairs(g: pd.DataFrame):
        # one BUCKET of band groups; only bands with >= 2 rows can emit
        empty = pd.DataFrame(
            {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"),
             "est_jaccard": pd.Series(dtype="float64")}
        )
        g = g[g.groupby("band_key")["doc"].transform("size") >= 2]
        pairs: list = []
        for _, sub in g.groupby("band_key"):
            docs = sub["doc"].to_numpy()
            sigs = np.stack([np.frombuffer(s, dtype=np.uint64) for s in sub["sig"]])
            _pairs_in_group(docs, sigs, pairs)
        if not pairs:
            return table_from_pandas(empty)
        return table_from_pandas(
            pd.DataFrame(pairs, columns=["a", "b", "est_jaccard"]),
            preserve_index=False,
        )

    sig_ds, _ = _with_dedup_bucket(
        ds.map_batches(sig_rows, batch_format="pyarrow"), "band_key"
    )
    pairs_ds = sig_ds.groupby("__dbkt").map_groups(
        candidate_pairs, batch_format="pandas"
    )
    if cluster_backend == "distributed":
        labels = connected_components_distributed(pairs_ds, "a", "b")

        def drop_roots(t: pa.Table) -> pa.Table:
            # match the driver union-find convention: the component's
            # minimum id is the KEPT representative, not a duplicate row
            import pyarrow.compute as pc

            t = t.filter(pc.not_equal(t["node"], t["cluster"]))
            return t.rename_columns([id_col, "cluster"])

        return labels.map_batches(drop_roots, batch_format="pyarrow")
    pairs_df = pairs_ds.to_pandas()
    if len(pairs_df) == 0:
        return pd.DataFrame({id_col: [], "cluster": []})
    pairs_df = pairs_df.drop_duplicates(["a", "b"])
    cluster_of = _union_find(list(zip(pairs_df["a"], pairs_df["b"])))
    items = sorted(cluster_of.items())
    return pd.DataFrame(
        {id_col: [k for k, _ in items], "cluster": [v for _, v in items]}
    )


def _pairs_table(pairs, id_dtype, val_col: str, val_type) -> pa.Table:
    """(a, b, val) triples -> an Arrow table whose schema is STABLE
    across empty and non-empty groups. (An empty pandas object column
    would type as Arrow null and break downstream unions/groupbys; ids
    are typed from the caller's id dtype instead.)"""
    id_type = pa.string() if id_dtype == object else pa.from_numpy_dtype(id_dtype)
    schema = pa.schema([("a", id_type), ("b", id_type), (val_col, val_type)])
    if not pairs:
        return schema.empty_table()
    a, b, v = zip(*pairs)
    return pa.table(
        {"a": pa.array(list(a), id_type), "b": pa.array(list(b), id_type),
         val_col: pa.array(list(v), val_type)}
    )


def _finalize_pairs(pairs_ds, val_col: str, output: str, id_col: str):
    """Shared pair-output escape hatches for the near-dup family — the
    equivalent of minhash's ``cluster_backend`` flag, so no pair list is
    forced through the driver at scale:

    - 'pandas' (default): driver-collected sorted DataFrame (a, b, val).
      Right while pairs are sparse (<< corpus).
    - 'dataset': lazy DEDUPED pairs Dataset (a, b, val) — pairs found in
      several LSH tables/chunks collapse via a (a, b) groupby; nothing
      ever lands on the driver.
    - 'clusters': Dataset (id_col, cluster) via distributed connected
      components over the pair Dataset; the component's minimum id is
      the kept representative (dropped from the output, matching the
      driver union-find convention).
    """
    if output == "dataset":
        from ray.data.aggregate import Min

        return pairs_ds.groupby(["a", "b"]).aggregate(
            Min(val_col, alias_name=val_col)
        )
    if output == "clusters":
        labels = connected_components_distributed(pairs_ds, "a", "b")

        def drop_roots(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            t = t.filter(pc.not_equal(t["node"], t["cluster"]))
            return t.rename_columns([id_col, "cluster"])

        return labels.map_batches(drop_roots, batch_format="pyarrow")
    if output != "pandas":
        raise ValueError(f"unknown output mode {output!r}")
    out = pairs_ds.to_pandas()
    if len(out) == 0:
        return pd.DataFrame(columns=["a", "b", val_col])
    return (
        out.drop_duplicates(["a", "b"])
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )


def simhash_dedup(
    ds, text_col: str, id_col: str, hamming_radius: int = 3, *,
    output: str = "pandas",
):
    """SimHash near-dup candidate pairs.

    64-bit simhash per doc; LSH on 4 x 16-bit chunks (two near-dup docs
    within Hamming distance 3 share at least one exact 16-bit chunk —
    pigeonhole), verify Hamming <= radius within chunk groups. Returns
    (a, b, hamming) pairs as pandas by default; ``output`` selects the
    Dataset-returning scale paths (see ``_finalize_pairs``)."""

    def sig_rows(batch: pa.Table) -> pa.Table:
        from mobray.functions.textfns import tokenize_lower_batch

        n_texts = batch.num_rows
        ids = batch[id_col].to_pylist()
        # tokenization, hashing and bit-majority are all batched
        toks, offsets = tokenize_lower_batch(batch[text_col])
        hashes = (
            stable_hash64(toks) if len(toks) else np.empty(0, np.uint64)
        )
        sigs = simhash64_batch(hashes, offsets)  # (n_docs,) int64
        u = sigs.view(np.uint64)
        chunks = np.empty((n_texts, 4), dtype=np.int64)
        for c in range(4):
            chunks[:, c] = (
                c * 65536
                + ((u >> np.uint64(16 * c)) & np.uint64(0xFFFF)).astype(np.int64)
            )
        return pa.table(
            {
                "chunk_key": pa.array(chunks.ravel(), pa.int64()),
                "doc": pa.array(np.repeat(np.asarray(ids, dtype=object), 4)),
                "sig": pa.array(np.repeat(sigs, 4), pa.int64()),
            }
        )

    pairs_ds = _hamming_verify_bucketed(
        ds.map_batches(sig_rows, batch_format="pyarrow"), hamming_radius
    )
    return _finalize_pairs(pairs_ds, "hamming", output, id_col)


def _hamming_verify_bucketed(sig_ds, hamming_radius: int):
    """Shared verify stage for simhash/phash: coarse-bucket the chunk
    keys, then per real chunk group emit (a, b, hamming) pairs within
    the radius. One Ray group per bucket (see module docstring).
    Returns the lazy pair Dataset (possibly with repeats across
    chunks); callers finalize via ``_finalize_pairs``."""

    def verify(g: pd.DataFrame):
        # id dtypes vary by caller (simhash int docs, phash string image
        # ids): type the Arrow output from the group's own dtype so
        # empty and non-empty groups agree on schema
        id_dtype = g["doc"].dtype
        g = g[g.groupby("chunk_key")["doc"].transform("size") >= 2]
        pairs = []
        for _, sub in g.groupby("chunk_key"):
            docs = sub["doc"].to_numpy()
            sigs = sub["sig"].to_numpy()
            for i in range(len(docs)):
                d = hamming64(np.full(len(docs) - i - 1, sigs[i]), sigs[i + 1 :])
                for off, dist in enumerate(d):
                    j = i + 1 + off
                    if docs[i] != docs[j] and dist <= hamming_radius:
                        lo, hi = sorted((docs[i], docs[j]))
                        pairs.append((lo, hi, int(dist)))
        return _pairs_table(pairs, id_dtype, "hamming", pa.int64())

    bucketed, _ = _with_dedup_bucket(sig_ds, "chunk_key")
    return bucketed.groupby("__dbkt").map_groups(verify, batch_format="pandas")


def ngram_jaccard_pairs(
    ds,
    text_col: str,
    id_col: str,
    *,
    n: int = 3,
    threshold: float = 0.5,
    bucket_col: Optional[str] = None,
    num_buckets: int = 32,
    max_bucket_rows: int = 10_000,
):
    """Exact word-n-gram Jaccard similarity pairs within candidate
    buckets (by default: rolling-fingerprint buckets, so only plausible
    near-dups are compared; quadratic only WITHIN a bucket).

    ``max_bucket_rows`` guards the in-bucket O(m^2) comparison against a
    degenerate corpus (e.g. thousands of identical boilerplate docs
    sharing one fingerprint): a bucket above the bound raises with
    guidance instead of silently burning m^2/2 comparisons."""
    from mobray.functions.textfns import rolling_fingerprint

    def add_bucket(batch: pa.Table) -> pa.Table:
        if bucket_col is not None:
            key = stable_hash64(batch[bucket_col].to_pylist()) % num_buckets
        else:
            key = rolling_fingerprint(batch[text_col]).astype(np.uint64)
        return batch.append_column(
            "__ngram_bucket", pa.array(key.astype(np.int64), pa.int64())
        )

    def verify(g: pd.DataFrame):
        empty = pd.DataFrame(
            {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"),
             "jaccard": pd.Series(dtype="float64")}
        )
        g = g[g.groupby("__ngram_bucket")[id_col].transform("size") >= 2]
        pairs = []
        for bkt, sub in g.groupby("__ngram_bucket"):
            if len(sub) > max_bucket_rows:
                raise ValueError(
                    f"candidate bucket {bkt} holds {len(sub)} docs "
                    f"(> max_bucket_rows={max_bucket_rows}); the corpus is "
                    f"degenerate for fingerprint bucketing — pre-dedup "
                    f"exact duplicates or pass a finer bucket_col"
                )
            grams = [word_ngrams(t or "", n) for t in sub[text_col]]
            docs = sub[id_col].to_numpy()
            for i in range(len(docs)):
                for j in range(i + 1, len(docs)):
                    sim = jaccard(grams[i], grams[j])
                    if sim >= threshold and docs[i] != docs[j]:
                        lo, hi = sorted((docs[i], docs[j]))
                        pairs.append((lo, hi, sim))
        if not pairs:
            return table_from_pandas(empty)
        return table_from_pandas(
            pd.DataFrame(pairs, columns=["a", "b", "jaccard"]),
            preserve_index=False,
        )

    bucketed, _ = _with_dedup_bucket(
        ds.map_batches(add_bucket, batch_format="pyarrow"), "__ngram_bucket"
    )
    return bucketed.groupby("__dbkt").map_groups(verify, batch_format="pandas")


def phash_neardup_pairs(
    ds, phash_col: str, id_col: str, hamming_radius: int = 6, *,
    output: str = "pandas",
):
    """Image near-dup candidate pairs by perceptual-hash Hamming distance.

    Same 16-bit-chunk LSH as simhash_dedup but over a precomputed int64
    phash column (no decode needed): two hashes within Hamming distance
    <= 3 share an exact 16-bit chunk (pigeonhole); larger radii trade
    recall. Returns (a, b, hamming) pairs; ``output`` selects the
    Dataset-returning scale paths (see ``_finalize_pairs``). Shuffle
    ships only (chunk_key, id, phash) rows."""

    def sig_rows(batch: pa.Table) -> pa.Table:
        ph = batch[phash_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(ph)
        u = ph.view(np.uint64)
        chunks = np.empty((4, n), dtype=np.int64)
        for c in range(4):
            chunks[c] = (
                c * 65536
                + ((u >> np.uint64(16 * c)) & np.uint64(0xFFFF)).astype(np.int64)
            )
        ids = batch[id_col].combine_chunks()
        return pa.table(
            {
                "chunk_key": pa.array(chunks.ravel(), pa.int64()),
                "doc": pa.concat_arrays([ids] * 4),
                "sig": pa.array(np.tile(ph, 4), pa.int64()),
            }
        )

    pairs_ds = _hamming_verify_bucketed(
        ds.map_batches(sig_rows, batch_format="pyarrow"), hamming_radius
    )
    return _finalize_pairs(pairs_ds, "hamming", output, id_col)


def embedding_neardup_pairs(
    ds,
    emb_col: str,
    id_col: str,
    *,
    threshold: float = 0.95,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 11,
    dim: Optional[int] = None,
    output: str = "pandas",
    ship: str = "vectors",
):
    """Embedding-cosine near-dup pairs via multi-table random-hyperplane
    LSH, returned as a sorted pandas DataFrame (a, b, cosine) by
    default; ``output`` selects the Dataset-returning scale paths (see
    ``_finalize_pairs``).

    Each of ``n_tables`` independent tables buckets vectors by the
    sign-pattern of ``n_planes`` random projections; exact cosine is
    verified within each bucket by one matmul, and pair sets are
    unioned across tables. Recall for a pair at cosine c is
    1 - (1 - (1 - acos(c)/pi)^n_planes)^n_tables — multiple small
    tables beat one large table because a single flipped sign only
    kills one table.

    ``ship`` picks the exchange byte profile:
      - 'vectors' (default): rows explode x n_tables in the shuffle, but
        each row is just (bucket, id, vector) and the replicated vector
        copy is downcast to float32 when the source is wider (the cosine
        verify is threshold-based, so the ~1e-7 relative rounding is
        immaterial). One shuffle; right whenever vector bytes x n_tables
        fits the exchange budget.
      - 'ids': the LSH shuffle carries ONLY (bucket, id) rows (~16
        bytes x n_tables); singleton buckets — the overwhelming majority
        under selective n_planes — are pruned BEFORE any vector moves,
        then vectors join back for just the surviving candidate rows and
        one more bucket groupby runs the same matmul verify. Three
        exchanges, but vector bytes proportional to CANDIDATES rather
        than corpus x n_tables — the scale path for wide embeddings
        (e.g. 4 KB float32 vectors at 100 TB) where candidates are a
        tiny fraction of rows."""
    if dim is None:
        first = ds.take(1)[0][emb_col]
        dim = len(first)
    rng = np.random.Generator(np.random.PCG64(seed))
    # (n_tables, dim, n_planes), all drawn from one seeded stream
    planes = rng.normal(size=(n_tables, dim, n_planes))

    def add_bucket(batch: pa.Table) -> pa.Table:
        emb = embedding_matrix(batch[emb_col])
        n = len(emb)
        keys = np.empty((n_tables, n), dtype=np.int64)
        for t in range(n_tables):
            signs = (emb @ planes[t]) > 0
            key = signs @ (1 << np.arange(n_planes, dtype=np.int64))
            keys[t] = key + (t << np.int64(48))  # disjoint per-table key space
        ids = batch[id_col]
        emb_arr = batch[emb_col].combine_chunks()
        t = emb_arr.type
        if pa.types.is_fixed_size_list(t) and t.value_type == pa.float64():
            emb_arr = emb_arr.cast(pa.list_(pa.float32(), t.list_size))
        elif pa.types.is_list(t) and t.value_type == pa.float64():
            emb_arr = emb_arr.cast(pa.list_(pa.float32()))
        out = pa.table(
            {
                "bucket": pa.array(keys.ravel(), pa.int64()),
                "doc": pa.concat_arrays(
                    [ids.combine_chunks()] * n_tables
                ),
                "emb": pa.concat_arrays([emb_arr] * n_tables),
            }
        )
        return out

    def verify(g: pd.DataFrame):
        id_dtype = g["doc"].dtype
        g = g[g.groupby("bucket")["doc"].transform("size") >= 2]
        pairs = []
        for _, sub in g.groupby("bucket"):
            emb = np.stack(sub["emb"].to_numpy()).astype(np.float64)
            norms = np.linalg.norm(emb, axis=1, keepdims=True)
            emb = emb / np.maximum(norms, 1e-12)
            sims = emb @ emb.T
            docs = sub["doc"].to_numpy()
            ii, jj = np.where(np.triu(sims, k=1) >= threshold)
            for i, j in zip(ii, jj):
                if docs[i] != docs[j]:
                    lo, hi = sorted((docs[i], docs[j]))
                    pairs.append((lo, hi, float(sims[i, j])))
        return _pairs_table(pairs, id_dtype, "cosine", pa.float64())

    if ship == "vectors":
        bucketed, _ = _with_dedup_bucket(
            ds.map_batches(add_bucket, batch_format="pyarrow"), "bucket"
        )
        pairs_ds = bucketed.groupby("__dbkt").map_groups(
            verify, batch_format="pandas"
        )
        return _finalize_pairs(pairs_ds, "cosine", output, id_col)
    if ship != "ids":
        raise ValueError(f"unknown ship mode {ship!r}")

    from mobray.pipelines.relational import hash_join

    def add_bucket_ids(batch: pa.Table) -> pa.Table:
        emb = embedding_matrix(batch[emb_col])
        n = len(emb)
        keys = np.empty((n_tables, n), dtype=np.int64)
        for t in range(n_tables):
            signs = (emb @ planes[t]) > 0
            key = signs @ (1 << np.arange(n_planes, dtype=np.int64))
            keys[t] = key + (t << np.int64(48))
        ids = batch[id_col]
        return pa.table(
            {
                "bucket": pa.array(keys.ravel(), pa.int64()),
                "doc": pa.concat_arrays([ids.combine_chunks()] * n_tables),
            }
        )

    def prune_singletons(g: pd.DataFrame):
        keep = g[g.groupby("bucket")["doc"].transform("size") >= 2]
        return table_from_pandas(keep[["bucket", "doc"]])

    import ray

    id_buckets, _ = _with_dedup_bucket(
        ds.map_batches(add_bucket_ids, batch_format="pyarrow"), "bucket"
    )
    candidates = id_buckets.groupby("__dbkt").map_groups(
        prune_singletons, batch_format="pandas"
    )
    # barrier between the all-to-alls (a groupby chained LAZILY into
    # another exchange deadlocks the streaming executor — same pathology
    # the connected-components supersteps document); candidates are tiny
    # by construction in the ship='ids' regime, so this is cheap
    candidates = candidates.materialize().repartition(8)
    # broadcast the candidate-id SET once (ray.put) and semi-filter the
    # embedding table MAP-SIDE: non-candidate vectors never leave their
    # block. A generic distributed join here would re-shuffle the whole
    # vector table and void the point of shipping ids. The broadcast set
    # bounds this mode: candidate ids must fit the object store — which
    # is exactly the selective-LSH regime ship='ids' exists for.
    cand_ids = np.unique(
        candidates.select_columns(["doc"]).to_pandas()["doc"].to_numpy()
    )
    cand_ref = ray.put(cand_ids)

    def keep_candidates(batch: pa.Table) -> pa.Table:
        wanted = ray.get(cand_ref)
        ids_np = batch[id_col].to_numpy(zero_copy_only=False)
        mask = np.isin(ids_np, wanted)
        kept = batch.filter(pa.array(mask))
        # normalize to a PLAIN list<double>: tensor-extension columns
        # cannot survive the padded union's null slots (their pandas
        # reconstruction rejects chunked null extension arrays)
        if kept.num_rows:
            m = embedding_matrix(kept[emb_col])
            offs = np.arange(
                0, (len(m) + 1) * m.shape[1], m.shape[1], dtype=np.int32
            )
            emb_arr = pa.ListArray.from_arrays(
                pa.array(offs), pa.array(m.ravel(), pa.float64())
            )
        else:
            emb_arr = pa.array([], pa.list_(pa.float64()))
        return pa.table(
            {"doc": kept[id_col].combine_chunks(), "emb": emb_arr}
        )

    pruned_vecs = ds.map_batches(keep_candidates, batch_format="pyarrow")
    # candidate-sized x candidate-sized equi join; the padded exchange
    # avoids the native join's per-partition aggregator actors (which
    # deadlock small CPU allocations at high partition counts)
    with_vec = hash_join(
        candidates, pruned_vecs, on="doc", how="inner",
        right_cols=["emb"], num_buckets=16, engine="padded",
    )
    # barrier between the join all-to-all and the verify groupby — the
    # same streaming-executor pathology as the candidates step above
    # (lazily chained exchanges deadlock small CPU allocations); the
    # joined table is candidate-sized, so materializing it is cheap
    with_vec = with_vec.materialize().repartition(8)
    bucketed, _ = _with_dedup_bucket(with_vec, "bucket")
    pairs_ds = bucketed.groupby("__dbkt").map_groups(
        verify, batch_format="pandas"
    )
    return _finalize_pairs(pairs_ds, "cosine", output, id_col)


def connected_components_distributed(
    pairs_ds,
    a_col: str = "a",
    b_col: str = "b",
    *,
    num_buckets: Optional[int] = None,
    max_iters: int = 64,
):
    """Distributed connected components over an edge Dataset via
    min-label propagation — the scale path for near-dup cluster merging
    when the pair list no longer fits on the driver (the driver-side
    union-find in minhash_lsh_dedup assumes sparse pairs).

    Each iteration: (1) propagate neighbour labels along edges and (2)
    pointer-double (label(label(node))) — both are bucketed hash_join
    exchanges — then take the per-node min. Pointer doubling gives
    O(log diameter) rounds (a pure neighbour walk is O(diameter), which
    bites on chain-shaped components); a stable-hash checksum of the
    label table detects the fixpoint. Returns a Dataset (node, cluster)
    where cluster = the component's minimum node id.

    PARTITIONING ASSUMPTION: inherited from hash_join (equal node ids
    co-locate); label state lives in the Dataset, never on the driver.
    """
    import ray.data
    from ray.data.aggregate import Min

    from mobray.pipelines.relational import hash_join

    def to_edges(batch: pa.Table) -> pa.Table:
        a = batch[a_col]
        b = batch[b_col]
        return pa.table(
            {
                "node": pa.concat_arrays(
                    [a.combine_chunks(), b.combine_chunks()]
                ),
                "peer": pa.concat_arrays(
                    [b.combine_chunks(), a.combine_chunks()]
                ),
            }
        )

    edges = pairs_ds.map_batches(to_edges, batch_format="pyarrow")
    # initial label = own id
    labels = (
        edges.map_batches(
            lambda t: pa.table({"node": t["node"], "cluster": t["node"]}),
            batch_format="pyarrow",
        )
        .groupby("node")
        .aggregate(Min("cluster", alias_name="cluster"))
        .materialize()
    )

    def checksum(lbl) -> int:
        # order-insensitive fingerprint of the label table: sum of stable
        # per-row hashes, computed as a per-batch partial then a tiny sum
        def part(t: pa.Table) -> pa.Table:
            # fully vectorized (node, cluster) pair hash: hash each
            # column at its native dtype (no per-row Python f-strings),
            # mix one side so (a, b) != (b, a), xor-combine
            import pandas as pd

            hn = pd.util.hash_array(t["node"].to_numpy(zero_copy_only=False))
            hc = pd.util.hash_array(t["cluster"].to_numpy(zero_copy_only=False))
            h = _mix64(hn) ^ hc
            # 32-bit per-batch partials so the reduce-side sum stays
            # far inside int64 (a 63-bit partial overflowed the reduce)
            return pa.table({"s": [int(h.sum()) & 0xFFFFFFFF]})

        # final mod 2^32 makes the checksum PARTITION-invariant:
        # sum(partial mod M) ≡ sum(partials) (mod M), but the raw sum
        # differs by multiples of M depending on block boundaries — an
        # unreduced compare saw identical label tables as "changed" and
        # looped to max_iters

        return int(lbl.map_batches(part, batch_format="pyarrow").sum("s") or 0) % 0x100000000

    # edges as "node takes peer's label" relations, keyed by peer
    nb = num_buckets if num_buckets is not None else 32
    edge_rel = edges.map_batches(
        lambda t: pa.table({"dst": t["node"], "node": t["peer"]}),
        batch_format="pyarrow",
    ).materialize()

    prev = checksum(labels)
    for _ in range(max_iters):
        # one relation carries BOTH propagation rules, keyed on "node":
        #   neighbour rule: dst takes label(peer)        (from edges)
        #   pointer jump:   dst takes label(label(dst))  (from labels)
        # so a single hash_join against the label table per superstep —
        # each iteration is one materialization barrier, Pregel-style
        # (a fully lazy nested-join graph was pathological to schedule).
        jump_rel = labels.map_batches(
            lambda t: pa.table({"dst": t["node"], "node": t["cluster"]}),
            batch_format="pyarrow",
        )
        cand = hash_join(
            edge_rel.union(jump_rel),
            labels,
            on="node",
            right_cols=["cluster"],
            num_buckets=num_buckets,
            # padded engine: the native join allocates an aggregator
            # actor pool per call, which thrashes inside an iterative
            # superstep loop (and label tables are narrow anyway)
            engine="padded",
        ).map_batches(
            lambda t: pa.table({"node": t["dst"], "cluster": t["cluster"]}),
            batch_format="pyarrow",
        ).materialize()  # barrier: a lazy join nested under the next
        # aggregate makes one plan with stacked all-to-alls, which Ray's
        # streaming executor schedules pathologically
        labels = (
            labels.union(cand)
            # bound the partition count: aggregate emits one block per
            # input partition, so without this the union compounds
            # blocks every superstep and the shuffle goes quadratic
            .repartition(nb)
            .groupby("node")
            .aggregate(Min("cluster", alias_name="cluster"))
            .materialize()
        )
        cur = checksum(labels)
        if cur == prev:
            break
        prev = cur
    return labels
