"""Stable vectorized hashing, MinHash, SimHash — the dedup primitives.

All hashes are deterministic across processes/workers (pandas'
``hash_array`` with a fixed hash key; NO salted builtin ``hash``), which
the distributed dedup groupbys rely on.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np
import pandas as pd

_HASH_KEY = "0123456789123456"
_MERSENNE = (1 << 61) - 1


def stable_hash64(values) -> np.ndarray:
    """Stable unsigned 64-bit hash of an array of strings/ints (C speed)."""
    arr = np.asarray(values, dtype=object)
    return pd.util.hash_array(arr, hash_key=_HASH_KEY)


def char_shingles(text: str, k: int = 5) -> List[str]:
    """Overlapping character k-grams of a normalized text."""
    t = " ".join(text.lower().split())
    if len(t) < k:
        return [t] if t else []
    return [t[i : i + k] for i in range(len(t) - k + 1)]


def word_ngrams(text: str, n: int = 3) -> List[str]:
    toks = text.lower().split()
    if len(toks) < n:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def minhash_params(num_perm: int, seed: int = 7) -> tuple:
    """(a, b) coefficient arrays for the universal hash family
    h_i(x) = (a_i x + b_i) mod (2^61 - 1)."""
    rng = np.random.Generator(np.random.PCG64(seed))
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(shingle_hashes: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """MinHash signature (num_perm,) uint64 from base shingle hashes."""
    if len(shingle_hashes) == 0:
        return np.full(len(a), _MERSENNE, dtype=np.uint64)
    x = (shingle_hashes % _MERSENNE).astype(np.uint64)
    # (num_perm, n_shingles) — fine for documents (hundreds of shingles)
    vals = (np.outer(a, x) + b[:, None]) % _MERSENNE
    return vals.min(axis=1)


def band_keys(sig: np.ndarray, bands: int) -> np.ndarray:
    """Collapse a signature into one stable uint64 key per LSH band."""
    r = len(sig) // bands
    view = sig[: bands * r].reshape(bands, r)
    return pd.util.hash_array(
        np.array([v.tobytes() for v in view], dtype=object), hash_key=_HASH_KEY
    )


def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    """MinHash Jaccard estimate = fraction of agreeing signature slots."""
    return float(np.mean(sig_a == sig_b))


def jaccard(a: Sequence[str], b: Sequence[str]) -> float:
    """Exact Jaccard similarity of two shingle collections."""
    sa, sb = set(a), set(b)
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def simhash64(tokens: List[str]) -> int:
    """64-bit SimHash over token hashes (count-weighted sign sum)."""
    if not tokens:
        return 0
    th = stable_hash64(tokens)
    bits = ((th[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
        np.int64
    )
    score = (bits * 2 - 1).sum(axis=0)
    out = np.uint64(0)
    for i in range(64):
        if score[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(out.astype(np.int64))
