"""Independent single-node reimplementations of the near-dup operators,
used as driver oracles (the pattern the binning core already follows:
same SPEC, separate straight-line implementation, different code path).

Everything here is deliberately plain Python-per-document with exact
integer arithmetic (no numpy vectorization, no shared kernel code with
``mobray.pipelines.dedup`` beyond the two spec'd primitives:
``pd.util.hash_array`` base hashing and the (a, b) parameter draw).
A bug in the distributed path's batching/reduceat/mulmod machinery
cannot reproduce here, which is what makes the comparison a real
correctness signal.

Specs implemented (mirrors mobray/functions/hashing.py contracts):
  - minhash shingle hash: k-byte windows of the normalized UTF-8 text,
    FNV polynomial + splitmix64 finish (plain Python ints here vs the
    vectorized one-buffer rolling pass in shingle_hash_stream)
  - minhash: h_i(x) = (a_i*x + b_i) mod (2^61 - 1), exact (Python ints)
  - LSH band key: FNV-1a-style polynomial combine of the band's slots
    mod 2^64, then the band index, masked to int64
  - simhash: per-bit majority (2*ones > n) of token-hash bits
  - winnowing fingerprint: min over window-8 rolling polynomial combine
    of token hashes (mod 2^64), masked to int63
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np
import pandas as pd

_HASH_KEY = "0123456789123456"
_P = (1 << 61) - 1
_M64 = (1 << 64) - 1
_MASK63 = 0x7FFFFFFFFFFFFFFF
_FNV_PRIME = 1099511628211
_FNV_OFFSET = 1469598103934665603


def _hash64(values: Sequence) -> List[int]:
    """The spec'd base hash (pandas hash_array, fixed key) as ints."""
    if not len(values):
        return []
    return [
        int(v)
        for v in pd.util.hash_array(np.asarray(values, dtype=object), hash_key=_HASH_KEY)
    ]


def _splitmix64(h: int) -> int:
    h &= _M64
    h ^= h >> 30
    h = (h * 0xBF58476D1CE4E5B9) & _M64
    h ^= h >> 27
    h = (h * 0x94D049BB133111EB) & _M64
    return h ^ (h >> 31)


def _shingle_hashes(text: str, k: int) -> List[int]:
    """Straight-line mirror of the minhash shingle-hash spec
    (mobray/functions/hashing.py:shingle_hash_stream): normalize
    (lower, collapse ASCII \\s+ to one space, strip spaces), k-BYTE
    windows of the UTF-8 bytes (one whole-text shingle when shorter
    than k), FNV polynomial per window + splitmix64 finish."""
    import re

    t = re.sub(r"[ \t\n\v\f\r]+", " ", (text or "").lower()).strip(" ")
    b = t.encode("utf-8")
    if not b:
        return []
    windows = [b] if len(b) < k else [b[i : i + k] for i in range(len(b) - k + 1)]
    out = []
    for w in windows:
        h = _FNV_OFFSET
        for c in w:
            h = (h * _FNV_PRIME + c) & _M64
        out.append(_splitmix64(h))
    return out


def _word_ngrams(text: str, n: int) -> List[str]:
    toks = text.lower().split()
    if len(toks) < n:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def _minhash_sig(text: str, a: List[int], b: List[int], shingle_k: int) -> List[int]:
    hashes = [h % _P for h in _shingle_hashes(text, shingle_k)]
    if not hashes:
        return [_P] * len(a)
    return [min((ai * x + bi) % _P for x in hashes) for ai, bi in zip(a, b)]


def _band_keys(sig: List[int], bands: int) -> List[int]:
    r = len(sig) // bands
    out = []
    for bi in range(bands):
        key = _FNV_OFFSET
        for j in range(r):
            key = (key * _FNV_PRIME + sig[bi * r + j]) & _M64
        key = (key * _FNV_PRIME + bi) & _M64
        out.append(key & _MASK63)
    return out


def _union_find_clusters(pairs: List[Tuple]) -> Dict:
    """Connected components over the pair list; every member maps to the
    minimum id of its component."""
    parent: Dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def naive_minhash_clusters(
    texts: Sequence[str],
    ids: Sequence,
    *,
    num_perm: int = 64,
    bands: int = 8,
    shingle_k: int = 5,
    threshold: float = 0.8,
) -> pd.DataFrame:
    """Single-node MinHash+LSH dedup clustering (spec of
    mobray.pipelines.dedup.minhash_lsh_dedup). Returns (id, cluster)
    rows sorted by id, clustered members only."""
    from mobray.functions.hashing import minhash_params

    a_arr, b_arr = minhash_params(num_perm)
    a, b = [int(v) for v in a_arr], [int(v) for v in b_arr]

    sigs = {i: _minhash_sig(t or "", a, b, shingle_k) for i, t in zip(ids, texts)}
    buckets: Dict[int, List] = {}
    for i in ids:
        for bk in _band_keys(sigs[i], bands):
            buckets.setdefault(bk, []).append(i)
    pairs = set()
    for members in buckets.values():
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                di, dj = members[x], members[y]
                if di == dj:
                    continue
                lo, hi = sorted((di, dj))
                if (lo, hi) in pairs:
                    continue
                est = sum(
                    1 for u, v in zip(sigs[di], sigs[dj]) if u == v
                ) / len(sigs[di])
                if est >= threshold:
                    pairs.add((lo, hi))
    cluster_of = _union_find_clusters(sorted(pairs))
    items = sorted(cluster_of.items())
    return pd.DataFrame(
        {"doc_id": [k for k, _ in items], "cluster": [v for _, v in items]}
    )


def _simhash(text: str) -> int:
    hashes = _hash64((text or "").lower().split())
    if not hashes:
        return 0
    n = len(hashes)
    out = 0
    for bit in range(64):
        ones = sum((h >> bit) & 1 for h in hashes)
        if 2 * ones > n:
            out |= 1 << bit
    return out - (1 << 64) if out >= (1 << 63) else out  # int64 view


def naive_simhash_pairs(
    texts: Sequence[str], ids: Sequence, *, hamming_radius: int = 3
) -> pd.DataFrame:
    """Single-node SimHash near-dup pairs (spec of simhash_dedup):
    16-bit-chunk LSH candidates, Hamming <= radius, sorted (a, b)."""
    sigs = {i: _simhash(t) for i, t in zip(ids, texts)}
    buckets: Dict[Tuple[int, int], List] = {}
    for i in ids:
        u = sigs[i] & _M64
        for c in range(4):
            buckets.setdefault((c, (u >> (16 * c)) & 0xFFFF), []).append(i)
    seen = {}
    for members in buckets.values():
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                di, dj = members[x], members[y]
                if di == dj:
                    continue
                lo, hi = sorted((di, dj))
                if (lo, hi) in seen:
                    continue
                d = bin((sigs[di] & _M64) ^ (sigs[dj] & _M64)).count("1")
                if d <= hamming_radius:
                    seen[(lo, hi)] = d
    rows = sorted(seen.items())
    return pd.DataFrame(
        {
            "a": [k[0] for k, _ in rows],
            "b": [k[1] for k, _ in rows],
            "hamming": [v for _, v in rows],
        }
    )


def _fingerprint(text: str, window: int = 8) -> int:
    toks = (text or "").lower().split()
    if not toks:
        return 0
    hashes = _hash64(toks)
    if len(hashes) <= window:
        return min(hashes) & _MASK63
    best = None
    for s in range(len(hashes) - window + 1):
        combined = hashes[s]
        for k in range(1, window):
            combined = (combined * _FNV_PRIME + hashes[s + k]) & _M64
        best = combined if best is None else min(best, combined)
    return best & _MASK63


def naive_ngram_jaccard_pairs(
    texts: Sequence[str], ids: Sequence, *, n: int = 3, threshold: float = 0.5
) -> pd.DataFrame:
    """Single-node fingerprint-bucketed exact n-gram Jaccard pairs (spec
    of ngram_jaccard_pairs). Returns (a, b, jaccard) sorted by (a, b)."""
    buckets: Dict[int, List] = {}
    text_of = {}
    for i, t in zip(ids, texts):
        text_of[i] = t or ""
        buckets.setdefault(_fingerprint(t or ""), []).append(i)
    rows = {}
    for members in buckets.values():
        grams = {i: set(_word_ngrams(text_of[i], n)) for i in members}
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                di, dj = members[x], members[y]
                if di == dj:
                    continue
                ga, gb = grams[di], grams[dj]
                if not ga and not gb:
                    sim = 1.0
                else:
                    union = len(ga | gb)
                    sim = len(ga & gb) / union if union else 1.0
                if sim >= threshold:
                    lo, hi = sorted((di, dj))
                    rows[(lo, hi)] = sim
    items = sorted(rows.items())
    return pd.DataFrame(
        {
            "a": [k[0] for k, _ in items],
            "b": [k[1] for k, _ in items],
            "jaccard": [v for _, v in items],
        }
    )
