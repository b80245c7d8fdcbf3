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
_P = np.uint64(_MERSENNE)
_MASK31 = np.uint64((1 << 31) - 1)
_MASK30 = np.uint64((1 << 30) - 1)


def _fold61(y: np.ndarray) -> np.ndarray:
    """Reduce uint64 y (any value) to y mod (2^61 - 1) WITHOUT division:
    y = u*2^61 + v === u + v (mod p), then one conditional subtract.
    u <= 7 for y < 2^64, so u + v < p + 8 — a single subtract suffices."""
    y = (y >> np.uint64(61)) + (y & _P)
    return np.where(y >= _P, y - _P, y)


def mulmod61(a: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Exact (a * x) mod (2^61 - 1) on uint64 arrays, vectorized.

    numpy has no 128-bit ints, so split both operands into 31/30-bit
    halves; every intermediate then fits in uint64 and 2^61 === 1 (mod p)
    folds the high parts back. This makes the minhash hash family the
    REAL universal family (a*x + b) mod p — a plain uint64 multiply
    would wrap mod 2^64 first and void the uniformity guarantee.

    Division-free: uint64 ``%`` has no vector unit and dominated the
    minhash signature kernel (~7.6 s for 94M evals); Mersenne shift-mask
    folds with one conditional subtract are ~an order of magnitude
    cheaper and bit-identical."""
    a = _fold61(a)
    x = _fold61(x)
    a_hi, a_lo = a >> np.uint64(31), a & _MASK31
    x_hi, x_lo = x >> np.uint64(31), x & _MASK31
    # a*x = a_hi*x_hi*2^62 + (a_hi*x_lo + a_lo*x_hi)*2^31 + a_lo*x_lo
    hi = a_hi * x_hi                  # operands < 2^30 -> product < 2^60
    mid = a_hi * x_lo + a_lo * x_hi   # each < 2^61, sum < 2^62: fits
    lo = a_lo * x_lo                  # < 2^62
    # mid * 2^31 mod p with mid = u*2^30 + v: u*2^61 + v*2^31 === u + v*2^31
    # u < 2^32, v*2^31 < 2^61 -> sum < 2^62: fits
    mid_shift = (mid >> np.uint64(30)) + ((mid & _MASK30) << np.uint64(31))
    # 2*hi < 2^61; each folded term < p < 2^61; total < 2^63: fits uint64
    return _fold61(np.uint64(2) * hi + _fold61(mid_shift) + _fold61(lo))


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


_FNV_PRIME64 = np.uint64(1099511628211)
_FNV_OFFSET64 = np.uint64(1469598103934665603)


def splitmix64(k: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (vectorized, uint64 wraparound): whitens a
    structured 64-bit value into a uniform one."""
    k = np.asarray(k, dtype=np.uint64)
    k = k ^ (k >> np.uint64(30))
    k = k * np.uint64(0xBF58476D1CE4E5B9)
    k = k ^ (k >> np.uint64(27))
    k = k * np.uint64(0x94D049BB133111EB)
    return k ^ (k >> np.uint64(31))


def shingle_hash_stream(texts, k: int = 5):
    """Vectorized per-document shingle-hash stream for MinHash.

    SPEC (mirrored straight-line by the oracle,
    mobray/oracle/naive.py:_shingle_hashes):
      - normalize: lowercase, collapse ``\\s+`` runs to one space, strip
        leading/trailing spaces (RE2 ``\\s`` = ASCII whitespace; applied
        to the UTF-8 text);
      - shingles: k-BYTE windows of the normalized UTF-8 bytes; a
        non-empty text shorter than k bytes yields ONE shingle (the
        whole text); empty/null texts yield none;
      - hash: FNV-1a-style polynomial over the window's bytes
        (h = offset; h = h*prime + byte, mod 2^64) finished with
        splitmix64.

    The whole batch is processed as ONE byte buffer: arrow compute
    kernels normalize, the window-start index vector comes from a
    repeat/arange expansion, and the rolling hash is k vectorized
    passes over the buffer — no per-row Python. Returns
    (hashes uint64 ndarray, per-doc offsets int64 ndarray) in the
    layout ``minhash_signatures`` consumes.

    Note: windows are BYTE-level (not codepoint-level) — multi-byte
    UTF-8 sequences hash as their bytes, which is standard practice for
    shingling throughput (similarity semantics are unchanged: equal
    text has equal bytes)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = texts if isinstance(texts, (pa.Array, pa.ChunkedArray)) else pa.array(
        list(texts), pa.string()
    )
    if pa.types.is_null(arr.type):
        # an all-null block infers the null type, which fill_null/utf8
        # kernels reject — it is just n empty docs
        arr = arr.cast(pa.string())
    arr = pc.fill_null(arr, "")
    arr = pc.utf8_lower(arr)
    arr = pc.replace_substring_regex(arr, pattern=r"\s+", replacement=" ")
    arr = pc.utf8_trim(arr, " ")
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n_docs = len(arr)
    # zero-copy views of the utf8 layout (offset-adjusted)
    str_offsets = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset : arr.offset + n_docs + 1
    ].astype(np.int64)
    data_buf = arr.buffers()[2]
    data = (
        np.frombuffer(data_buf, dtype=np.uint8)
        if data_buf is not None
        else np.empty(0, np.uint8)
    )
    lens = np.diff(str_offsets)
    counts = np.where(lens >= k, lens - k + 1, (lens > 0).astype(np.int64))
    out_offsets = np.zeros(n_docs, dtype=np.int64)
    np.cumsum(counts[:-1], out=out_offsets[1:])
    total = int(counts.sum())
    hashes = np.empty(total, dtype=np.uint64)
    # long docs: every k-byte window, all docs at once
    long_mask = lens >= k
    if long_mask.any():
        nw = counts[long_mask]
        first = str_offsets[:-1][long_mask]
        # window starts = doc_start + (0..nw_i-1), flattened
        csum = np.cumsum(nw)
        starts = np.arange(csum[-1], dtype=np.int64) - np.repeat(
            csum - nw, nw
        ) + np.repeat(first, nw)
        h = np.full(len(starts), _FNV_OFFSET64)
        for j in range(k):
            h = h * _FNV_PRIME64 + data[starts + j]
        # destination slots of long-doc windows: each long doc's
        # out_offset repeated across its windows plus the window ordinal
        dpos = np.repeat(out_offsets[long_mask], nw) + (
            np.arange(csum[-1], dtype=np.int64) - np.repeat(csum - nw, nw)
        )
        hashes[dpos] = splitmix64(h)
    # short docs: one whole-text shingle per length class (< k classes)
    short_mask = (lens > 0) & (lens < k)
    for l in np.unique(lens[short_mask]):
        m = short_mask & (lens == l)
        first = str_offsets[:-1][m]
        h = np.full(int(m.sum()), _FNV_OFFSET64)
        for j in range(int(l)):
            h = h * _FNV_PRIME64 + data[first + j]
        hashes[out_offsets[m]] = splitmix64(h)
    return hashes, out_offsets


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
    """MinHash signature (num_perm,) uint64 from base shingle hashes,
    using the exact universal family h_i(x) = (a_i*x + b_i) mod (2^61-1)."""
    if len(shingle_hashes) == 0:
        return np.full(len(a), _MERSENNE, dtype=np.uint64)
    x = _fold61(shingle_hashes.astype(np.uint64))
    vals = _fold61(mulmod61(a[:, None], x[None, :]) + b[:, None])
    return vals.min(axis=1)


def minhash_signatures(
    shingle_hashes: np.ndarray, offsets: np.ndarray, a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """Batched MinHash: signatures for MANY documents in one vectorized
    pass (the per-batch hot path of the LSH dedup stage).

    ``shingle_hashes`` is the concatenation of all docs' shingle hashes;
    ``offsets[i]`` is doc i's start (len(offsets) = n_docs). Returns
    (n_docs, num_perm) uint64. Empty docs get the sentinel p (same as
    minhash_signature). Perm axis is chunked so the intermediate
    (chunk, total_shingles) matrix stays bounded."""
    offsets = np.asarray(offsets, dtype=np.int64)
    n_docs = len(offsets)
    num_perm = len(a)
    out = np.full((n_docs, num_perm), _MERSENNE, dtype=np.uint64)
    total = len(shingle_hashes)
    if total == 0 or n_docs == 0:
        return out
    counts = np.diff(np.append(offsets, total))
    nonempty = counts > 0
    raw = np.asarray(shingle_hashes, dtype=np.uint64)
    # per-doc DISTINCT shingles: min over a set == min over the multiset,
    # and real text repeats shingles (~1.4x here) — pure kernel savings
    uniq_parts = []
    ne_offsets = np.empty(int(nonempty.sum()), dtype=np.int64)
    pos = 0
    for k, i in enumerate(np.flatnonzero(nonempty)):
        u = np.unique(raw[offsets[i] : offsets[i] + counts[i]])
        ne_offsets[k] = pos
        pos += len(u)
        uniq_parts.append(u)
    x = _fold61(np.concatenate(uniq_parts))
    total = len(x)
    # split x once for every perm-chunk (the generic mulmod61 would redo
    # the fold+split per call); all ops below are in-place single passes
    x_hi, x_lo = x >> np.uint64(31), x & _MASK31
    af = _fold61(a)
    a_hi, a_lo = af >> np.uint64(31), af & _MASK31
    # chunk perms: keep chunk*total <= ~4M uint64 (~32 MB of intermediates)
    chunk = max(1, int(4_000_000 // max(1, total)))
    for s in range(0, num_perm, chunk):
        e = min(num_perm, s + chunk)
        # a*x mod p via 31/30-bit split; the combined sum
        # 2*hi + mid_shift + lo < 2^61 + 2^62 + 2^62 < 2^64 fits uint64,
        # so only ONE fold at the end (mulmod61 folds each term)
        t1 = a_hi[s:e, None] * x_lo[None, :]
        t1 += a_lo[s:e, None] * x_hi[None, :]  # mid < 2^62
        t2 = t1 & _MASK30
        t2 <<= np.uint64(31)
        t1 >>= np.uint64(30)
        t1 += t2  # mid_shift = mid*2^31 mod-equivalent, < 2^62
        np.multiply(a_lo[s:e, None], x_lo[None, :], out=t2)
        t1 += t2  # + lo < 2^62
        np.multiply(a_hi[s:e, None], x_hi[None, :], out=t2)
        t2 <<= np.uint64(1)
        t1 += t2  # + 2*hi < 2^61
        t2 = t1 >> np.uint64(61)
        t1 &= _P
        t1 += t2  # exact a*x mod p after one conditional subtract...
        t1 += b[s:e, None]  # ...folded together with +b: t1 < 2p+8 < 2^62
        t2 = t1 >> np.uint64(61)
        t1 &= _P
        t1 += t2
        np.subtract(t1, _P, out=t1, where=t1 >= _P)
        # per-doc min via reduceat on the shingle axis (empty docs excluded:
        # reduceat would misreport them as the next doc's first element)
        mins = np.minimum.reduceat(t1, ne_offsets, axis=1)
        out[nonempty, s:e] = mins.T
    return out


_BAND_PRIME = np.uint64(1099511628211)  # FNV-64 prime, wraparound combine


def band_keys_matrix(sigs: np.ndarray, bands: int) -> np.ndarray:
    """Vectorized LSH band keys for a signature MATRIX (n_docs, num_perm)
    -> (n_docs, bands) int64. Key = polynomial rolling combine of the
    band's r signature slots (uint64 wraparound, deterministic across
    workers), offset by the band index so identical content in different
    bands never collides."""
    n_docs, num_perm = sigs.shape
    r = num_perm // bands
    view = sigs[:, : bands * r].reshape(n_docs, bands, r)
    key = np.full((n_docs, bands), np.uint64(1469598103934665603))  # FNV offset
    for j in range(r):
        key = key * _BAND_PRIME + view[:, :, j]
    key = key * _BAND_PRIME + np.arange(bands, dtype=np.uint64)[None, :]
    return (key & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)


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
    return int(simhash64_batch(th, np.array([0], dtype=np.int64))[0])


def simhash64_batch(token_hashes: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Batched SimHash: one int64 simhash per document from the
    concatenated token hashes + per-doc start offsets. Bit-identical to
    per-doc simhash64 (majority of each of the 64 bits, count-weighted);
    empty docs hash to 0."""
    offsets = np.asarray(offsets, dtype=np.int64)
    n_docs = len(offsets)
    out = np.zeros(n_docs, dtype=np.int64)
    total = len(token_hashes)
    if total == 0 or n_docs == 0:
        return out
    counts = np.diff(np.append(offsets, total))
    nonempty = counts > 0
    th = np.asarray(token_hashes, dtype=np.uint64)
    # chunk docs so the (tokens, 64) bit matrix stays bounded
    ne_idx = np.flatnonzero(nonempty)
    starts = offsets[ne_idx]
    ends = starts + counts[ne_idx]
    doc_chunk = max(1, int(2_000_000 // 64))
    pos = 0
    while pos < len(ne_idx):
        hi = min(len(ne_idx), pos + doc_chunk)
        lo_off, hi_off = starts[pos], ends[hi - 1]
        sub = th[lo_off:hi_off]
        # little-endian unpack: bit column k == (hash >> k) & 1, so the
        # uint8 bit matrix + packbits round-trip is bit-identical to the
        # shift-broadcast it replaced, ~4x faster (measured 291 -> 79 ms
        # on sf0.1's 270k tokens)
        bits = np.unpackbits(
            sub.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
        )
        ones = np.add.reduceat(
            bits, (starts[pos:hi] - lo_off), axis=0, dtype=np.int32
        )
        n_tok = counts[ne_idx[pos:hi]][:, None].astype(np.int32)
        majority = (2 * ones) > n_tok  # score = 2*ones - n > 0
        packed = np.packbits(majority, axis=1, bitorder="little")
        out[ne_idx[pos:hi]] = (
            np.ascontiguousarray(packed).view(np.uint64).ravel().view(np.int64)
        )
        pos = hi
    return out
