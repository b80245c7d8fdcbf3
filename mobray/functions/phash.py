"""Perceptual-hash-like 64-bit image fingerprint + derived features.

An 8x8 area-mean / threshold hash (the classic aHash construction):
grayscale -> area-average to 8x8 -> threshold at the cell mean -> pack
64 bits into an int64. Deterministic and pure numpy, so the generator
and the decode-verify stage compute the identical value.

Binning features derive from it: ``popcount(phash)`` (0..64, low
cardinality — a good groupby key at any scale) and ``phash & 0xFF``.
"""

from __future__ import annotations

import numpy as np


# Boundary arrays depend only on (h, w); images arrive in a handful of
# shapes per batch, so memoize (rb, cb, 1/area) — profiling showed the
# arange/diff/append/outer bookkeeping costing as much as the reduceat
# itself when recomputed per image. Values are identical (same integer
# math), just cached, so stored phashes remain bit-exact.
_BOUNDS_8: dict = {}


def _bounds_8x8(h: int, w: int):
    key = (h, w)
    hit = _BOUNDS_8.get(key)
    if hit is None:
        rb = (np.arange(8) * h) // 8
        cb = (np.arange(8) * w) // 8
        # images smaller than 8px duplicate boundaries; reduceat then
        # yields the single source pixel for the zero-width cell, so a
        # count clamped to 1 is the exact divisor (not a 0-div -> nan)
        rcounts = np.maximum(np.diff(np.append(rb, h)), 1)
        ccounts = np.maximum(np.diff(np.append(cb, w)), 1)
        area = np.outer(rcounts, ccounts)
        # row-stage accumulator for PER-CHANNEL sums: a row cell sums at
        # most max(rcounts) uint8 values (channels not yet folded)
        acc = np.uint16 if int(rcounts.max()) * 255 < (1 << 16) else np.int32
        if len(_BOUNDS_8) >= 1024:
            _BOUNDS_8.clear()
        hit = _BOUNDS_8[key] = (rb, cb, area, acc)
    return hit


def phash64(pixels: np.ndarray) -> int:
    """(H, W, 3) uint8 -> signed int64 perceptual hash. Identical to
    ``phash64_batch`` on a singleton stack by construction."""
    return int(phash64_batch(pixels[None, ...])[0])


def phash64_batch(stack: np.ndarray) -> np.ndarray:
    """(N, H, W, 3) uint8 -> (N,) int64 phash.

    Integer pyramid, channel-last: reduceat rows PER CHANNEL into a
    (N, 8, W, C) uint16 intermediate (exact while
    255 * max_row_count < 2^16, i.e. any image up to ~2000 px tall;
    int32 beyond), then columns with an EXPLICIT int64 accumulator (a
    full 8x8 cell sum exceeds 2^31 already at ~1700 px images — never
    leave it to numpy's platform-default int promotion), then fold the
    channel axis. Integer addition commutes, so cell sums are
    bit-identical to the old grayscale-first order — but the stack is
    read ONCE (3 bytes/pixel) with a small 8-row intermediate instead of
    writing + re-reading a full (N, H, W) grayscale (2+2 bytes/pixel
    extra); streaming bandwidth is what limits per-core throughput when
    many decode actors run. The per-channel cell layout is shared with
    the 8x8 area-resize (same boundary formula), which is what lets the
    decode stage fuse phash/PSNR-thumb/brightness into one reduction
    (``phash64_from_cells``)."""
    rb, cb, area, acc = _bounds_8x8(stack.shape[1], stack.shape[2])
    cells4 = np.add.reduceat(
        np.add.reduceat(stack, rb, axis=1, dtype=acc), cb, axis=2,
        dtype=np.int64,
    )
    return phash64_from_cells(cells4.sum(axis=3), area)


def phash64_from_cells(sums: np.ndarray, area: np.ndarray) -> np.ndarray:
    """(N, 8, 8) int64 grayscale cell sums (+ the 8x8 integer pixel-count
    grid) -> (N,) int64 phash. The threshold/packing tail of
    ``phash64_batch``, split out so a caller that already holds the
    per-channel cell sums (the fused decode stage) skips every full-image
    pass."""
    n = len(sums)
    cells = sums.reshape(n, 64) / (3.0 * area.reshape(64))
    bits = cells > cells.mean(axis=1)[:, None]
    packed = np.packbits(bits.astype(np.uint8), axis=1)  # (n, 8) big-endian
    u = np.ascontiguousarray(packed).view(">u8").ravel()
    return u.astype(np.uint64).view(np.int64)


def popcount64(values: np.ndarray) -> np.ndarray:
    """Vectorized popcount of an int64/uint64 array -> int32 (0..64)."""
    v = np.asarray(values).astype(np.int64).view(np.uint64)
    return np.unpackbits(v.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1).astype(
        np.int32
    )


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise Hamming distance between two int64 hash arrays."""
    x = np.asarray(a).astype(np.int64) ^ np.asarray(b).astype(np.int64)
    return popcount64(x)
