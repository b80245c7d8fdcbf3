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
        if len(_BOUNDS_8) >= 1024:
            _BOUNDS_8.clear()
        hit = _BOUNDS_8[key] = (rb, cb, area)
    return hit


def phash64(pixels: np.ndarray) -> int:
    """(H, W, 3) uint8 -> signed int64 perceptual hash. Identical to
    ``phash64_batch`` on a singleton stack by construction."""
    return int(phash64_batch(pixels[None, ...])[0])


def phash64_batch(stack: np.ndarray) -> np.ndarray:
    """(N, H, W, 3) uint8 -> (N,) int64 phash.

    Integer pyramid: channel-sum the raw uint8 stack into a uint16
    grayscale (exact: a per-pixel channel total is bounded by
    3*255 = 765 < 2^16), then reduceat rows with an EXPLICIT int64
    accumulator (a full 8x8 cell sum is bounded by
    ceil(h/8)*ceil(w/8)*765, which exceeds 2^31 already at ~1700 px
    images — the accumulator must not be left to numpy's
    platform-default int promotion), then columns (int64 input stays
    int64). Every cell sum is an exact integer and the only float math
    is the final 64-cell mean/threshold. The (N, H, W) grayscale is the
    single largest memory stream in the decode stage: uint16 is 2 bytes
    per pixel vs 4 for the previous int32 (and 8 for the original
    float64); streaming bandwidth is what limits per-core throughput
    when many decode actors run."""
    n, h, w, _ = stack.shape
    rb, cb, area = _bounds_8x8(h, w)
    g = stack.sum(axis=3, dtype=np.uint16)
    sums = np.add.reduceat(
        np.add.reduceat(g, rb, axis=1, dtype=np.int64), cb, axis=2
    )
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
