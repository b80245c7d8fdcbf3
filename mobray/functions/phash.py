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
        rcounts = np.diff(np.append(rb, h))
        ccounts = np.diff(np.append(cb, w))
        area = np.outer(rcounts, ccounts)
        if len(_BOUNDS_8) >= 1024:
            _BOUNDS_8.clear()
        hit = _BOUNDS_8[key] = (rb, cb, area)
    return hit


def _area_mean_8x8(gray: np.ndarray) -> np.ndarray:
    """Area-average an (H, W) float array down to 8x8 via reduceat on
    integer cell boundaries (handles any H, W >= 1)."""
    h, w = gray.shape
    rb, cb, area = _bounds_8x8(h, w)
    sums = np.add.reduceat(np.add.reduceat(gray, rb, axis=0), cb, axis=1)
    return sums / area


def phash64(pixels: np.ndarray) -> int:
    """(H, W, 3) uint8 -> signed int64 perceptual hash."""
    # dtype=float64 accumulates (a+b)+c in float64 exactly like
    # astype-then-mean, minus the full-image float64 copy
    gray = np.mean(pixels, axis=2, dtype=np.float64)
    cells = _area_mean_8x8(gray)
    bits = (cells > cells.mean()).ravel()
    packed = np.packbits(bits.astype(np.uint8))  # 8 bytes, big-endian bit order
    u = np.frombuffer(packed.tobytes(), dtype=">u8")[0]
    return int(np.uint64(u).astype(np.int64))


def phash64_batch(stack: np.ndarray) -> np.ndarray:
    """(N, H, W, 3) uint8 -> (N,) int64 phash, bit-exact vs per-image
    ``phash64``: every reduction (channel mean, reduceat cell sums, cell
    mean) runs in the same element order per image, just across a stack,
    so the per-image numpy call overhead amortizes over N."""
    n, h, w, _ = stack.shape
    rb, cb, area = _bounds_8x8(h, w)
    gray = np.mean(stack, axis=3, dtype=np.float64)
    sums = np.add.reduceat(np.add.reduceat(gray, rb, axis=1), cb, axis=2)
    cells = (sums / area).reshape(n, 64)
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
