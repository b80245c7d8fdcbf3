"""Self-contained image codecs on stdlib zlib — no PIL in this sandbox.

Two formats:
  - ``raw``: H*W*3 uint8 buffer (zero-copy reshape; the fast path)
  - ``png``: minimal but spec-conformant PNG (8-bit RGB, filter 0 rows
    on encode; decoder handles all five standard filters)

PNG is lossless, so decode(encode(px)) == px exactly — which trivially
satisfies the PSNR >= 40 dB gate (BASELINE.json north_star) and lets
tests assert exact pixel equality.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(tag + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + tag + payload + struct.pack(">I", crc)


def png_encode(pixels: np.ndarray, compress_level: int = 1) -> bytes:
    """Encode an (H, W, 3) uint8 array as an RGB8 PNG (filter 0 rows)."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError(f"expected (H, W, 3) uint8, got {pixels.shape} {pixels.dtype}")
    h, w = pixels.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    # one filter byte (0 = None) per scanline
    raw = np.empty((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = pixels.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), compress_level)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _unfilter(
    raw: np.ndarray, h: int, w: int, bpp: int = 3, out: np.ndarray = None
) -> np.ndarray:
    """Undo PNG scanline filters (types 0-4). Row-wise loop; each row is
    vectorized except Sub/Paeth which are inherently sequential.
    ``out`` (h, w*bpp uint8): decode straight into a caller buffer — the
    decode stage passes a slot of its preallocated same-shape chunk so
    pixels are written ONCE instead of copy-out-of-unfilter + np.stack."""
    stride = w * bpp
    rows = raw.reshape(h, 1 + stride)
    # fast path: all scanlines unfiltered (what our encoder emits) -> one slice
    if not rows[:, 0].any():
        if out is not None:
            np.copyto(out, rows[:, 1:])
            return out
        return np.ascontiguousarray(rows[:, 1:])
    if out is None:
        # every row is written before row r+1 reads it as `prev`, so the
        # buffer needs no zeroing — np.empty matches the out-buffer path
        out = np.empty((h, stride), dtype=np.uint8)
    for r in range(h):
        ftype = rows[r, 0]
        cur = rows[r, 1:].astype(np.int32)
        prev = out[r - 1].astype(np.int32) if r > 0 else np.zeros(stride, np.int32)
        if ftype == 0:
            line = cur
        elif ftype == 2:  # Up
            line = (cur + prev) & 0xFF
        elif ftype == 3:  # Average
            line = np.empty(stride, np.int32)
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (cur[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 1:  # Sub
            line = cur.copy()
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 4:  # Paeth
            line = np.empty(stride, np.int32)
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (cur[i] + pred) & 0xFF
        else:
            raise ValueError(f"unsupported PNG filter type {ftype}")
        out[r] = line.astype(np.uint8)
    return out


def png_decode(data: bytes, out: np.ndarray = None) -> np.ndarray:
    """Decode an RGB8 PNG produced by any conformant encoder -> (H, W, 3)
    uint8, optionally straight into ``out`` (whose shape must match the
    IHDR dimensions — a mismatch means the payload does not belong to its
    metadata row and is rejected as corrupt)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    w = h = None
    idat_parts = []
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(">IIBBBBB", payload)
            if depth != 8 or ctype != 2 or interlace != 0:
                raise ValueError(
                    f"unsupported PNG variant (depth={depth} color={ctype} interlace={interlace})"
                )
        elif tag == b"IDAT":
            idat_parts.append(payload)
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    # single-IDAT fast path (what our encoder emits): decompress the
    # buffer view directly, no join copy of the compressed stream
    if len(idat_parts) == 1:
        raw = np.frombuffer(zlib.decompress(idat_parts[0]), dtype=np.uint8)
    else:
        raw = np.frombuffer(
            zlib.decompress(b"".join(bytes(p) for p in idat_parts)), dtype=np.uint8
        )
    expected = h * (1 + w * 3)
    if len(raw) != expected:
        raise ValueError(f"PNG data length {len(raw)} != expected {expected}")
    if out is not None:
        if out.shape != (h, w, 3):
            raise ValueError(f"decoded dims ({h}, {w}) != metadata {out.shape[:2]}")
        _unfilter(raw, h, w, out=out.reshape(h, w * 3))
        return out
    return _unfilter(raw, h, w).reshape(h, w, 3)


def raw_encode(pixels: np.ndarray) -> bytes:
    if pixels.dtype != np.uint8:
        raise ValueError("raw codec expects uint8")
    return pixels.tobytes()


def raw_decode(data: bytes, w: int, h: int, out: np.ndarray = None) -> np.ndarray:
    arr = np.frombuffer(data, dtype=np.uint8)
    if len(arr) != h * w * 3:
        raise ValueError(f"raw buffer length {len(arr)} != {h}x{w}x3")
    if out is not None:
        np.copyto(out.reshape(-1), arr)
        return out
    return arr.reshape(h, w, 3)


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return png_encode(pixels)
    if fmt == "raw":
        return raw_encode(pixels)
    raise NotImplementedError(
        f"fmt '{fmt}' not supported in this sandbox (no image libs); "
        f"supported: png, raw"
    )


def decode_image(
    data: bytes, w: int, h: int, fmt: str, out: np.ndarray = None
) -> np.ndarray:
    if fmt == "png":
        return png_decode(data, out=out)
    if fmt == "raw":
        return raw_decode(data, w, h, out=out)
    raise NotImplementedError(
        f"fmt '{fmt}' not supported in this sandbox (no image libs); "
        f"supported: png, raw"
    )


# (h, w, out_h, out_w) -> (rb, cb, area) — boundary bookkeeping
# (arange/diff/append/outer) costs as much as the reduceat itself when
# recomputed per image; shapes repeat heavily within a batch, so memoize.
# Identical integer math, so outputs are bit-exact vs the uncached path.
_RESIZE_BOUNDS: dict = {}


def _resize_bounds(h: int, w: int, out_h: int, out_w: int):
    key = (h, w, out_h, out_w)
    hit = _RESIZE_BOUNDS.get(key)
    if hit is None:
        rb = (np.arange(out_h) * h) // out_h
        cb = (np.arange(out_w) * w) // out_w
        # upscaling duplicates cell boundaries; reduceat then yields the
        # single source pixel for the zero-width cell, so clamping the
        # count to 1 gives exact nearest-cell repetition (not inf/255)
        rcounts = np.maximum(np.diff(np.append(rb, h)), 1)
        ccounts = np.maximum(np.diff(np.append(cb, w)), 1)
        area = np.outer(
            rcounts.astype(np.float64), ccounts.astype(np.float64)
        )[:, :, None]
        # Row-stage accumulator: the (out_h, W, C) row-sum intermediate is
        # the dominant memory stream of a resize (W is still full width).
        # A row cell sums at most max(rcounts) uint8 values, so uint16 is
        # EXACT whenever 255 * max_rcount < 2^16 (any downscale ratio up
        # to 257x); int32 covers every ratio numpy can index. The column
        # stage then reduces into an explicit int64 (full-cell sums are
        # bounded by 255*h*w, and the output is tiny: out_h x out_w x C).
        # All sums stay exact integers, so the final float64 division is
        # bit-identical to the old float accumulator pyramid.
        acc = np.uint16 if int(rcounts.max()) * 255 < (1 << 16) else np.int32
        if len(_RESIZE_BOUNDS) >= 1024:
            _RESIZE_BOUNDS.clear()
        hit = _RESIZE_BOUNDS[key] = (rb, cb, area, acc)
    return hit


def resize_area(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Area-average resize of an (H, W, C) uint8 image to (out_h, out_w, C)
    — pure numpy (PIL unavailable), exact box-filter semantics via
    reduceat on integer cell boundaries. Downscale-oriented; upscaling
    repeats source pixels (nearest-cell)."""
    h, w, c = pixels.shape
    rb, cb, area, acc = _resize_bounds(h, w, out_h, out_w)
    # cast folded into the first reduction (no full-image float copy);
    # an area mean of uint8 is provably in [0, 255] so no clip needed
    sums = np.add.reduceat(
        np.add.reduceat(pixels, rb, axis=0, dtype=acc), cb, axis=1,
        dtype=np.int64,
    )
    return np.rint(sums / area).astype(np.uint8)  # f64 division (area is f64)


def area_cells_batch(stack: np.ndarray, out_w: int, out_h: int):
    """Exact integer per-channel cell sums for an area resize of a
    (N, H, W, C) uint8 stack: (cells (N, out_h, out_w, C) int64,
    area (out_h, out_w, 1) float64). The shared first stage of
    ``resize_area_batch``, exposed so the decode stage can reuse ONE
    reduction for its 8x8 PSNR thumb, the phash (same 8x8 boundary
    formula; fold the channel axis), and the brightness mean."""
    n, h, w, c = stack.shape
    rb, cb, area, acc = _resize_bounds(h, w, out_h, out_w)
    cells = np.add.reduceat(
        np.add.reduceat(stack, rb, axis=1, dtype=acc), cb, axis=2,
        dtype=np.int64,
    )
    return cells, area


def resize_area_batch(stack: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """(N, H, W, C) uint8 -> (N, out_h, out_w, C) uint8, bit-exact vs
    per-image ``resize_area`` (same reduceat segment order per image,
    same exact-integer accumulators)."""
    cells, area = area_cells_batch(stack, out_w, out_h)
    return np.rint(cells / area).astype(np.uint8)  # f64 division (area is f64)


def psnr_batch(a: np.ndarray, b: np.ndarray, peak: float = 255.0) -> np.ndarray:
    """Per-image PSNR over stacks of identical shape: (N, ...) vs
    (N, ...) -> (N,) float64, inf where images are identical. Bit-exact
    vs per-image ``psnr`` (mean over each image's contiguous block)."""
    if a.shape != b.shape:
        raise ValueError(f"shape mismatch {a.shape} vs {b.shape}")
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = np.mean(diff * diff, axis=tuple(range(1, a.ndim)))
    out = np.full(len(mse), np.inf)
    nz = mse > 0.0
    out[nz] = 10.0 * np.log10(peak * peak / mse[nz])
    return out


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 255.0) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images."""
    if a.shape != b.shape:
        raise ValueError(f"shape mismatch {a.shape} vs {b.shape}")
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(peak * peak / mse)
