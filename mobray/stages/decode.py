"""Image decode / verify / feature-extract actor-pool stages.

These are the engine's stateful stages (SURVEY.md §2.3): codec dispatch
tables and verification state are built once per actor in ``__init__``
and reused across batches; run with

    ds.map_batches(DecodeVerifyStage, batch_format="pyarrow",
                   concurrency=(2, N), num_cpus=1, batch_size=B)

``batch_size`` here must be set from a BYTE budget, not a row count —
the ``bytes`` column dominates block width (see
``decode_batch_size_for``).

Only the self-contained png/raw codecs exist in this sandbox (no
PIL/ffmpeg); other formats raise NotImplementedError at the codec layer,
and the Ray-side plumbing (schema, actor signature, output layout) is
identical for a real decoder dropped in behind ``decode_image``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from mobray.functions.arrowutils import binary_views
from mobray.functions.phash import (
    phash64,
    phash64_batch,
    phash64_from_cells,
    popcount64,
)
from mobray.sources.codec import (
    _resize_bounds,
    area_cells_batch,
    decode_image,
    encode_image,
    psnr,
    psnr_batch,
    resize_area,
    resize_area_batch,
)
from mobray.sources.imagegen import REF_THUMB_SIZE

# the fused 8x8 cell reduction in DecodeVerifyStage doubles as the PSNR
# reference thumb; the generator's thumb grid must stay the phash grid
assert REF_THUMB_SIZE == 8, "fused decode gates assume 8x8 reference thumbs"


def decode_batch_size_for(mean_image_bytes: float, budget_bytes: int = 64 << 20) -> int:
    """Rows per decode batch from a byte budget (>=1)."""
    return max(1, int(budget_bytes / max(1.0, mean_image_bytes)))


class DecodeVerifyStage:
    """Decode pixels and verify the round-trip invariants.

    Appends:
      decode_ok:bool    decode succeeded
      phash_match:bool  recomputed phash == stored phash column
      psnr_db:float64   fidelity vs the generator's stored ``ref_thumb``
                        reference thumbnail (8x8 area-resize of the TRUE
                        pixels): inf for an exact lossless decode, finite
                        for a lossy codec or a corrupted-but-decodable
                        payload. NaN when the input table carries no
                        ``ref_thumb`` column — without an independent
                        reference there is no honest PSNR (a
                        self-comparison would be identically inf for any
                        codec), so the gate is explicitly not claimed.
      brightness:float64  mean pixel value (a cheap decoded feature)
    """

    def __init__(
        self,
        check_phash: bool = True,
        extract_thumb: bool = False,
        thumb_size: int = 32,
    ):
        self.check_phash = check_phash
        self.extract_thumb = extract_thumb
        self.thumb_size = thumb_size

    def __call__(self, batch: pa.Table) -> pa.Table:
        # memoryviews over the Arrow value buffer, not to_pylist(): no
        # per-image Python bytes copy of the whole payload batch
        blobs = binary_views(batch["bytes"])
        ws = batch["w"].to_numpy(zero_copy_only=False)
        hs = batch["h"].to_numpy(zero_copy_only=False)
        fmts = batch["fmt"].to_pylist()
        stored_ph = batch["phash"].to_numpy(zero_copy_only=False)
        refs = (
            binary_views(batch["ref_thumb"])
            if "ref_thumb" in batch.schema.names
            else None
        )

        n = len(blobs)
        ok = np.zeros(n, dtype=bool)
        ph_match = np.zeros(n, dtype=bool)
        psnrs = np.full(n, np.nan)
        bright = np.full(n, np.nan)
        thumb_ph = np.zeros(n, dtype=np.int64)

        def process(stack: np.ndarray, id_list: list) -> None:
            # One same-shape stack of decoded images: all kernels amortize
            # across the stack. The 8x8 per-channel cell sums are computed
            # ONCE and shared by three gates — phash uses the identical
            # boundary grid (fold the channel axis; integer addition
            # commutes, so cell sums are bit-identical to a standalone
            # phash64_batch), the PSNR thumb is rint(cells/area), and
            # brightness is the total cell sum over the pixel count
            # (exact while the 8x8 boxes PARTITION the image, i.e.
            # h, w >= 8 — smaller images fall back to np.mean).
            idx = np.asarray(id_list, dtype=np.intp)
            n_s, h, w = stack.shape[0], stack.shape[1], stack.shape[2]
            # When the thumbnail grid is a multiple of 8 and the image is
            # at least thumb-sized, the 8x8 boundaries NEST inside the
            # thumb grid ((i*h)//8 == (r*i*h)//(8r)), so the 8x8 cells
            # fold exactly out of the thumb cells — the whole stack is
            # then read ONCE for all four gates instead of twice.
            tsz = self.thumb_size
            fuse_thumb = (
                self.extract_thumb and tsz % 8 == 0 and h >= tsz and w >= tsz
            )
            if fuse_thumb:
                cellsT, areaT = area_cells_batch(stack, tsz, tsz)
                r = tsz // 8
                cells8 = (
                    cellsT.reshape(n_s, 8, r, tsz, -1)
                    .sum(axis=2)
                    .reshape(n_s, 8, 8, r, -1)
                    .sum(axis=3)
                )
                area8 = _resize_bounds(h, w, 8, 8)[2]
            else:
                cells8, area8 = area_cells_batch(stack, 8, 8)
            if h >= 8 and w >= 8:
                bright[idx] = cells8.sum(axis=(1, 2, 3)) / float(h * w * 3)
            else:
                bright[idx] = np.mean(stack, axis=(1, 2, 3), dtype=np.float64)
            if refs is not None:
                has_ref = np.fromiter(
                    (refs[i] is not None for i in idx), dtype=bool
                )
                if has_ref.any():
                    ridx = idx[has_ref]
                    ref = np.stack(
                        [
                            np.frombuffer(refs[i], dtype=np.uint8).reshape(
                                REF_THUMB_SIZE, REF_THUMB_SIZE, 3
                            )
                            for i in ridx
                        ]
                    )
                    got = np.rint(cells8 / area8).astype(np.uint8)
                    if not has_ref.all():
                        got = got[has_ref]
                    psnrs[ridx] = psnr_batch(got, ref)
            if self.check_phash:
                ph = phash64_from_cells(cells8.sum(axis=3), area8[:, :, 0])
                ph_match[idx] = ph == stored_ph[idx].astype(np.int64)
            if self.extract_thumb:
                if fuse_thumb:
                    thumbs = np.rint(cellsT / areaT).astype(np.uint8)
                else:
                    thumbs = resize_area_batch(stack, tsz, tsz)
                thumb_ph[idx] = phash64_batch(thumbs)

        # decode is per-image (png framing) but lands DIRECTLY in a
        # preallocated same-shape chunk buffer (decode_image(out=...)):
        # pixels are written once, not copied out of the decoder and
        # again into an np.stack. Chunks are processed AS SOON AS they
        # fill so decoded pixels are released incrementally — peak
        # per-actor memory is ~one chunk per distinct shape, not the
        # whole batch's pixels. The shape comes from the metadata
        # columns; a decodable payload whose true dimensions disagree
        # with its row's (w, h) is rejected as corrupt (gate semantics).
        decoded: dict = {}  # (h, w) -> [chunk_buffer, row_id_list]
        for i in range(n):
            h_i, w_i = int(hs[i]), int(ws[i])
            ent = decoded.get((h_i, w_i))
            if ent is None:
                chunk = max(1, (64 << 20) // (h_i * w_i * 3 * 8))
                ent = decoded[(h_i, w_i)] = [
                    np.empty((chunk, h_i, w_i, 3), dtype=np.uint8),
                    [],
                ]
            buf, ids = ent
            try:
                decode_image(blobs[i], w_i, h_i, fmts[i], out=buf[len(ids)])
            except Exception:
                continue
            ok[i] = True
            ids.append(i)
            if len(ids) == len(buf):
                process(buf, ids)
                ids.clear()
        for buf, ids in decoded.values():
            if ids:
                process(buf[: len(ids)], ids)

        batch = batch.append_column("decode_ok", pa.array(ok))
        batch = batch.append_column("phash_match", pa.array(ph_match))
        batch = batch.append_column("psnr_db", pa.array(psnrs, pa.float64()))
        batch = batch.append_column("brightness", pa.array(bright, pa.float64()))
        if self.extract_thumb:
            batch = batch.append_column("thumb_phash", pa.array(thumb_ph, pa.int64()))
        return batch


class ImageResizeStage:
    """Actor-pool resize: decode -> area-resize to (out_w, out_h) ->
    re-encode. Output columns replace bytes/w/h; phash recomputed on the
    resized pixels. Batch size must come from a byte budget
    (``decode_batch_size_for``)."""

    def __init__(self, out_w: int = 32, out_h: int = 32, out_fmt: str = "png"):
        self.out_w = out_w
        self.out_h = out_h
        self.out_fmt = out_fmt
        self._resize = resize_area

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = binary_views(batch["bytes"])
        ws = batch["w"].to_numpy(zero_copy_only=False)
        hs = batch["h"].to_numpy(zero_copy_only=False)
        fmts = batch["fmt"].to_pylist()
        out_blobs, out_ph = [], []
        for i in range(len(blobs)):
            px = decode_image(blobs[i], int(ws[i]), int(hs[i]), fmts[i])
            rs = self._resize(px, self.out_w, self.out_h)
            out_blobs.append(encode_image(rs, self.out_fmt))
            out_ph.append(phash64(rs))
        n = len(blobs)
        batch = batch.drop_columns(["bytes", "w", "h", "fmt", "phash"])
        batch = batch.append_column("bytes", pa.array(out_blobs, pa.binary()))
        batch = batch.append_column("w", pa.array([self.out_w] * n, pa.int32()))
        batch = batch.append_column("h", pa.array([self.out_h] * n, pa.int32()))
        batch = batch.append_column("fmt", pa.array([self.out_fmt] * n, pa.string()))
        batch = batch.append_column("phash", pa.array(out_ph, pa.int64()))
        return batch


class VideoFrameSampleStage:
    """Actor-pool video frame sampling — STUB: no video codecs exist in
    this sandbox, so ``__call__`` raises NotImplementedError at the codec
    boundary. The Ray-side plumbing (actor signature, per-actor decoder
    state slot, output schema: one row per sampled frame with
    frame_index/frame_bytes columns) is real and unit-tested so a
    pyav/ffmpeg decoder can drop in unchanged."""

    OUTPUT_SCHEMA = pa.schema(
        [
            ("video_id", pa.string()),
            ("frame_index", pa.int32()),
            ("frame_bytes", pa.binary()),
            ("frame_w", pa.int32()),
            ("frame_h", pa.int32()),
        ]
    )

    def __init__(self, every_n_frames: int = 30):
        self.every_n_frames = every_n_frames
        self._decoder = None  # real impl: open codec context once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        raise NotImplementedError(
            "video decoding requires pyav/ffmpeg, unavailable in this sandbox; "
            "plug a decoder into VideoFrameSampleStage._decoder"
        )


class AudioFeatureStage:
    """Actor-pool audio feature extraction — STUB (no audio libs).
    Output schema: (audio_id, duration_s, rms, n_samples)."""

    OUTPUT_SCHEMA = pa.schema(
        [
            ("audio_id", pa.string()),
            ("duration_s", pa.float64()),
            ("rms", pa.float64()),
            ("n_samples", pa.int64()),
        ]
    )

    def __init__(self, sample_rate: int = 16000):
        self.sample_rate = sample_rate

    def __call__(self, batch: pa.Table) -> pa.Table:
        raise NotImplementedError(
            "audio decoding requires soundfile/librosa, unavailable in this "
            "sandbox; plug a decoder into AudioFeatureStage"
        )


def image_feature_stage(batch: pa.Table) -> pa.Table:
    """Lightweight metadata-only feature projection (NO pixel decode, so
    the ``bytes`` column must already be pruned from the input). A plain
    function -> stateless Ray tasks: there is no per-actor state to
    amortize, and stateless tasks never reserve CPUs away from the read
    stage.

    Appends: pop (popcount of phash, 0..64), aspect (w/h), pixels (w*h),
    phash_lo (phash & 0xFF) — the binning features the north star keys on
    (phash-derived + dimension features w, h)."""
    ph = batch["phash"].to_numpy(zero_copy_only=False)
    w = batch["w"].to_numpy(zero_copy_only=False).astype(np.float64)
    h = batch["h"].to_numpy(zero_copy_only=False).astype(np.float64)
    batch = batch.append_column(
        "pop", pa.array(popcount64(ph).astype(np.int32), pa.int32())
    )
    batch = batch.append_column("aspect", pa.array(w / h, pa.float64()))
    batch = batch.append_column("pixels", pa.array((w * h).astype(np.int64)))
    batch = batch.append_column(
        "phash_lo",
        pa.array((ph.astype(np.int64) & 0xFF).astype(np.int32), pa.int32()),
    )
    if "caption" in batch.schema.names:
        import pyarrow.compute as pc

        n_space = pc.count_substring(batch["caption"], " ")
        batch = batch.append_column(
            "caption_tokens", pc.cast(pc.add(n_space, 1), pa.int32())
        )
    return batch
