"""Deterministic synthetic image+caption table (the north-rule input).

Schema per BASELINE.json ``input_hint``:
  (image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
   caption:string, phash:int64)
plus columns the temporal/fit pipelines need, documented in FIXTURES.md F1:
  event_ts:timestamp[us]  per-entity increasing with irregular gaps
  label:float64           Bernoulli(sigmoid-of-popcount(phash)) target, so
                          fitted bins have a known monotone direction

Every row is a pure function of (seed, entity, snapshot) — shard layout,
worker count and generation order cannot change the data, which is what
makes distributed generation + resume trivially correct.

Parquet stands in for Lance (pylance unavailable in this sandbox); the
file layout (one file per entity shard) mirrors Lance fragment layout.
"""

from __future__ import annotations

import hashlib
import os
from typing import List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from mobray.functions.phash import phash64, popcount64
from mobray.sources.codec import encode_image, resize_area

# ref_thumb: 8x8x3 uint8 area-resized REFERENCE pixels, stored by the
# generator as an independent fidelity target so the decode/verify stage
# can compute a real PSNR (a lossy or corrupted decode shows up as a
# finite/low psnr_db instead of a vacuous self-comparison).
REF_THUMB_SIZE = 8

IMAGE_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
        ("event_ts", pa.timestamp("us")),
        ("label", pa.float64()),
        ("ref_thumb", pa.binary()),
    ]
)

ATTRS_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("event_ts", pa.timestamp("us")),
        ("attr", pa.float64()),
    ]
)

# skewed discrete dimension sets (FIXTURES.md F1): one hot value ~50% to
# exercise skew handling in the grouped fit shuffle
_DIMS = np.array([32, 48, 64, 96, 128], dtype=np.int32)
_DIM_P = np.array([0.5, 0.2, 0.15, 0.1, 0.05])
_COLORS = ["red", "blue", "green", "amber", "violet", "teal", "gray", "coral"]
_SHAPES = ["square", "circle", "mountain", "river", "tower", "forest", "cat", "boat"]
_BASE_TS_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in microseconds
_SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min session threshold


def _entity_seed(seed: int, entity: int) -> int:
    h = hashlib.blake2b(f"{seed}:{entity}".encode(), digest_size=8).digest()
    return int.from_bytes(h, "little")


def gen_entity_rows(seed: int, entity: int, snapshots: int) -> dict:
    """All rows (snapshots) for one entity, as plain python/numpy columns."""
    rng = np.random.Generator(np.random.PCG64(_entity_seed(seed, entity)))
    image_id = f"img-{entity:09d}"
    w = int(rng.choice(_DIMS, p=_DIM_P))
    h = int(rng.choice(_DIMS, p=_DIM_P))
    caption = f"a {rng.choice(_COLORS)} {rng.choice(_SHAPES)} photo {entity:06d}"

    # base pixels for the entity; each snapshot perturbs a small patch so
    # phash is mostly stable but drifts over time
    base = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)

    # irregular per-entity timestamps: gaps 1-20 min, with ~15% of gaps
    # pushed past the 30-min session threshold
    start = _BASE_TS_US + int(rng.integers(0, 72 * 3600)) * 1_000_000
    gaps = rng.integers(60, 1200, size=snapshots) * 1_000_000
    long_mask = rng.random(snapshots) < 0.15
    gaps[long_mask] += _SESSION_GAP_US + 600 * 1_000_000
    ts = start + np.cumsum(gaps)

    ids, blobs, ws, hs, fmts, captions, phashes, labels = [], [], [], [], [], [], [], []
    thumbs = []
    for k in range(snapshots):
        px = base.copy()
        if k > 0:
            y0 = int(rng.integers(0, max(1, h - 4)))
            x0 = int(rng.integers(0, max(1, w - 4)))
            px[y0 : y0 + 4, x0 : x0 + 4] = rng.integers(0, 256, size=(
                min(4, h - y0), min(4, w - x0), 3), dtype=np.uint8)
        fmt = "png" if rng.random() < 0.7 else "raw"
        ph = phash64(px)
        pop = int(popcount64(np.array([ph]))[0])
        p = 1.0 / (1.0 + np.exp(-(pop - 32) / 6.0))
        label = float(rng.random() < p)
        ids.append(image_id)
        blobs.append(encode_image(px, fmt))
        ws.append(w)
        hs.append(h)
        fmts.append(fmt)
        captions.append(caption)
        phashes.append(ph)
        labels.append(label)
        thumbs.append(resize_area(px, REF_THUMB_SIZE, REF_THUMB_SIZE).tobytes())

    return {
        "image_id": ids,
        "bytes": blobs,
        "w": ws,
        "h": hs,
        "fmt": fmts,
        "caption": captions,
        "phash": phashes,
        "event_ts": ts.tolist(),
        "label": labels,
        "ref_thumb": thumbs,
    }


def gen_entities_table(seed: int, entities: List[int], snapshots: int) -> pa.Table:
    cols = {name: [] for name in IMAGE_SCHEMA.names}
    for e in entities:
        rows = gen_entity_rows(seed, e, snapshots)
        for name in IMAGE_SCHEMA.names:
            cols[name].extend(rows[name])
    arrays = [
        pa.array(cols["image_id"], pa.string()),
        pa.array(cols["bytes"], pa.binary()),
        pa.array(cols["w"], pa.int32()),
        pa.array(cols["h"], pa.int32()),
        pa.array(cols["fmt"], pa.string()),
        pa.array(cols["caption"], pa.string()),
        pa.array(cols["phash"], pa.int64()),
        pa.array(cols["event_ts"], pa.timestamp("us")),
        pa.array(cols["label"], pa.float64()),
        pa.array(cols["ref_thumb"], pa.binary()),
    ]
    return pa.Table.from_arrays(arrays, schema=IMAGE_SCHEMA)


def gen_attrs_table(seed: int, entities: List[int], snapshots: int) -> pa.Table:
    """Right side for as-of joins: per-entity attribute updates whose
    timestamps interleave with (and sometimes strictly follow) the image
    rows, so temporal-leakage assertions have teeth (FIXTURES.md F1)."""
    ids, tss, attrs = [], [], []
    for e in entities:
        rng = np.random.Generator(np.random.PCG64(_entity_seed(seed + 7919, e)))
        image_id = f"img-{e:09d}"
        n = snapshots + 2  # a couple of strictly-later rows
        start = _BASE_TS_US + int(rng.integers(0, 96 * 3600)) * 1_000_000
        ts = start + np.cumsum(rng.integers(60, 2400, size=n) * 1_000_000)
        vals = np.round(rng.normal(loc=float(e % 100), scale=5.0, size=n), 4)
        ids.extend([image_id] * n)
        tss.extend(ts.tolist())
        attrs.extend(vals.tolist())
    return pa.Table.from_arrays(
        [
            pa.array(ids, pa.string()),
            pa.array(tss, pa.timestamp("us")),
            pa.array(attrs, pa.float64()),
        ],
        schema=ATTRS_SCHEMA,
    )


def generate_image_table(
    out_dir: str,
    n_entities: int = 200,
    snapshots: int = 8,
    seed: int = 42,
    shards: Optional[int] = None,
    use_ray: bool = False,
    overwrite: bool = False,
) -> str:
    """Write ``{out_dir}/images/shard-NNNNN.parquet`` + ``{out_dir}/attrs/...``.

    Deterministic in (seed, n_entities, snapshots) regardless of shard
    count or parallelism. With ``use_ray=True`` shards are generated as
    Ray tasks (the generator is a pure function of the entity range, so
    this is embarrassingly parallel). Existing complete output is reused
    unless ``overwrite``.
    """
    img_dir = os.path.join(out_dir, "images")
    attr_dir = os.path.join(out_dir, "attrs")
    done_marker = os.path.join(out_dir, "_GEN_DONE")
    # v3: phash moved to the integer-pyramid construction (stored hash
    # values changed) -> stale v2 caches regenerate
    marker_text = f"v3:{seed}:{n_entities}:{snapshots}"
    if os.path.exists(done_marker) and not overwrite:
        with open(done_marker) as f:
            if f.read().strip() == marker_text:
                return out_dir
    # regenerating: clear any existing shards first — a layout change
    # (different shard count/schema) must not leave stale files behind
    # (a stale v1 shard next to v2 shards = duplicated rows + mixed
    # schemas, which silently corrupts every consumer)
    import shutil

    for d in (img_dir, attr_dir):
        shutil.rmtree(d, ignore_errors=True)
    if os.path.exists(done_marker):
        os.remove(done_marker)
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(attr_dir, exist_ok=True)

    if shards is None:
        shards = max(1, min(64, n_entities // 25))
    bounds = np.linspace(0, n_entities, shards + 1).astype(int)
    ranges = [
        (i, list(range(bounds[i], bounds[i + 1])))
        for i in range(shards)
        if bounds[i + 1] > bounds[i]
    ]

    def _write_shard(shard_id: int, entities: List[int]) -> None:
        # bytes are already-compressed PNG / incompressible raw pixels:
        # parquet page compression would only burn CPU on both ends
        pq.write_table(
            gen_entities_table(seed, entities, snapshots),
            os.path.join(img_dir, f"shard-{shard_id:05d}.parquet"),
            compression="NONE",
        )
        pq.write_table(
            gen_attrs_table(seed, entities, snapshots),
            os.path.join(attr_dir, f"shard-{shard_id:05d}.parquet"),
        )

    if use_ray:
        import ray

        @ray.remote(num_cpus=1)
        def _task(shard_id, entities):
            _write_shard(shard_id, entities)
            return shard_id

        ray.get([_task.remote(sid, ents) for sid, ents in ranges])
    else:
        for sid, ents in ranges:
            _write_shard(sid, ents)

    with open(done_marker, "w") as f:
        f.write(marker_text)
    return out_dir


def read_image_table(
    out_dir: str,
    columns: Optional[List[str]] = None,
    shard_limit: Optional[int] = None,
):
    """Ray Dataset over the generated image table, with column pruning.

    The ``bytes`` column dominates row width — every pipeline that does
    not decode pixels MUST pass ``columns=`` excluding it so blocks stay
    small and the fit shuffle never moves image payloads.

    When ``bytes`` is pruned, Ray's block-size estimate (derived from the
    on-disk file size, which IS mostly image bytes) over-splits each file
    into many tiny blocks and per-task overhead dominates; pin one block
    per shard file in that case (measured 10-20x on the metadata path).

    ``shard_limit``: read only the first N shard files (each shard is a
    contiguous entity range) — the scaling bench uses this to size one
    identical job to the measurement window without generating a second
    table.
    """
    import glob

    import ray.data

    img_dir = os.path.join(out_dir, "images")
    files = sorted(glob.glob(os.path.join(img_dir, "*.parquet")))
    if shard_limit is not None:
        files = files[:shard_limit]
    source = files if shard_limit is not None else img_dir
    kwargs = {}
    if columns is not None and "bytes" not in columns and files:
        kwargs["override_num_blocks"] = len(files)
    return ray.data.read_parquet(source, columns=columns, **kwargs)


def read_attrs_table(out_dir: str, shard_limit: Optional[int] = None):
    """Attrs shards are written per the SAME entity ranges as the image
    shards (one attrs shard per image shard, identical ids), so
    ``shard_limit`` prunes both sides of the as-of join consistently —
    the co-partitioning that lets a subset job read zero unrelated
    right-side rows."""
    import glob

    import ray.data

    attr_dir = os.path.join(out_dir, "attrs")
    if shard_limit is not None:
        files = sorted(glob.glob(os.path.join(attr_dir, "*.parquet")))[:shard_limit]
        return ray.data.read_parquet(files)
    return ray.data.read_parquet(attr_dir)


def mean_row_bytes(out_dir: str) -> float:
    """Mean on-disk bytes per row of the image shards, from parquet
    footer metadata only (no data read). Feeds the byte-budgeted decode
    batch size (``decode_batch_size_for``)."""
    import glob

    import pyarrow.parquet as pq

    files = glob.glob(os.path.join(out_dir, "images", "*.parquet"))
    if not files:
        return 0.0
    total_bytes = sum(os.path.getsize(f) for f in files)
    total_rows = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    return total_bytes / max(1, total_rows)
