"""The flagship pipeline: monotonic binning inside a point-in-time +
windowed feature job over the image+caption table (the north star).

Two exchange topologies, selected by ``full_job(exchange=...)``:

COPARTITIONED (default on the entity-aligned shard layout — ZERO
exchange): the metadata-only fit pass runs CONCURRENTLY (ModelHolder
rendezvous) while each (image shard, attrs shard) pair executes as one
self-contained task — chunked byte-budgeted decode/verify with fused
gates, feature + model scoring, local merge_asof, window features,
checkpointed write. Resume skips finished shards before reading a byte.

SHUFFLE (any layout):

  pass 1 (metadata only, bytes column never read):
    read -> image_feature_stage -> fit_dataset(pop, label)   tiny shuffle
    (overlapped with pass 2 by default — the model binds on first use)
  pass 2 (the payload pass — ONE execution, ONE read of bytes):
    read all columns
      -> DecodeVerifyStage actor pool    decode, PSNR/phash gates,
                                         thumbnail phash extraction
      -> drop bytes                      payloads never enter a shuffle
      -> feature + transform stages      broadcast model, vectorized
      -> as-of join attrs + FUSED        the single all-to-all exchange;
         lag/lead/backfill/sessionize    windows + the checkpointed
         + partition write (post_fn)     write run inside the same
                                         per-bucket pass

Outputs are BIT-identical across both topologies (tested); only the
partition layout differs (entity-range shards vs hash buckets). The
per-partition manifests carry rows/bytes/hash AND the decode gate
counts (lineage doubles as the verification record).

``decode_verification_report`` remains available as a standalone
verification-only pass (used by tests and ad-hoc audits).
"""

from __future__ import annotations

from typing import Optional

import pandas as pd

import pyarrow as pa

from mobray.core.constraints import BinningConstraints
from mobray.pipelines.fit import fit_dataset, multi_transform_dataset
from mobray.pipelines.temporal import asof_join, asof_join_prepadded, make_pad_left_fn
from mobray.sources.imagegen import mean_row_bytes, read_attrs_table, read_image_table
from mobray.stages.binning import make_multi_transform_stage
from mobray.stages.decode import (
    DecodeVerifyStage,
    decode_batch_size_for,
    image_feature_stage,
)

META_COLS = ["image_id", "w", "h", "fmt", "phash", "event_ts", "label"]

# column layout of the fused payload stage's output (pre-padding), in
# append order: source (minus bytes) + verify + features + scores
PAYLOAD_LEFT_NAMES = [
    "image_id", "w", "h", "fmt", "caption", "phash", "event_ts", "label",
    "decode_ok", "phash_match", "psnr_db", "brightness", "thumb_phash",
    "pop", "aspect", "pixels", "phash_lo", "caption_tokens",
    "pop_woe", "pop_bin",
]
PAYLOAD_LEFT_TYPES = {
    "image_id": pa.string(), "w": pa.int32(), "h": pa.int32(),
    "fmt": pa.string(), "caption": pa.string(), "phash": pa.int64(),
    "event_ts": pa.timestamp("us"), "label": pa.float64(),
    "decode_ok": pa.bool_(), "phash_match": pa.bool_(),
    "psnr_db": pa.float64(), "brightness": pa.float64(),
    "thumb_phash": pa.int64(), "pop": pa.int32(), "aspect": pa.float64(),
    "pixels": pa.int64(), "phash_lo": pa.int32(),
    "caption_tokens": pa.int32(),
    "pop_woe": pa.float64(), "pop_bin": pa.string(),
}


class ModelHolder:
    """Tiny rendezvous actor for the OVERLAPPED fit: the driver thread
    that runs the metadata fit publishes the finished BinningModel here;
    payload actors poll it the first time they need to score. ``get``
    returns None while the fit is still running (the actor's single
    thread must never block, or ``set`` could not run)."""

    def __init__(self):
        self._model = None
        self._error = None

    def set(self, model) -> None:
        self._model = model

    def set_error(self, msg: str) -> None:
        self._error = msg

    def get(self):
        if self._error is not None:
            raise RuntimeError(f"overlapped fit failed: {self._error}")
        return self._model


def _overlapped_fit(feats_meta, cons):
    """Start the metadata fit in a driver thread, publishing the model
    through a ModelHolder rendezvous actor. Returns (holder, join):
    ``join()`` blocks until the fit finishes and returns the model,
    re-raising any fit error on the driver (the error also reaches the
    payload actors through the holder so their model poll cannot hang)."""
    import threading

    import ray

    holder = ray.remote(num_cpus=0)(ModelHolder).options(max_restarts=0).remote()
    box: dict = {}

    def _run():
        try:
            m = fit_dataset(feats_meta, "pop", "label", constraints=cons)
            box["model"] = m
            ray.get(holder.set.remote(m))
        except Exception as exc:  # surface in BOTH threads
            box["error"] = exc
            try:
                ray.get(holder.set_error.remote(repr(exc)))
            except Exception:
                pass

    thread = threading.Thread(target=_run, name="mobray-fit")
    thread.start()

    def join():
        thread.join()
        if "error" in box:
            raise box["error"]
        return box["model"]

    return holder, join


class _ModelBound:
    """Mixin: lazy model binding against the ModelHolder rendezvous —
    shared by the exchange-path PayloadStage and the shuffle-free
    CoPartitionedShardStage. ``self.score`` is None until the first call
    that needs it; by then the overlapped fit has normally finished, so
    the poll is a single remote get."""

    def _bind(self, model) -> None:
        self.score = make_multi_transform_stage(
            model, "pop", {"pop_woe": "woe", "pop_bin": "interval"}
        )

    # fit-poll deadline: if the fit thread dies AND its set_error
    # delivery itself fails, an unbounded poll would hang the payload
    # actors forever while the driver blocks on metrics collection — a
    # silent deadlock. The metadata fit is seconds; minutes of silence
    # means it is never coming.
    MODEL_WAIT_S = 300.0

    def _ensure_model(self) -> None:
        if self.score is not None:
            return
        import time as _time

        import ray as _ray

        deadline = _time.monotonic() + self.MODEL_WAIT_S
        while True:
            model = _ray.get(self._holder.get.remote())
            if model is not None:
                self._bind(model)
                return
            if _time.monotonic() > deadline:
                raise TimeoutError(
                    f"overlapped fit produced no model within "
                    f"{self.MODEL_WAIT_S:.0f}s — the fit thread likely "
                    f"died without reaching the ModelHolder; rerun with "
                    f"overlap_fit=False to fit serially"
                )
            _time.sleep(0.05)


class PayloadStage(_ModelBound):
    """THE per-row actor stage of the payload pass: decode/verify +
    thumbnail extraction + metadata features + model scoring + as-of
    left-side padding, all inside one actor ``__call__``. Fusing the
    whole per-row chain into the pool keeps parallelism at the actor
    count (Ray otherwise re-bundles the small decoded blocks into a
    handful of downstream tasks, capping the cluster at ~a dozen
    workers) and ships exactly one output block per input block
    straight into the exchange.

    ``model`` may be None with a ``model_holder`` actor handle instead:
    the metadata fit then runs CONCURRENTLY with the payload read +
    decode (see ``image_feature_pipeline(overlap_fit=...)``) and the
    stage binds the model on first use — by which point the fit has
    normally long finished, so the poll is a single remote get."""

    def __init__(self, model, num_buckets: int, model_holder=None):
        self.decode = DecodeVerifyStage(extract_thumb=True)
        self._holder = model_holder
        self.score = None
        if model is not None:
            self._bind(model)
        self.pad = make_pad_left_fn(
            PAYLOAD_LEFT_NAMES, "image_id", {"attr": pa.float64()},
            ["attr"], ["attr"], num_buckets,
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = self.decode(batch)
        # payloads (and the per-row reference thumbs, already consumed by
        # the PSNR gate) never enter the shuffle
        drop = ["bytes"] + (["ref_thumb"] if "ref_thumb" in batch.schema.names else [])
        batch = batch.drop_columns(drop)
        batch = image_feature_stage(batch)
        self._ensure_model()
        batch = self.score(batch)
        return self.pad(batch)


def make_window_post_fn(key: str = "image_id", ts: str = "event_ts",
                        session_gap: str = "30min",
                        out_dir=None, num_buckets: int = 32):
    """Per-bucket window features fused into the as-of join pass:
    lag/lead of the joined attr, backfill, session ids. If ``out_dir`` is
    set, the partition is ALSO written (checkpointed, idempotent) inside
    the same pass and only its metrics row is returned — the whole job
    then has exactly one all-to-all exchange after the fit."""
    gap = pd.Timedelta(session_gap)

    def _windows(merged: pd.DataFrame) -> pd.DataFrame:
        g = merged.sort_values([key, ts], kind="stable")
        grouped = g.groupby(key, sort=False)
        g["attr_lag1"] = grouped["attr"].shift(1)
        g["attr_lead1"] = grouped["attr"].shift(-1)
        g["attr_filled"] = grouped["attr"].ffill()
        prev = grouped[ts].shift(1)
        new_session = prev.isna() | ((g[ts] - prev) > gap)
        g["__new"] = new_session.astype("int64")
        g["session_seq"] = g.groupby(key, sort=False)["__new"].cumsum()
        return g.drop(columns="__new")

    if out_dir is None:
        return _windows

    import numpy as np

    from mobray.pipelines.temporal import _hash_bucket
    from mobray.state.checkpoint import write_partition

    def _windows_and_write(merged: pd.DataFrame) -> pd.DataFrame:
        g = _windows(merged)
        if len(g) == 0:
            return pd.DataFrame(
                {"pid": pd.Series(dtype="int64"), "rows": pd.Series(dtype="int64"),
                 "bytes": pd.Series(dtype="int64"), "wall_s": pd.Series(dtype="float64"),
                 "skipped": pd.Series(dtype="bool"),
                 "content_hash": pd.Series(dtype="object")}
            )
        pid = int(_hash_bucket(np.array([g[key].iloc[0]], dtype=object), num_buckets)[0])
        rec = write_partition(g, out_dir, pid)
        # per-partition verification gates into the lineage record
        for col, name in (
            ("decode_ok", "n_decode_ok"),
            ("phash_match", "n_phash_match"),
            ("psnr_db", "n_psnr_ge_40"),
        ):
            if col in g.columns:
                if col == "psnr_db":
                    rec[name] = int((g[col] >= 40.0).sum())
                else:
                    rec[name] = int(g[col].sum())
        return pd.DataFrame([rec])

    return _windows_and_write


class CoPartitionedShardStage(_ModelBound):
    """Shuffle-free flagship job over CO-PARTITIONED storage.

    PARTITIONING ASSUMPTION (validated per shard at runtime): image shard
    i and attrs shard i cover the SAME entity set — the generator writes
    both sides on identical entity ranges (sources/imagegen.py), which is
    the layout a production 100 TB feature store maintains precisely so
    point-in-time joins never pay an all-to-all. Each task then runs the
    ENTIRE per-shard job locally: chunked decode/verify (byte-budgeted),
    feature + model scoring, pd.merge_asof against its attrs shard,
    window features, checkpointed write — one metrics row out, zero rows
    exchanged. A violated assumption raises with guidance to the
    exchange-based path (``full_job(exchange='shuffle')``). The check is
    deliberately STRICT here — an attrs entity absent from the image
    shard means a truncated/misaligned shard in this generator-aligned
    layout, never a benign right-only key; feeds with legitimate
    right-only entities must pre-filter them (or see
    ``asof_join_copartitioned(left_keys=...)`` for the exact variant).

    Resume: a shard whose partition manifest is already consistent is
    skipped BEFORE any byte of it is read — the exchange path can only
    skip the final write.
    """

    def __init__(
        self,
        model,
        out_dir: str,
        session_gap: str = "30min",
        model_holder=None,
        decoded_budget_bytes: int = 64 << 20,
        expansion: float = 4.0,
    ):
        self.decode = DecodeVerifyStage(extract_thumb=True)
        self._holder = model_holder
        self.score = None
        if model is not None:
            self._bind(model)
        self.out_dir = out_dir
        self.windows = make_window_post_fn(session_gap=session_gap)
        self.budget = decoded_budget_bytes
        self.expansion = expansion

    def _one_shard(self, img_path: str, attr_path: str, pid: int) -> dict:
        import pyarrow.parquet as pq

        from mobray.state.checkpoint import partition_done, write_partition

        done = partition_done(self.out_dir, pid)
        if done is not None:
            return {
                "pid": pid, "rows": done["rows"], "bytes": done["bytes"],
                "wall_s": 0.0, "skipped": True,
                "content_hash": done["content_hash"],
                "n_decode_ok": None, "n_phash_match": None,
                "n_psnr_ge_40": None,
            }
        # STREAM the shard: per-task memory must be bound by the decode
        # budget, not the shard size (a whole-shard read_table held the
        # full bytes column before chunking — fine at ~70 MB shards, an
        # unchecked contract at 100x). Row width comes from the footer
        # (uncompressed row-group bytes / rows), so no payload byte is
        # read before the budget-sized chunking is in place.
        pf = pq.ParquetFile(img_path)
        md = pf.metadata
        raw_bytes = sum(
            md.row_group(i).total_byte_size for i in range(md.num_row_groups)
        )
        mean_bytes = max(1.0, raw_bytes / max(1, md.num_rows))
        chunk = max(64, int(self.budget / (mean_bytes * self.expansion)))
        parts = []
        for rb in pf.iter_batches(batch_size=chunk):
            c = self.decode(pa.Table.from_batches([rb]))
            drop = ["bytes"] + (
                ["ref_thumb"] if "ref_thumb" in c.schema.names else []
            )
            c = image_feature_stage(c.drop_columns(drop))
            self._ensure_model()
            parts.append(self.score(c))
        feats = pa.concat_tables(parts).to_pandas()
        attrs = pq.read_table(attr_path).to_pandas()
        missing = set(attrs["image_id"].unique()) - set(feats["image_id"].unique())
        if missing:
            raise ValueError(
                f"co-partitioning violated for shard {pid}: {len(missing)} "
                f"attr entities absent from the image shard (e.g. "
                f"{sorted(missing)[:3]}). The shuffle-free path requires "
                f"entity-aligned shards; run full_job(exchange='shuffle')."
            )
        lf = feats.sort_values("event_ts", kind="stable")
        rf = attrs.sort_values("event_ts", kind="stable")
        merged = pd.merge_asof(
            lf, rf, on="event_ts", by="image_id", direction="backward"
        )
        g = self.windows(merged)
        rec = write_partition(g, self.out_dir, pid)
        rec["n_decode_ok"] = int(g["decode_ok"].sum())
        rec["n_phash_match"] = int(g["phash_match"].sum())
        rec["n_psnr_ge_40"] = int((g["psnr_db"] >= 40.0).sum())
        return rec

    def __call__(self, batch: pa.Table) -> pa.Table:
        recs = [
            self._one_shard(r["img_path"], r["attr_path"], int(r["pid"]))
            for r in batch.to_pylist()
        ]
        return pa.table(
            {
                "pid": pa.array([r["pid"] for r in recs], pa.int64()),
                "rows": pa.array([r["rows"] for r in recs], pa.int64()),
                "bytes": pa.array([r["bytes"] for r in recs], pa.int64()),
                "wall_s": pa.array([r["wall_s"] for r in recs], pa.float64()),
                "skipped": pa.array([r["skipped"] for r in recs], pa.bool_()),
                "content_hash": pa.array(
                    [r["content_hash"] for r in recs], pa.string()
                ),
                "n_decode_ok": pa.array(
                    [r["n_decode_ok"] for r in recs], pa.int64()
                ),
                "n_phash_match": pa.array(
                    [r["n_phash_match"] for r in recs], pa.int64()
                ),
                "n_psnr_ge_40": pa.array(
                    [r["n_psnr_ge_40"] for r in recs], pa.int64()
                ),
            }
        )


def copartitioned_layout(data_dir: str, shard_limit: Optional[int] = None):
    """The (img, attr, pid) shard triples iff the directory has the
    entity-aligned layout (equal counts of images/ and attrs/ shards),
    else None. Entity-set equality is validated per shard at run time."""
    import glob
    import os

    imgs = sorted(glob.glob(os.path.join(data_dir, "images", "*.parquet")))
    attrs = sorted(glob.glob(os.path.join(data_dir, "attrs", "*.parquet")))
    if not imgs or len(imgs) != len(attrs):
        return None
    if shard_limit is not None:
        imgs, attrs = imgs[:shard_limit], attrs[:shard_limit]
    return [
        {"img_path": i, "attr_path": a, "pid": p}
        for p, (i, a) in enumerate(zip(imgs, attrs))
    ]


def payload_batch_size(
    data_dir: str,
    *,
    decoded_budget_bytes: int = 64 << 20,
    expansion: float = 4.0,
    lo: int = 64,
    hi: int = 2048,
) -> int:
    """Rows per payload-actor batch from a DECODED-byte budget: mean
    on-disk row bytes (parquet footer metadata only) x a codec expansion
    factor. A fixed row count produces uneven actor memory when image
    sizes vary; this adapts the row count to the actual payload width."""
    mean = mean_row_bytes(data_dir)
    if mean <= 0:
        return 256
    rows = decode_batch_size_for(mean * expansion, decoded_budget_bytes)
    return max(lo, min(hi, rows))


def image_feature_pipeline(
    data_dir: str,
    *,
    constraints: Optional[BinningConstraints] = None,
    num_buckets: int = 32,
    out_dir: Optional[str] = None,
    session_gap: str = "30min",
    verify_decode: bool = False,
    decode_concurrency: int = 4,
    shard_limit: Optional[int] = None,
    overlap_fit: bool = False,
):
    """Run the full feature job over a generated image table directory.

    Returns (features, model): ``features`` is the lazy Dataset of
    entity x timestamp feature rows unless ``out_dir`` is given, in which
    case it is the metrics DataFrame of the resumable write.

    ``verify_decode=True`` fuses the decode/verify actor pool INTO the
    feature pipeline: the bytes column is read once, every image is
    decoded and gated (PSNR/phash) on the pool, bytes are dropped before
    any exchange, and the per-partition manifests carry the gate counts.
    One execution, one read of the payload, zero bytes in the shuffle.

    ``overlap_fit=True`` (verify_decode + out_dir path): run the
    metadata fit pass in a driver thread CONCURRENTLY with the payload
    pass — the payload actors need the model only after their first
    decode, by which point the (much shorter) fit has finished. On a
    saturated small cluster the overlap is free; on a large one it
    removes the fit from the critical path entirely (it is the dominant
    serial term once decode is fast). The produced model and features
    are identical either way.
    """
    meta = read_image_table(data_dir, columns=META_COLS, shard_limit=shard_limit)
    feats_meta = meta.map_batches(image_feature_stage, batch_format="pyarrow")
    cons = constraints or BinningConstraints(max_bins=6, min_bins=2)

    join_fit = None
    if verify_decode and overlap_fit:
        holder, join_fit = _overlapped_fit(feats_meta, cons)
        model = None
    else:
        model = fit_dataset(feats_meta, "pop", "label", constraints=cons)
        holder = None

    attrs = read_attrs_table(data_dir, shard_limit=shard_limit)
    post = make_window_post_fn(
        session_gap=session_gap, out_dir=out_dir, num_buckets=num_buckets
    )

    if verify_decode:
        src_ds = read_image_table(data_dir, shard_limit=shard_limit)  # includes bytes
        left_padded = src_ds.map_batches(
            PayloadStage,
            fn_constructor_kwargs={
                "model": model,
                "num_buckets": num_buckets,
                "model_holder": holder if model is None else None,
            },
            batch_format="pyarrow",
            batch_size=payload_batch_size(data_dir),
            concurrency=decode_concurrency,
            num_cpus=1,
        )
        features = asof_join_prepadded(
            left_padded,
            attrs,
            key="image_id",
            ts="event_ts",
            left_names=PAYLOAD_LEFT_NAMES,
            rcols=["attr"],
            out_rcols=["attr"],
            left_types=PAYLOAD_LEFT_TYPES,
            num_buckets=num_buckets,
            post_fn=post,
        )
    else:
        scored = multi_transform_dataset(
            feats_meta, model, "pop", {"pop_woe": "woe", "pop_bin": "interval"}
        )
        features = asof_join(
            scored,
            attrs,
            key="image_id",
            ts="event_ts",
            right_cols=["attr"],
            num_buckets=num_buckets,
            post_fn=post,
        )

    if out_dir is not None:
        metrics = (
            features.to_pandas().sort_values("pid").reset_index(drop=True)
        )
        if join_fit is not None:
            model = join_fit()
        return metrics, model
    if join_fit is not None:
        # lazy return: the caller executes later, so there is nothing to
        # overlap with — just finish the fit before handing back
        model = join_fit()
    return features, model


def full_job(
    data_dir: str,
    out_dir: str,
    *,
    num_buckets: int = 64,
    decode_concurrency: int = 8,
    constraints: Optional[BinningConstraints] = None,
    shard_limit: Optional[int] = None,
    overlap_fit: bool = True,
    exchange: str = "auto",
):
    """The complete north-star job: decode/verify every image on an actor
    pool (PSNR/phash gates) AND produce the binned + as-of-joined +
    windowed feature rows with a checkpointed write.

    ``exchange`` selects the join topology:
      - 'copartitioned': shuffle-free — each (image, attrs) shard pair is
        one self-contained task (see CoPartitionedShardStage); requires
        the entity-aligned shard layout and validates it per shard.
      - 'shuffle': the general hash-bucketed as-of exchange; works for
        any layout.
      - 'auto' (default): copartitioned when the directory has the
        aligned layout, else shuffle.
    The metadata-only fit pass overlaps the payload pass either way
    (``overlap_fit``); the model, feature values, and gate counts are
    identical across exchanges — only the partition layout differs
    (entity-range partitions vs hash buckets).

    Returns (metrics_df, model, decode_report)."""
    shards = copartitioned_layout(data_dir, shard_limit)
    if exchange == "auto":
        exchange = "copartitioned" if shards is not None else "shuffle"
    if exchange == "copartitioned":
        if shards is None:
            raise ValueError(
                f"{data_dir} lacks the entity-aligned images/attrs shard "
                f"layout; use exchange='shuffle'"
            )
        metrics, model = _copartitioned_job(
            data_dir, shards, out_dir,
            constraints=constraints,
            decode_concurrency=decode_concurrency,
            overlap_fit=overlap_fit,
        )
    elif exchange == "shuffle":
        metrics, model = image_feature_pipeline(
            data_dir,
            constraints=constraints,
            num_buckets=num_buckets,
            out_dir=out_dir,
            verify_decode=True,
            decode_concurrency=decode_concurrency,
            shard_limit=shard_limit,
            overlap_fit=overlap_fit,
        )
    else:
        raise ValueError(f"unknown exchange {exchange!r}")
    fresh = metrics[~metrics["skipped"]]
    report = {
        "n": int(metrics["rows"].sum()),
        "n_ok": int(fresh.get("n_decode_ok", pd.Series(dtype=float)).sum()),
        "n_phash_match": int(fresh.get("n_phash_match", pd.Series(dtype=float)).sum()),
        "n_psnr_ge_40": int(fresh.get("n_psnr_ge_40", pd.Series(dtype=float)).sum()),
        "n_skipped_rows": int(metrics.loc[metrics["skipped"], "rows"].sum()),
    }
    return metrics, model, report


def _copartitioned_job(
    data_dir: str,
    shards: list,
    out_dir: str,
    *,
    constraints: Optional[BinningConstraints] = None,
    decode_concurrency: int = 8,
    session_gap: str = "30min",
    overlap_fit: bool = True,
):
    """Drive CoPartitionedShardStage over the shard triples; the fit
    pass overlaps shard processing via the ModelHolder rendezvous (shard
    tasks decode before they first need the model)."""
    import ray
    import ray.data

    cons = constraints or BinningConstraints(max_bins=6, min_bins=2)
    if overlap_fit:
        # an actor pool holding EVERY cpu starves the concurrent fit's
        # tasks and the shard actors then poll the ModelHolder forever —
        # always leave the fit at least one core
        try:
            avail = int(ray.cluster_resources().get("CPU", 0))
        except Exception:
            avail = 0
        if avail and decode_concurrency >= avail:
            decode_concurrency = max(1, avail - 1)
    n_shards = len(shards)
    meta = read_image_table(
        data_dir, columns=META_COLS, shard_limit=n_shards
    )
    feats_meta = meta.map_batches(image_feature_stage, batch_format="pyarrow")

    holder = None
    model = None
    join_fit = None
    if overlap_fit:
        holder, join_fit = _overlapped_fit(feats_meta, cons)
    else:
        model = fit_dataset(feats_meta, "pop", "label", constraints=cons)

    items = ray.data.from_items(shards).repartition(n_shards)
    metrics_ds = items.map_batches(
        CoPartitionedShardStage,
        fn_constructor_kwargs={
            "model": model,
            "out_dir": out_dir,
            "session_gap": session_gap,
            "model_holder": holder,
        },
        batch_format="pyarrow",
        batch_size=1,
        concurrency=decode_concurrency,
        num_cpus=1,
    )
    metrics = metrics_ds.to_pandas().sort_values("pid").reset_index(drop=True)
    if join_fit is not None:
        model = join_fit()
    return metrics, model


def decode_verification_report(
    data_dir: str, concurrency: int = 4, shard_limit: Optional[int] = None
) -> dict:
    """Decode every image on an actor pool and aggregate the verification
    gates: decode success, phash match, PSNR >= 40 dB, caption equality
    (captions survive the read round-trip byte-identically by
    construction; asserted per-row in tests)."""
    ds = read_image_table(data_dir, shard_limit=shard_limit)  # needs bytes: full read
    verified = ds.map_batches(
        DecodeVerifyStage,
        batch_format="pyarrow",
        batch_size=payload_batch_size(data_dir),
        concurrency=concurrency,
        num_cpus=1,
    )
    import pyarrow as pa

    def summarize(batch: pa.Table) -> pa.Table:
        import numpy as np

        ok = batch["decode_ok"].to_numpy(zero_copy_only=False)
        ph = batch["phash_match"].to_numpy(zero_copy_only=False)
        ps = batch["psnr_db"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n": [len(ok)],
                "n_ok": [int(ok.sum())],
                "n_phash_match": [int(ph.sum())],
                "n_psnr_ge_40": [int(np.sum(ps >= 40.0))],
            }
        )

    parts = verified.map_batches(summarize, batch_format="pyarrow").to_pandas()
    total = parts.sum()
    return {
        "n": int(total["n"]),
        "n_ok": int(total["n_ok"]),
        "n_phash_match": int(total["n_phash_match"]),
        "n_psnr_ge_40": int(total["n_psnr_ge_40"]),
    }
