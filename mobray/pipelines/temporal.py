"""Point-in-time / windowed temporal operators over Ray Datasets.

Absent from the reference (strictly batch, SURVEY.md §2.11); mandated by
the north rule. All operators share one partitioning contract:

  PARTITIONING ASSUMPTION: rows are hash-bucketed by the entity key, so
  every entity is wholly contained in exactly one bucket; within a
  bucket the operator sorts by (key, ts). Sessions / windows / as-of
  matches therefore never cross bucket boundaries by construction.
  Cost: ONE all-to-all shuffle (the bucket groupby) per operator chain —
  ``with_buckets`` can be called once and reused across chained
  operators to keep it to one shuffle total.

Skew: a hot entity cannot be split (correctness), but buckets hold many
entities; ``num_buckets`` should be a small multiple of total cores so
one hot bucket does not straggle the stage.

The per-bucket functions are vectorized pandas (groupby.shift / ffill /
cumsum / merge_asof) — one Python call per bucket, not per entity.
"""

from __future__ import annotations

from typing import Iterable, List, Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

from mobray.functions.arrowutils import table_from_pandas

_HASH_KEY = "0123456789123456"  # fixed pandas hash key -> stable across workers
BUCKET_COL = "__bucket"  # prefix; the actual column encodes the key


def bucket_col_for(key: str) -> str:
    """Bucket-column name with the partitioning key baked in, so a
    pre-bucketed dataset can never be silently reused by an operator
    keyed on a DIFFERENT column (that would split entities across
    buckets and corrupt per-entity results)."""
    return f"{BUCKET_COL}__{key}"


def is_bucket_col(name: str) -> bool:
    return name.startswith(BUCKET_COL)


def _hash_bucket(values: np.ndarray, num_buckets: int) -> np.ndarray:
    return (pd.util.hash_array(values, hash_key=_HASH_KEY) % num_buckets).astype(
        np.int32
    )


def _ts_us(batch: pa.Table, ts: str) -> np.ndarray:
    """Timestamp column -> int64 microseconds regardless of the source
    unit (timestamp[s|ms|us|ns] all appear in the wild; a raw int64 cast
    of ns input would make windows 1000x too small)."""
    import pyarrow.compute as pc

    col = batch[ts]
    if not pa.types.is_timestamp(col.type):
        raise TypeError(f"column {ts!r} is {col.type}, expected a timestamp")
    return pc.cast(pc.cast(col, pa.timestamp("us")), pa.int64()).to_numpy(
        zero_copy_only=False
    )


def _arrow_types(schema) -> dict:
    """ray.data.Schema -> {name: pa.DataType}. Pandas-backed datasets
    report numpy/python types (object for strings); normalize them."""
    out = {}
    for name, t in zip(schema.names, schema.types):
        if not isinstance(t, pa.DataType):
            if t is object or t is str:
                t = pa.string()
            else:
                t = pa.from_numpy_dtype(np.dtype(t))
        out[name] = t
    return out


def pad_column(n: int, t: "pa.DataType") -> "pa.Array":
    """Schema-alignment padding for the OTHER side of a padded union.

    Padded slots are never read by the per-bucket functions (each side is
    split off before use), but their NULLS are not free: an int64 column
    containing any null becomes float64 in the pandas bucket frame, and
    the float64 round-trip silently destroys integer values above 2^53 —
    a 64-bit hash column loses its low ~11 bits (caught by comparing the
    shuffle exchange against the shuffle-free co-partitioned job). Pad
    integers with 0 and booleans with False so the column's dtype
    survives the union bit-exactly; other types keep nulls (floats/NaN,
    timestamps/NaT, strings/None are lossless)."""
    if pa.types.is_integer(t):
        return pa.array(np.zeros(n, dtype=t.to_pandas_dtype()), t)
    if pa.types.is_boolean(t):
        return pa.array(np.zeros(n, dtype=bool))
    return pa.nulls(n, t)


def restore_pad_dtypes(df: pd.DataFrame, arrow_types: dict) -> pd.DataFrame:
    """Undo pandas' dtype widening caused by null-padding in a union.

    The padded-union exchange (as-of / hash / semi join) appends null
    rows to every left column, so int64 columns come out of the bucket
    frame as float64 and bool columns as object. After the per-bucket
    merge/filter drops the padding rows, cast columns that are non-null
    back to their original arrow-derived dtype so the join output schema
    equals the input schema."""
    for c, t in arrow_types.items():
        if c not in df.columns:
            continue
        if pa.types.is_integer(t) and df[c].dtype.kind == "f":
            if not df[c].isna().any():
                df[c] = df[c].astype(t.to_pandas_dtype())
        elif pa.types.is_boolean(t) and df[c].dtype == object:
            if not df[c].isna().any():
                df[c] = df[c].astype(bool)
    return df


DEFAULT_BUCKET_FLOOR = 64
TARGET_BUCKET_BYTES = 128 << 20  # ~128 MB of input per bucket


def auto_num_buckets(
    ds,
    floor: int = DEFAULT_BUCKET_FLOOR,
    target_bytes: int = TARGET_BUCKET_BYTES,
) -> int:
    """Bucket count sized from the INPUT bytes so per-bucket pandas
    frames stay ~target_bytes at any scale (a fixed bucket count makes
    bucket size grow linearly with input — at 100x data the map_groups
    frame would be 100x too big). Uses on-disk file sizes (metadata
    only, never triggers execution); in-memory datasets without lineage
    files fall back to ``floor``."""
    import math
    import os

    size = None
    try:
        files = ds.input_files()
        if files:
            paths = [f[len("local://"):] if f.startswith("local://") else f
                     for f in files]
            size = sum(os.path.getsize(p) for p in paths if os.path.exists(p))
    except Exception:
        size = None
    if not size:
        return floor
    return max(floor, math.ceil(size / target_bytes))


def _resolve_buckets(ds, num_buckets) -> int:
    return auto_num_buckets(ds) if num_buckets is None else num_buckets


def with_buckets(ds, key: str, num_buckets: int = 64):
    """Append a stable hash-bucket column for the entity key (named
    ``__bucket__{key}`` so reuse is key-safe)."""
    bc = bucket_col_for(key)

    def add_bucket(batch: pa.Table) -> pa.Table:
        vals = batch[key].to_numpy(zero_copy_only=False)
        return batch.append_column(
            bc, pa.array(_hash_bucket(vals, num_buckets), pa.int32())
        )

    return ds.map_batches(add_bucket, batch_format="pyarrow")


def _per_bucket(ds, key: str, num_buckets, fn):
    """bucket -> groupby -> vectorized pandas fn per bucket, dropping the
    bucket column on the way out. A pre-existing bucket column is reused
    ONLY when it was computed for the same key (name-encoded).
    ``num_buckets=None`` sizes the fan-out from the input bytes."""
    num_buckets = _resolve_buckets(ds, num_buckets)
    bc = bucket_col_for(key)
    bucketed = ds if bc in ds.schema().names else with_buckets(ds, key, num_buckets)

    def wrapped(g: pd.DataFrame):
        out = fn(g).drop(columns=[bc], errors="ignore")
        # emit Arrow, not pandas: Ray passes EMPTY blocks through
        # downstream map_batches without invoking the UDF, so a pandas
        # block from an empty bucket would survive into unions with
        # arrow datasets (block-type mismatch) and print schema-less
        # "new schema:" warnings
        return table_from_pandas(out)

    return bucketed.groupby(bc).map_groups(wrapped, batch_format="pandas")


def lag_lead(
    ds,
    key: str,
    ts: str,
    cols: Sequence[str],
    lags: Sequence[int] = (1,),
    leads: Sequence[int] = (),
    num_buckets: Optional[int] = None,
    tiebreak: Optional[str] = None,
):
    """Per-entity LAG/LEAD columns (``{col}_lag{k}`` / ``{col}_lead{k}``),
    ordered by ts within entity. SQL-equivalent:
    ``LAG(col, k) OVER (PARTITION BY key ORDER BY ts)``.

    Rows TIED on (key, ts) are ordered by arrival (stable sort) — which,
    like the SQL window above, is not reproducible after an unordered
    upstream (shuffle, unordered read). Pass ``tiebreak`` (a unique
    column, e.g. an event id) to pin tied rows deterministically."""

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            [key, ts] + ([tiebreak] if tiebreak else []), kind="stable"
        )
        grouped = g.groupby(key, sort=False)
        for col in cols:
            for k in lags:
                g[f"{col}_lag{k}"] = grouped[col].shift(k)
            for k in leads:
                g[f"{col}_lead{k}"] = grouped[col].shift(-k)
        return g

    return _per_bucket(ds, key, num_buckets, fn)


def backfill(
    ds,
    key: str,
    ts: str,
    cols: Sequence[str],
    num_buckets: Optional[int] = None,
    out_suffix: str = "_filled",
    tiebreak: Optional[str] = None,
):
    """Forward-fill nulls per entity using only values at earlier (or the
    same) timestamps — never a later value, so zero temporal leakage.
    SQL-equivalent: ``LAST_VALUE(col IGNORE NULLS) OVER (PARTITION BY key
    ORDER BY ts ROWS UNBOUNDED PRECEDING)``. ``tiebreak``: see
    ``lag_lead`` (pins rows tied on (key, ts) deterministically)."""

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            [key, ts] + ([tiebreak] if tiebreak else []), kind="stable"
        )
        grouped = g.groupby(key, sort=False)
        for col in cols:
            g[f"{col}{out_suffix}"] = grouped[col].ffill()
        return g

    return _per_bucket(ds, key, num_buckets, fn)


def sessionize(
    ds,
    key: str,
    ts: str,
    gap,
    num_buckets: Optional[int] = None,
    session_col: str = "session_seq",
):
    """Gap-based session ids per entity: a new session starts at the first
    row of an entity and whenever ``ts - prev_ts > gap``.

    ``gap`` is a pd.Timedelta (or anything comparable to the ts diff).
    Emits ``{session_col}`` (1-based per-entity session ordinal) and
    ``session_id`` (= "{key}#{seq}")."""

    gap = pd.Timedelta(gap) if not isinstance(gap, pd.Timedelta) else gap

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts], kind="stable")
        grouped = g.groupby(key, sort=False)
        prev = grouped[ts].shift(1)
        new_session = prev.isna() | ((g[ts] - prev) > gap)
        g["__new"] = new_session.astype(np.int64)
        g[session_col] = g.groupby(key, sort=False)["__new"].cumsum()
        g["session_id"] = g[key].astype(str) + "#" + g[session_col].astype(str)
        return g.drop(columns=["__new"])

    return _per_bucket(ds, key, num_buckets, fn)


def make_pad_left_fn(
    left_names: List[str],
    key: str,
    right_types: dict,
    rcols: List[str],
    out_rcols: List[str],
    num_buckets: int,
):
    """Arrow-batch function that tags/pads/buckets the LEFT side for the
    as-of exchange. Exposed so callers can fuse it into an upstream
    stage (e.g. inside a decode actor pool) instead of paying a separate
    map operator."""

    bc = bucket_col_for(key)

    def pad_left(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        batch = batch.append_column("__side", pa.array(np.zeros(n, dtype=np.int8)))
        for rc, oc in zip(rcols, out_rcols):
            batch = batch.append_column(oc, pad_column(n, right_types[rc]))
        kv = batch[key].to_numpy(zero_copy_only=False)
        return batch.append_column(
            bc, pa.array(_hash_bucket(kv, num_buckets), pa.int32())
        )

    return pad_left


def asof_join_prepadded(
    left_padded,
    right,
    *,
    key: str,
    ts: str,
    left_names: List[str],
    rcols: List[str],
    out_rcols: List[str],
    left_types: dict,
    direction: str = "backward",
    tolerance=None,
    allow_exact_matches: bool = True,
    num_buckets: Optional[int] = None,
    post_fn=None,
):
    """As-of join where the left side is ALREADY tagged/padded/bucketed
    (via make_pad_left_fn, possibly fused into an upstream actor stage).
    See asof_join for semantics."""

    num_buckets = _resolve_buckets(left_padded, num_buckets)
    bc = bucket_col_for(key)

    def pad_right(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = {key: batch[key], ts: batch[ts]}
        out = pa.table(cols)
        out = out.append_column("__side", pa.array(np.ones(n, dtype=np.int8)))
        for lc in left_names:
            if lc in (key, ts):
                continue
            out = out.append_column(lc, pad_column(n, left_types[lc]))
        for rc, oc in zip(rcols, out_rcols):
            out = out.append_column(oc, batch[rc])
        kv = out[key].to_numpy(zero_copy_only=False)
        out = out.append_column(
            bc, pa.array(_hash_bucket(kv, num_buckets), pa.int32())
        )
        # match left's column order
        order = left_names + ["__side"] + out_rcols + [bc]
        return out.select(order)

    rpad = right.map_batches(pad_right, batch_format="pyarrow")
    both = left_padded.union(rpad)

    tol = pd.Timedelta(tolerance) if tolerance is not None and not isinstance(tolerance, pd.Timedelta) else tolerance

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        ldf = g[g["__side"] == 0].drop(columns=["__side"] + out_rcols)
        rdf = g[g["__side"] == 1][[key, ts] + out_rcols]
        if len(ldf) == 0:
            return ldf.assign(**{c: pd.Series(dtype=rdf[c].dtype) for c in out_rcols})
        ldf = ldf.sort_values(ts, kind="stable")
        rdf = rdf.sort_values(ts, kind="stable")
        merged = pd.merge_asof(
            ldf,
            rdf,
            on=ts,
            by=key,
            direction=direction,
            tolerance=tol,
            allow_exact_matches=allow_exact_matches,
        )
        merged = restore_pad_dtypes(merged, left_types)
        if post_fn is not None:
            merged = post_fn(merged)
        return merged

    return _per_bucket(both, key, num_buckets, fn)


def asof_join(
    left,
    right,
    *,
    key: str,
    ts: str,
    right_cols: Sequence[str],
    direction: str = "backward",
    tolerance=None,
    allow_exact_matches: bool = True,
    suffix: str = "_r",
    num_buckets: Optional[int] = None,
    post_fn=None,
):
    """Distributed sorted-merge as-of join (point-in-time lookup).

    ``post_fn`` (optional, pandas DataFrame -> DataFrame) runs on each
    bucket's joined frame inside the SAME shuffle — fuse per-entity
    window ops (lag/lead/backfill/sessionize) here to avoid a second
    all-to-all exchange.

    For each left row, attaches the ``right_cols`` of the latest right
    row of the same entity with ``right.ts <= left.ts`` (backward;
    'forward'/'nearest' as in pd.merge_asof). Rows with no earlier match
    get nulls — a right row with a LATER timestamp is never used (zero
    temporal leakage; asserted by tests against a DuckDB oracle).

    Implementation: both sides are tagged, schema-aligned, unioned, and
    hash-bucketed by entity; one groupby shuffle co-locates each entity's
    rows from both sides; per bucket a vectorized ``pd.merge_asof``
    (sorted-merge, by=key) runs once. This is exchange-equivalent to a
    range-partitioned sort-merge join but reuses Ray Data's groupby
    machinery. Broadcast variant: if the right side is tiny, prefer
    ``asof_join_broadcast``.
    """
    left_names = [c for c in left.schema().names if not is_bucket_col(c)]
    rcols = list(right_cols)
    out_rcols = [c + suffix if c in left_names else c for c in rcols]

    right_types = _arrow_types(right.schema())
    left_types = _arrow_types(left.schema())
    num_buckets = _resolve_buckets(left, num_buckets)

    pad_left = make_pad_left_fn(
        left_names, key, right_types, rcols, out_rcols, num_buckets
    )
    lpad = left.map_batches(pad_left, batch_format="pyarrow")

    return asof_join_prepadded(
        lpad,
        right,
        key=key,
        ts=ts,
        left_names=left_names,
        rcols=rcols,
        out_rcols=out_rcols,
        left_types=left_types,
        direction=direction,
        tolerance=tolerance,
        allow_exact_matches=allow_exact_matches,
        num_buckets=num_buckets,
        post_fn=post_fn,
    )


def asof_join_broadcast(
    left,
    right_df: pd.DataFrame,
    *,
    key: str,
    ts: str,
    right_cols: Sequence[str],
    direction: str = "backward",
    tolerance=None,
    allow_exact_matches: bool = True,
    suffix: str = "_r",
):
    """As-of join against a SMALL right side: the right table is put in
    the object store once (``ray.put``) and every map_batches task does a
    local merge_asof — no shuffle at all. Use when the right side fits
    comfortably in worker memory (dimension-table pattern)."""
    import ray

    rdf = right_df[[key, ts] + list(right_cols)].sort_values(ts, kind="stable")
    left_names = left.schema().names
    rename = {c: c + suffix for c in right_cols if c in left_names}
    if rename:
        rdf = rdf.rename(columns=rename)
    ref = ray.put(rdf)
    tol = pd.Timedelta(tolerance) if tolerance is not None and not isinstance(tolerance, pd.Timedelta) else tolerance

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        small = ray.get(ref)
        out = pd.merge_asof(
            batch.sort_values(ts, kind="stable"),
            small,
            on=ts,
            by=key,
            direction=direction,
            tolerance=tol,
            allow_exact_matches=allow_exact_matches,
        )
        return out

    return left.map_batches(fn, batch_format="pandas")


def asof_join_copartitioned(
    pairs: Sequence,
    *,
    key: str,
    ts: str,
    right_cols: Sequence[str],
    direction: str = "backward",
    tolerance=None,
    allow_exact_matches: bool = True,
    suffix: str = "_r",
    post_fn=None,
    validate: bool = True,
    left_keys=None,
    concurrency=None,
):
    """Shuffle-free as-of join over CO-PARTITIONED parquet file pairs.

    ``pairs`` is a sequence of (left_path, right_path): file pair i must
    hold the SAME key set on both sides (the layout a feature store
    maintains by hash- or range-bucketing both tables on the key at
    write time). Each pair then joins entirely LOCALLY — read both
    files, one vectorized ``pd.merge_asof``, optional fused ``post_fn``
    (windows etc.) — and nothing is exchanged: the operator is
    embarrassingly parallel at the file-pair count and is the shape the
    flagship job uses at 100 TB (pipelines/features.py).

    PARTITIONING ASSUMPTION: a key whose left rows live in pair i but
    whose right rows live in pair j != i would silently miss matches.
    ``validate=True`` checks the locally-checkable half (every right key
    present in the pair's left keys) and raises with guidance to the
    exchange-based ``asof_join``; global misplacement on the LEFT side
    cannot be detected locally and is the caller's layout contract.

    A right key with NO left rows anywhere is harmless for this LEFT
    as-of join (it can never match), but it is locally indistinguishable
    from a misplaced key. Pass ``left_keys`` (the global left key set —
    a broadcast-sized collection or anything supporting ``in``) to make
    the check exact: right-only keys are then silently ignored and only
    keys that exist globally on the left but are absent from THIS pair's
    left file raise. Without ``left_keys``, right-only keys must be
    pre-filtered by the caller (or validation disabled).

    Returns a lazy Dataset of joined rows (one output block per pair)."""
    import ray.data

    tol = (
        pd.Timedelta(tolerance)
        if tolerance is not None and not isinstance(tolerance, pd.Timedelta)
        else tolerance
    )
    rcols = list(right_cols)

    def join_pair(batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        outs = []
        for row in batch.to_pylist():
            ldf = pq.read_table(row["left_path"]).to_pandas()
            rt = pq.read_table(
                row["right_path"], columns=[key, ts] + rcols
            ).to_pandas()
            if validate:
                extra = set(rt[key].unique()) - set(ldf[key].unique())
                if extra and left_keys is not None:
                    # right-only keys (absent from the GLOBAL left set)
                    # can never match a left row — ignore them; what
                    # remains is genuine misplacement
                    extra = {k for k in extra if k in left_keys}
                if extra:
                    raise ValueError(
                        f"co-partitioning violated in pair "
                        f"{row['left_path']!r}: {len(extra)} right-side "
                        f"keys absent from the left file (e.g. "
                        f"{sorted(extra)[:3]}); use the exchange-based "
                        f"asof_join for unaligned inputs (right-only "
                        f"keys are tolerated only when the global "
                        f"left_keys set is supplied)"
                    )
            rename = {c: c + suffix for c in rcols if c in ldf.columns}
            if rename:
                rt = rt.rename(columns=rename)
            merged = pd.merge_asof(
                ldf.sort_values(ts, kind="stable"),
                rt.sort_values(ts, kind="stable"),
                on=ts,
                by=key,
                direction=direction,
                tolerance=tol,
                allow_exact_matches=allow_exact_matches,
            )
            if post_fn is not None:
                merged = post_fn(merged)
            outs.append(table_from_pandas(merged))
        return pa.concat_tables(outs)

    items = ray.data.from_items(
        [{"left_path": str(l), "right_path": str(r)} for l, r in pairs]
    ).repartition(max(1, len(pairs)))
    kwargs = {"batch_format": "pyarrow", "batch_size": 1}
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return items.map_batches(join_pair, **kwargs)


def hopping_window(
    ds,
    key: str,
    ts: str,
    value_col: str,
    window: str,
    hop: str,
):
    """Hopping (sliding) window aggregate: fixed ``window`` length
    advancing by ``hop`` (< window => overlapping windows; each event
    lands in window/hop windows). Implemented as a vectorized per-batch
    EXPANSION to (key, window_start) partial rows followed by the same
    pre-aggregated groupby as tumbling_window — no per-row Python.
    SQL-equivalent: join against generated window starts, or a RANGE
    window frame."""
    from ray.data.aggregate import Max, Min, Sum

    import pyarrow.compute as pc

    window_us = int(pd.Timedelta(window).value // 1000)
    hop_us = int(pd.Timedelta(hop).value // 1000)
    if window_us % hop_us != 0:
        raise ValueError("window must be a multiple of hop")
    k = window_us // hop_us

    def partial(batch: pa.Table) -> pa.Table:
        ts_us = _ts_us(batch, ts)
        keys = batch[key].to_numpy(zero_copy_only=False)
        vals = pc.cast(batch[value_col], pa.float64()).to_numpy(zero_copy_only=False)
        # each event belongs to the k windows starting at
        # floor(ts/hop)*hop - i*hop for i in 0..k-1 (those whose
        # [start, start+window) contains ts)
        base = (ts_us // hop_us) * hop_us
        starts = base[None, :] - (np.arange(k)[:, None] * hop_us)
        n = len(ts_us)
        df = pd.DataFrame(
            {
                key: np.tile(keys, k),
                "window_start": starts.ravel(),
                "v": np.tile(vals, k),
            }
        )
        g = df.groupby([key, "window_start"], sort=False)["v"]
        out = g.agg(n="count", s="sum", mn="min", mx="max").reset_index()
        return table_from_pandas(out)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    agg = partials.groupby([key, "window_start"]).aggregate(
        Sum("n", alias_name="n_events"),
        Sum("s", alias_name="sum_value"),
        Min("mn", alias_name="min_value"),
        Max("mx", alias_name="max_value"),
    )

    def finalize(batch: pa.Table) -> pa.Table:
        ws = batch["window_start"].to_numpy(zero_copy_only=False)
        return batch.set_column(
            batch.schema.get_field_index("window_start"),
            "window_start",
            pa.array(ws.astype("datetime64[us]"), pa.timestamp("us")),
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


def rolling_window(
    ds,
    key: str,
    ts: str,
    value_col: str,
    window_rows: int = 4,
    num_buckets: Optional[int] = None,
    tiebreak: Optional[str] = None,
):
    """Per-entity trailing rolling aggregates over the previous
    ``window_rows`` rows (inclusive of current): mean/min/max/count.
    SQL-equivalent: ``AVG(v) OVER (PARTITION BY key ORDER BY ts ROWS
    BETWEEN {window_rows-1} PRECEDING AND CURRENT ROW)``. Only past rows
    enter the window — no temporal leakage. ``tiebreak``: see
    ``lag_lead``."""

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            [key, ts] + ([tiebreak] if tiebreak else []), kind="stable"
        )
        grouped = g.groupby(key, sort=False)[value_col]
        roll = grouped.rolling(window=window_rows, min_periods=1)
        g[f"{value_col}_rmean"] = roll.mean().reset_index(level=0, drop=True)
        g[f"{value_col}_rmin"] = roll.min().reset_index(level=0, drop=True)
        g[f"{value_col}_rmax"] = roll.max().reset_index(level=0, drop=True)
        g[f"{value_col}_rcount"] = (
            roll.count().reset_index(level=0, drop=True).astype("int64")
        )
        return g

    return _per_bucket(ds, key, num_buckets, fn)


def topk_per_key(
    ds,
    key: str,
    value_col: str,
    k: int = 3,
    descending: bool = True,
    num_buckets: Optional[int] = None,
    tiebreak: Optional[str] = None,
):
    """Top-k rows per entity by ``value_col`` with a rank column.
    SQL-equivalent: ``ROW_NUMBER() OVER (PARTITION BY key ORDER BY v
    DESC) <= k``. Ties on the value are broken by input order within the
    sorted bucket; pass ``tiebreak`` (unique column, always ascending)
    to make rank — and therefore which tied rows survive the cut —
    reproducible after an unordered upstream."""

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        order = [key, value_col] + ([tiebreak] if tiebreak else [])
        g = g.sort_values(order,
                          ascending=[True, not descending] + [True] * bool(tiebreak),
                          kind="stable")
        g["rank"] = g.groupby(key, sort=False).cumcount() + 1
        return g[g["rank"] <= k]

    return _per_bucket(ds, key, num_buckets, fn)


def session_stats(
    ds,
    key: str,
    ts: str,
    value_col: str,
    gap,
    num_buckets: Optional[int] = None,
):
    """Session-level aggregates: one row per (entity, session) with
    event count, duration (seconds), sum/mean of ``value_col``, start
    and end timestamps. Built on the same gap rule as ``sessionize``."""
    gap = pd.Timedelta(gap) if not isinstance(gap, pd.Timedelta) else gap

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts], kind="stable")
        grouped = g.groupby(key, sort=False)
        prev = grouped[ts].shift(1)
        new_session = prev.isna() | ((g[ts] - prev) > gap)
        g["session_seq"] = new_session.astype("int64").groupby(g[key]).cumsum()
        agg = (
            g.groupby([key, "session_seq"], sort=False)
            .agg(
                n_events=(value_col, "count"),
                sum_value=(value_col, "sum"),
                session_start=(ts, "min"),
                session_end=(ts, "max"),
            )
            .reset_index()
        )
        # integer microseconds (exact; float seconds would be inexact)
        agg["duration_us"] = (
            (agg["session_end"] - agg["session_start"]).dt.total_seconds() * 1e6
        ).round().astype("int64")
        return agg

    return _per_bucket(ds, key, num_buckets, fn)


def tumbling_window(
    ds,
    key: str,
    ts: str,
    window: str,
    value_col: str,
    num_buckets: Optional[int] = None,  # unused; kept for signature symmetry
):
    """Tumbling-window aggregate per (entity, window): count/sum/min/max/
    mean of ``value_col`` over fixed windows of ``window`` (e.g. '1h').

    Pre-aggregates inside map_batches (one row per (key, window) per
    batch) before the global groupby — the combiner pattern, so the
    shuffle moves partials, not rows. SQL-equivalent:
    ``GROUP BY key, date_trunc/epoch-floor(ts)``."""
    from ray.data.aggregate import Max, Min, Sum

    import pyarrow.compute as pc

    window_us = int(pd.Timedelta(window).value // 1000)

    def partial(batch: pa.Table) -> pa.Table:
        ts_us = _ts_us(batch, ts)
        keys = batch[key].to_numpy(zero_copy_only=False)
        vals = pc.cast(batch[value_col], pa.float64()).to_numpy(zero_copy_only=False)
        wstart = (ts_us // window_us) * window_us
        df = pd.DataFrame({key: keys, "window_start": wstart, "v": vals})
        g = df.groupby([key, "window_start"], sort=False)["v"]
        out = g.agg(n="count", s="sum", mn="min", mx="max").reset_index()
        return table_from_pandas(out)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    agg = partials.groupby([key, "window_start"]).aggregate(
        Sum("n", alias_name="n_events"),
        Sum("s", alias_name="sum_value"),
        Min("mn", alias_name="min_value"),
        Max("mx", alias_name="max_value"),
    )

    def finalize(batch: pa.Table) -> pa.Table:
        n = batch["n_events"].to_numpy(zero_copy_only=False).astype(float)
        s = batch["sum_value"].to_numpy(zero_copy_only=False)
        batch = batch.append_column("mean_value", pa.array(s / n, pa.float64()))
        ws = batch["window_start"].to_numpy(zero_copy_only=False)
        batch = batch.set_column(
            batch.schema.get_field_index("window_start"),
            "window_start",
            pa.array(ws.astype("datetime64[us]"), pa.timestamp("us")),
        )
        return batch

    return agg.map_batches(finalize, batch_format="pyarrow")
