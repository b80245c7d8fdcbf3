"""Distributed monotonic-binning fit over a Ray Dataset.

Execution shape (SURVEY.md §3.1 engine version):

  select_columns([x, y])                       # prune at the read
    -> map_batches(partial_agg)                # per-batch combine (stateless)
    -> groupby(["tag", "xk"]).aggregate(...)   # the ONLY wide shuffle; input
                                               # is already one row per
                                               # distinct x per batch
    -> driver: core reduce (PAVA + merge)      # rows = distinct x, tiny

Everything after the groupby runs on the driver via the pure-numpy core
(mobray.core.binner.fit_from_aggregates) — the identical code path as the
single-node oracle, which is what makes allclose parity achievable.

Scale note: the shuffle volume is O(distinct_x x n_blocks), independent of
row count. For truly high-cardinality continuous x, pass
``max_distinct_x`` to quantile-prebucket x inside the partial pass
(documented deviation from the reference; off by default so conformance
tests see exact distinct-x semantics).
"""

from __future__ import annotations

from typing import Iterable, Optional

import numpy as np

from mobray.core.binner import FitAggregates, SpecialStats, fit_from_aggregates
from mobray.core.constraints import BinningConstraints
from mobray.core.merge import MergeStrategy
from mobray.core.model import BinningModel
from mobray.core.pava import GroupsTable
from mobray.exceptions import DataError
from mobray.stages.binning import make_partial_agg


def collect_aggregates(
    ds,
    x: str,
    y: str,
    *,
    exclude_values: Optional[Iterable[float]] = None,
    batch_size: int = 65536,
    max_distinct_x: Optional[int] = None,
    prebucket_sample_rows: int = 100_000,
) -> FitAggregates:
    """Run ONLY the distributed aggregation pass and return the mergeable
    FitAggregates sketch. Save it (``aggregates_to_json``) and later pool
    it with aggregates of NEW data via
    ``mobray.core.binner.merge_fit_aggregates`` — an incremental fit that
    never re-scans old data. ``fit_dataset`` = collect + reduce."""
    from ray.data.aggregate import Max, Min, Sum

    names = ds.schema().names
    missing = [c for c in (x, y) if c not in names]
    if missing:
        raise DataError(f"Missing columns in Dataset: {missing}. Available: {names[:10]}")

    edges = None
    if max_distinct_x is not None:
        edges = _prebucket_edges(
            ds, x, max_distinct_x, exclude_values, prebucket_sample_rows
        )

    partials = ds.select_columns([x, y]).map_batches(
        make_partial_agg(x, y, exclude_values, prebucket_edges=edges),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
    agg = partials.groupby(["tag", "xk"]).aggregate(
        Sum("n", alias_name="n"),
        Sum("nv", alias_name="nv"),
        Sum("s", alias_name="s"),
        Sum("s2", alias_name="s2"),
        Min("mn", alias_name="mn"),
        Max("mx", alias_name="mx"),
    )
    small = agg.to_pandas()  # rows = distinct x (+ a few specials): small
    return _rows_to_aggregates(small, exclude_values)


def _prebucket_edges(
    ds, x: str, max_distinct_x: int, exclude_values, sample_rows: int
):
    """Quantile edges for the high-cardinality prebucket, from ONE pass:
    each batch emits its own evenly-spaced order statistics (a per-batch
    quantile sketch of <= ``sketch_size`` values, each weighted by the
    batch rows it represents) and the driver merges them into weighted
    global quantiles.

    This replaces a count() pass + a seeded random_sample pass — on a
    DERIVED dataset (e.g. fit over a map_batches feature stage) each of
    those re-executed the whole upstream pipeline. One sketch pass sees
    every block, so sorted-by-x storage still yields full-range edges
    (the bias a limit() sample would reintroduce; see the
    TestPrebucketSampleBias regression)."""
    import pyarrow as pa

    # total driver-side rows = sketch_size x n_batches; 512 keeps the
    # collect tiny while bounding each batch's quantile error at ~0.2%
    sketch_size = max(64, min(1024, sample_rows // 64 or 64))

    def batch_sketch(t: pa.Table) -> pa.Table:
        v = t[x].to_numpy(zero_copy_only=False).astype(float)
        v = v[~np.isnan(v)]
        if exclude_values:
            v = v[~np.isin(v, list(exclude_values))]
        if len(v) == 0:
            return pa.table(
                {"q": pa.array([], pa.float64()), "w": pa.array([], pa.float64())}
            )
        v.sort()
        k = min(sketch_size, len(v))
        pos = ((np.arange(k) + 0.5) * len(v) / k).astype(np.int64)
        return pa.table(
            {
                "q": pa.array(v[pos], pa.float64()),
                "w": pa.array(np.full(k, len(v) / k), pa.float64()),
            }
        )

    sk = (
        ds.select_columns([x])
        .map_batches(batch_sketch, batch_format="pyarrow")
        .to_pandas()
    )
    if len(sk) == 0:
        return None
    vals = sk["q"].to_numpy()
    wts = sk["w"].to_numpy()
    order = np.argsort(vals, kind="stable")
    vals, wts = vals[order], wts[order]
    cum = np.cumsum(wts)
    qs = np.linspace(0.0, 1.0, max_distinct_x + 1)[:-1]
    idx = np.searchsorted(cum, qs * cum[-1], side="left")
    return np.unique(vals[np.minimum(idx, len(vals) - 1)])


def fit_dataset(
    ds,
    x: str,
    y: str,
    *,
    sign: str = "auto",
    strict: bool = True,
    constraints: Optional[BinningConstraints] = None,
    exclude_values: Optional[Iterable[float]] = None,
    merge_strategy: MergeStrategy | str = MergeStrategy.HIGHEST_PVALUE,
    batch_size: int = 65536,
    max_distinct_x: Optional[int] = None,
    prebucket_sample_rows: int = 100_000,
) -> BinningModel:
    """Fit a BinningModel on columns (x, y) of a Ray Dataset.

    Matches ``MonotonicBinner(df, x, y, ...).fit()`` semantics
    (MOBPY/binning/mob.py:173-305) with allclose numerics.

    ``max_distinct_x``: the scale valve for high-cardinality continuous
    features — see collect_aggregates.
    """
    agg = collect_aggregates(
        ds,
        x,
        y,
        exclude_values=exclude_values,
        batch_size=batch_size,
        max_distinct_x=max_distinct_x,
        prebucket_sample_rows=prebucket_sample_rows,
    )
    return fit_from_aggregates(
        agg,
        sign=sign,
        strict=strict,
        constraints=constraints,
        merge_strategy=merge_strategy,
    )


def _rows_to_aggregates(small, exclude_values=None) -> FitAggregates:
    """Driver-side: aggregated (tag, xk) rows -> FitAggregates."""
    c = small[small["tag"] == "c"].sort_values("xk")
    if len(c) == 0:
        raise DataError("No clean rows after removing missing/excluded values")

    groups = GroupsTable(
        x=c["xk"].to_numpy(dtype=float),
        count=c["nv"].to_numpy(dtype=np.int64),
        sum=c["s"].to_numpy(dtype=float),
        sum2=c["s2"].to_numpy(dtype=float),
        ymin=c["mn"].to_numpy(dtype=float),
        ymax=c["mx"].to_numpy(dtype=float),
    )

    meta = small[small["tag"] == "_meta"]
    clean_n_rows = int(meta["n"].sum()) if len(meta) else int(groups.count.sum())

    ydist = sorted(small.loc[small["tag"] == "_ydist", "xk"].tolist())[:3]

    def _special(row) -> SpecialStats:
        return SpecialStats(
            n_rows=int(row["n"]),
            n_valid=int(row["nv"]),
            sum=float(row["s"]),
            sum2=float(row["s2"]),
            ymin=float(row["mn"]),
            ymax=float(row["mx"]),
        )

    m = small[small["tag"] == "m"]
    missing_stats = _special(m.iloc[0]) if len(m) else SpecialStats()

    excluded = {}
    for _, row in small[small["tag"] == "e"].iterrows():
        excluded[float(row["xk"])] = _special(row)

    return FitAggregates(
        groups=groups,
        clean_n_rows=clean_n_rows,
        y_distinct=[float(v) for v in ydist],
        missing=missing_stats,
        excluded=excluded,
        requested_exclude=(
            tuple(sorted(set(float(v) for v in exclude_values)))
            if exclude_values else ()
        ),
    )


def transform_dataset(
    ds,
    model: BinningModel,
    x: str,
    *,
    assign: str = "interval",
    out_col: Optional[str] = None,
    batch_size: int = 65536,
):
    """Append a bin-assignment column — stateless vectorized scoring
    (SURVEY.md §3.2). Returns a lazy Dataset; no shuffle."""
    from mobray.stages.binning import make_transform_stage

    return ds.map_batches(
        make_transform_stage(model, x, out_col, assign),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def multi_transform_dataset(
    ds,
    model: BinningModel,
    x: str,
    assigns: dict,
    *,
    batch_size: int = 65536,
):
    """Append several assignment columns ({out_col: assign}) in ONE
    map_batches stage."""
    from mobray.stages.binning import make_multi_transform_stage

    return ds.map_batches(
        make_multi_transform_stage(model, x, assigns),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
