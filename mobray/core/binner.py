"""Fit orchestration + vectorized transform, on sufficient statistics.

This is the driver-side reduce of the distributed fit AND the
single-node oracle. The full pipeline (MOBPY/binning/mob.py:173-305):

  partition -> binary check (+remap) -> constraint resolve -> PAVA ->
  merge_adjacent -> bins table -> summary (+WoE/IV)

Everything after the grouped aggregation operates on tables whose row
count is the number of distinct x values — small by construction — so
the exact same code path serves both the distributed engine and the
oracle parity tests.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Dict, Iterable, List, Optional, Tuple

import numpy as np

from mobray.config import EPSILON
from mobray.core.blocks import Block
from mobray.core.constraints import BinningConstraints
from mobray.core.format import interval_label
from mobray.core.merge import MergeStrategy, coerce_strategy, merge_adjacent
from mobray.core.model import BinningModel
from mobray.core.pava import GroupsTable, group_stats, run_pava, validate_monotonicity
from mobray.core.woe import woe_iv
from mobray.exceptions import DataError, FittingError


@dataclass
class SpecialStats:
    """Sufficient stats for a Missing / Excluded partition slice.

    ``n_rows`` counts all rows in the slice; the moments cover only the
    non-null y rows — matching pandas' skipna aggregation used by the
    reference summary builder (MOBPY/binning/mob.py:628-653: ``count`` is
    ``len(y)`` while mean/std/min/max skip NaN).
    """

    n_rows: int = 0
    n_valid: int = 0
    sum: float = 0.0
    sum2: float = 0.0
    ymin: float = math.inf
    ymax: float = -math.inf

    def merge(self, other: "SpecialStats") -> "SpecialStats":
        return SpecialStats(
            n_rows=self.n_rows + other.n_rows,
            n_valid=self.n_valid + other.n_valid,
            sum=self.sum + other.sum,
            sum2=self.sum2 + other.sum2,
            ymin=min(self.ymin, other.ymin),
            ymax=max(self.ymax, other.ymax),
        )

    def summary_row(self, bucket: str) -> Dict[str, Any]:
        if self.n_valid > 0:
            mean = self.sum / self.n_valid
            mn, mx = self.ymin, self.ymax
        else:
            mean, mn, mx = float("nan"), float("nan"), float("nan")
        if self.n_valid > 1:
            var = max(
                0.0,
                (self.sum2 / self.n_valid - mean * mean)
                * self.n_valid
                / (self.n_valid - 1),
            )
            std = math.sqrt(var)
        else:
            std = float("nan")
        return {
            "bucket": bucket,
            "count": int(self.n_rows),
            "sum": float(self.sum),
            "mean": mean,
            "std": std,
            "min": mn,
            "max": mx,
        }

    @staticmethod
    def from_y(y: np.ndarray) -> "SpecialStats":
        y = np.asarray(y, dtype=float)
        valid = y[~np.isnan(y)]
        return SpecialStats(
            n_rows=len(y),
            n_valid=len(valid),
            sum=float(valid.sum()) if len(valid) else 0.0,
            sum2=float((valid * valid).sum()) if len(valid) else 0.0,
            ymin=float(valid.min()) if len(valid) else math.inf,
            ymax=float(valid.max()) if len(valid) else -math.inf,
        )


@dataclass
class FitAggregates:
    """Everything the driver-side fit needs, computable in ONE distributed
    pass over (x, y):

    - ``groups``: per-distinct-x sufficient stats over the clean partition
      (x not null / not excluded, y not null)
    - ``clean_n_rows``: clean rows incl. y-null ones (constraint totals use
      ``len(parts.clean)``, MOBPY/binning/mob.py:231)
    - ``y_distinct``: distinct non-null y values over clean, capped at 3
      (enough to answer the <=2-distinct binary check exactly)
    - ``missing`` / ``excluded``: stats for the special summary rows
    - ``requested_exclude``: the full user-supplied exclude set. The
      reference maps ANY requested value to "Excluded:{v}" at transform
      time whether or not it occurred during fit (MOBPY/binning/
      mob.py:430-431), so the model must carry the request, not just the
      observed subset (``excluded`` keys ⊆ ``requested_exclude``).
    """

    groups: GroupsTable
    clean_n_rows: int
    y_distinct: List[float]
    missing: SpecialStats = field(default_factory=SpecialStats)
    excluded: Dict[float, SpecialStats] = field(default_factory=dict)
    requested_exclude: Tuple[float, ...] = ()


def detect_binary(y_distinct: List[float]) -> bool:
    """Reference binary check (MOBPY/core/utils.py:71-121, flexible mode):
    <=2 distinct integer-valued values AND (set == {0,1} or exactly one
    distinct value). NaNs excluded upstream."""
    vals = sorted(set(float(v) for v in y_distinct))
    if len(vals) == 0 or len(vals) > 2:
        return False
    ints = [int(v) for v in vals]
    if any(float(i) != v for i, v in zip(ints, vals)):
        return False
    return set(ints) == {0, 1} or len(vals) == 1


def aggregates_from_arrays(
    x: np.ndarray,
    y: np.ndarray,
    exclude_values: Optional[Iterable] = None,
) -> FitAggregates:
    """Single-node oracle path: partition + aggregate raw arrays.

    Mirrors partition_df (MOBPY/core/utils.py:291-385) + the PAVA group
    pass. x NaN -> missing; x in exclude_values -> excluded; else clean.
    """
    x = np.asarray(x, dtype=float)
    y = np.asarray(y, dtype=float)
    if len(x) != len(y):
        raise DataError("x and y must have equal length")
    finite_or_nan = np.isnan(x) | np.isfinite(x)
    if not finite_or_nan.all():
        raise DataError("x contains non-finite (inf) values")
    ynn = y[~np.isnan(y)]
    if len(ynn) and not np.isfinite(ynn).all():
        raise DataError("y contains non-finite (inf) values")

    missing_mask = np.isnan(x)
    exclude_set = sorted(set(float(v) for v in exclude_values)) if exclude_values else []
    if exclude_set:
        excluded_mask = ~missing_mask & np.isin(x, exclude_set)
    else:
        excluded_mask = np.zeros(len(x), dtype=bool)
    clean_mask = ~missing_mask & ~excluded_mask

    x_clean, y_clean = x[clean_mask], y[clean_mask]
    if len(x_clean) == 0:
        raise DataError("No clean rows after removing missing/excluded values")

    groups = group_stats(x_clean, y_clean)
    y_valid = y_clean[~np.isnan(y_clean)]
    # distinct y capped at 3 — enough to answer the <=2-distinct binary
    # check exactly, and what the distributed one-pass path produces
    y_distinct = sorted(set(np.unique(y_valid).tolist()))[:3] if len(y_valid) else []

    excluded: Dict[float, SpecialStats] = {}
    for v in exclude_set:
        m = ~missing_mask & (x == v)
        if m.any():
            excluded[float(v)] = SpecialStats.from_y(y[m])

    return FitAggregates(
        groups=groups,
        clean_n_rows=int(clean_mask.sum()),
        y_distinct=[float(v) for v in y_distinct],
        missing=SpecialStats.from_y(y[missing_mask]) if missing_mask.any() else SpecialStats(),
        excluded=excluded,
        requested_exclude=tuple(exclude_set),
    )


def _num_to_json(v: float):
    if isinstance(v, float) and math.isinf(v):
        return "inf" if v > 0 else "-inf"
    return v


def _num_from_json(v):
    if v == "inf":
        return math.inf
    if v == "-inf":
        return -math.inf
    return float(v)


def aggregates_to_json(agg: FitAggregates) -> str:
    """Serialize the mergeable fit sketch — the checkpointable state of
    an incremental fit."""
    import json

    def ss(s: SpecialStats):
        return {
            "n_rows": s.n_rows, "n_valid": s.n_valid, "sum": s.sum,
            "sum2": s.sum2, "ymin": _num_to_json(s.ymin), "ymax": _num_to_json(s.ymax),
        }

    return json.dumps(
        {
            "groups": {
                "x": agg.groups.x.tolist(),
                "count": agg.groups.count.tolist(),
                "sum": agg.groups.sum.tolist(),
                "sum2": agg.groups.sum2.tolist(),
                "ymin": agg.groups.ymin.tolist(),
                "ymax": agg.groups.ymax.tolist(),
            },
            "clean_n_rows": agg.clean_n_rows,
            "y_distinct": agg.y_distinct,
            "missing": ss(agg.missing),
            "excluded": {str(k): ss(v) for k, v in agg.excluded.items()},
            "requested_exclude": list(agg.requested_exclude),
        }
    )


def aggregates_from_json(s: str) -> FitAggregates:
    import json

    d = json.loads(s)

    def ss(x) -> SpecialStats:
        return SpecialStats(
            n_rows=int(x["n_rows"]), n_valid=int(x["n_valid"]),
            sum=float(x["sum"]), sum2=float(x["sum2"]),
            ymin=_num_from_json(x["ymin"]), ymax=_num_from_json(x["ymax"]),
        )

    g = d["groups"]
    return FitAggregates(
        groups=GroupsTable(
            x=np.array(g["x"], dtype=float),
            count=np.array(g["count"], dtype=np.int64),
            sum=np.array(g["sum"], dtype=float),
            sum2=np.array(g["sum2"], dtype=float),
            ymin=np.array(g["ymin"], dtype=float),
            ymax=np.array(g["ymax"], dtype=float),
        ),
        clean_n_rows=int(d["clean_n_rows"]),
        y_distinct=[float(v) for v in d["y_distinct"]],
        missing=ss(d["missing"]),
        excluded={float(k): ss(v) for k, v in d["excluded"].items()},
        # .get: sketches checkpointed before this field existed
        requested_exclude=tuple(float(v) for v in d.get("requested_exclude", [])),
    )


def merge_fit_aggregates(a: FitAggregates, b: FitAggregates) -> FitAggregates:
    """Pool two FitAggregates — every component is a mergeable sketch
    (counts/sums pool; grouped tables merge-by-key; capped distinct sets
    union), so a fit can be updated INCREMENTALLY: aggregate only the new
    data and merge with the saved aggregates, then re-run the cheap
    driver-side reduce. fit(merge(agg(A), agg(B))) == fit(A ∪ B) exactly.
    """
    # merge grouped tables by x key
    ga, gb = a.groups, b.groups
    xs = np.union1d(ga.x, gb.x)
    ia = np.searchsorted(ga.x, xs)
    ib = np.searchsorted(gb.x, xs)
    in_a = (ia < len(ga.x)) & (ga.x[np.clip(ia, 0, max(0, len(ga.x) - 1))] == xs)
    in_b = (ib < len(gb.x)) & (gb.x[np.clip(ib, 0, max(0, len(gb.x) - 1))] == xs)

    def pick(arr_a, arr_b, fill):
        out_a = np.full(len(xs), fill, dtype=float)
        out_b = np.full(len(xs), fill, dtype=float)
        out_a[in_a] = arr_a[ia[in_a]]
        out_b[in_b] = arr_b[ib[in_b]]
        return out_a, out_b

    ca, cb = pick(ga.count.astype(float), gb.count.astype(float), 0.0)
    sa, sb = pick(ga.sum, gb.sum, 0.0)
    s2a, s2b = pick(ga.sum2, gb.sum2, 0.0)
    mna, mnb = pick(ga.ymin, gb.ymin, math.inf)
    mxa, mxb = pick(ga.ymax, gb.ymax, -math.inf)

    groups = GroupsTable(
        x=xs,
        count=(ca + cb).astype(np.int64),
        sum=sa + sb,
        sum2=s2a + s2b,
        ymin=np.minimum(mna, mnb),
        ymax=np.maximum(mxa, mxb),
    )

    excluded: Dict[float, SpecialStats] = {}
    for src in (a.excluded, b.excluded):
        for k, v in src.items():
            excluded[k] = excluded[k].merge(v) if k in excluded else v

    return FitAggregates(
        groups=groups,
        clean_n_rows=a.clean_n_rows + b.clean_n_rows,
        y_distinct=sorted(set(a.y_distinct) | set(b.y_distinct))[:3],
        missing=a.missing.merge(b.missing),
        excluded=excluded,
        requested_exclude=tuple(
            sorted(set(a.requested_exclude) | set(b.requested_exclude))
        ),
    )


def fit_from_aggregates(
    agg: FitAggregates,
    *,
    sign: str = "auto",
    strict: bool = True,
    constraints: Optional[BinningConstraints] = None,
    merge_strategy: MergeStrategy | str = MergeStrategy.HIGHEST_PVALUE,
    epsilon: float = EPSILON,
) -> BinningModel:
    """Driver-side reduce: PAVA -> merge -> bins -> summary -> model.

    Identical semantics to MonotonicBinner.fit steps 2-7
    (MOBPY/binning/mob.py:211-300).
    """
    strategy = coerce_strategy(merge_strategy)
    constraints = (constraints or BinningConstraints()).copy()

    is_binary = detect_binary(agg.y_distinct)
    groups = agg.groups

    # Binary remap min->0 max->1 (MOBPY/binning/mob.py:216-227). Note: the
    # reference's binary check only accepts {0,1} (or a single integer
    # value), so for 2-value targets the remap branch never fires there;
    # kept for surface parity via an exact affine transform on aggregates.
    if is_binary and len(agg.y_distinct) == 2:
        vals = sorted(agg.y_distinct)
        if set(vals) != {0.0, 1.0}:
            v0, v1 = vals
            scale = 1.0 / (v1 - v0)
            groups = GroupsTable(
                x=groups.x,
                count=groups.count,
                sum=(groups.sum - groups.count * v0) * scale,
                sum2=(groups.sum2 - 2 * v0 * groups.sum + groups.count * v0 * v0)
                * scale
                * scale,
                ymin=(groups.ymin - v0) * scale,
                ymax=(groups.ymax - v0) * scale,
            )

    total_n = agg.clean_n_rows
    total_pos = int(groups.sum.sum()) if is_binary else 0
    constraints.resolve(total_n=total_n, total_pos=total_pos)

    blocks, resolved_sign = run_pava(groups, sign=sign, strict=strict, epsilon=epsilon)
    if not validate_monotonicity(blocks, resolved_sign):
        raise FittingError("PAVA failed to produce monotonic blocks")
    n_pava_blocks = len(blocks)

    merged = merge_adjacent(
        blocks,
        constraints,
        is_binary,
        strategy=strategy,
        epsilon=epsilon,
    )

    # Edge stitching (MOBPY/binning/mob.py:545-591): right := next.left,
    # outer edges forced to +/- inf.
    k = len(merged)
    lefts = np.empty(k)
    rights = np.empty(k)
    for i, b in enumerate(merged):
        lefts[i] = -math.inf if i == 0 else b.left
        rights[i] = math.inf if i == k - 1 else merged[i + 1].left

    counts = np.array([b.n for b in merged], dtype=np.int64)
    sums = np.array([b.sum for b in merged])
    means = np.array([b.mean for b in merged])
    stds = np.array([b.std for b in merged])
    mins = np.array([b.ymin for b in merged])
    maxs = np.array([b.ymax for b in merged])
    labels = [interval_label(lefts[i], rights[i]) for i in range(k)]

    special_rows: List[Dict[str, Any]] = []
    if agg.missing.n_rows > 0:
        special_rows.append(agg.missing.summary_row("Missing"))
    for val in sorted(agg.excluded):
        st = agg.excluded[val]
        if st.n_rows > 0:
            special_rows.append(st.summary_row(f"Excluded:{val}"))

    woe = iv = None
    if is_binary:
        bads = sums.astype(float)
        goods = counts - bads
        comp = woe_iv(goods, bads, smoothing=0.5, return_components=True, epsilon=epsilon)
        woe, iv = comp["woe"], comp["iv"]

    diagnostics = {
        "partition_summary": {
            "clean": int(total_n),
            "missing": int(agg.missing.n_rows),
            "excluded": int(sum(s.n_rows for s in agg.excluded.values())),
        },
        "is_binary": is_binary,
        "resolved_sign": resolved_sign,
        "n_distinct_x": len(groups),
        "n_pava_blocks": n_pava_blocks,
        "n_final_bins": k,
        "constraints": {
            "max_bins": constraints.max_bins,
            "min_bins": constraints.min_bins,
            "abs_min_samples": constraints.abs_min_samples,
            "abs_max_samples": constraints.abs_max_samples,
            "abs_min_positives": constraints.abs_min_positives,
            "initial_pvalue": constraints.initial_pvalue,
            "maximize_bins": constraints.maximize_bins,
        },
        "constraints_satisfied": _check_constraints_satisfied(
            merged, constraints, is_binary
        ),
    }

    return BinningModel(
        lefts=lefts,
        rights=rights,
        counts=counts,
        sums=sums,
        means=means,
        stds=stds,
        mins=mins,
        maxs=maxs,
        labels=labels,
        sign=resolved_sign,
        is_binary=is_binary,
        woe=woe,
        iv=iv,
        # the REQUESTED set, not just the observed subset: the reference
        # maps any requested value to "Excluded:{v}" at transform even
        # when it never occurred during fit (MOBPY/binning/mob.py:430)
        exclude_values=frozenset(float(v) for v in agg.excluded)
        | frozenset(agg.requested_exclude),
        special_rows=tuple(special_rows),
        diagnostics=diagnostics,
    )


def _check_constraints_satisfied(
    blocks: List[Block], constraints: BinningConstraints, is_binary: bool
) -> Dict[str, bool]:
    """MOBPY/binning/mob.py:708-742."""
    if not blocks:
        return {}
    satisfied = {
        "max_bins": len(blocks) <= constraints.max_bins,
        "min_bins": len(blocks) >= constraints.min_bins,
    }
    if constraints.abs_min_samples > 0:
        satisfied["min_samples"] = all(b.n >= constraints.abs_min_samples for b in blocks)
    if constraints.abs_max_samples is not None:
        satisfied["max_samples"] = all(b.n <= constraints.abs_max_samples for b in blocks)
    if is_binary and constraints.abs_min_positives > 0:
        satisfied["min_positives"] = all(
            b.sum >= constraints.abs_min_positives for b in blocks
        )
    return satisfied


def fit_binning(
    x,
    y,
    *,
    sign: str = "auto",
    strict: bool = True,
    constraints: Optional[BinningConstraints] = None,
    exclude_values: Optional[Iterable] = None,
    merge_strategy: MergeStrategy | str = MergeStrategy.HIGHEST_PVALUE,
    epsilon: float = EPSILON,
) -> BinningModel:
    """Single-node oracle fit from raw arrays (or pandas Series)."""
    agg = aggregates_from_arrays(np.asarray(x), np.asarray(y), exclude_values)
    return fit_from_aggregates(
        agg,
        sign=sign,
        strict=strict,
        constraints=constraints,
        merge_strategy=merge_strategy,
        epsilon=epsilon,
    )


def transform_values(
    model: BinningModel,
    values,
    assign: str = "interval",
) -> np.ndarray:
    """Vectorized bin assignment for a whole array at once.

    Replaces the reference's per-value Series.apply
    (MOBPY/binning/mob.py:422-468) with one np.searchsorted over the
    batch; label/left/right/woe semantics and the Missing / "Excluded:{v}"
    handling are identical.
    """
    if assign not in ("interval", "left", "right", "woe"):
        raise ValueError(f"Invalid assign '{assign}'")
    if assign == "woe" and not model.is_binary:
        raise ValueError("assign='woe' requires binary target")

    vals = np.asarray(values, dtype=float)
    k = model.n_bins
    nan_mask = np.isnan(vals)
    if model.exclude_values:
        excl_mask = ~nan_mask & np.isin(vals, list(model.exclude_values))
    else:
        excl_mask = np.zeros(len(vals), dtype=bool)

    safe_vals = np.where(nan_mask, 0.0, vals)
    idx = np.searchsorted(model.rights, safe_vals, side="right")
    idx = np.minimum(idx, k - 1)
    back = (idx > 0) & (safe_vals < model.lefts[idx])
    idx[back] -= 1

    if assign == "left":
        out = model.lefts[idx].astype(float)
        out[nan_mask | excl_mask] = np.nan
        return out
    if assign == "right":
        out = model.rights[idx].astype(float)
        out[nan_mask | excl_mask] = np.nan
        return out
    if assign == "woe":
        out = model.woe[idx].astype(float)
        out[nan_mask | excl_mask] = np.nan
        return out

    # interval labels
    labels = np.asarray(model.labels, dtype=object)
    out = labels[idx].astype(object)
    out[nan_mask] = "Missing"
    if excl_mask.any():
        ev = vals[excl_mask]
        out[excl_mask] = [f"Excluded:{v}" for v in ev]
    return out
