"""Per-batch stages of the distributed binning fit and transform.

Fit is ONE wide pass: a stateless per-batch partial aggregation
(``make_partial_agg``) that collapses each Arrow batch to a handful of
(tag, x) sufficient-stat rows, followed by a tiny global
``groupby(tag, x)`` — the classic combiner pattern, so the shuffle
moves one row per distinct x per batch instead of one row per input row,
which also defeats value skew (a hot x value pre-combines inside every
batch). The reference does the same aggregation eagerly in pandas
(MOBPY/core/pava.py:259-284) plus a partition step
(MOBPY/core/utils.py:291-385); both are fused here into one pass.

Tags: 'c' = clean per-distinct-x group row; 'm' = missing (x null);
'e' = excluded value row; '_meta' = clean row count (including y-null
rows, which constraint resolution counts — MOBPY/binning/mob.py:231);
'_ydist' = distinct y values capped at 3 per batch (union across batches
answers the <=2-distinct binary check exactly).
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional

import numpy as np
import pyarrow as pa

from mobray.core.binner import transform_values

PARTIAL_SCHEMA = pa.schema(
    [
        ("tag", pa.string()),
        ("xk", pa.float64()),
        ("n", pa.int64()),
        ("nv", pa.int64()),
        ("s", pa.float64()),
        ("s2", pa.float64()),
        ("mn", pa.float64()),
        ("mx", pa.float64()),
    ]
)


def _to_float_np(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Arrow column -> float64 numpy with nulls as NaN."""
    import pyarrow.compute as pc

    return pc.cast(col, pa.float64()).to_numpy(zero_copy_only=False)


def make_partial_agg(
    x: str,
    y: str,
    exclude_values: Optional[Iterable[float]] = None,
    validate: bool = True,
    prebucket_edges: Optional[np.ndarray] = None,
) -> Callable[[pa.Table], pa.Table]:
    """Build the per-batch partial-aggregation function for fit.

    ``prebucket_edges``: sorted quantile edges for high-cardinality
    continuous x — clean values are snapped DOWN to their bucket's left
    edge before grouping, bounding the grouped table at len(edges) rows
    regardless of distinct-x cardinality (documented deviation from the
    reference's exact distinct-x semantics; off by default). Missing /
    excluded handling still sees the ORIGINAL values.
    """
    excl = np.array(sorted(set(float(v) for v in exclude_values)), dtype=float) if exclude_values else None

    def partial_agg(batch: pa.Table) -> pa.Table:
        xa = _to_float_np(batch[x])
        ya = _to_float_np(batch[y])

        if validate:
            if np.isinf(xa).any():
                raise ValueError(f"Column '{x}' contains non-finite (inf) values")
            if np.isinf(ya).any():
                raise ValueError(f"Column '{y}' contains non-finite (inf) values")

        missing_mask = np.isnan(xa)
        if excl is not None and len(excl):
            excl_mask = ~missing_mask & np.isin(xa, excl)
        else:
            excl_mask = np.zeros(len(xa), dtype=bool)
        clean_mask = ~missing_mask & ~excl_mask

        tags, xks, ns, nvs, ss, s2s, mns, mxs = [], [], [], [], [], [], [], []

        def emit(tag, xk, n, nv, s, s2, mn, mx):
            tags.append(tag)
            xks.append(float(xk))
            ns.append(int(n))
            nvs.append(int(nv))
            ss.append(float(s))
            s2s.append(float(s2))
            mns.append(float(mn))
            mxs.append(float(mx))

        # clean: group by distinct x over valid-y rows (vectorized)
        xc = xa[clean_mask]
        yc = ya[clean_mask]
        if prebucket_edges is not None and len(xc):
            idx = np.clip(
                np.searchsorted(prebucket_edges, xc, side="right") - 1,
                0,
                len(prebucket_edges) - 1,
            )
            xc = prebucket_edges[idx]
        yv_mask = ~np.isnan(yc)
        xv, yv = xc[yv_mask], yc[yv_mask]
        if len(xv):
            order = np.argsort(xv, kind="stable")
            xs, ys = xv[order], yv[order]
            uniq, starts = np.unique(xs, return_index=True)
            counts = np.diff(np.append(starts, len(xs)))
            sums = np.add.reduceat(ys, starts)
            sum2s = np.add.reduceat(ys * ys, starts)
            gmins = np.minimum.reduceat(ys, starts)
            gmaxs = np.maximum.reduceat(ys, starts)
            for i in range(len(uniq)):
                emit("c", uniq[i], counts[i], counts[i], sums[i], sum2s[i], gmins[i], gmaxs[i])
            for v in np.unique(ys)[:3]:
                emit("_ydist", v, 0, 0, 0.0, 0.0, np.inf, -np.inf)
        if clean_mask.any():
            emit("_meta", 0.0, int(clean_mask.sum()), 0, 0.0, 0.0, np.inf, -np.inf)

        def special(mask, tag, xk):
            yb = ya[mask]
            vb = yb[~np.isnan(yb)]
            emit(
                tag,
                xk,
                int(mask.sum()),
                len(vb),
                vb.sum() if len(vb) else 0.0,
                (vb * vb).sum() if len(vb) else 0.0,
                vb.min() if len(vb) else np.inf,
                vb.max() if len(vb) else -np.inf,
            )

        if missing_mask.any():
            special(missing_mask, "m", 0.0)
        if excl is not None:
            for v in excl:
                m = ~missing_mask & (xa == v)
                if m.any():
                    special(m, "e", v)

        return pa.Table.from_arrays(
            [
                pa.array(tags, pa.string()),
                pa.array(xks, pa.float64()),
                pa.array(ns, pa.int64()),
                pa.array(nvs, pa.int64()),
                pa.array(ss, pa.float64()),
                pa.array(s2s, pa.float64()),
                pa.array(mns, pa.float64()),
                pa.array(mxs, pa.float64()),
            ],
            schema=PARTIAL_SCHEMA,
        )

    return partial_agg


def make_multi_transform_stage(
    model, x: str, assigns: dict
) -> Callable[[pa.Table], pa.Table]:
    """One stage appending several assignment columns ({out_col: assign})
    from a single values extraction — fewer operators than chaining
    make_transform_stage per assign."""
    def score(batch: pa.Table) -> pa.Table:
        vals = _to_float_np(batch[x])
        for out_col, assign in assigns.items():
            out = transform_values(model, vals, assign)
            if assign == "interval":
                arr = pa.array(out.tolist(), pa.string())
            else:
                arr = pa.array(out, pa.float64())
            batch = batch.append_column(out_col, arr)
        return batch

    return score


def make_transform_stage(
    model,
    x: str,
    out_col: Optional[str] = None,
    assign: str = "interval",
) -> Callable[[pa.Table], pa.Table]:
    """Stateless scoring stage: one np.searchsorted per batch against the
    broadcast BinningModel (vs the reference's per-value Series.apply,
    MOBPY/binning/mob.py:468). The model is a few-KB value object captured
    in the task closure — serialized once per task, never per batch."""
    name = out_col or f"{x}_{assign}"

    def score(batch: pa.Table) -> pa.Table:
        vals = _to_float_np(batch[x])
        out = transform_values(model, vals, assign)
        if assign == "interval":
            arr = pa.array(out.tolist(), pa.string())
        else:
            arr = pa.array(out, pa.float64())
        return batch.append_column(name, arr)

    return score
