"""Pool-Adjacent-Violators on grouped sufficient statistics.

The reference (MOBPY/core/pava.py:223-439) sorts raw rows and groups by
x before pooling; the only input PAVA actually needs is the grouped
table (one row per distinct x: count, sum, sum2, ymin, ymax). In the
distributed engine that table comes out of a Ray Data
``groupby(x).aggregate(...)``; here the driver-side reduce is pure
numpy/stdlib and identical to the single-node oracle path.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from mobray.config import EPSILON
from mobray.core.blocks import Block
from mobray.core.stats import pearson_corr
from mobray.exceptions import DataError


@dataclass
class GroupsTable:
    """Grouped per-distinct-x sufficient statistics, sorted ascending by x.

    Mirrors the reference's ``groups_`` DataFrame incl. cumulative columns
    (MOBPY/core/pava.py:271-293).
    """

    x: np.ndarray        # float64, strictly increasing
    count: np.ndarray    # int64
    sum: np.ndarray      # float64
    sum2: np.ndarray     # float64
    ymin: np.ndarray     # float64
    ymax: np.ndarray     # float64

    def __post_init__(self) -> None:
        n = len(self.x)
        for name in ("count", "sum", "sum2", "ymin", "ymax"):
            if len(getattr(self, name)) != n:
                raise DataError(f"GroupsTable column '{name}' length mismatch")
        if n > 1 and not np.all(np.diff(self.x) > 0):
            raise DataError("GroupsTable.x must be strictly increasing")

    def __len__(self) -> int:
        return len(self.x)

    @property
    def cum_count(self) -> np.ndarray:
        return np.cumsum(self.count).astype(float)

    @property
    def cum_sum(self) -> np.ndarray:
        return np.cumsum(self.sum)

    @property
    def cum_mean(self) -> np.ndarray:
        return self.cum_sum / self.cum_count

    @property
    def group_mean(self) -> np.ndarray:
        return self.sum / self.count

    def to_pandas(self):
        import pandas as pd

        return pd.DataFrame(
            {
                "x": self.x,
                "count": self.count,
                "sum": self.sum,
                "sum2": self.sum2,
                "ymin": self.ymin,
                "ymax": self.ymax,
                "cum_count": self.cum_count,
                "cum_sum": self.cum_sum,
                "cum_mean": self.cum_mean,
                "group_mean": self.group_mean,
            }
        )


def group_stats(x: np.ndarray, y: np.ndarray) -> GroupsTable:
    """Grouped sufficient stats from raw (x, y) arrays, vectorized.

    Equivalent to the reference's sort + groupby loop
    (MOBPY/core/pava.py:259-284) but via np.unique + np.add.reduceat.
    Rows where either x or y is NaN are dropped (MOBPY/core/pava.py:251-255).
    """
    x = np.asarray(x, dtype=float)
    y = np.asarray(y, dtype=float)
    mask = ~(np.isnan(x) | np.isnan(y))
    x = x[mask]
    y = y[mask]
    if len(x) == 0:
        raise DataError("No rows with non-missing x and y for PAVA")

    order = np.argsort(x, kind="stable")
    xs = x[order]
    ys = y[order]
    uniq, starts = np.unique(xs, return_index=True)
    counts = np.diff(np.append(starts, len(xs)))
    sums = np.add.reduceat(ys, starts)
    sum2s = np.add.reduceat(ys * ys, starts)
    ymins = np.minimum.reduceat(ys, starts)
    ymaxs = np.maximum.reduceat(ys, starts)
    return GroupsTable(
        x=uniq.astype(float),
        count=counts.astype(np.int64),
        sum=sums.astype(float),
        sum2=sum2s.astype(float),
        ymin=ymins.astype(float),
        ymax=ymaxs.astype(float),
    )


def infer_sign(groups: GroupsTable, sign: str = "auto") -> str:
    """Resolve the monotone direction.

    '+' / '-' pass through; 'auto' infers from the Pearson correlation of
    distinct-x vs per-group mean, with corr >= 0 -> '+'
    (MOBPY/core/pava.py:296-310).
    """
    if sign in ("+", "-"):
        return sign
    corr = pearson_corr(groups.x, groups.group_mean)
    return "+" if corr >= 0 else "-"


def build_blocks(groups: GroupsTable) -> List[Block]:
    """One block per distinct x; right edge = next x; outer edges forced
    to -inf/+inf (MOBPY/core/pava.py:314-339)."""
    n = len(groups)
    blocks: List[Block] = []
    for i in range(n):
        right = groups.x[i + 1] if i < n - 1 else groups.x[i]
        blocks.append(
            Block(
                left=float(groups.x[i]),
                right=float(right),
                n=int(groups.count[i]),
                sum=float(groups.sum[i]),
                sum2=float(groups.sum2[i]),
                ymin=float(groups.ymin[i]),
                ymax=float(groups.ymax[i]),
            )
        )
    if blocks:
        blocks[0].left = float("-inf")
        blocks[-1].right = float("inf")
    return blocks


def apply_pava(blocks: List[Block], sign: str, epsilon: float = EPSILON) -> List[Block]:
    """Stack-based PAVA pooling, O(n).

    While the top two stack blocks violate monotonicity
    ('+': b2.mean < b1.mean - eps; '-' mirrored), pop and pool
    (MOBPY/core/pava.py:358-406).
    """
    stack: List[Block] = []
    for block in blocks:
        stack.append(block)
        while len(stack) >= 2:
            b2 = stack[-1]
            b1 = stack[-2]
            if sign == "+":
                violates = b2.mean < b1.mean - epsilon
            else:
                violates = b2.mean > b1.mean + epsilon
            if violates:
                merged = b1.merge_with(b2)
                stack.pop()
                stack.pop()
                stack.append(merged)
            else:
                break
    return stack


def enforce_strict(blocks: List[Block], sign: str, epsilon: float = EPSILON) -> List[Block]:
    """Merge adjacent blocks whose means are equal within epsilon, removing
    plateaus (MOBPY/core/pava.py:408-439). ``sign`` is unused by the
    reference's implementation too; kept for signature parity."""
    if not blocks:
        return blocks
    result: List[Block] = [blocks[0]]
    for block in blocks[1:]:
        last = result[-1]
        if abs(block.mean - last.mean) <= epsilon:
            result[-1] = last.merge_with(block)
        else:
            result.append(block)
    return result


def validate_monotonicity(
    blocks: List[Block], sign: str, tolerance: float = 1e-10
) -> bool:
    """Non-decreasing ('+') / non-increasing ('-') means within tolerance
    (MOBPY/core/pava.py:471-508, MOBPY/core/merge.py:769-811)."""
    if len(blocks) <= 1:
        return True
    means = [b.mean for b in blocks]
    for i in range(1, len(means)):
        if sign == "+":
            if means[i] < means[i - 1] - tolerance:
                return False
        else:
            if means[i] > means[i - 1] + tolerance:
                return False
    return True


class PAVA:
    """Class-style API mirroring the reference's ``PAVA`` composition
    surface (MOBPY/core/pava.py:144-356, used directly per
    MOBPY/core/__init__.py:29-43): construct with (df, x, y, sign,
    strict), ``fit()``, then ``export_blocks()`` feeds
    ``merge_adjacent``. ``df`` may be a pandas DataFrame or any mapping
    of column name -> array."""

    VALID_SORT_KINDS = {None, "quicksort", "mergesort", "heapsort", "stable"}

    def __init__(
        self,
        *,
        df,
        x: str,
        y: str,
        metric: str = "mean",
        sign: str = "auto",
        strict: bool = True,
        sort_kind: Optional[str] = "quicksort",
    ):
        if metric != "mean":
            raise ValueError(
                f"Only metric='mean' is supported in this version, got '{metric}'."
            )
        if sort_kind not in self.VALID_SORT_KINDS:
            raise ValueError(
                f"sort_kind must be one of {self.VALID_SORT_KINDS}, got {sort_kind!r}"
            )
        self.df = df
        self.x = x
        self.y = y
        self.sign = sign
        self.strict = strict
        self.blocks_: List[Block] = []
        self.groups_: Optional[GroupsTable] = None
        self.resolved_sign_: Optional[str] = None

    def fit(self) -> "PAVA":
        try:
            cols = set(self.df.columns)
        except AttributeError:
            cols = set(self.df.keys())
        missing = [c for c in (self.x, self.y) if c not in cols]
        if missing:
            raise DataError(f"Missing columns in DataFrame: {missing}")
        self.groups_ = group_stats(
            np.asarray(self.df[self.x], dtype=float),
            np.asarray(self.df[self.y], dtype=float),
        )
        self.blocks_, self.resolved_sign_ = run_pava(
            self.groups_, sign=self.sign, strict=self.strict
        )
        return self

    def export_blocks(self, as_dict: bool = True):
        """Dict or legacy tuple format (MOBPY/core/pava.py:441-469)."""
        if not self.blocks_:
            raise DataError("No blocks available. Call fit() first.")
        if as_dict:
            return [b.as_dict() for b in self.blocks_]
        return [
            (b.left, b.right, b.n, b.sum, b.sum2, b.ymin, b.ymax)
            for b in self.blocks_
        ]

    def validate_monotonicity(self, tolerance: float = 1e-10) -> bool:
        return validate_monotonicity(self.blocks_, self.resolved_sign_ or "+", tolerance)


def run_pava(
    groups: GroupsTable,
    sign: str = "auto",
    strict: bool = True,
    epsilon: float = EPSILON,
) -> tuple:
    """Full PAVA pass on a grouped table.

    Returns (blocks, resolved_sign). Mirrors MOBPY/core/pava.py:223-356
    fit(): infer sign -> init blocks -> pool -> optional strict pass.
    """
    resolved = infer_sign(groups, sign)
    blocks = build_blocks(groups)
    blocks = apply_pava(blocks, resolved, epsilon)
    if strict and len(blocks) > 1:
        blocks = enforce_strict(blocks, resolved, epsilon)
    return blocks, resolved
