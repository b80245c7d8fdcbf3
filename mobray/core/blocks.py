"""Mergeable sufficient-statistics block.

The key property: ``merge_with`` pools (n, sum, sum2, ymin, ymax)
associatively in O(1) — which is what makes the whole binning algorithm
distributable as a mergeable sketch. The reference keeps two duplicate
implementations (``MOBPY/core/pava.py:26-137`` ``_Block`` and
``MOBPY/core/merge.py:35-176`` ``Block``); the stats formulas are
identical, so this engine keeps one.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict


@dataclass
class Block:
    """Contiguous half-open x-range ``[left, right)`` with pooled y stats.

    Attributes:
        left: left edge (inclusive).
        right: right edge (exclusive).
        n: number of observations.
        sum: sum of y.
        sum2: sum of y**2.
        ymin: min of y.
        ymax: max of y.
    """

    left: float
    right: float
    n: int
    sum: float
    sum2: float
    ymin: float
    ymax: float

    @property
    def mean(self) -> float:
        """Mean of y; 0.0 for an empty block (MOBPY/core/pava.py:55-62)."""
        return self.sum / self.n if self.n > 0 else 0.0

    @property
    def var(self) -> float:
        """Unbiased sample variance via the sum-of-squares formula,
        clamped non-negative (MOBPY/core/pava.py:64-82)."""
        if self.n <= 1:
            return 0.0
        mean_of_sq = self.sum2 / self.n
        sq_of_mean = (self.sum / self.n) ** 2
        return max(0.0, (mean_of_sq - sq_of_mean) * self.n / (self.n - 1))

    @property
    def std(self) -> float:
        return math.sqrt(self.var)

    @property
    def cv(self) -> float:
        """Coefficient of variation; 0.0 when |mean| < 1e-10
        (MOBPY/core/merge.py:106-115)."""
        if abs(self.mean) < 1e-10:
            return 0.0
        return self.std / abs(self.mean)

    def merge_with(self, other: "Block") -> "Block":
        """Pool stats with an adjacent block on the right (O(1), associative).

        MOBPY/core/pava.py:93-117 / MOBPY/core/merge.py:117-149.
        """
        return Block(
            left=self.left,
            right=other.right,
            n=self.n + other.n,
            sum=self.sum + other.sum,
            sum2=self.sum2 + other.sum2,
            ymin=min(self.ymin, other.ymin),
            ymax=max(self.ymax, other.ymax),
        )

    def as_dict(self) -> Dict[str, Any]:
        return {
            "left": float(self.left),
            "right": float(self.right),
            "n": int(self.n),
            "sum": float(self.sum),
            "sum2": float(self.sum2),
            "ymin": float(self.ymin),
            "ymax": float(self.ymax),
            "mean": float(self.mean),
            "var": float(self.var),
            "std": float(self.std),
        }


def block_from_dict(row: Dict[str, Any]) -> Block:
    """Build a Block from a dict; accepts ymin/min and ymax/max aliases
    (MOBPY/core/merge.py:690-728)."""
    return Block(
        left=float(row["left"]),
        right=float(row["right"]),
        n=int(row["n"]),
        sum=float(row["sum"]),
        sum2=float(row["sum2"]),
        ymin=float(row.get("ymin", row.get("min", float("inf")))),
        ymax=float(row.get("ymax", row.get("max", float("-inf")))),
    )


def as_blocks(rows) -> list:
    """Coerce a list of Blocks or dicts to a list of Blocks
    (MOBPY/core/merge.py:731-764)."""
    if not rows:
        return []
    first = rows[0]
    if isinstance(first, Block):
        return list(rows)
    if isinstance(first, dict):
        return [block_from_dict(r) for r in rows]
    raise TypeError(f"Expected list of Block or dict, got list of {type(first).__name__}")
