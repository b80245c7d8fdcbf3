"""Binning constraints with fraction->absolute resolution.

Semantics match MOBPY/core/constraints.py:17-256: fractional values in
(0, 1] are resolved against the clean-partition totals at fit time;
defaults max_bins=6, min_bins=4, initial_pvalue=0.4, maximize_bins=True.
"""

from __future__ import annotations

import warnings
from dataclasses import dataclass, field
from typing import Optional

from mobray.exceptions import BinningWarning, ConstraintError


@dataclass
class BinningConstraints:
    """User constraints on the binning process.

    Args:
        max_bins: maximum number of bins (>= 1).
        min_bins: minimum number of bins (>= 1).
        max_samples: per-bin sample cap; (0,1] = fraction of clean rows,
            >1 = absolute, None = unlimited.
        min_samples: per-bin sample floor; same fraction/absolute rule.
        min_positives: per-bin positives floor (binary targets); fraction
            of total positives or absolute.
        initial_pvalue: merge-score threshold in (0, 1].
        maximize_bins: True = enforce <= max_bins (default); False =
            prefer >= min_bins, merging only on high scores.
    """

    max_bins: int = 6
    min_bins: int = 4
    max_samples: Optional[float] = None
    min_samples: Optional[float] = None
    min_positives: Optional[float] = None
    initial_pvalue: float = 0.4
    maximize_bins: bool = True

    abs_max_samples: Optional[int] = field(default=None, init=False)
    abs_min_samples: int = field(default=0, init=False)
    abs_min_positives: int = field(default=0, init=False)
    _resolved: bool = field(default=False, init=False)

    def __post_init__(self) -> None:
        if not isinstance(self.max_bins, int) or self.max_bins < 1:
            raise ConstraintError(f"invalid max_bins={self.max_bins!r}: need an int of at least 1")
        if not isinstance(self.min_bins, int) or self.min_bins < 1:
            raise ConstraintError(f"invalid min_bins={self.min_bins!r}: need an int of at least 1")
        if self.maximize_bins and self.min_bins > self.max_bins:
            raise ConstraintError(
                f"with maximize_bins=True, min_bins={self.min_bins} may not be "
                f"larger than max_bins={self.max_bins}"
            )
        if not 0 < self.initial_pvalue <= 1:
            raise ConstraintError(
                f"invalid initial_pvalue={self.initial_pvalue!r}: need a value in (0, 1]"
            )
        if self.max_samples is not None and self.max_samples <= 0:
            raise ConstraintError(f"invalid max_samples={self.max_samples!r}: need a positive value")
        if self.min_samples is not None and self.min_samples < 0:
            raise ConstraintError(f"invalid min_samples={self.min_samples!r}: need a non-negative value")
        if self.min_positives is not None and self.min_positives < 0:
            raise ConstraintError(
                f"invalid min_positives={self.min_positives!r}: need a non-negative value"
            )

    def resolve(self, *, total_n: int, total_pos: int = 0) -> None:
        """Resolve fractional constraints against actual totals
        (MOBPY/core/constraints.py:118-208)."""
        if total_n < 0:
            raise ValueError(f"negative total_n ({total_n}) makes no sense here")
        if total_pos < 0:
            raise ValueError(f"negative total_pos ({total_pos}) makes no sense here")

        if self.max_samples is None:
            self.abs_max_samples = None
        else:
            if 0 < self.max_samples <= 1:
                self.abs_max_samples = max(1, int(self.max_samples * total_n))
            else:
                self.abs_max_samples = int(self.max_samples)
            if total_n > 0:
                self.abs_max_samples = min(self.abs_max_samples, total_n)

        if self.min_samples is None:
            self.abs_min_samples = 0
        else:
            if 0 < self.min_samples <= 1:
                self.abs_min_samples = max(0, int(self.min_samples * total_n))
            else:
                self.abs_min_samples = max(0, int(self.min_samples))
            if total_n > 0:
                self.abs_min_samples = min(self.abs_min_samples, total_n)

        if self.abs_max_samples is not None and self.abs_min_samples > self.abs_max_samples:
            raise ConstraintError(
                f"resolved min_samples={self.abs_min_samples} ended up above "
                f"resolved max_samples={self.abs_max_samples}"
            )

        if self.min_positives is None:
            self.abs_min_positives = 0
        else:
            if 0 < self.min_positives <= 1:
                self.abs_min_positives = max(0, int(self.min_positives * total_pos))
            else:
                self.abs_min_positives = max(0, int(self.min_positives))
            if total_pos > 0:
                self.abs_min_positives = min(self.abs_min_positives, total_pos)

        if self.abs_min_samples > 0 and total_n > 0:
            max_possible = total_n // self.abs_min_samples
            if max_possible < self.min_bins:
                warnings.warn(
                    f"min_samples={self.abs_min_samples} caps the bin count at "
                    f"{max_possible}, below min_bins={self.min_bins}; expect "
                    f"unsatisfied constraints.",
                    BinningWarning,
                )

        self._resolved = True

    def is_resolved(self) -> bool:
        return self._resolved

    def copy(self) -> "BinningConstraints":
        """Unresolved deep copy (MOBPY/core/constraints.py:218-235)."""
        return BinningConstraints(
            max_bins=self.max_bins,
            min_bins=self.min_bins,
            max_samples=self.max_samples,
            min_samples=self.min_samples,
            min_positives=self.min_positives,
            initial_pvalue=self.initial_pvalue,
            maximize_bins=self.maximize_bins,
        )
