"""MonotonicBinner — the reference-compatible high-level API.

A drop-in orchestrator mirroring MOBPY's ``MonotonicBinner``
(MOBPY/binning/mob.py:51-752): same constructor surface (x, y, sign,
strict, constraints, exclude_values, merge_strategy), same artifacts
(``bins_()``, ``summary_()``, ``transform()``, ``pava_groups_()``,
``get_diagnostics()``) — but the input may be EITHER a pandas DataFrame
(single-node numpy core) or a ``ray.data.Dataset`` (distributed fit;
same allclose results). ``metric`` accepts only 'mean', like the
reference (MOBPY/binning/mob.py:125-129).
"""

from __future__ import annotations

from typing import Any, Iterable, Optional, Union

import numpy as np

from mobray.core.binner import fit_binning, transform_values
from mobray.core.constraints import BinningConstraints
from mobray.core.merge import MergeStrategy, coerce_strategy
from mobray.core.model import BinningModel
from mobray.exceptions import NotFittedError


class MonotonicBinner:
    """End-to-end monotonic optimal binning over pandas or Ray data."""

    def __init__(
        self,
        df: Any,
        x: str,
        y: str,
        *,
        metric: str = "mean",
        sign: str = "auto",
        strict: bool = True,
        constraints: Optional[BinningConstraints] = None,
        exclude_values: Optional[Iterable] = None,
        sort_kind: Optional[str] = "quicksort",
        merge_strategy: Union[MergeStrategy, str] = MergeStrategy.HIGHEST_PVALUE,
    ):
        if metric != "mean":
            raise ValueError(
                f"Only metric='mean' is supported in this version, got '{metric}'."
            )
        # accepted for reference drop-in compatibility, intentionally
        # unused: the reference's sort_kind is a pandas sort-algorithm
        # hint (MOBPY/binning/mob.py:116); the fit here aggregates exact
        # per-distinct-x sufficient stats, so results never depend on the
        # sort algorithm
        self.sort_kind = sort_kind
        self.df = df
        self.x = x
        self.y = y
        self.sign = sign
        self.strict = strict
        self.constraints = constraints or BinningConstraints()
        self.exclude_values = (
            set(exclude_values) if exclude_values is not None else None
        )
        self.merge_strategy = coerce_strategy(merge_strategy)
        self.model_: Optional[BinningModel] = None
        self.resolved_sign_: Optional[str] = None

    def _is_ray_dataset(self) -> bool:
        return type(self.df).__module__.startswith("ray.data")

    def fit(self) -> "MonotonicBinner":
        if self._is_ray_dataset():
            from mobray.pipelines.fit import fit_dataset

            self.model_ = fit_dataset(
                self.df,
                self.x,
                self.y,
                sign=self.sign,
                strict=self.strict,
                constraints=self.constraints,
                exclude_values=self.exclude_values,
                merge_strategy=self.merge_strategy,
            )
        else:
            self.model_ = fit_binning(
                np.asarray(self.df[self.x]),
                np.asarray(self.df[self.y]),
                sign=self.sign,
                strict=self.strict,
                constraints=self.constraints,
                exclude_values=self.exclude_values,
                merge_strategy=self.merge_strategy,
            )
        self.resolved_sign_ = self.model_.sign
        return self

    def _require_fit(self) -> BinningModel:
        if self.model_ is None:
            raise NotFittedError("Call fit() before accessing results")
        return self.model_

    def bins_(self):
        return self._require_fit().bins_df()

    def summary_(self):
        return self._require_fit().summary_df()

    def transform(self, x_values, assign: str = "interval"):
        """Transform values (pandas Series / array -> Series; Ray Dataset
        -> Dataset with an appended column)."""
        model = self._require_fit()
        if type(x_values).__module__.startswith("ray.data"):
            from mobray.pipelines.fit import transform_dataset

            return transform_dataset(x_values, model, self.x, assign=assign)
        import pandas as pd

        arr = transform_values(model, np.asarray(x_values, dtype=float), assign)
        index = x_values.index if isinstance(x_values, pd.Series) else None
        return pd.Series(arr, index=index)

    def get_diagnostics(self) -> dict:
        return dict(self._require_fit().diagnostics)

    def __repr__(self) -> str:
        status = "fitted" if self.model_ is not None else "not fitted"
        n_bins = self.model_.n_bins if self.model_ is not None else "N/A"
        return (
            f"MonotonicBinner(x='{self.x}', y='{self.y}', "
            f"sign='{self.sign}', status={status}, n_bins={n_bins})"
        )
