"""Single-node pandas helpers mirroring the reference's ``core.utils``
surface (MOBPY/core/utils.py:23-385): input validation, binary-target
detection, and the clean/missing/excluded partition.

The distributed fit performs the same partition vectorized inside
map_batches (stages/binning.py) and never materializes these frames;
this module is the pandas-level equivalent a reference user imports
directly (the reference's own tests import from here), plus the
``woe_iv`` re-export that the reference co-locates in utils.
"""

from __future__ import annotations

import warnings
from dataclasses import dataclass
from typing import Dict, Iterable, List, Optional, Union

import numpy as np
import pandas as pd

from mobray.core.woe import woe_iv  # noqa: F401  (reference co-locates it here)
from mobray.exceptions import DataError

__all__ = [
    "ensure_numeric_series",
    "is_binary_series",
    "validate_column_exists",
    "Parts",
    "partition_df",
    "woe_iv",
]


def ensure_numeric_series(s: pd.Series, name: str) -> None:
    """Raise DataError unless ``s`` is numeric with only finite (or NaN)
    values. NaN is fine — it means missing, handled by the partition."""
    if not pd.api.types.is_numeric_dtype(s):
        sample = s.dropna().head(3).tolist()
        raise DataError(
            f"Column '{name}' must be numeric, but got dtype={s.dtype}. "
            f"Sample values: {sample}"
        )
    non_null = s.dropna()
    if non_null.empty:
        return
    finite = np.isfinite(non_null.to_numpy(dtype=float))
    if not finite.all():
        n_bad = int((~finite).sum())
        where = non_null.index[~finite].tolist()[:5]
        raise DataError(
            f"Column '{name}' contains {n_bad} non-finite values "
            f"(inf or -inf) at indices {where}..."
        )


def is_binary_series(s: pd.Series, strict: bool = False) -> bool:
    """True when the non-null values form a binary target.

    ``strict``: exactly the two values {0, 1}. Otherwise: at most two
    distinct integer-valued entries from {0, 1} (a lone 0 or lone 1
    counts, matching the reference's flexible mode)."""
    clean = s.dropna()
    if clean.empty:
        return False
    uniq = pd.Series(clean.unique())
    if strict:
        return len(uniq) == 2 and set(uniq.tolist()) == {0, 1}
    if len(uniq) > 2:
        return False
    try:
        as_int = uniq.astype(int)
    except (ValueError, TypeError):
        return False
    if not np.array_equal(uniq.to_numpy(dtype=float), as_int.to_numpy(dtype=float)):
        return False
    return set(as_int.tolist()) == {0, 1} or len(uniq) == 1


def validate_column_exists(df: pd.DataFrame, columns: Union[str, List[str]]) -> None:
    """Raise DataError naming any missing column (and a preview of what
    IS available)."""
    cols = [columns] if isinstance(columns, str) else list(columns)
    missing = [c for c in cols if c not in df.columns]
    if missing:
        preview = list(df.columns)[:10]
        raise DataError(
            f"Missing columns in DataFrame: {missing}. "
            f"Available columns: {preview}{'...' if len(df.columns) > 10 else ''}"
        )


@dataclass(frozen=True)
class Parts:
    """The three partitions of a frame by its feature column: clean
    (valid x), missing (x is null), excluded (x in the user's exclude
    set). Original index preserved in each."""

    clean: pd.DataFrame
    missing: pd.DataFrame
    excluded: pd.DataFrame

    def summary(self) -> Dict[str, int]:
        return {
            "clean": len(self.clean),
            "missing": len(self.missing),
            "excluded": len(self.excluded),
            "total": len(self.clean) + len(self.missing) + len(self.excluded),
        }

    def validate(self) -> bool:
        """True when no row index appears in more than one partition."""
        a, b, c = (
            set(self.clean.index),
            set(self.missing.index),
            set(self.excluded.index),
        )
        return not (a & b) and not (a & c) and not (b & c)


def partition_df(
    df: pd.DataFrame,
    x: str,
    exclude_values: Optional[Iterable] = None,
    validate: bool = True,
) -> Parts:
    """Split ``df`` into Parts on column ``x``: null -> missing, member
    of ``exclude_values`` -> excluded, everything else -> clean.

    Same semantics the distributed fit applies per batch
    (stages/binning.py partition tags); exact value match via isin."""
    if validate:
        validate_column_exists(df, x)
    null_mask = df[x].isna()
    exclude_list = list(exclude_values) if exclude_values is not None else []
    if exclude_list:
        excl_mask = ~null_mask & df[x].isin(exclude_list)
    else:
        excl_mask = pd.Series(False, index=df.index)
    parts = Parts(
        clean=df[~null_mask & ~excl_mask],
        missing=df[null_mask],
        excluded=df[excl_mask],
    )
    s = parts.summary()
    if s["clean"] < 100 and s["total"] > 100:
        warnings.warn(
            f"Clean partition has only {s['clean']} rows out of "
            f"{s['total']}. This may lead to unstable binning results.",
            UserWarning,
        )
    return parts
