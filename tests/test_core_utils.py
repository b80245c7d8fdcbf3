"""Single-node pandas helpers (mobray/core/utils.py) — the reference's
core.utils surface (partition/validation/binary detection)."""

import numpy as np
import pandas as pd
import pytest

from mobray.core.utils import (
    Parts,
    ensure_numeric_series,
    is_binary_series,
    partition_df,
    validate_column_exists,
    woe_iv,
)
from mobray.exceptions import DataError, MOBPYError, MobrayError


class TestEnsureNumeric:
    def test_numeric_with_nan_ok(self):
        ensure_numeric_series(pd.Series([1.0, 2.0, np.nan]), "x")

    def test_object_dtype_raises(self):
        with pytest.raises(DataError, match="must be numeric"):
            ensure_numeric_series(pd.Series(["a", "b"]), "x")

    def test_inf_raises(self):
        with pytest.raises(DataError, match="non-finite"):
            ensure_numeric_series(pd.Series([1.0, np.inf]), "x")

    def test_all_null_ok(self):
        ensure_numeric_series(pd.Series([np.nan, np.nan]), "x")


class TestIsBinary:
    def test_flexible(self):
        assert is_binary_series(pd.Series([0, 1, 1, 0, np.nan]))
        assert is_binary_series(pd.Series([True, False, True]))
        assert is_binary_series(pd.Series([1.0, 0.0]))
        assert is_binary_series(pd.Series([1, 1, 1]))  # lone value, flexible
        assert not is_binary_series(pd.Series([0, 1, 2]))
        assert not is_binary_series(pd.Series([0.5, 1.0]))
        assert not is_binary_series(pd.Series([], dtype=float))

    def test_strict(self):
        assert is_binary_series(pd.Series([0, 1]), strict=True)
        assert not is_binary_series(pd.Series([1, 1]), strict=True)


class TestValidateColumns:
    def test_present_and_missing(self):
        df = pd.DataFrame({"a": [1], "b": [2]})
        validate_column_exists(df, "a")
        validate_column_exists(df, ["a", "b"])
        with pytest.raises(DataError, match=r"\['c'\]"):
            validate_column_exists(df, "c")


class TestPartition:
    def test_reference_example(self):
        df = pd.DataFrame(
            {"feature": [1, 2, np.nan, -999, 5], "target": [0, 1, 1, 0, 1]}
        )
        parts = partition_df(df, "feature", exclude_values=[-999])
        assert parts.summary() == {
            "clean": 3, "missing": 1, "excluded": 1, "total": 5
        }
        assert parts.validate()
        assert list(parts.excluded["target"]) == [0]

    def test_no_excludes(self):
        df = pd.DataFrame({"x": [1.0, np.nan]})
        parts = partition_df(df, "x")
        assert parts.summary()["excluded"] == 0 and parts.summary()["clean"] == 1

    def test_missing_column_raises(self):
        with pytest.raises(DataError):
            partition_df(pd.DataFrame({"x": [1]}), "y")

    def test_small_clean_warns(self):
        df = pd.DataFrame({"x": [np.nan] * 150 + [1.0] * 5})
        with pytest.warns(UserWarning, match="unstable"):
            partition_df(df, "x")

    def test_matches_distributed_partition_counts(self):
        """partition_df and the fit's internal partition must agree."""
        from mobray.core.binner import aggregates_from_arrays

        rng = np.random.RandomState(3)
        x = rng.normal(0, 1, 300)
        x[:20] = np.nan
        x[20:30] = -999.0
        y = (rng.uniform(size=300) < 0.5).astype(float)
        parts = partition_df(pd.DataFrame({"x": x, "y": y}), "x", [-999.0])
        agg = aggregates_from_arrays(x, y, exclude_values=[-999.0])
        assert parts.summary()["clean"] == agg.clean_n_rows
        assert parts.summary()["missing"] == agg.missing.n_rows
        assert parts.summary()["excluded"] == sum(
            s.n_rows for s in agg.excluded.values()
        )


class TestCompatAliases:
    def test_mobpy_error_alias(self):
        assert MOBPYError is MobrayError
        assert issubclass(DataError, MOBPYError)

    def test_woe_iv_reexport(self):
        from mobray.core.woe import woe_iv as original

        assert woe_iv is original
