"""End-to-end single-node fit/transform semantics
(reference: MOBPY/binning/mob.py, tests/test_mob.py)."""

import numpy as np
import pytest

from mobray.core.binner import (
    aggregates_from_arrays,
    detect_binary,
    fit_binning,
    transform_values,
)
from mobray.core.constraints import BinningConstraints
from mobray.core.format import format_edge, interval_label
from mobray.exceptions import DataError


def logistic_data(n=500, seed=42):
    """Reference synthetic credit fixture (tests/test_mob.py:25-40)."""
    rng = np.random.RandomState(seed)
    x = np.linspace(-2, 3, n) + rng.normal(0, 0.15, n)
    p = 1.0 / (1.0 + np.exp(-1.4 * x))
    y = (rng.uniform(size=n) < p).astype(float)
    return x, y


def expdecay_data(n=500, seed=123):
    """Decreasing-sign fixture (reference tests/test_pava.py:514-530)."""
    rng = np.random.RandomState(seed)
    age = rng.uniform(18, 70, n)
    p = 0.3 * np.exp(-age / 30) + 0.05
    default = (rng.uniform(size=n) < p).astype(float)
    return age, default


class TestFormatEdge:
    def test_infinities(self):
        assert format_edge(float("-inf")) == "-inf"
        assert format_edge(float("inf")) == "+inf"

    def test_scientific(self):
        assert format_edge(0.001) == "1.00e-03"
        assert format_edge(123456.0) == "1.23e+05"

    def test_sig_figs(self):
        assert format_edge(9.0) == "9"
        assert format_edge(12.3456) == "12.35"

    def test_interval_label(self):
        assert interval_label(float("-inf"), 9.0) == "(-inf, 9)"
        assert interval_label(9.0, 16.0) == "[9, 16)"
        assert interval_label(16.0, float("inf")) == "[16, +inf)"


class TestDetectBinary:
    def test_01(self):
        assert detect_binary([0.0, 1.0])
        assert detect_binary([0.0])  # single integer value: reference quirk
        assert detect_binary([7.0])

    def test_not_binary(self):
        assert not detect_binary([0.0, 1.0, 2.0])
        assert not detect_binary([0.5, 1.0])
        assert not detect_binary([1.0, 2.0])   # reference: set != {0,1} -> False
        assert not detect_binary([])


class TestAggregates:
    def test_partition_counts(self):
        x = np.array([1.0, 2.0, np.nan, -999.0, 5.0])
        y = np.array([0, 1, 1, 0, 1], dtype=float)
        agg = aggregates_from_arrays(x, y, exclude_values=[-999])
        assert agg.clean_n_rows == 3
        assert agg.missing.n_rows == 1
        assert agg.excluded[-999.0].n_rows == 1

    def test_all_missing_raises(self):
        with pytest.raises(DataError):
            aggregates_from_arrays(np.array([np.nan, np.nan]), np.array([1.0, 2.0]))

    def test_inf_rejected(self):
        with pytest.raises(DataError):
            aggregates_from_arrays(np.array([1.0, np.inf]), np.array([1.0, 2.0]))
        with pytest.raises(DataError):
            aggregates_from_arrays(np.array([1.0, 2.0]), np.array([1.0, np.inf]))


class TestFitBinary:
    def test_basic_fit(self):
        x, y = logistic_data()
        model = fit_binning(x, y)
        assert model.is_binary
        assert model.sign == "+"
        assert 1 <= model.n_bins <= 6
        assert model.lefts[0] == -np.inf
        assert model.rights[-1] == np.inf
        # interior edges stitched: right[i] == left[i+1]
        assert np.all(model.rights[:-1] == model.lefts[1:])
        # monotone non-decreasing event rate
        assert np.all(np.diff(model.means) >= -1e-10)
        # counts conserve rows
        assert model.counts.sum() == 500

    def test_summary_woe_iv(self):
        x, y = logistic_data()
        model = fit_binning(x, y)
        s = model.summary_df()
        assert list(s.columns) == [
            "bucket", "count", "count_pct", "sum", "mean", "std", "min", "max", "woe", "iv",
        ]
        assert s["count_pct"].sum() == pytest.approx(100.0)
        assert model.total_iv() > 0
        # monotone event rate implies monotone WoE ordering for '+'
        woe = model.woe
        assert np.all(np.diff(woe) <= 1e-12) or np.all(np.diff(woe) >= -1e-12)

    def test_decreasing_sign_inferred(self):
        age, default = expdecay_data()
        model = fit_binning(age, default)
        assert model.sign == "-"
        assert np.all(np.diff(model.means) <= 1e-10)

    def test_constraints_respected(self):
        x, y = logistic_data()
        c = BinningConstraints(max_bins=3, min_bins=2, min_samples=0.05)
        model = fit_binning(x, y, constraints=c)
        assert model.n_bins <= 3
        assert np.all(model.counts >= int(0.05 * 500))

    def test_missing_excluded_rows(self):
        x, y = logistic_data()
        x = x.copy()
        x[:10] = np.nan
        x[10:20] = -999.0
        model = fit_binning(x, y, exclude_values=[-999])
        s = model.summary_df()
        buckets = list(s["bucket"])
        assert "Missing" in buckets
        assert "Excluded:-999.0" in buckets
        missing_row = s[s["bucket"] == "Missing"].iloc[0]
        assert missing_row["count"] == 10
        assert np.isnan(missing_row["woe"])
        assert missing_row["iv"] == 0.0
        assert s["count"].sum() == 500

    def test_continuous_target_no_woe(self):
        rng = np.random.RandomState(7)
        x = np.repeat(np.arange(20.0), 25)
        y = x * 2 + rng.normal(0, 1, 500)
        model = fit_binning(x, y)
        assert not model.is_binary
        s = model.summary_df()
        assert "woe" not in s.columns

    def test_idempotent(self):
        x, y = logistic_data()
        m1 = fit_binning(x, y)
        m2 = fit_binning(x, y)
        assert np.array_equal(m1.lefts, m2.lefts)
        assert m1.labels == m2.labels

    def test_merge_strategies_all_run(self):
        x, y = logistic_data()
        for strat in ("highest_pvalue", "smallest_loss", "balanced_size"):
            model = fit_binning(x, y, merge_strategy=strat)
            assert 1 <= model.n_bins <= 6


class TestTransform:
    @pytest.fixture(scope="class")
    def model(self):
        x, y = logistic_data()
        x = x.copy()
        x[:5] = np.nan
        x[5:10] = -999.0
        return fit_binning(x, y, exclude_values=[-999])

    def test_interval(self, model):
        out = transform_values(model, np.array([np.nan, -999.0, 0.5]), "interval")
        assert out[0] == "Missing"
        assert out[1] == "Excluded:-999.0"
        assert out[2].startswith("[") or out[2].startswith("(")
        assert out[2] in model.labels

    def test_left_right(self, model):
        vals = np.array([-100.0, 0.5, 100.0])
        lefts = transform_values(model, vals, "left")
        rights = transform_values(model, vals, "right")
        assert lefts[0] == -np.inf
        assert rights[2] == np.inf
        assert np.all(lefts[1] <= vals[1]) and vals[1] < rights[1]

    def test_woe(self, model):
        vals = np.array([np.nan, -999.0, 0.5])
        woe = transform_values(model, vals, "woe")
        assert np.isnan(woe[0]) and np.isnan(woe[1])
        assert np.isfinite(woe[2])

    def test_every_value_assigned(self, model):
        vals = np.linspace(-10, 10, 1001)
        out = transform_values(model, vals, "interval")
        assert all(o in model.labels for o in out)

    def test_boundary_values(self, model):
        # values exactly on interior edges fall into the RIGHT bin [edge, ...)
        for edge in model.lefts[1:]:
            lab = transform_values(model, np.array([edge]), "interval")[0]
            idx = model.labels.index(lab)
            assert model.lefts[idx] == edge

    def test_unobserved_exclude_value_still_maps(self):
        """The reference checks the USER-SUPPLIED exclude set at
        transform (MOBPY/binning/mob.py:430-431), so a requested value
        that never occurred during fit must still map to Excluded — the
        model carries the request, not just the observed subset."""
        x, y = logistic_data()
        model = fit_binning(x, y, exclude_values=[-999.0, -1.5])
        assert model.exclude_values == frozenset({-999.0, -1.5})
        out = transform_values(model, np.array([-999.0, -1.5, 0.5]))
        assert out[0] == "Excluded:-999.0"
        assert out[1] == "Excluded:-1.5"
        woe = transform_values(model, np.array([-999.0]), "woe")
        assert np.isnan(woe[0])

    def test_requested_exclude_survives_sketch_roundtrip_and_merge(self):
        from mobray.core.binner import (
            aggregates_from_arrays,
            aggregates_from_json,
            aggregates_to_json,
            merge_fit_aggregates,
        )

        x, y = logistic_data()
        a = aggregates_from_arrays(x[:200], y[:200], exclude_values=[-999.0])
        b = aggregates_from_arrays(x[200:], y[200:], exclude_values=[-7.0])
        rt = aggregates_from_json(aggregates_to_json(a))
        assert rt.requested_exclude == (-999.0,)
        merged = merge_fit_aggregates(a, b)
        assert merged.requested_exclude == (-999.0, -7.0)

    def test_woe_requires_binary(self):
        rng = np.random.RandomState(7)
        x = np.repeat(np.arange(20.0), 25)
        y = x * 2 + rng.normal(0, 1, 500)
        m = fit_binning(x, y)
        with pytest.raises(ValueError, match="binary"):
            transform_values(m, np.array([1.0]), "woe")


class TestModelSerde:
    def test_json_roundtrip(self):
        x, y = logistic_data()
        x = x.copy()
        x[:5] = np.nan
        model = fit_binning(x, y)
        from mobray.core.model import BinningModel

        m2 = BinningModel.from_json(model.to_json())
        assert np.array_equal(m2.lefts, model.lefts)
        assert np.array_equal(m2.rights, model.rights)
        assert m2.labels == model.labels
        assert np.allclose(m2.woe, model.woe)
        vals = np.linspace(-5, 5, 100)
        assert np.array_equal(
            transform_values(m2, vals, "interval"),
            transform_values(model, vals, "interval"),
        )
