"""Reference-compatible API surface: MonotonicBinner wrapper, plot-data
builders, config round-trips."""

import numpy as np
import pandas as pd
import pytest

from mobray.binner import MonotonicBinner
from mobray.config import EngineConfig
from mobray.core.constraints import BinningConstraints
from mobray.core.pava import group_stats
from mobray.exceptions import NotFittedError
from mobray import plotdata


def make_df(n=2000, seed=42):
    rng = np.random.RandomState(seed)
    x = np.round(np.linspace(-2, 3, n) + rng.normal(0, 0.15, n), 2)
    p = 1.0 / (1.0 + np.exp(-1.4 * x))
    y = (rng.uniform(size=n) < p).astype(float)
    return pd.DataFrame({"x": x, "y": y})


class TestMonotonicBinner:
    def test_pandas_path(self):
        b = MonotonicBinner(make_df(), "x", "y").fit()
        bins = b.bins_()
        summary = b.summary_()
        assert bins["left"].iloc[0] == -np.inf
        assert "woe" in summary.columns
        assert b.resolved_sign_ == "+"
        labels = b.transform(pd.Series([0.5, np.nan]))
        assert labels.iloc[1] == "Missing"
        woe = b.transform(pd.Series([0.5]), assign="woe")
        assert np.isfinite(woe.iloc[0])

    def test_ray_path_matches_pandas(self, ray_session):
        import ray.data

        df = make_df()
        b_pd = MonotonicBinner(df, "x", "y").fit()
        b_ray = MonotonicBinner(
            ray.data.from_pandas(df).repartition(4), "x", "y"
        ).fit()
        np.testing.assert_allclose(b_pd.model_.lefts, b_ray.model_.lefts, rtol=1e-9)
        assert b_pd.model_.labels == b_ray.model_.labels

    def test_not_fitted_raises(self):
        b = MonotonicBinner(make_df(), "x", "y")
        with pytest.raises(NotFittedError):
            b.bins_()

    def test_metric_guard(self):
        with pytest.raises(ValueError, match="metric"):
            MonotonicBinner(make_df(), "x", "y", metric="median")

    def test_diagnostics(self):
        b = MonotonicBinner(make_df(), "x", "y").fit()
        d = b.get_diagnostics()
        assert d["is_binary"] and d["n_final_bins"] == b.model_.n_bins

    def test_constraints_and_strategy_passthrough(self):
        b = MonotonicBinner(
            make_df(), "x", "y",
            constraints=BinningConstraints(max_bins=3, min_bins=2),
            merge_strategy="Size",
        ).fit()
        assert b.model_.n_bins <= 3


class TestPlotData:
    @pytest.fixture(scope="class")
    def fitted(self):
        df = make_df()
        b = MonotonicBinner(df, "x", "y").fit()
        groups = group_stats(df["x"].to_numpy(), df["y"].to_numpy())
        return groups, b.model_

    def test_gcm(self, fitted):
        groups, _ = fitted
        d = plotdata.gcm_data(groups)
        assert {"cum_count", "cum_sum", "cum_mean", "group_mean"} <= set(d.columns)
        assert d["cum_count"].is_monotonic_increasing

    def test_pava_process(self, fitted):
        groups, model = fitted
        d = plotdata.pava_process_data(groups, model)
        assert len(d["steps"]) == model.n_bins

    def test_woe_bars(self, fitted):
        _, model = fitted
        d = plotdata.plot_woe_bars(model)
        assert len(d) == model.n_bins

    def test_event_rate(self, fitted):
        _, model = fitted
        d = plotdata.plot_event_rate(model)
        assert d["count_pct"].sum() == pytest.approx(100.0)

    def test_stability(self, fitted):
        _, model = fitted
        df2 = make_df(seed=7)
        m2 = MonotonicBinner(df2, "x", "y").fit().model_
        d = plotdata.binning_stability_data(model, m2)
        assert "psi" in d.columns
        assert np.isfinite(d["psi"]).all()

    def test_boundaries_and_distribution(self, fitted):
        _, model = fitted
        b = plotdata.bin_boundaries_data(model)
        assert len(b) == model.n_bins - 1
        s = plotdata.sample_distribution_data(model)
        assert "count_pct" in s.columns


class TestConfig:
    def test_json_roundtrip(self):
        c = EngineConfig(epsilon=1e-10, num_buckets=16)
        c2 = EngineConfig.from_json(c.to_json())
        assert c2 == c

    def test_env_override(self, monkeypatch):
        monkeypatch.setenv("MOBRAY_EPSILON", "1e-8")
        monkeypatch.setenv("MOBRAY_NUM_BUCKETS", "7")
        c = EngineConfig.from_env()
        assert c.epsilon == 1e-8 and c.num_buckets == 7


class TestReferenceCompatShims:
    def test_logging_utils_surface(self, capsys):
        import logging

        from mobray.logging_utils import (
            BinningProgressLogger,
            get_logger,
            set_verbosity,
        )

        log = get_logger("mobray.test_shim")
        assert get_logger("mobray.test_shim") is log  # no handler stacking
        assert len(log.handlers) == 1
        set_verbosity("DEBUG")
        assert logging.getLogger("mobray.test_shim").level == logging.DEBUG
        with BinningProgressLogger("unit", logger=log) as p:
            p.update("step one")
            p.update("step two")
        assert p.steps_completed == 2
        set_verbosity("WARNING")
        import pytest as _pytest

        with _pytest.raises(ValueError, match="logging level"):
            set_verbosity("NOPE")

    def test_plot_package_aliases(self):
        # the reference exposes plots under plot/, plot/mob_plot.py,
        # plot/csd_gcm.py and the legacy plot/MOB_PLOT.py; all four
        # module paths must import and agree on the same callables
        import mobray.plot as p
        import mobray.plot.MOB_PLOT as legacy
        import mobray.plot.csd_gcm as csd
        import mobray.plot.mob_plot as mp
        import mobray.plotdata as data

        assert p.plot_woe_bars is mp.plot_woe_bars is data.plot_woe_bars
        assert legacy.plot_woe_bars is mp.plot_woe_bars
        assert p.plot_gcm is csd.plot_gcm is data.plot_gcm
        assert set(p.__all__) == set(mp.__all__) | set(csd.__all__)
        assert set(legacy.__all__) == set(mp.__all__)

    def test_binning_package_aliases(self):
        # the reference's own tests import from MOBPY.binning.mob
        # (reference tests/test_mob.py:13); the alias package must
        # resolve to the real implementations
        from mobray import MonotonicBinner as top
        from mobray.binning import MonotonicBinner as pkg
        from mobray.binning.mob import MonotonicBinner as mod
        from mobray.binning.mob import _format_edge
        from mobray.core.format import format_edge

        assert top is pkg is mod
        assert _format_edge is format_edge
