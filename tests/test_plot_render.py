"""Plot-layer renderers: every reference plot function has a mobray
counterpart. matplotlib is absent in this sandbox, so the render paths
are executed against an injected mock module — this catches NameErrors /
bad call shapes in the matplotlib code without the real library, and the
data outputs are asserted for real."""

from __future__ import annotations

import sys
from unittest import mock

import numpy as np
import pandas as pd
import pytest

from mobray.core.binner import fit_binning
from mobray.core.pava import group_stats


@pytest.fixture()
def fitted():
    rng = np.random.RandomState(5)
    x = np.repeat(np.arange(20.0), 50)
    p = 1 / (1 + np.exp(-(x - 10) / 3))
    y = (rng.rand(len(x)) < p).astype(float)
    model = fit_binning(x, y)
    groups = group_stats(x, y)
    return groups, model


@pytest.fixture()
def mock_mpl():
    """Inject a mock matplotlib so _maybe_plot executes the renderers."""
    mpl = mock.MagicMock(name="matplotlib")
    plt = mock.MagicMock(name="pyplot")
    mpl.pyplot = plt
    with mock.patch.dict(
        sys.modules,
        {
            "matplotlib": mpl,
            "matplotlib.pyplot": plt,
            "matplotlib.animation": mpl.animation,
        },
    ):
        yield plt


class TestRenderers:
    def test_plot_gcm(self, fitted, mock_mpl):
        from mobray.plotdata import plot_gcm

        groups, model = fitted
        data = plot_gcm(groups, model)
        assert len(data["groups"]) == 20
        assert len(data["steps"]) == model.n_bins
        assert mock_mpl.gca.called

    def test_plot_pava_process(self, fitted, mock_mpl):
        from mobray.plotdata import plot_pava_process

        groups, model = fitted
        data = plot_pava_process(groups, model)
        assert len(data["gcm"]) == 20
        assert len(data["anchors"]) == model.n_bins - 1

    def test_plot_pava_animation_frames(self, fitted, mock_mpl):
        from mobray.plotdata import plot_pava_animation

        groups, model = fitted
        out = plot_pava_animation(groups, sign=model.sign)
        frames = out["frames"]
        assert len(frames) == 20  # one frame per pushed group
        # final frame is monotone in mean
        means = frames[-1]["mean"].to_numpy()
        assert (np.diff(means) >= -1e-12).all()
        # stack never grows beyond the group count
        assert all(len(f) <= 20 for f in frames)

    def test_animation_frames_match_model(self, fitted):
        """Final animation frame = the PAVA blocks before the merge
        phase: pooled means must be monotone and cover all samples."""
        from mobray.plotdata import pava_animation_frames

        groups, model = fitted
        frames = pava_animation_frames(groups, model.sign)
        last = frames[-1]
        assert last["n"].sum() == groups.count.sum()

    def test_plot_pava_comparison(self, fitted, mock_mpl):
        from mobray.plotdata import plot_pava_comparison

        groups, model = fitted
        data = plot_pava_comparison(groups, model, title="cmp")
        assert mock_mpl.figure.called
        assert "steps" in data

    def test_plot_bin_statistics(self, fitted, mock_mpl):
        from mobray.plotdata import plot_bin_statistics

        _, model = fitted
        data = plot_bin_statistics(model, title="stats")
        assert len(data["stats"]) == model.n_bins
        assert mock_mpl.figure.called

    def test_plot_sample_distribution(self, fitted, mock_mpl):
        from mobray.plotdata import plot_sample_distribution

        _, model = fitted
        data = plot_sample_distribution(model)
        assert data["cum_pct"].iloc[-1] == pytest.approx(100.0)

    def test_plot_bin_boundaries(self, fitted, mock_mpl):
        from mobray.plotdata import plot_bin_boundaries

        groups, model = fitted
        x_vals = np.repeat(np.arange(20.0), 50)
        data = plot_bin_boundaries(model, x_values=x_vals)
        assert len(data["boundaries"]) == model.n_bins - 1
        assert np.isfinite(data["boundaries"]["boundary"]).all()

    def test_plot_binning_stability(self, fitted, mock_mpl):
        from mobray.plotdata import plot_binning_stability

        groups, model = fitted
        rng = np.random.RandomState(11)
        x = np.repeat(np.arange(20.0), 30)
        p = 1 / (1 + np.exp(-(x - 10) / 3))
        y = (rng.rand(len(x)) < p).astype(float)
        test_model = fit_binning(x, y)
        data = plot_binning_stability(model, test_model)
        assert "psi" in data.columns
        assert (data["psi"] >= 0).all() or np.isfinite(data["psi"]).all()

    def test_renderers_no_matplotlib(self, fitted):
        """Without matplotlib every plot fn still returns its data."""
        from mobray.plotdata import (
            plot_bin_boundaries,
            plot_bin_statistics,
            plot_gcm,
            plot_pava_comparison,
            plot_sample_distribution,
        )

        groups, model = fitted
        assert plot_gcm(groups, model) is not None
        assert plot_pava_comparison(groups, model) is not None
        assert plot_bin_statistics(model)["figure"] is None
        assert plot_sample_distribution(model) is not None
        assert plot_bin_boundaries(model) is not None
