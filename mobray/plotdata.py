"""Plot-data builders for the reference's visualization layer.

The reference ships ~10 matplotlib functions (MOBPY/plot/__init__.py:
44-59: plot_gcm, plot_pava_process, plot_woe_bars, plot_event_rate,
plot_bin_statistics, plot_sample_distribution, plot_bin_boundaries,
plot_binning_stability, ...). They all consume only the small
driver-side artifacts (groups_ / blocks / summary_). This module builds
the same underlying plot DATA as plain DataFrames — usable headless —
and renders with matplotlib only if it is importable (it is not
installed in this sandbox).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pandas as pd

from mobray.core.model import BinningModel
from mobray.core.pava import GroupsTable


def _maybe_plot(fn):
    try:
        import matplotlib.pyplot as plt  # noqa: F401
    except ImportError:
        return None
    return fn()


def gcm_data(groups: GroupsTable) -> pd.DataFrame:
    """Cumulative-sum diagram + greatest-convex-minorant points
    (the inputs of plot_gcm, MOBPY/plot/csd_gcm.py:167)."""
    return pd.DataFrame(
        {
            "x": groups.x,
            "cum_count": groups.cum_count,
            "cum_sum": groups.cum_sum,
            "cum_mean": groups.cum_mean,
            "group_mean": groups.group_mean,
        }
    )


def pava_process_data(groups: GroupsTable, model: BinningModel) -> dict:
    """Before/after view of PAVA pooling (plot_pava_process /
    plot_pava_comparison): per-group means vs final fitted step means."""
    return {
        "groups": pd.DataFrame({"x": groups.x, "group_mean": groups.group_mean}),
        "steps": pd.DataFrame(
            {
                "left": model.lefts,
                "right": model.rights,
                "mean": model.means,
            }
        ),
    }


def woe_bars_data(model: BinningModel) -> pd.DataFrame:
    """WoE per bucket (plot_woe_bars, MOBPY/plot/mob_plot.py:25)."""
    if not model.is_binary:
        raise ValueError("WoE bars require a binary-target model")
    return pd.DataFrame(
        {"bucket": model.labels, "woe": model.woe, "iv": model.iv}
    )


def event_rate_data(model: BinningModel) -> pd.DataFrame:
    """Event rate + sample share per bucket (plot_event_rate)."""
    total = model.counts.sum()
    return pd.DataFrame(
        {
            "bucket": model.labels,
            "event_rate": model.means,
            "count": model.counts,
            "count_pct": model.counts / total * 100.0,
        }
    )


def bin_statistics_data(model: BinningModel) -> pd.DataFrame:
    """Per-bin stats table (plot_bin_statistics)."""
    return model.bins_df().assign(bucket=model.labels)


def bin_boundaries_data(model: BinningModel) -> pd.DataFrame:
    """Finite boundary positions (plot_bin_boundaries)."""
    edges = model.rights[:-1]
    return pd.DataFrame({"boundary": edges})


def sample_distribution_data(model: BinningModel) -> pd.DataFrame:
    """Sample counts per bucket incl. Missing/Excluded rows
    (plot_sample_distribution)."""
    s = model.summary_df()
    return s[["bucket", "count", "count_pct"]]


def binning_stability_data(
    train: BinningModel, test: BinningModel
) -> pd.DataFrame:
    """Train-vs-test per-bucket comparison (plot_binning_stability,
    MOBPY/plot/mob_plot.py:691). Buckets are matched positionally; the
    PSI column quantifies distribution shift."""
    n = min(train.n_bins, test.n_bins)
    tr = train.counts[:n] / train.counts[:n].sum()
    te = test.counts[:n] / test.counts[:n].sum()
    eps = 1e-12
    psi = (tr - te) * np.log((tr + eps) / (te + eps))
    return pd.DataFrame(
        {
            "bucket_train": list(train.labels[:n]),
            "bucket_test": list(test.labels[:n]),
            "rate_train": train.means[:n],
            "rate_test": test.means[:n],
            "share_train": tr,
            "share_test": te,
            "psi": psi,
        }
    )


def plot_woe_bars(model: BinningModel, ax=None):
    """Render WoE bars if matplotlib is available; always returns the
    underlying data."""
    data = woe_bars_data(model)

    def render():
        import matplotlib.pyplot as plt

        axis = ax or plt.gca()
        axis.bar(data["bucket"], data["woe"])
        axis.set_ylabel("WoE")
        axis.tick_params(axis="x", rotation=45)
        return axis

    _maybe_plot(render)
    return data


def plot_event_rate(model: BinningModel, ax=None):
    data = event_rate_data(model)

    def render():
        import matplotlib.pyplot as plt

        axis = ax or plt.gca()
        axis.plot(data["bucket"], data["event_rate"], marker="o")
        axis.set_ylabel("event rate")
        axis.tick_params(axis="x", rotation=45)
        return axis

    _maybe_plot(render)
    return data
