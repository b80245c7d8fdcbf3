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


def pava_animation_frames(groups: GroupsTable, sign: str = "+") -> List[pd.DataFrame]:
    """Replay the PAVA stack pooling and capture one frame per pooling
    step (the data behind plot_pava_animation, reference
    plot/csd_gcm.py:549 — which ships as a stub there; here the frame
    DATA is real and the renderer is matplotlib-gated). Each frame is a
    DataFrame (left, right, mean, n) of the current block stack."""
    import numpy as np

    x = np.asarray(groups.x, dtype=float)
    n = np.asarray(groups.count, dtype=float)
    s = np.asarray(groups.sum, dtype=float)
    flip = -1.0 if sign == "-" else 1.0
    stack: List[list] = []  # [left, right, n, sum]
    frames: List[pd.DataFrame] = []

    def snap():
        frames.append(
            pd.DataFrame(
                {
                    "left": [b[0] for b in stack],
                    "right": [b[1] for b in stack],
                    "mean": [b[3] / b[2] for b in stack],
                    "n": [b[2] for b in stack],
                }
            )
        )

    for i in range(len(x)):
        right = x[i + 1] if i + 1 < len(x) else x[i]
        stack.append([x[i], right, n[i], s[i]])
        while len(stack) >= 2 and (
            flip * (stack[-1][3] / stack[-1][2])
            < flip * (stack[-2][3] / stack[-2][2]) - 1e-12
        ):
            b2 = stack.pop()
            b1 = stack.pop()
            stack.append([b1[0], b2[1], b1[2] + b2[2], b1[3] + b2[3]])
        snap()
    return frames


def plot_gcm(groups: GroupsTable, model: BinningModel, ax=None):
    """Group means + the fitted monotone step function (reference
    plot_gcm, plot/csd_gcm.py:167). Returns the underlying data; renders
    when matplotlib is importable."""
    data = pava_process_data(groups, model)

    def render():
        import matplotlib.pyplot as plt

        axis = ax or plt.gca()
        g = data["groups"]
        axis.scatter(g["x"], g["group_mean"], s=40, label="group means",
                     color="#64B5F6", marker="o")
        steps = data["steps"]
        for _, row in steps.iterrows():
            left = row["left"] if np.isfinite(row["left"]) else g["x"].min()
            right = row["right"] if np.isfinite(row["right"]) else g["x"].max()
            axis.hlines(row["mean"], left, right, colors="#E53935",
                        linewidth=2.5)
        axis.set_xlabel("x")
        axis.set_ylabel("mean(y)")
        axis.legend()
        return axis

    _maybe_plot(render)
    return data


def plot_pava_process(groups: GroupsTable, model: BinningModel, ax=None):
    """Cumulative-mean evolution with completed-bin anchors (reference
    plot_pava_process, plot/csd_gcm.py:344)."""
    gcm = gcm_data(groups)
    anchors = pd.DataFrame(
        {"right": model.rights[:-1], "mean": model.means[:-1]}
    )
    data = {"gcm": gcm, "anchors": anchors}

    def render():
        import matplotlib.pyplot as plt

        axis = ax or plt.gca()
        axis.plot(gcm["x"], gcm["cum_mean"], color="#2196F3", alpha=0.6,
                  label="cumulative mean")
        axis.scatter(gcm["x"], gcm["group_mean"], s=30, color="#9E9E9E",
                     label="group means")
        axis.scatter(anchors["right"], anchors["mean"], s=80, marker="s",
                     color="#F44336", label="bin anchors")
        axis.set_xlabel("x")
        axis.legend()
        return axis

    _maybe_plot(render)
    return data


def plot_pava_animation(groups: GroupsTable, sign: str = "+",
                        interval: int = 1000, save_path=None):
    """Frame-by-frame PAVA pooling animation (reference
    plot_pava_animation, plot/csd_gcm.py:549). Always returns the frame
    data; the rendered FuncAnimation is returned only when matplotlib
    (with animation support) is importable, else None — mirroring the
    reference's graceful degradation."""
    frames = pava_animation_frames(groups, sign)

    def render():
        import matplotlib.pyplot as plt
        from matplotlib import animation

        fig = plt.figure()
        axis = fig.add_subplot(1, 1, 1)

        def draw(k):
            axis.clear()
            f = frames[k]
            for _, row in f.iterrows():
                axis.hlines(row["mean"], row["left"], row["right"],
                            colors="#E53935", linewidth=2.0)
            axis.set_title(f"PAVA step {k + 1}/{len(frames)}")
            return []

        anim = animation.FuncAnimation(
            fig, draw, frames=len(frames), interval=interval, blit=False
        )
        if save_path:
            anim.save(save_path)
        return anim

    anim = _maybe_plot(render)
    return {"frames": frames, "animation": anim}


def plot_pava_comparison(groups: GroupsTable, model: BinningModel,
                         figsize=(15, 6), title=None):
    """Side-by-side before/after PAVA view (reference
    plot_pava_comparison, plot/csd_gcm.py:595): raw group means on the
    left, fitted monotone steps on the right."""
    data = pava_process_data(groups, model)

    def render():
        import matplotlib.pyplot as plt

        fig = plt.figure(figsize=figsize)
        ax1 = fig.add_subplot(1, 2, 1)
        ax2 = fig.add_subplot(1, 2, 2)
        g = data["groups"]
        ax1.scatter(g["x"], g["group_mean"], s=40, color="#64B5F6")
        ax1.set_title("before PAVA (group means)")
        for _, row in data["steps"].iterrows():
            left = row["left"] if np.isfinite(row["left"]) else g["x"].min()
            right = row["right"] if np.isfinite(row["right"]) else g["x"].max()
            ax2.hlines(row["mean"], left, right, colors="#E53935",
                       linewidth=2.5)
        ax2.set_title("after PAVA + merge (monotone steps)")
        if title:
            fig.suptitle(title)
        return fig

    fig = _maybe_plot(render)
    data["figure"] = fig
    return data


def plot_bin_statistics(model: BinningModel, figsize=(15, 10), title=None):
    """Multi-panel binning overview (reference plot_bin_statistics,
    plot/mob_plot.py:319): WoE pattern (binary targets), event rate,
    sample distribution, per-bin stats."""
    stats = bin_statistics_data(model)
    rate = event_rate_data(model)
    dist = sample_distribution_data(model)
    data = {"stats": stats, "event_rate": rate, "distribution": dist}

    def render():
        import matplotlib.pyplot as plt

        fig = plt.figure(figsize=figsize)
        ax1 = fig.add_subplot(2, 2, 1)
        if model.is_binary:
            woe = woe_bars_data(model)
            ax1.bar(woe["bucket"], woe["woe"], color="#42A5F5")
            ax1.set_title("WoE by bucket")
        else:
            ax1.bar(stats["bucket"], stats["mean"], color="#42A5F5")
            ax1.set_title("mean(y) by bucket")
        ax1.tick_params(axis="x", rotation=45)
        ax2 = fig.add_subplot(2, 2, 2)
        ax2.plot(rate["bucket"], rate["event_rate"], marker="o",
                 color="#E53935")
        ax2.set_title("event rate")
        ax2.tick_params(axis="x", rotation=45)
        ax3 = fig.add_subplot(2, 2, 3)
        ax3.bar(dist["bucket"], dist["count_pct"], color="#66BB6A")
        ax3.set_title("sample distribution (%)")
        ax3.tick_params(axis="x", rotation=45)
        ax4 = fig.add_subplot(2, 2, 4)
        ax4.bar(stats["bucket"], stats["std"].fillna(0.0), color="#FFA726")
        ax4.set_title("std(y) by bucket")
        ax4.tick_params(axis="x", rotation=45)
        if title:
            fig.suptitle(title)
        return fig

    data["figure"] = _maybe_plot(render)
    return data


def plot_sample_distribution(model: BinningModel, ax=None,
                             show_cumulative: bool = True):
    """Sample share per bucket with optional cumulative line (reference
    plot_sample_distribution, plot/mob_plot.py:418)."""
    data = sample_distribution_data(model).copy()
    data["cum_pct"] = data["count_pct"].cumsum()

    def render():
        import matplotlib.pyplot as plt

        axis = ax or plt.gca()
        axis.bar(data["bucket"], data["count_pct"], color="#42A5F5")
        if show_cumulative:
            axis.plot(data["bucket"], data["cum_pct"], marker="o",
                      color="#E53935")
        axis.set_ylabel("% of samples")
        axis.tick_params(axis="x", rotation=45)
        return axis

    _maybe_plot(render)
    return data


def plot_bin_boundaries(model: BinningModel, x_values=None, ax=None,
                        n_samples: int = 1000):
    """Bin cut points (and means), optionally over a sample histogram of
    the feature (reference plot_bin_boundaries, plot/mob_plot.py:525).
    ``x_values``: optional array-like of raw feature values."""
    data = {
        "boundaries": bin_boundaries_data(model),
        "means": pd.DataFrame(
            {"left": model.lefts, "right": model.rights, "mean": model.means}
        ),
    }

    def render():
        import matplotlib.pyplot as plt

        axis = ax or plt.gca()
        if x_values is not None:
            vals = np.asarray(x_values, dtype=float)
            vals = vals[np.isfinite(vals)]
            if len(vals) > n_samples:
                step = max(1, len(vals) // n_samples)
                vals = vals[::step]
            axis.hist(vals, bins=40, alpha=0.6, color="#90CAF9",
                      density=True)
        for b in data["boundaries"]["boundary"]:
            axis.axvline(b, color="#E53935", linewidth=1.5, linestyle="--")
        axis.set_xlabel("x")
        return axis

    _maybe_plot(render)
    return data


def plot_binning_stability(train: BinningModel, test: BinningModel,
                           figsize=(12, 6), title=None):
    """Train-vs-test rate and share comparison with PSI (reference
    plot_binning_stability, plot/mob_plot.py:691)."""
    data = binning_stability_data(train, test)

    def render():
        import matplotlib.pyplot as plt

        fig = plt.figure(figsize=figsize)
        ax1 = fig.add_subplot(1, 2, 1)
        idx = np.arange(len(data))
        ax1.bar(idx - 0.2, data["rate_train"], width=0.4, label="train",
                color="#42A5F5")
        ax1.bar(idx + 0.2, data["rate_test"], width=0.4, label="test",
                color="#E53935")
        ax1.set_xticks(idx)
        ax1.set_xticklabels(data["bucket_train"], rotation=45)
        ax1.set_title("event rate")
        ax1.legend()
        ax2 = fig.add_subplot(1, 2, 2)
        ax2.bar(idx, data["psi"], color="#FFA726")
        ax2.set_xticks(idx)
        ax2.set_xticklabels(data["bucket_train"], rotation=45)
        ax2.set_title(f"PSI (total {data['psi'].sum():.4f})")
        if title:
            fig.suptitle(title)
        return fig

    out = dict(data=data)
    out["figure"] = _maybe_plot(render)
    return data


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
