"""MOB result plots — import-compat alias for the reference's
``MOBPY/plot/mob_plot.py`` module path. The renderers live in
``mobray.plotdata`` (data builders + matplotlib-gated render fns)."""

from mobray.plotdata import (
    plot_bin_boundaries,
    plot_bin_statistics,
    plot_binning_stability,
    plot_event_rate,
    plot_sample_distribution,
    plot_woe_bars,
)

__all__ = [
    "plot_woe_bars",
    "plot_event_rate",
    "plot_bin_statistics",
    "plot_sample_distribution",
    "plot_bin_boundaries",
    "plot_binning_stability",
]
