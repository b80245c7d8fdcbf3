"""Binning visualization (import-compat package mirroring the
reference's ``MOBPY/plot``): PAVA-process plots from ``csd_gcm``, MOB
result plots from ``mob_plot``. All render functions require matplotlib
(absent in this sandbox — they raise a clear ImportError); the
corresponding ``*_data`` builders in ``mobray.plotdata`` are pure
pandas/numpy and always available."""

from mobray.plot.csd_gcm import (
    plot_gcm,
    plot_pava_animation,
    plot_pava_comparison,
    plot_pava_process,
)
from mobray.plot.mob_plot import (
    plot_bin_boundaries,
    plot_bin_statistics,
    plot_binning_stability,
    plot_event_rate,
    plot_sample_distribution,
    plot_woe_bars,
)

__all__ = [
    "plot_gcm",
    "plot_pava_process",
    "plot_pava_animation",
    "plot_pava_comparison",
    "plot_woe_bars",
    "plot_event_rate",
    "plot_bin_statistics",
    "plot_sample_distribution",
    "plot_bin_boundaries",
    "plot_binning_stability",
]
