"""CSD/GCM and PAVA-process plots — import-compat alias for the
reference's ``MOBPY/plot/csd_gcm.py`` module path. The renderers live in
``mobray.plotdata``."""

from mobray.plotdata import (
    plot_gcm,
    plot_pava_animation,
    plot_pava_comparison,
    plot_pava_process,
)

__all__ = [
    "plot_gcm",
    "plot_pava_process",
    "plot_pava_animation",
    "plot_pava_comparison",
]
