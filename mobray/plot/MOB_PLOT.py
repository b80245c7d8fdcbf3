"""Legacy alias kept for parity with the reference, whose
``MOBPY/plot/MOB_PLOT.py`` is a byte-duplicate of ``mob_plot.py``; here
it is a re-export instead."""

from mobray.plot.mob_plot import *  # noqa: F401,F403
from mobray.plot.mob_plot import __all__  # noqa: F401
