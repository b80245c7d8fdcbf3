"""Reference-compatible import path: ``MOBPY.binning.mob`` ⇄ this module.

The reference's own tests import ``MonotonicBinner`` and ``_format_edge``
from here (e.g. /root/reference/tests/test_mob.py:13); both resolve to
the real implementations (``mobray.binner`` / ``mobray.core.format``).
"""

from mobray.binner import MonotonicBinner
from mobray.core.format import format_edge as _format_edge

__all__ = ["MonotonicBinner", "_format_edge"]
