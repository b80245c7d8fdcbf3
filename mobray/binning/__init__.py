"""Reference-compatible import path: ``MOBPY.binning`` ⇄ ``mobray.binning``.

The reference exposes its binner as ``MOBPY.binning.MonotonicBinner``
(MOBPY/binning/__init__.py:28-30); this alias package keeps user import
paths working verbatim. The implementation lives in ``mobray.binner``.
"""

from mobray.binner import MonotonicBinner

__all__ = ["MonotonicBinner"]
