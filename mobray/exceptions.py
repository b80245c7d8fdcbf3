"""Exception hierarchy, mirroring the reference's programmatic surface.

Reference: /root/reference/src/MOBPY/exceptions.py:8-66 (MOBPYError >
DataError, ConstraintError, FittingError, NotFittedError; BinningWarning).
"""


class MobrayError(Exception):
    """Base class for all engine errors."""


class DataError(MobrayError):
    """Invalid input data (non-numeric, non-finite, missing columns...)."""


class ConstraintError(MobrayError):
    """Invalid or contradictory binning constraints."""


class FittingError(MobrayError):
    """The fit failed to produce a valid result."""


class NotFittedError(MobrayError):
    """An artifact was requested before fit()."""


class BinningWarning(UserWarning):
    """Non-fatal binning condition worth surfacing."""


# reference-compatible name for the base class (the reference's tests
# assert each error inherits from MOBPYError)
MOBPYError = MobrayError
