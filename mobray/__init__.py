"""mobray — a Ray-Data-native monotonic-optimal-binning feature-engineering engine.

Re-expresses the capabilities of the reference library
(ChenTaHung/Monotonic-Optimal-Binning, MOBPY v2.0.0) as a distributed,
streaming Ray Data engine, plus the point-in-time / windowed feature
machinery (as-of join, lag/lead, backfill, sessionize) and large-scale
training-data operators (dedup, similarity search, text analysis,
image decode) needed to run it over very large image+caption tables.

Layers
------
- ``mobray.core``      pure numpy; the binning algorithm itself (PAVA +
                       statistical merge). Zero Ray imports — doubles as the
                       single-node oracle for parity tests.
- ``mobray.sources``   readers + the deterministic synthetic image table
                       generator (PNG codec on stdlib zlib).
- ``mobray.functions`` vectorized scalar/array kernels (phash, hashing,
                       text metrics).
- ``mobray.stages``    map_batches-callable stages (stateless fns + actor
                       classes).
- ``mobray.pipelines`` composed Dataset -> Dataset pipelines (distributed
                       fit, transform, temporal ops, dedup, simsearch).
- ``mobray.state``     BinningModel artifact, checkpoint manifests, metrics.
"""

from mobray.binner import MonotonicBinner
from mobray.core.constraints import BinningConstraints
from mobray.core.merge import MergeStrategy
from mobray.core.model import BinningModel

__version__ = "0.1.0"

__all__ = [
    "MonotonicBinner",
    "BinningConstraints",
    "MergeStrategy",
    "BinningModel",
    "__version__",
]


def get_version() -> str:
    """Current engine version (mirrors the reference's helper,
    MOBPY/__init__.py:33-39)."""
    return __version__
