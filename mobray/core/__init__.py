"""Pure-numpy binning core — zero Ray imports.

This layer is simultaneously (a) the driver-side reduce step of the
distributed fit (the grouped table it consumes has one row per distinct
feature value, so it is tiny) and (b) the single-node oracle that parity
tests compare the distributed engine against.

Semantics follow the reference (file:line cites in each module):
  blocks.py       MOBPY/core/pava.py:26-137, MOBPY/core/merge.py:35-176
  pava.py         MOBPY/core/pava.py:223-439
  merge.py        MOBPY/core/merge.py:179-967
  constraints.py  MOBPY/core/constraints.py:17-256
  woe.py          MOBPY/core/utils.py:152-237
  stats.py        MOBPY/core/merge.py:230-284 (Welch t, re-derived without scipy)
  binner.py       MOBPY/binning/mob.py:51-752 (fit/summary/transform semantics)
"""

from mobray.core.blocks import Block
from mobray.core.constraints import BinningConstraints
from mobray.core.merge import MergeScorer, MergeStrategy, merge_adjacent
from mobray.core.model import BinningModel
from mobray.core.pava import GroupsTable, apply_pava, build_blocks, infer_sign
from mobray.core.binner import fit_binning, transform_values

__all__ = [
    "Block",
    "BinningConstraints",
    "BinningModel",
    "MergeScorer",
    "MergeStrategy",
    "merge_adjacent",
    "GroupsTable",
    "apply_pava",
    "build_blocks",
    "infer_sign",
    "fit_binning",
    "transform_values",
]
