"""Statistical adjacent-block merging with constraints.

Control flow matches MOBPY/core/merge.py:407-967 exactly, including its
tie-breaking (strict ``>`` in the best-merge scan keeps the first
maximum) and the maximize_bins / min_bins decision branches, because the
greedy loop is order-sensitive and parity with the reference depends on
reproducing it.
"""

from __future__ import annotations

import warnings
from enum import Enum
from typing import List, Optional, Tuple

from mobray.config import EPSILON
from mobray.core.blocks import Block, as_blocks
from mobray.core.constraints import BinningConstraints
from mobray.core.stats import welch_pvalue
from mobray.exceptions import BinningWarning, FittingError


class MergeStrategy(Enum):
    """Strategy for scoring candidate merges (MOBPY/core/merge.py:27-31)."""

    HIGHEST_PVALUE = "highest_pvalue"  # default; legacy "Stats" path
    SMALLEST_LOSS = "smallest_loss"
    BALANCED_SIZE = "balanced_size"    # legacy "Size" path


class MergeScorer:
    """Scores a candidate merge of two adjacent blocks; higher = merge first.

    Mirrors MOBPY/core/merge.py:179-404 (base score per strategy, then
    constraint penalties/bonuses).
    """

    def __init__(
        self,
        constraints: BinningConstraints,
        is_binary_y: bool,
        strategy: MergeStrategy = MergeStrategy.HIGHEST_PVALUE,
        epsilon: float = EPSILON,
    ):
        self.constraints = constraints
        self.is_binary_y = is_binary_y
        self.strategy = strategy
        self.epsilon = epsilon

    def score_pair(self, a: Block, b: Block) -> float:
        if self.strategy == MergeStrategy.SMALLEST_LOSS:
            base = 1.0 / (1.0 + self._information_loss(a, b))
        elif self.strategy == MergeStrategy.BALANCED_SIZE:
            base = self._size_balance_score(a, b)
        else:
            base = self._two_sample_pvalue(a, b)
        return self._apply_penalties(base, a, b)

    def _two_sample_pvalue(self, a: Block, b: Block) -> float:
        return welch_pvalue(
            a.n, a.mean, a.var, b.n, b.mean, b.var, epsilon=self.epsilon
        )

    def _information_loss(self, a: Block, b: Block) -> float:
        """Increase in within-block SSE, normalized by pooled variance
        (MOBPY/core/merge.py:286-319)."""
        ss_a = a.sum2 - a.sum**2 / a.n if a.n > 0 else 0.0
        ss_b = b.sum2 - b.sum**2 / b.n if b.n > 0 else 0.0
        current_ss = ss_a + ss_b

        merged_n = a.n + b.n
        merged_sum = a.sum + b.sum
        merged_sum2 = a.sum2 + b.sum2
        merged_ss = merged_sum2 - merged_sum**2 / merged_n if merged_n > 0 else 0.0

        loss = max(0.0, merged_ss - current_ss)
        total_var = (a.var * a.n + b.var * b.n) / (a.n + b.n) if (a.n + b.n) > 0 else 1.0
        return loss / max(total_var, self.epsilon)

    def _size_balance_score(self, a: Block, b: Block) -> float:
        """Size-ratio x oversize penalty (MOBPY/core/merge.py:321-351)."""
        max_n = max(a.n, b.n)
        min_n = min(a.n, b.n)
        if max_n == 0:
            return 1.0
        balance = min_n / max_n
        total_n = a.n + b.n
        if self.constraints.abs_max_samples:
            size_penalty = min(1.0, self.constraints.abs_max_samples / total_n)
        else:
            size_penalty = min(1.0, 1000 / total_n)
        return balance * size_penalty

    def _apply_penalties(self, base_score: float, a: Block, b: Block) -> float:
        """Constraint adjustments (MOBPY/core/merge.py:353-404):
        x1.5 per undersized side, x1.3 per binary-extreme side, oversize
        max(0.1, 1/ratio), x1.4 per side short of min_positives."""
        score = base_score
        c = self.constraints

        if c.abs_min_samples > 0:
            if a.n < c.abs_min_samples:
                score *= 1.5
            if b.n < c.abs_min_samples:
                score *= 1.5

        if self.is_binary_y:
            if a.mean <= 0.001 or a.mean >= 0.999:
                score *= 1.3
            if b.mean <= 0.001 or b.mean >= 0.999:
                score *= 1.3

        if c.abs_max_samples:
            merged_n = a.n + b.n
            if merged_n > c.abs_max_samples:
                violation_ratio = merged_n / c.abs_max_samples
                score *= max(0.1, 1.0 / violation_ratio)

        if self.is_binary_y and c.abs_min_positives > 0:
            if a.sum < c.abs_min_positives:
                score *= 1.4
            if b.sum < c.abs_min_positives:
                score *= 1.4

        return score


def _find_best_merge(
    blocks: List[Block], scorer: MergeScorer
) -> Tuple[Optional[int], float]:
    """Argmax adjacent pair; strict > keeps the FIRST maximum
    (MOBPY/core/merge.py:575-602) — order matters for parity."""
    if len(blocks) < 2:
        return None, -1.0
    best_idx: Optional[int] = None
    best_score = -1.0
    for i in range(len(blocks) - 1):
        score = scorer.score_pair(blocks[i], blocks[i + 1])
        if score > best_score:
            best_score = score
            best_idx = i
    return best_idx, best_score


def _merge_at(blocks: List[Block], idx: int) -> List[Block]:
    if idx < 0 or idx >= len(blocks) - 1:
        raise IndexError(f"Invalid merge index {idx} for {len(blocks)} blocks")
    merged = blocks[idx].merge_with(blocks[idx + 1])
    return blocks[:idx] + [merged] + blocks[idx + 2 :]


def _statistical_merge_phase(
    blocks: List[Block],
    constraints: BinningConstraints,
    scorer: MergeScorer,
    history: Optional[List[List[dict]]],
    max_iterations: int,
) -> List[Block]:
    """Phase 1 (MOBPY/core/merge.py:486-572).

    maximize_bins=True: merge best-scoring pair only while count > max_bins.
    maximize_bins=False: merge while best score >= initial_pvalue, or
    (count > min_bins and score >= initial_pvalue/2).
    """
    current = list(blocks)
    iteration = 0

    while iteration < max_iterations and len(current) > 1:
        if constraints.maximize_bins:
            should_continue = len(current) > constraints.max_bins
        else:
            should_continue = True
        if not should_continue and constraints.maximize_bins:
            break

        best_idx, best_score = _find_best_merge(current, scorer)
        if best_idx is None:
            break

        should_merge = False
        if constraints.maximize_bins and len(current) > constraints.max_bins:
            should_merge = True
        elif best_score >= constraints.initial_pvalue:
            should_merge = True
        elif not constraints.maximize_bins and len(current) > constraints.min_bins:
            should_merge = best_score >= constraints.initial_pvalue * 0.5

        if should_merge:
            current = _merge_at(current, best_idx)
            if history is not None:
                history.append([b.as_dict() for b in current])
        else:
            break
        iteration += 1

    if iteration >= max_iterations:
        warnings.warn(
            f"Statistical merge phase reached max iterations ({max_iterations})",
            BinningWarning,
        )
    return current


def _enforce_min_samples(
    blocks: List[Block],
    constraints: BinningConstraints,
    scorer: MergeScorer,
    history: Optional[List[List[dict]]],
) -> List[Block]:
    """Phase 2 (MOBPY/core/merge.py:892-967): while any bin is undersized
    and count > max(1, min_bins), merge the first undersized bin into its
    better-scoring neighbor (first block -> right, last -> left)."""
    current = list(blocks)
    if constraints.abs_min_samples <= 0:
        return current

    max_iterations = len(blocks) * 2
    iteration = 0

    while iteration < max_iterations:
        if len(current) <= max(1, constraints.min_bins):
            break
        undersized = [
            i for i, b in enumerate(current) if b.n < constraints.abs_min_samples
        ]
        if not undersized:
            break
        idx = undersized[0]
        if idx == 0:
            merge_idx = 0
        elif idx == len(current) - 1:
            merge_idx = idx - 1
        else:
            left_score = scorer.score_pair(current[idx - 1], current[idx])
            right_score = scorer.score_pair(current[idx], current[idx + 1])
            merge_idx = idx if right_score >= left_score else idx - 1
        current = _merge_at(current, merge_idx)
        if history is not None:
            history.append([b.as_dict() for b in current])
        iteration += 1
        if iteration >= max_iterations:
            warnings.warn(
                f"Min-samples enforcement reached max iterations ({max_iterations})",
                BinningWarning,
            )
    return current


def _validate_merge_result(blocks: List[Block], constraints: BinningConstraints) -> None:
    """MOBPY/core/merge.py:641-685 — fatal only on max_bins violation
    under maximize_bins."""
    if constraints.maximize_bins and len(blocks) > constraints.max_bins:
        raise FittingError(
            f"Merge failed: {len(blocks)} blocks exceeds max_bins={constraints.max_bins}"
        )


def merge_adjacent(
    blocks,
    constraints: BinningConstraints,
    is_binary_y: bool,
    *,
    strategy: MergeStrategy = MergeStrategy.HIGHEST_PVALUE,
    history: Optional[List[List[dict]]] = None,
    max_iterations: Optional[int] = None,
    epsilon: float = EPSILON,
) -> List[Block]:
    """Two-phase merge: statistical phase then min-samples enforcement
    (MOBPY/core/merge.py:407-483). Accepts Blocks or dicts."""
    blocks_typed = as_blocks(blocks)
    if not blocks_typed:
        return []

    current = list(blocks_typed)
    scorer = MergeScorer(constraints, is_binary_y, strategy, epsilon=epsilon)
    max_iter = max_iterations or constraints.max_bins * 100

    current = _statistical_merge_phase(current, constraints, scorer, history, max_iter)

    if constraints.abs_min_samples > 0:
        current = _enforce_min_samples(current, constraints, scorer, history)

    if len(current) == 0:
        raise FittingError("Merging produced zero blocks")
    _validate_merge_result(current, constraints)
    return current


def coerce_strategy(value) -> MergeStrategy:
    """String or enum -> MergeStrategy, with the reference's error message
    shape (MOBPY/binning/mob.py:147-158). Also accepts the legacy
    'Stats'/'Size' aliases from the v1 MOB API (MOB.runMOB mergeMethod)."""
    if isinstance(value, MergeStrategy):
        return value
    legacy = {"stats": MergeStrategy.HIGHEST_PVALUE, "size": MergeStrategy.BALANCED_SIZE}
    if isinstance(value, str):
        if value.lower() in legacy:
            return legacy[value.lower()]
        try:
            return MergeStrategy(value)
        except ValueError:
            valid = [s.value for s in MergeStrategy]
            raise ValueError(
                f"Invalid merge_strategy '{value}'. Valid options: {valid}"
            )
    raise TypeError(f"merge_strategy must be str or MergeStrategy, got {type(value)}")
