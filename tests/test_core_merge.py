"""Merge-phase semantics (reference: MOBPY/core/merge.py, tests/test_merge.py)."""

import numpy as np
import pytest

from mobray.core.blocks import Block, as_blocks, block_from_dict
from mobray.core.constraints import BinningConstraints
from mobray.core.merge import (
    MergeScorer,
    MergeStrategy,
    _enforce_min_samples,
    _find_best_merge,
    _merge_at,
    coerce_strategy,
    merge_adjacent,
)
from mobray.exceptions import FittingError


# Canonical three-block fixture (FIXTURES.md F3 /
# reference tests/test_merge.py:175-188)
THREE_BLOCKS = [
    {"left": 0.0, "right": 1.0, "n": 10, "sum": 10.0, "sum2": 12.0, "ymin": 0.8, "ymax": 1.2},
    {"left": 1.0, "right": 2.0, "n": 10, "sum": 20.0, "sum2": 42.0, "ymin": 1.8, "ymax": 2.2},
    {"left": 2.0, "right": 3.0, "n": 10, "sum": 30.0, "sum2": 92.0, "ymin": 2.8, "ymax": 3.2},
]


def resolved(**kw):
    c = BinningConstraints(**kw)
    c.resolve(total_n=30, total_pos=0)
    return c


class TestBlockConversion:
    def test_from_dict_aliases(self):
        b = block_from_dict({"left": 0, "right": 1, "n": 2, "sum": 3, "sum2": 5, "min": 1, "max": 2})
        assert b.ymin == 1 and b.ymax == 2

    def test_as_blocks(self):
        blocks = as_blocks(THREE_BLOCKS)
        assert all(isinstance(b, Block) for b in blocks)
        assert as_blocks(blocks) == blocks
        assert as_blocks([]) == []

    def test_as_blocks_bad_type(self):
        with pytest.raises(TypeError):
            as_blocks([1, 2, 3])


class TestScorer:
    def test_similar_blocks_score_high(self):
        c = resolved()
        scorer = MergeScorer(c, is_binary_y=False)
        a = block_from_dict(THREE_BLOCKS[0])
        near = Block(1.0, 2.0, 10, 10.5, 12.5, 0.8, 1.3)  # mean 1.05
        far = block_from_dict(THREE_BLOCKS[2])             # mean 3.0
        assert scorer.score_pair(a, near) > scorer.score_pair(a, far)

    def test_undersized_bonus(self):
        c = BinningConstraints(min_samples=15)
        c.resolve(total_n=30)
        scorer = MergeScorer(c, is_binary_y=False)
        a = block_from_dict(THREE_BLOCKS[0])
        b = block_from_dict(THREE_BLOCKS[1])
        base = MergeScorer(resolved(), False).score_pair(a, b)
        # both sides undersized -> x1.5 x1.5
        assert scorer.score_pair(a, b) == pytest.approx(base * 2.25)

    def test_binary_extreme_bonus(self):
        c = resolved()
        scorer_bin = MergeScorer(c, is_binary_y=True)
        scorer_cont = MergeScorer(c, is_binary_y=False)
        # rate 0.0 on both sides -> x1.3 x1.3
        a = Block(0, 1, 10, 0.0, 0.0, 0, 0)
        b = Block(1, 2, 10, 0.0, 0.0, 0, 0)
        assert scorer_bin.score_pair(a, b) == pytest.approx(
            scorer_cont.score_pair(a, b) * 1.69
        )

    def test_oversize_penalty(self):
        c = BinningConstraints(max_samples=15)
        c.resolve(total_n=30)
        scorer = MergeScorer(c, is_binary_y=False)
        a = block_from_dict(THREE_BLOCKS[0])
        b = block_from_dict(THREE_BLOCKS[1])
        base = MergeScorer(resolved(), False).score_pair(a, b)
        # merged 20 > 15 -> x max(0.1, 15/20)
        assert scorer.score_pair(a, b) == pytest.approx(base * 0.75)

    def test_min_positives_bonus(self):
        c = BinningConstraints(min_positives=15)
        c.resolve(total_n=30, total_pos=60)
        scorer = MergeScorer(c, is_binary_y=True)
        a = Block(0, 1, 20, 10.0, 10.0, 0, 1)  # sum 10 < 15
        b = Block(1, 2, 20, 18.0, 18.0, 0, 1)
        base_c = resolved()
        base = MergeScorer(base_c, True).score_pair(a, b)
        assert scorer.score_pair(a, b) == pytest.approx(base * 1.4)

    def test_smallest_loss_strategy(self):
        scorer = MergeScorer(resolved(), False, MergeStrategy.SMALLEST_LOSS)
        a = block_from_dict(THREE_BLOCKS[0])
        near = Block(1.0, 2.0, 10, 10.0, 12.0, 0.8, 1.2)  # identical stats
        far = block_from_dict(THREE_BLOCKS[2])
        assert scorer.score_pair(a, near) > scorer.score_pair(a, far)

    def test_balanced_size_strategy(self):
        scorer = MergeScorer(resolved(), False, MergeStrategy.BALANCED_SIZE)
        small_pair = (Block(0, 1, 5, 5, 6, 1, 1), Block(1, 2, 5, 5, 6, 1, 1))
        unbal_pair = (Block(0, 1, 100, 100, 110, 1, 1), Block(1, 2, 5, 5, 6, 1, 1))
        assert scorer.score_pair(*small_pair) > scorer.score_pair(*unbal_pair)


class TestFindBestMerge:
    def test_first_max_wins(self):
        """Strict > keeps first index on ties (MOBPY/core/merge.py:595-602)."""

        class ConstScorer:
            def score_pair(self, a, b):
                return 0.7

        idx, score = _find_best_merge(as_blocks(THREE_BLOCKS), ConstScorer())
        assert idx == 0 and score == 0.7

    def test_too_few(self):
        idx, score = _find_best_merge([as_blocks(THREE_BLOCKS)[0]], None)
        assert idx is None and score == -1.0


class TestMergeAt:
    def test_merge(self):
        blocks = as_blocks(THREE_BLOCKS)
        out = _merge_at(blocks, 0)
        assert len(out) == 2
        assert out[0].n == 20 and out[0].left == 0.0 and out[0].right == 2.0

    def test_bad_index(self):
        with pytest.raises(IndexError):
            _merge_at(as_blocks(THREE_BLOCKS), 2)


class TestMergeAdjacent:
    def test_respects_max_bins(self):
        blocks = [
            Block(i, i + 1, 10, 10.0 * i, 100.0 * i * i + 5, i - 0.5, i + 0.5)
            for i in range(10)
        ]
        c = BinningConstraints(max_bins=4, min_bins=2)
        c.resolve(total_n=100)
        out = merge_adjacent(blocks, c, is_binary_y=False)
        assert len(out) <= 4

    def test_maximize_bins_stops_at_max(self):
        """With maximize_bins=True the statistical phase merges ONLY while
        count > max_bins (MOBPY/core/merge.py:508-519) — even if all
        scores exceed the p-value threshold."""
        blocks = [mk(i, 1.0 * i) for i in range(6)]
        c = BinningConstraints(max_bins=6, min_bins=4)
        c.resolve(total_n=60)
        out = merge_adjacent(blocks, c, is_binary_y=False)
        assert len(out) == 6

    def test_non_maximize_merges_on_high_scores(self):
        # identical blocks -> p-value 1.0 >= 0.4 -> keeps merging (can go
        # below min_bins; the reference's documented quirk)
        blocks = [mk(i, 5.0, var=1.0) for i in range(6)]
        c = BinningConstraints(max_bins=6, min_bins=4, maximize_bins=False)
        c.resolve(total_n=60)
        out = merge_adjacent(blocks, c, is_binary_y=False)
        assert len(out) == 1

    def test_history_recorded(self):
        blocks = [mk(i, float(i)) for i in range(8)]
        c = BinningConstraints(max_bins=4, min_bins=2)
        c.resolve(total_n=80)
        hist = []
        merge_adjacent(blocks, c, is_binary_y=False, history=hist)
        assert len(hist) == 4  # 8 -> 4 bins = 4 merges
        assert all(isinstance(snap, list) for snap in hist)

    def test_empty_input(self):
        assert merge_adjacent([], resolved(), False) == []


def mk(i, mean, n=10, var=0.01):
    s = mean * n
    sum2 = var * (n - 1) + s * s / n
    return Block(float(i), float(i + 1), n, s, sum2, mean - 0.1, mean + 0.1)


class TestEnforceMinSamples:
    def test_first_block_merges_right(self):
        blocks = [mk(0, 0.0, n=2), mk(1, 1.0, n=50), mk(2, 2.0, n=50), mk(3, 3.0, n=50)]
        c = BinningConstraints(min_samples=10, min_bins=2)
        c.resolve(total_n=152)
        scorer = MergeScorer(c, False)
        out = _enforce_min_samples(blocks, c, scorer, None)
        assert out[0].n == 52  # merged into right neighbor

    def test_last_block_merges_left(self):
        blocks = [mk(0, 0.0, n=50), mk(1, 1.0, n=50), mk(2, 2.0, n=50), mk(3, 3.0, n=2)]
        c = BinningConstraints(min_samples=10, min_bins=2)
        c.resolve(total_n=152)
        out = _enforce_min_samples(blocks, c, MergeScorer(c, False), None)
        assert out[-1].n == 52

    def test_middle_block_picks_better_neighbor(self):
        # undersized middle with a mean much closer to its right neighbor
        blocks = [mk(0, 0.0, n=50), mk(1, 5.0, n=2), mk(2, 5.1, n=50), mk(3, 9.0, n=50)]
        c = BinningConstraints(min_samples=10, min_bins=2)
        c.resolve(total_n=152)
        out = _enforce_min_samples(blocks, c, MergeScorer(c, False), None)
        assert len(out) == 3
        assert out[1].n == 52  # merged right

    def test_stops_at_min_bins(self):
        blocks = [mk(i, float(i), n=2) for i in range(3)]
        c = BinningConstraints(min_samples=100, min_bins=3, max_bins=6)
        c.resolve(total_n=6)
        out = _enforce_min_samples(blocks, c, MergeScorer(c, False), None)
        assert len(out) == 3  # len <= max(1, min_bins) -> untouched


class TestValidation:
    def test_max_bins_violation_raises(self):
        # force the phase-1 loop to be unable to reach max_bins by
        # exhausting iterations
        blocks = [mk(i, float(i)) for i in range(5)]
        c = BinningConstraints(max_bins=2, min_bins=1)
        c.resolve(total_n=50)
        with pytest.raises(FittingError):
            merge_adjacent(blocks, c, False, max_iterations=1)


class TestCoerceStrategy:
    def test_enum_passthrough(self):
        assert coerce_strategy(MergeStrategy.SMALLEST_LOSS) is MergeStrategy.SMALLEST_LOSS

    def test_string(self):
        assert coerce_strategy("highest_pvalue") is MergeStrategy.HIGHEST_PVALUE

    def test_legacy_aliases(self):
        assert coerce_strategy("Stats") is MergeStrategy.HIGHEST_PVALUE
        assert coerce_strategy("Size") is MergeStrategy.BALANCED_SIZE

    def test_invalid(self):
        with pytest.raises(ValueError, match="Invalid merge_strategy"):
            coerce_strategy("nope")
