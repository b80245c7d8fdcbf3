"""PAVA semantics (reference: MOBPY/core/pava.py, tests/test_pava.py)."""

import numpy as np
import pytest

from mobray.core.blocks import Block
from mobray.core.pava import (
    GroupsTable,
    apply_pava,
    build_blocks,
    enforce_strict,
    group_stats,
    infer_sign,
    run_pava,
    validate_monotonicity,
)
from mobray.exceptions import DataError


def mkblock(left, right, n, mean, var=0.0):
    # sum2 chosen so the block reproduces the requested mean/var
    s = mean * n
    sum2 = var * (n - 1) + s * s / n if n > 1 else s * s / n
    return Block(left=left, right=right, n=n, sum=s, sum2=sum2, ymin=mean, ymax=mean)


class TestBlockStats:
    def test_mean_var_std(self):
        # y = [0.8, 1.2] -> mean 1.0, var 0.08
        b = Block(0, 1, 2, 2.0, 2.08, 0.8, 1.2)
        assert b.mean == pytest.approx(1.0)
        assert b.var == pytest.approx(0.08)
        assert b.std == pytest.approx(np.sqrt(0.08))

    def test_empty_and_singleton(self):
        assert Block(0, 1, 0, 0, 0, np.inf, -np.inf).mean == 0.0
        assert Block(0, 1, 1, 5, 25, 5, 5).var == 0.0

    def test_merge_pools(self):
        a = Block(0, 1, 10, 10.0, 12.0, 0.8, 1.2)
        b = Block(1, 2, 10, 20.0, 42.0, 1.8, 2.2)
        m = a.merge_with(b)
        assert (m.left, m.right, m.n) == (0, 2, 20)
        assert m.sum == 30.0 and m.sum2 == 54.0
        assert m.ymin == 0.8 and m.ymax == 2.2

    def test_merge_associative(self):
        a, b, c = (mkblock(i, i + 1, 5, float(i)) for i in range(3))
        left = a.merge_with(b).merge_with(c)
        right = a.merge_with(b.merge_with(c))
        assert left.as_dict() == right.as_dict()


class TestGroupStats:
    def test_basic(self):
        x = np.array([1, 1, 2, 2, 3])
        y = np.array([1.0, 2.0, 3.0, 5.0, 7.0])
        g = group_stats(x, y)
        assert list(g.x) == [1.0, 2.0, 3.0]
        assert list(g.count) == [2, 2, 1]
        assert list(g.sum) == [3.0, 8.0, 7.0]
        assert list(g.sum2) == [5.0, 34.0, 49.0]
        assert list(g.ymin) == [1.0, 3.0, 7.0]
        assert list(g.ymax) == [2.0, 5.0, 7.0]

    def test_nan_dropped(self):
        g = group_stats(np.array([1, np.nan, 2]), np.array([1.0, 2.0, np.nan]))
        assert list(g.x) == [1.0]
        assert list(g.count) == [1]

    def test_empty_raises(self):
        with pytest.raises(DataError):
            group_stats(np.array([np.nan]), np.array([1.0]))

    def test_cumulative(self):
        g = group_stats(np.array([1, 2, 2]), np.array([1.0, 2.0, 4.0]))
        assert list(g.cum_count) == [1.0, 3.0]
        assert list(g.cum_sum) == [1.0, 7.0]
        assert list(g.group_mean) == [1.0, 3.0]


class TestInferSign:
    def test_explicit_passthrough(self):
        g = group_stats(np.array([1, 2]), np.array([5.0, 1.0]))
        assert infer_sign(g, "+") == "+"
        assert infer_sign(g, "-") == "-"

    def test_auto_increasing(self):
        g = group_stats(np.arange(10), np.arange(10) * 2.0)
        assert infer_sign(g, "auto") == "+"

    def test_auto_decreasing(self):
        g = group_stats(np.arange(10), -np.arange(10) * 2.0)
        assert infer_sign(g, "auto") == "-"

    def test_degenerate_defaults_plus(self):
        # zero-variance means -> corr 0.0 -> '+' (corr >= 0)
        g = group_stats(np.arange(5), np.ones(5))
        assert infer_sign(g, "auto") == "+"


class TestBuildBlocks:
    def test_edges(self):
        g = group_stats(np.array([1.0, 2.0, 5.0]), np.array([1.0, 2.0, 3.0]))
        blocks = build_blocks(g)
        assert blocks[0].left == -np.inf
        assert blocks[0].right == 2.0
        assert blocks[1].right == 5.0
        assert blocks[-1].right == np.inf


class TestApplyPava:
    def test_already_monotone(self):
        blocks = [mkblock(0, 1, 10, 1.0), mkblock(1, 2, 10, 2.0), mkblock(2, 3, 10, 3.0)]
        out = apply_pava(blocks, "+")
        assert len(out) == 3

    def test_single_violation_pools(self):
        blocks = [mkblock(0, 1, 10, 2.0), mkblock(1, 2, 10, 1.0)]
        out = apply_pava(blocks, "+")
        assert len(out) == 1
        assert out[0].mean == pytest.approx(1.5)

    def test_cascade(self):
        blocks = [
            mkblock(0, 1, 1, 3.0),
            mkblock(1, 2, 1, 2.0),
            mkblock(2, 3, 1, 1.0),
        ]
        out = apply_pava(blocks, "+")
        assert len(out) == 1
        assert out[0].mean == pytest.approx(2.0)

    def test_decreasing_sign(self):
        blocks = [mkblock(0, 1, 10, 1.0), mkblock(1, 2, 10, 2.0)]
        out = apply_pava(blocks, "-")
        assert len(out) == 1

    def test_v_shape(self):
        # means fall then rise: PAVA('+') pools the falling prefix
        means = [5.0, 3.0, 1.0, 2.0, 4.0]
        blocks = [mkblock(i, i + 1, 1, m) for i, m in enumerate(means)]
        out = apply_pava(blocks, "+")
        assert validate_monotonicity(out, "+")
        assert out[0].mean == pytest.approx(2.75)  # (5+3+1+2)/4

    def test_result_monotone_property(self):
        rng = np.random.RandomState(42)
        for _ in range(20):
            means = rng.uniform(0, 10, size=rng.randint(2, 30))
            blocks = [mkblock(i, i + 1, 3, float(m)) for i, m in enumerate(means)]
            for sign in ("+", "-"):
                assert validate_monotonicity(apply_pava(list(blocks), sign), sign)


class TestStrict:
    def test_plateau_merged(self):
        blocks = [mkblock(0, 1, 5, 1.0), mkblock(1, 2, 5, 1.0), mkblock(2, 3, 5, 2.0)]
        out = enforce_strict(blocks, "+")
        assert len(out) == 2
        assert out[0].n == 10

    def test_distinct_kept(self):
        blocks = [mkblock(0, 1, 5, 1.0), mkblock(1, 2, 5, 2.0)]
        assert len(enforce_strict(blocks, "+")) == 2


class TestRunPava:
    def test_v_shaped_22row(self):
        """testMono.csv pattern: mean falls 11->1 for x=1..11 then rises
        1->12 for x=11..22 (FIXTURES.md F2)."""
        xs = np.arange(1, 23, dtype=float)
        ys = np.concatenate([np.arange(11, 0, -1), np.arange(2, 13)]).astype(float)
        g = group_stats(xs, ys)
        blocks, sign = run_pava(g, sign="auto")
        assert validate_monotonicity(blocks, sign)
        total_n = sum(b.n for b in blocks)
        assert total_n == 22
        assert blocks[0].left == -np.inf and blocks[-1].right == np.inf

    def test_perf_10k(self):
        """Reference bound: 10k rows < 5 s (tests/test_pava.py:545-562);
        the vectorized grouping should be far under that."""
        import time

        rng = np.random.RandomState(0)
        x = np.arange(10000, dtype=float)
        y = x + rng.normal(0, 1, 10000)
        t0 = time.time()
        g = group_stats(x, y)
        blocks, sign = run_pava(g, sign="auto")
        assert time.time() - t0 < 5.0
        assert sign == "+"
        assert validate_monotonicity(blocks, "+")
