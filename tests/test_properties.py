"""Property-based invariants (hypothesis) for the binning core."""

import numpy as np
from hypothesis import given, settings, strategies as st

from mobray.core.binner import fit_binning, transform_values
from mobray.core.blocks import Block
from mobray.core.constraints import BinningConstraints
from mobray.core.merge import merge_adjacent
from mobray.core.pava import apply_pava, validate_monotonicity
from mobray.core.stats import welch_pvalue


def blocks_strategy(min_blocks=2, max_blocks=20):
    @st.composite
    def _blocks(draw):
        k = draw(st.integers(min_blocks, max_blocks))
        out = []
        for i in range(k):
            n = draw(st.integers(1, 50))
            mean = draw(st.floats(-100, 100, allow_nan=False, width=32))
            spread = draw(st.floats(0, 10, allow_nan=False, width=32))
            s = mean * n
            sum2 = (spread**2) * max(0, n - 1) + s * s / n
            out.append(Block(float(i), float(i + 1), n, s, sum2, mean - spread, mean + spread))
        out[0].left = float("-inf")
        out[-1].right = float("inf")
        return out

    return _blocks()


class TestPavaProperties:
    @settings(max_examples=200, deadline=None)
    @given(blocks_strategy(), st.sampled_from(["+", "-"]))
    def test_pava_monotone_and_conserving(self, blocks, sign):
        total_n = sum(b.n for b in blocks)
        total_sum = sum(b.sum for b in blocks)
        out = apply_pava(list(blocks), sign)
        assert validate_monotonicity(out, sign, tolerance=1e-6)
        assert sum(b.n for b in out) == total_n
        assert abs(sum(b.sum for b in out) - total_sum) < 1e-6 * max(1, abs(total_sum))
        # edges still tile the real line
        assert out[0].left == float("-inf") and out[-1].right == float("inf")


class TestMergeProperties:
    @settings(max_examples=100, deadline=None)
    @given(blocks_strategy(), st.integers(1, 8), st.booleans())
    def test_merge_conserves_and_bounds(self, blocks, max_bins, is_binary):
        sorted_blocks = apply_pava(list(blocks), "+")
        c = BinningConstraints(max_bins=max_bins, min_bins=min(1, max_bins))
        c.resolve(total_n=sum(b.n for b in sorted_blocks))
        out = merge_adjacent(sorted_blocks, c, is_binary)
        assert 1 <= len(out) <= max(max_bins, len(sorted_blocks))
        assert len(out) <= max_bins  # maximize_bins default enforces this
        assert sum(b.n for b in out) == sum(b.n for b in sorted_blocks)


class TestWelchProperties:
    @settings(max_examples=300, deadline=None)
    @given(
        st.integers(0, 100), st.floats(-50, 50, allow_nan=False),
        st.floats(0, 100, allow_nan=False),
        st.integers(0, 100), st.floats(-50, 50, allow_nan=False),
        st.floats(0, 100, allow_nan=False),
    )
    def test_pvalue_in_unit_interval_and_symmetric(self, na, ma, va, nb, mb, vb):
        p = welch_pvalue(na, ma, va, nb, mb, vb)
        assert 0.0 <= p <= 1.0
        assert p == welch_pvalue(nb, mb, vb, na, ma, va)


class TestTransformProperties:
    @settings(max_examples=50, deadline=None)
    @given(st.integers(0, 2**32 - 1))
    def test_every_finite_value_lands_in_its_bin(self, seed):
        rng = np.random.RandomState(seed)
        n = 400
        x = np.round(rng.normal(0, 2, n), 1)
        y = (rng.uniform(size=n) < 0.5).astype(float)
        model = fit_binning(x, y)
        probe = rng.uniform(-1e6, 1e6, 100)
        lefts = transform_values(model, probe, "left")
        rights = transform_values(model, probe, "right")
        assert np.all(lefts <= probe) and np.all(probe < rights)
