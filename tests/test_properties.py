"""Property-based invariants (hypothesis) for the binning core."""

import numpy as np
import pandas as pd
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


class TestTokenizeProperties:
    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.one_of(
                st.none(),
                st.text(
                    # printable ASCII + every whitespace class Python and
                    # Arrow both split on, incl. \x1c-\x1f and \x85
                    alphabet=st.characters(
                        codec="ascii", categories=("L", "N", "P", "S", "Z", "C")
                    ),
                    max_size=40,
                ),
            ),
            max_size=12,
        )
    )
    def test_ascii_fast_path_token_identical(self, texts):
        from mobray.functions.textfns import tokenize_lower_batch

        ref_toks, ref_offsets = [], []
        for t in texts:
            ref_offsets.append(len(ref_toks))
            ref_toks.extend((t or "").lower().split())
        toks, offsets = tokenize_lower_batch(
            pd.Series(texts, dtype=object)
        )
        assert list(toks) == ref_toks
        assert list(offsets) == ref_offsets

    @settings(max_examples=100, deadline=None)
    @given(st.lists(st.one_of(st.none(), st.text(max_size=30)), max_size=10))
    def test_any_unicode_matches_python_semantics(self, texts):
        """Arbitrary unicode (forcing the fallback whenever any row is
        non-ASCII) must still match per-row str.lower().split()."""
        from mobray.functions.textfns import tokenize_lower_batch

        ref_toks, ref_offsets = [], []
        for t in texts:
            ref_offsets.append(len(ref_toks))
            ref_toks.extend((t or "").lower().split())
        toks, offsets = tokenize_lower_batch(pd.Series(texts, dtype=object))
        assert list(toks) == ref_toks
        assert list(offsets) == ref_offsets


class TestSimhashChunkBoundary:
    def test_multi_chunk_equals_per_half_runs(self):
        """simhash64_batch chunks docs at 31,250 per pass; a batch that
        spans the boundary must agree with independent runs over each
        half (per-doc independence is the kernel's contract)."""
        from mobray.functions.hashing import simhash64_batch

        rng = np.random.RandomState(5)
        n_docs = 31_250 + 7
        counts = rng.randint(1, 3, n_docs)
        offsets = np.concatenate(([0], np.cumsum(counts)[:-1])).astype(np.int64)
        h = rng.randint(0, 2**63, int(counts.sum())).astype(np.uint64)
        full = simhash64_batch(h, offsets)
        split = 31_249  # last doc of chunk 1 / first docs of chunk 2 nearby
        cut = int(offsets[split])
        first = simhash64_batch(h[:cut], offsets[:split])
        second = simhash64_batch(h[cut:], offsets[split:] - cut)
        np.testing.assert_array_equal(full, np.concatenate([first, second]))
