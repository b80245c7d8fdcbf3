"""Constraint validation/resolution (reference: MOBPY/core/constraints.py,
tests/test_constraints.py)."""

import pytest

from mobray.core.constraints import BinningConstraints
from mobray.core.woe import woe_iv
from mobray.exceptions import BinningWarning, ConstraintError

import numpy as np


class TestValidation:
    def test_defaults(self):
        c = BinningConstraints()
        assert c.max_bins == 6 and c.min_bins == 4
        assert c.initial_pvalue == 0.4 and c.maximize_bins

    def test_bad_max_bins(self):
        with pytest.raises(ConstraintError):
            BinningConstraints(max_bins=0)

    def test_min_gt_max_when_maximizing(self):
        with pytest.raises(ConstraintError):
            BinningConstraints(max_bins=3, min_bins=5)
        # allowed when not maximizing
        BinningConstraints(max_bins=3, min_bins=5, maximize_bins=False)

    def test_bad_pvalue(self):
        with pytest.raises(ConstraintError):
            BinningConstraints(initial_pvalue=0.0)
        with pytest.raises(ConstraintError):
            BinningConstraints(initial_pvalue=1.5)

    def test_negative_samples(self):
        with pytest.raises(ConstraintError):
            BinningConstraints(max_samples=-1)
        with pytest.raises(ConstraintError):
            BinningConstraints(min_samples=-0.1)


class TestResolution:
    def test_fractions(self):
        c = BinningConstraints(min_samples=0.05, max_samples=0.5, min_positives=0.1)
        c.resolve(total_n=1000, total_pos=100)
        assert c.abs_min_samples == 50
        assert c.abs_max_samples == 500
        assert c.abs_min_positives == 10
        assert c.is_resolved()

    def test_absolutes(self):
        c = BinningConstraints(min_samples=30, max_samples=400)
        c.resolve(total_n=1000)
        assert c.abs_min_samples == 30
        assert c.abs_max_samples == 400

    def test_caps_at_total(self):
        c = BinningConstraints(min_samples=5000, max_samples=9000)
        c.resolve(total_n=1000)
        assert c.abs_min_samples == 1000
        assert c.abs_max_samples == 1000

    def test_exactly_one_is_fraction(self):
        # 1.0 is a fraction (the (0,1] rule)
        c = BinningConstraints(min_samples=1.0)
        c.resolve(total_n=200)
        assert c.abs_min_samples == 200

    def test_contradiction_raises(self):
        c = BinningConstraints(min_samples=500, max_samples=100)
        with pytest.raises(ConstraintError):
            c.resolve(total_n=1000)

    def test_infeasible_warns(self):
        c = BinningConstraints(min_samples=400, min_bins=4)
        with pytest.warns(BinningWarning):
            c.resolve(total_n=1000)

    def test_none_defaults(self):
        c = BinningConstraints()
        c.resolve(total_n=1000)
        assert c.abs_max_samples is None
        assert c.abs_min_samples == 0
        assert c.abs_min_positives == 0

    def test_copy_unresolved(self):
        c = BinningConstraints(min_samples=0.1)
        c.resolve(total_n=100)
        c2 = c.copy()
        assert not c2.is_resolved()
        assert c2.min_samples == 0.1


class TestWoeIv:
    def test_basic(self):
        goods = np.array([100.0, 200.0, 150.0])
        bads = np.array([20.0, 30.0, 40.0])
        woe, iv = woe_iv(goods, bads)
        assert len(woe) == 3
        assert np.all(iv >= 0)  # (gr-br)*ln(gr/br) >= 0 always

    def test_smoothing_prevents_inf(self):
        woe, iv = woe_iv(np.array([0.0, 100.0]), np.array([50.0, 50.0]))
        assert np.all(np.isfinite(woe))

    def test_zero_variation_guard(self):
        woe, iv = woe_iv(np.array([10.0, 20.0]), np.array([0.0, 0.0]))
        assert np.all(woe == 0) and np.all(iv == 0)

    def test_components(self):
        comp = woe_iv(
            np.array([100.0, 50.0]), np.array([10.0, 40.0]), return_components=True
        )
        assert set(comp) == {"woe", "iv", "good_rate", "bad_rate", "total_iv"}
        assert comp["total_iv"] == pytest.approx(comp["iv"].sum())

    def test_exact_value(self):
        # hand-computed with smoothing 0.5, k=2
        goods = np.array([80.0, 20.0])
        bads = np.array([10.0, 30.0])
        gr = (goods + 0.5) / (100 + 1.0)
        br = (bads + 0.5) / (40 + 1.0)
        expect_woe = np.log(gr / br)
        woe, iv = woe_iv(goods, bads)
        assert np.allclose(woe, expect_woe)
        assert np.allclose(iv, (gr - br) * expect_woe)
