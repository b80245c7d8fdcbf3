"""Incremental fit via mergeable FitAggregates sketches:
fit(merge(agg(A), agg(B))) must equal fit(A ∪ B) exactly."""

import numpy as np
import pandas as pd
import pytest

from mobray.core.binner import (
    aggregates_from_arrays,
    aggregates_from_json,
    aggregates_to_json,
    fit_binning,
    fit_from_aggregates,
    merge_fit_aggregates,
)
from mobray.pipelines.fit import collect_aggregates, fit_dataset


def make_df(n, seed):
    rng = np.random.RandomState(seed)
    x = np.round(rng.uniform(-2, 3, n), 1)
    p = 1.0 / (1.0 + np.exp(-1.4 * x))
    y = (rng.uniform(size=n) < p).astype(float)
    x[: n // 50] = np.nan
    x[n // 50 : n // 25] = -999.0
    return pd.DataFrame({"x": x, "y": y})


def assert_models_equal(m1, m2, rtol=1e-12):
    assert m1.labels == m2.labels
    np.testing.assert_allclose(m1.means, m2.means, rtol=rtol)
    np.testing.assert_array_equal(m1.counts, m2.counts)
    if m1.is_binary:
        np.testing.assert_allclose(m1.woe, m2.woe, rtol=rtol)
    assert [dict(r) for r in m1.special_rows] == [dict(r) for r in m2.special_rows]


class TestMergeAggregates:
    def test_core_merge_equals_union(self):
        a, b = make_df(3000, 1), make_df(2000, 2)
        both = pd.concat([a, b], ignore_index=True)
        agg_a = aggregates_from_arrays(a["x"].to_numpy(), a["y"].to_numpy(), [-999])
        agg_b = aggregates_from_arrays(b["x"].to_numpy(), b["y"].to_numpy(), [-999])
        merged = merge_fit_aggregates(agg_a, agg_b)
        m_inc = fit_from_aggregates(merged)
        m_full = fit_binning(both["x"].to_numpy(), both["y"].to_numpy(), exclude_values=[-999])
        assert_models_equal(m_inc, m_full, rtol=1e-9)

    def test_merge_is_commutative(self):
        a = aggregates_from_arrays(*make_df(1000, 3)[["x", "y"]].T.to_numpy(), [-999])
        b = aggregates_from_arrays(*make_df(900, 4)[["x", "y"]].T.to_numpy(), [-999])
        ab = merge_fit_aggregates(a, b)
        ba = merge_fit_aggregates(b, a)
        np.testing.assert_array_equal(ab.groups.x, ba.groups.x)
        np.testing.assert_allclose(ab.groups.sum, ba.groups.sum)
        assert ab.clean_n_rows == ba.clean_n_rows

    def test_disjoint_x_domains(self):
        a = aggregates_from_arrays(np.array([1.0, 1.0, 2.0]), np.array([0.0, 1.0, 1.0]))
        b = aggregates_from_arrays(np.array([5.0, 6.0]), np.array([0.0, 1.0]))
        m = merge_fit_aggregates(a, b)
        assert list(m.groups.x) == [1.0, 2.0, 5.0, 6.0]
        assert m.groups.count.sum() == 5

    def test_json_roundtrip(self):
        df = make_df(1500, 5)
        agg = aggregates_from_arrays(df["x"].to_numpy(), df["y"].to_numpy(), [-999])
        agg2 = aggregates_from_json(aggregates_to_json(agg))
        m1 = fit_from_aggregates(agg)
        m2 = fit_from_aggregates(agg2)
        assert_models_equal(m1, m2)


class TestDistributedIncremental:
    def test_collect_merge_refit(self, ray_session):
        """The scale workflow: day-1 aggregates saved; day-2 aggregates
        collected from new data only; merged + reduced == full refit."""
        import ray.data

        a, b = make_df(4000, 7), make_df(3000, 8)
        agg_a = collect_aggregates(
            ray.data.from_pandas(a).repartition(4), "x", "y", exclude_values=[-999]
        )
        # simulate checkpointing the sketch between days
        saved = aggregates_to_json(agg_a)
        agg_b = collect_aggregates(
            ray.data.from_pandas(b).repartition(3), "x", "y", exclude_values=[-999]
        )
        merged = merge_fit_aggregates(aggregates_from_json(saved), agg_b)
        m_inc = fit_from_aggregates(merged)

        both = pd.concat([a, b], ignore_index=True)
        m_full = fit_dataset(
            ray.data.from_pandas(both).repartition(6), "x", "y", exclude_values=[-999]
        )
        assert_models_equal(m_inc, m_full, rtol=1e-9)
