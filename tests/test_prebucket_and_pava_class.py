"""Quantile prebucketing (high-cardinality scale valve) + the PAVA
composition class."""

import numpy as np
import pandas as pd
import pytest

from mobray.core.constraints import BinningConstraints
from mobray.core.merge import merge_adjacent
from mobray.core.pava import PAVA
from mobray.exceptions import DataError
from mobray.pipelines.fit import fit_dataset


class TestPavaClass:
    def make_df(self):
        rng = np.random.RandomState(0)
        x = np.repeat(np.arange(20.0), 25)
        y = x + rng.normal(0, 0.5, 500)
        return pd.DataFrame({"x": x, "y": y})

    def test_fit_and_export(self):
        p = PAVA(df=self.make_df(), x="x", y="y", sign="auto").fit()
        assert p.resolved_sign_ == "+"
        assert p.validate_monotonicity()
        blocks = p.export_blocks(as_dict=True)
        assert blocks[0]["left"] == -np.inf
        tuples = p.export_blocks(as_dict=False)
        assert len(tuples[0]) == 7

    def test_feeds_merge_adjacent(self):
        """The §3.3 composition path: PAVA -> merge_adjacent directly."""
        p = PAVA(df=self.make_df(), x="x", y="y").fit()
        c = BinningConstraints(max_bins=4, min_bins=2)
        c.resolve(total_n=500)
        merged = merge_adjacent(p.export_blocks(), c, is_binary_y=False)
        assert 1 <= len(merged) <= 4

    def test_guards(self):
        with pytest.raises(ValueError, match="metric"):
            PAVA(df=self.make_df(), x="x", y="y", metric="median")
        with pytest.raises(ValueError, match="sort_kind"):
            PAVA(df=self.make_df(), x="x", y="y", sort_kind="bogus")
        with pytest.raises(DataError, match="Missing columns"):
            PAVA(df=self.make_df(), x="nope", y="y").fit()
        with pytest.raises(DataError, match="Call fit"):
            PAVA(df=self.make_df(), x="x", y="y").export_blocks()


class TestPrebucketing:
    def test_bounds_distinct_x(self, ray_session):
        import ray.data

        rng = np.random.RandomState(3)
        x = rng.normal(size=20000)  # ~20k distinct float values
        p = 1.0 / (1.0 + np.exp(-2.0 * x))
        y = (rng.uniform(size=20000) < p).astype(float)
        df = pd.DataFrame({"x": x, "y": y})
        ds = ray.data.from_pandas(df).repartition(8)

        exact = fit_dataset(ds, "x", "y")
        assert exact.diagnostics["n_distinct_x"] == len(np.unique(x))

        approx = fit_dataset(ds, "x", "y", max_distinct_x=256)
        assert approx.diagnostics["n_distinct_x"] <= 256
        # bins remain monotone, cover all rows, and approximate the exact fit
        assert approx.counts.sum() == 20000
        assert np.all(np.diff(approx.means) >= -1e-10)
        assert approx.n_bins <= 6
        # event rates of corresponding bins are close to the exact fit's range
        assert abs(approx.means[0] - exact.means[0]) < 0.1
        assert abs(approx.means[-1] - exact.means[-1]) < 0.1

    def test_missing_excluded_not_bucketed(self, ray_session):
        import ray.data

        rng = np.random.RandomState(4)
        x = rng.normal(size=5000)
        y = (rng.uniform(size=5000) < 0.3).astype(float)
        x[:100] = np.nan
        x[100:200] = -999.0
        ds = ray.data.from_pandas(pd.DataFrame({"x": x, "y": y})).repartition(4)
        model = fit_dataset(ds, "x", "y", exclude_values=[-999], max_distinct_x=64)
        s = model.summary_df()
        assert s[s["bucket"] == "Missing"]["count"].iloc[0] == 100
        assert s[s["bucket"] == "Excluded:-999.0"]["count"].iloc[0] == 100
        assert s["count"].sum() == 5000


class TestPrebucketSampleBias:
    def test_sorted_storage_gets_full_range_edges(self, ray_session, tmp_path):
        """Input SORTED by x (the storage order that biased a limit()
        sample): quantile prebucket edges must still span the whole x
        range, so the top of the distribution keeps its own buckets."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray.data

        from mobray.pipelines.fit import fit_dataset

        n = 400_000
        rng = np.random.RandomState(3)
        x = np.sort(rng.uniform(0, 1000, size=n))  # sorted-by-x storage
        y = x * 0.01 + rng.normal(scale=0.5, size=n)
        pq.write_table(
            pa.Table.from_pandas(pd.DataFrame({"x": x, "y": y})),
            str(tmp_path / "sorted.parquet"),
        )
        ds = ray.data.read_parquet(str(tmp_path / "sorted.parquet"))
        model = fit_dataset(
            ds, "x", "y", max_distinct_x=64, prebucket_sample_rows=20_000
        )
        uppers = model.rights[np.isfinite(model.rights)]
        # a first-blocks sample would cap every finite edge near the low
        # tail (~ first 20k of 400k sorted rows -> x < 50)
        assert max(uppers) > 500
