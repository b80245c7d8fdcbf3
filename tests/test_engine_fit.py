"""Distributed fit/transform vs the single-node numpy core (oracle
equivalence — SURVEY.md §5 test plan item 2)."""

import numpy as np
import pandas as pd
import pytest

from mobray.core.binner import fit_binning, transform_values
from mobray.core.constraints import BinningConstraints
from mobray.pipelines.fit import fit_dataset, transform_dataset


@pytest.fixture(scope="module")
def logistic_df():
    rng = np.random.RandomState(42)
    n = 5000
    x = np.round(np.linspace(-2, 3, n) + rng.normal(0, 0.15, n), 2)  # ~500 distinct
    p = 1.0 / (1.0 + np.exp(-1.4 * x))
    y = (rng.uniform(size=n) < p).astype(float)
    x[:50] = np.nan
    x[50:100] = -999.0
    return pd.DataFrame({"x": x, "y": y})


def assert_models_allclose(m1, m2):
    assert m1.n_bins == m2.n_bins
    np.testing.assert_allclose(m1.lefts, m2.lefts, rtol=1e-9)
    np.testing.assert_allclose(m1.rights, m2.rights, rtol=1e-9)
    np.testing.assert_array_equal(m1.counts, m2.counts)
    np.testing.assert_allclose(m1.sums, m2.sums, rtol=1e-9)
    np.testing.assert_allclose(m1.means, m2.means, rtol=1e-9)
    np.testing.assert_allclose(m1.stds, m2.stds, rtol=1e-9)
    assert m1.labels == m2.labels
    assert m1.sign == m2.sign and m1.is_binary == m2.is_binary
    if m1.is_binary:
        np.testing.assert_allclose(m1.woe, m2.woe, rtol=1e-9)
        np.testing.assert_allclose(m1.iv, m2.iv, rtol=1e-9)


class TestFitParity:
    def test_binary_with_missing_excluded(self, ray_session, logistic_df):
        import ray.data

        ds = ray.data.from_pandas(logistic_df).repartition(8)
        dist = fit_dataset(ds, "x", "y", exclude_values=[-999])
        oracle = fit_binning(
            logistic_df["x"].to_numpy(),
            logistic_df["y"].to_numpy(),
            exclude_values=[-999],
        )
        assert_models_allclose(dist, oracle)
        # summary tables line up incl. Missing / Excluded rows
        s1, s2 = dist.summary_df(), oracle.summary_df()
        assert list(s1["bucket"]) == list(s2["bucket"])
        np.testing.assert_allclose(
            s1["count_pct"].to_numpy(), s2["count_pct"].to_numpy(), rtol=1e-9
        )

    def test_unobserved_exclude_value_maps_distributed(self, ray_session, logistic_df):
        """Parity with the reference's transform-time exclude check
        (MOBPY/binning/mob.py:430-431): a requested exclude value absent
        from the fit data must still reach the distributed model."""
        import ray.data

        from mobray.core import transform_values

        ds = ray.data.from_pandas(logistic_df).repartition(4)
        dist = fit_dataset(ds, "x", "y", exclude_values=[-999, -123456.0])
        assert -123456.0 in dist.exclude_values  # never occurs in the data
        out = transform_values(dist, np.array([-123456.0]))
        assert out[0] == "Excluded:-123456.0"

    def test_continuous_target(self, ray_session):
        import ray.data

        rng = np.random.RandomState(7)
        x = np.repeat(np.arange(50.0), 100)
        y = x * 2 + rng.normal(0, 1, 5000)
        df = pd.DataFrame({"x": x, "y": y})
        ds = ray.data.from_pandas(df).repartition(6)
        dist = fit_dataset(ds, "x", "y")
        oracle = fit_binning(x, y)
        assert not dist.is_binary
        assert_models_allclose(dist, oracle)

    def test_constraints_and_strategies(self, ray_session, logistic_df):
        import ray.data

        ds = ray.data.from_pandas(logistic_df).repartition(4)
        for strat in ("highest_pvalue", "smallest_loss", "balanced_size"):
            c = BinningConstraints(max_bins=4, min_bins=2, min_samples=0.05)
            dist = fit_dataset(
                ds, "x", "y", constraints=c, exclude_values=[-999], merge_strategy=strat
            )
            oracle = fit_binning(
                logistic_df["x"].to_numpy(),
                logistic_df["y"].to_numpy(),
                constraints=BinningConstraints(max_bins=4, min_bins=2, min_samples=0.05),
                exclude_values=[-999],
                merge_strategy=strat,
            )
            assert_models_allclose(dist, oracle)

    def test_partitioning_invariance(self, ray_session, logistic_df):
        """Result must not depend on block layout."""
        import ray.data

        m2 = fit_dataset(ray.data.from_pandas(logistic_df).repartition(2), "x", "y")
        m16 = fit_dataset(ray.data.from_pandas(logistic_df).repartition(16), "x", "y")
        assert_models_allclose(m2, m16)

    def test_lineitem_real_data(self, ray_session, sf_dir):
        import pyarrow.parquet as pq
        import ray.data

        ds = ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_quantity", "l_extendedprice"]
        )
        dist = fit_dataset(ds, "l_quantity", "l_extendedprice")
        t = pq.read_table(f"{sf_dir}/lineitem.parquet", columns=["l_quantity", "l_extendedprice"])
        oracle = fit_binning(
            t["l_quantity"].to_numpy(), t["l_extendedprice"].to_numpy()
        )
        assert_models_allclose(dist, oracle)


class TestTransformDataset:
    def test_matches_core(self, ray_session, logistic_df):
        import ray.data

        ds = ray.data.from_pandas(logistic_df).repartition(4)
        model = fit_dataset(ds, "x", "y", exclude_values=[-999])
        out = transform_dataset(ds, model, "x", assign="interval").to_pandas()
        expect = transform_values(model, logistic_df["x"].to_numpy(), "interval")
        # order-insensitive compare (row order may differ across blocks)
        got = out.sort_values(["x", "y"], na_position="last")["x_interval"].to_numpy()
        ref = (
            pd.DataFrame({"x": logistic_df["x"], "y": logistic_df["y"], "lab": expect})
            .sort_values(["x", "y"], na_position="last")["lab"]
            .to_numpy()
        )
        assert list(got) == list(ref)

    def test_woe_assign(self, ray_session, logistic_df):
        import ray.data

        ds = ray.data.from_pandas(logistic_df).repartition(4)
        model = fit_dataset(ds, "x", "y", exclude_values=[-999])
        out = transform_dataset(ds, model, "x", assign="woe", out_col="x_woe").to_pandas()
        assert out["x_woe"].dtype == float
        # Missing / excluded rows -> NaN
        nan_rows = out[out["x"].isna() | (out["x"] == -999.0)]
        assert nan_rows["x_woe"].isna().all()
        valid = out[~out["x"].isna() & (out["x"] != -999.0)]
        assert valid["x_woe"].notna().all()
