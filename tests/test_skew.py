"""Skew robustness: hot keys and hot entities must not change results.

The fit path pre-combines per batch (a hot x value contributes one
partial row per batch, not per row); temporal ops keep entities whole
(correctness) while buckets bound the blast radius of a hot entity."""

import numpy as np
import pandas as pd
import pytest

from mobray.core.binner import fit_binning
from mobray.pipelines.fit import fit_dataset
from mobray.pipelines.temporal import sessionize


class TestFitSkew:
    def test_dominant_x_value(self, ray_session):
        """One x value holds 90% of rows (extreme value skew)."""
        import ray.data

        rng = np.random.RandomState(13)
        n = 50000
        x = np.full(n, 7.0)
        minority = rng.choice(n, size=n // 10, replace=False)
        x[minority] = rng.randint(0, 20, size=len(minority)).astype(float)
        y = (rng.uniform(size=n) < (x / 25.0)).astype(float)
        df = pd.DataFrame({"x": x, "y": y})

        dist = fit_dataset(ray.data.from_pandas(df).repartition(16), "x", "y")
        oracle = fit_binning(x, y)
        np.testing.assert_allclose(dist.means, oracle.means, rtol=1e-9)
        np.testing.assert_array_equal(dist.counts, oracle.counts)
        assert dist.counts.sum() == n

    def test_shuffle_volume_independent_of_skew(self, ray_session):
        """The partial-agg output is one row per distinct x per batch —
        the same whether rows concentrate on one value or spread out."""
        import pyarrow.parquet  # noqa: F401
        import ray.data

        from mobray.stages.binning import make_partial_agg

        n = 20000
        hot = pd.DataFrame({"x": np.full(n, 1.0), "y": np.ones(n)})
        spread = pd.DataFrame(
            {"x": np.arange(n) % 10 * 1.0, "y": np.ones(n)}
        )
        fn = make_partial_agg("x", "y")
        import pyarrow as pa

        hot_rows = fn(pa.Table.from_pandas(hot)).num_rows
        spread_rows = fn(pa.Table.from_pandas(spread)).num_rows
        assert hot_rows <= 4          # 1 group + ydist + meta
        assert spread_rows <= 14      # 10 groups + ydist + meta


class TestEntitySkew:
    def test_hot_entity_sessionize(self, ray_session):
        """One entity holds half of all events; session ids must still be
        correct (entity-complete partitioning)."""
        import ray.data

        rng = np.random.RandomState(17)
        n_hot, n_cold_entities = 5000, 50
        base = pd.Timestamp("2024-01-01")
        hot_ts = base + pd.to_timedelta(np.cumsum(rng.randint(1, 3600, n_hot)), unit="s")
        frames = [pd.DataFrame({"k": "hot", "ts": hot_ts})]
        for e in range(n_cold_entities):
            m = rng.randint(5, 30)
            ts = base + pd.to_timedelta(np.cumsum(rng.randint(1, 3600, m)), unit="s")
            frames.append(pd.DataFrame({"k": f"cold{e}", "ts": ts}))
        df = pd.concat(frames, ignore_index=True)

        out = (
            sessionize(
                ray.data.from_pandas(df).repartition(8), "k", "ts", gap="30min",
                num_buckets=8,
            )
            .to_pandas()
            .sort_values(["k", "ts"])
        )
        # pandas oracle
        oracle = df.sort_values(["k", "ts"]).copy()
        prev = oracle.groupby("k")["ts"].shift(1)
        new = prev.isna() | ((oracle["ts"] - prev) > pd.Timedelta("30min"))
        oracle["seq"] = new.astype("int64").groupby(oracle["k"]).cumsum()
        np.testing.assert_array_equal(
            out["session_seq"].to_numpy(),
            oracle.sort_values(["k", "ts"])["seq"].to_numpy(),
        )
