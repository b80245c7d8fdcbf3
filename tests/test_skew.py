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


class TestJoinKeySkew:
    def _skewed_tables(self):
        """Left: 20k rows, ONE key holds 40%; right: small dim table with
        2 payload rows for the hot key (so replication correctness — each
        right row exactly once per left match — is exercised)."""
        rng = np.random.RandomState(23)
        n = 20000
        keys = rng.randint(0, 200, size=n).astype(np.int64)
        keys[: int(n * 0.4)] = 7  # hot key
        left = pd.DataFrame(
            {"k": keys, "lv": np.arange(n, dtype=np.int64)}
        ).sample(frac=1.0, random_state=5).reset_index(drop=True)
        right = pd.DataFrame(
            {
                "k": np.concatenate([np.arange(150, dtype=np.int64), [7]]),
                "rv": np.concatenate(
                    [np.arange(150, dtype=np.int64) * 10, [99999]]
                ),
            }
        )
        return left, right

    @pytest.mark.parametrize("how", ["inner", "left"])
    def test_salted_equals_plain(self, ray_session, how):
        import ray.data

        from mobray.pipelines.relational import hash_join, hash_join_salted

        left, right = self._skewed_tables()
        lds = ray.data.from_pandas(left).repartition(8)
        rds = ray.data.from_pandas(right).repartition(2)
        plain = (
            hash_join(
                lds, rds, on="k", how=how, num_buckets=16, engine="padded"
            )
            .to_pandas()
            .sort_values(["k", "lv"])
            .reset_index(drop=True)
        )
        salted = (
            hash_join_salted(
                lds, rds, on="k", how=how, hot_keys=[7], salt=8, num_buckets=16
            )
            .to_pandas()
            .sort_values(["k", "lv"])
            .reset_index(drop=True)
        )
        assert list(salted.columns) == list(plain.columns)
        pd.testing.assert_frame_equal(salted[plain.columns], plain)

    def test_hot_key_spreads_across_buckets(self, ray_session):
        """The point of salting: the hot key's rows must land in more
        than one bucket (a plain hash join puts them all in one)."""
        import ray.data

        from mobray.pipelines.relational import _salted_bucket

        left, _ = self._skewed_tables()
        hotkv = left.loc[left["k"] == 7, "k"].to_numpy()
        salts = (np.arange(len(hotkv)) % 8).astype(np.int32)
        buckets = _salted_bucket(hotkv, salts, 16)
        assert len(np.unique(buckets)) >= 4
        # and the per-bucket share of the hot key drops accordingly
        top = np.bincount(buckets).max() / len(hotkv)
        assert top <= 0.5

    def test_rejects_degenerate_salt(self, ray_session):
        import ray.data

        from mobray.pipelines.relational import hash_join_salted

        left, right = self._skewed_tables()
        with pytest.raises(ValueError, match="salt"):
            hash_join_salted(
                ray.data.from_pandas(left),
                ray.data.from_pandas(right),
                on="k",
                hot_keys=[7],
                salt=1,
            )


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
