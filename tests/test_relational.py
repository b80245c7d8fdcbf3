"""hash_join / semi_join correctness vs pandas oracles."""

import numpy as np
import pandas as pd
import pytest

from mobray.pipelines.relational import hash_join, semi_join


@pytest.fixture()
def sides():
    rng = np.random.RandomState(21)
    left = pd.DataFrame(
        {
            "k": rng.randint(0, 50, 500),
            "lv": rng.rand(500),
        }
    )
    # right: some keys missing, some duplicated (join multiplicity)
    right = pd.DataFrame(
        {
            "k": np.concatenate([np.arange(0, 40), np.arange(0, 10)]),
            "rv": rng.rand(50),
        }
    )
    return left, right


def canon(df, cols):
    return (
        df[cols].sort_values(cols).reset_index(drop=True).round(9)
    )


class TestHashJoin:
    def test_inner_matches_pandas(self, ray_session, sides):
        import ray.data

        left, right = sides
        got = hash_join(
            ray.data.from_pandas(left).repartition(4),
            ray.data.from_pandas(right).repartition(3),
            on="k",
            how="inner",
            num_buckets=8,
        ).to_pandas()
        expect = left.merge(right, on="k", how="inner")
        cols = ["k", "lv", "rv"]
        pd.testing.assert_frame_equal(canon(got, cols), canon(expect, cols))

    def test_left_keeps_unmatched(self, ray_session, sides):
        import ray.data

        left, right = sides
        got = hash_join(
            ray.data.from_pandas(left).repartition(4),
            ray.data.from_pandas(right).repartition(3),
            on="k",
            how="left",
            num_buckets=8,
        ).to_pandas()
        expect = left.merge(right, on="k", how="left")
        assert len(got) == len(expect)
        assert got["rv"].isna().sum() == expect["rv"].isna().sum()

    def test_name_collision_suffix(self, ray_session):
        import ray.data

        left = pd.DataFrame({"k": [1, 2], "v": [10.0, 20.0]})
        right = pd.DataFrame({"k": [1, 2], "v": [0.1, 0.2]})
        got = hash_join(
            ray.data.from_pandas(left),
            ray.data.from_pandas(right),
            on="k",
            num_buckets=2,
        ).to_pandas()
        assert {"v", "v_r"} <= set(got.columns)

    def test_bad_how(self, ray_session, sides):
        import ray.data

        left, right = sides
        with pytest.raises(ValueError, match="how"):
            hash_join(
                ray.data.from_pandas(left), ray.data.from_pandas(right),
                on="k", how="outer",
            )


class TestSemiJoin:
    def test_semi_and_anti_partition_left(self, ray_session, sides):
        import ray.data

        left, right = sides
        l_ds = ray.data.from_pandas(left).repartition(4)
        r_ds = ray.data.from_pandas(right).repartition(2)
        semi = semi_join(l_ds, r_ds, on="k", num_buckets=8).to_pandas()
        anti = semi_join(l_ds, r_ds, on="k", anti=True, num_buckets=8).to_pandas()
        keys = set(right["k"])
        assert semi["k"].isin(keys).all()
        assert (~anti["k"].isin(keys)).all()
        assert len(semi) + len(anti) == len(left)
        # semi join never duplicates left rows despite right dups
        assert len(semi) == left["k"].isin(keys).sum()


class TestNullKeySemantics:
    """SQL semantics for NULL join keys (what every DuckDB oracle
    produces): NULL = NULL is not true. pd.merge/isin match NaN to NaN,
    so the padded engine must filter them; both engines must agree."""

    @pytest.fixture()
    def null_sides(self):
        left = pd.DataFrame(
            {"k": [1.0, 2.0, np.nan, np.nan], "a": [10, 20, 30, 40]}
        )
        right = pd.DataFrame({"k": [1.0, np.nan], "b": [100.0, 200.0]})
        return left, right

    def test_padded_inner_left(self, ray_session, null_sides):
        import ray.data

        left, right = null_sides
        inner = hash_join(
            ray.data.from_pandas(left), ray.data.from_pandas(right),
            on="k", num_buckets=4, engine="padded",
        ).to_pandas()
        assert inner["a"].tolist() == [10]  # only the non-null match
        lj = hash_join(
            ray.data.from_pandas(left), ray.data.from_pandas(right),
            on="k", how="left", num_buckets=4, engine="padded",
        ).to_pandas().sort_values("a")
        assert lj["a"].tolist() == [10, 20, 30, 40]
        assert lj["b"].notna().tolist() == [True, False, False, False]

    def test_padded_semi_anti(self, ray_session, null_sides):
        import ray.data

        left, right = null_sides
        semi = semi_join(
            ray.data.from_pandas(left), ray.data.from_pandas(right),
            on="k", num_buckets=4, engine="padded",
        ).to_pandas()
        assert sorted(semi["a"].tolist()) == [10]
        anti = semi_join(
            ray.data.from_pandas(left), ray.data.from_pandas(right),
            on="k", anti=True, num_buckets=4, engine="padded",
        ).to_pandas()
        # null-keyed left rows always anti-survive (SQL NOT EXISTS)
        assert sorted(anti["a"].tolist()) == [20, 30, 40]

    def test_salted_drops_null_matches(self, ray_session, null_sides):
        import ray.data

        from mobray.pipelines.relational import hash_join_salted

        left, right = null_sides
        out = hash_join_salted(
            ray.data.from_pandas(left), ray.data.from_pandas(right),
            on="k", hot_keys=[1.0], salt=2, num_buckets=4,
        ).to_pandas()
        assert out["a"].tolist() == [10]


class TestJoinAggregatorSizing:
    def test_total_reservation_leaves_producer_room(self):
        """Dataset.join aggregator actors must never reserve more than
        ~half the cluster — nb x share above that deadlocked a 4-CPU
        session with the default 64-bucket floor (and a 0.05 floor that
        reserved 3.2/4 still deadlocked)."""
        import ray

        from mobray.pipelines.relational import _join_aggregator_args

        cpus = float(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4.0
        for nb in (2, 8, 16, 64, 200):
            share = _join_aggregator_args(nb)["num_cpus"]
            assert 0 < share <= 1.0
            assert nb * share <= cpus * 0.5 + 1e-9


class TestEngineAgreementRandomized:
    """Native (Dataset.join) and padded engines must agree with a
    null-aware pandas oracle on random inputs: duplicate keys (join
    multiplicity), null keys on both sides, keys private to each side."""

    @staticmethod
    def _frames(seed):
        rng = np.random.RandomState(seed)
        def keys(n):
            k = rng.randint(0, 12, n).astype(float)
            k[rng.uniform(size=n) < 0.15] = np.nan
            return k
        left = pd.DataFrame({"k": keys(120), "lv": rng.rand(120)})
        right = pd.DataFrame({"k": keys(30), "rv": rng.rand(30)})
        return left, right

    @staticmethod
    def _oracle(left, right, how):
        r = right[right["k"].notna()]
        return left.merge(r, on="k", how=how)

    @pytest.mark.parametrize("seed", [0, 1, 2])
    @pytest.mark.parametrize("how", ["inner", "left"])
    def test_triple_agreement(self, ray_session, seed, how):
        import ray.data

        left, right = self._frames(seed)
        expect = canon(self._oracle(left, right, how).fillna(-1), ["k", "lv", "rv"])
        for engine in ("native", "padded"):
            got = hash_join(
                ray.data.from_pandas(left).repartition(3),
                ray.data.from_pandas(right).repartition(2),
                on="k", how=how, num_buckets=4, engine=engine,
            ).to_pandas()
            got = canon(got.fillna(-1), ["k", "lv", "rv"])
            pd.testing.assert_frame_equal(got, expect, check_dtype=False)

    @pytest.mark.parametrize("seed", [0, 1])
    def test_semi_anti_agreement(self, ray_session, seed):
        import ray.data

        left, right = self._frames(seed)
        valid = set(right["k"].dropna())
        match = left["k"].notna() & left["k"].isin(valid)
        for engine in ("native", "padded"):
            semi = semi_join(
                ray.data.from_pandas(left), ray.data.from_pandas(right),
                on="k", num_buckets=4, engine=engine,
            ).to_pandas()
            anti = semi_join(
                ray.data.from_pandas(left), ray.data.from_pandas(right),
                on="k", anti=True, num_buckets=4, engine=engine,
            ).to_pandas()
            assert sorted(semi["lv"].round(9)) == sorted(left.loc[match, "lv"].round(9)), engine
            assert sorted(anti["lv"].round(9)) == sorted(left.loc[~match, "lv"].round(9)), engine
