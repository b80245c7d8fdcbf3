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
