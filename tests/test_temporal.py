"""Temporal operators vs DuckDB/pandas oracles on the events table
(SURVEY.md §5 test plan item 3), incl. explicit no-leakage assertions."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from mobray.pipelines.temporal import (
    asof_join,
    asof_join_broadcast,
    backfill,
    lag_lead,
    sessionize,
    tumbling_window,
)


@pytest.fixture(scope="module")
def events_pd(sf_dir):
    return pd.read_parquet(f"{sf_dir}/events.parquet")


@pytest.fixture()
def events_ds(ray_session, sf_dir):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/events.parquet")


def duck_sql(sf_dir, query):
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    df = con.sql(query).df()
    con.close()
    return df


class TestLagLead:
    def test_vs_sql(self, events_ds, sf_dir):
        out = (
            lag_lead(events_ds, "user_id", "ts", ["value"], lags=[1], leads=[1], num_buckets=4)
            .to_pandas()
            .sort_values(["user_id", "ts"])
            .reset_index(drop=True)
        )
        oracle = (
            duck_sql(sf_dir,
                """
            SELECT user_id, ts, value,
                   LAG(value) OVER (PARTITION BY user_id ORDER BY ts) AS value_lag1,
                   LEAD(value) OVER (PARTITION BY user_id ORDER BY ts) AS value_lead1
            FROM events ORDER BY user_id, ts
            """
            )
        )
        np.testing.assert_allclose(
            out["value_lag1"].to_numpy(), oracle["value_lag1"].to_numpy(), equal_nan=True
        )
        np.testing.assert_allclose(
            out["value_lead1"].to_numpy(), oracle["value_lead1"].to_numpy(), equal_nan=True
        )


class TestBackfill:
    def test_vs_sql(self, ray_session, events_pd, sf_dir):
        import ray.data

        # null out non-purchase values, then forward-fill per user
        df = events_pd.copy()
        df["pv"] = df["value"].where(df["event_type"] == "purchase")
        ds = ray.data.from_pandas(df).repartition(4)
        out = (
            backfill(ds, "user_id", "ts", ["pv"], num_buckets=4)
            .to_pandas()
            .sort_values(["user_id", "ts"])
            .reset_index(drop=True)
        )
        oracle = duck_sql(sf_dir,
            """
            SELECT user_id, ts,
                   LAST_VALUE(CASE WHEN event_type='purchase' THEN value END IGNORE NULLS)
                     OVER (PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv_filled
            FROM events ORDER BY user_id, ts
            """
        )
        np.testing.assert_allclose(
            out["pv_filled"].to_numpy(), oracle["pv_filled"].to_numpy(), equal_nan=True
        )

    def test_no_future_leak(self, ray_session):
        """A null before the first observation must stay null — never
        filled from a later value."""
        import ray.data

        df = pd.DataFrame(
            {
                "k": ["a"] * 3,
                "ts": pd.to_datetime(["2024-01-01", "2024-01-02", "2024-01-03"]),
                "v": [np.nan, 5.0, np.nan],
            }
        )
        out = (
            backfill(ray.data.from_pandas(df), "k", "ts", ["v"], num_buckets=2)
            .to_pandas()
            .sort_values("ts")
        )
        assert np.isnan(out["v_filled"].iloc[0])
        assert out["v_filled"].iloc[2] == 5.0


class TestSessionize:
    def test_vs_sql(self, events_ds, sf_dir):
        out = (
            sessionize(events_ds, "user_id", "ts", gap="30min", num_buckets=4)
            .to_pandas()
            .sort_values(["user_id", "ts"])
            .reset_index(drop=True)
        )
        oracle = (
            duck_sql(sf_dir,
                """
            SELECT user_id, ts,
                   SUM(CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END)
                     OVER (PARTITION BY user_id ORDER BY ts) AS session_seq
            FROM (SELECT user_id, ts,
                         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
                  FROM events)
            ORDER BY user_id, ts
            """
            )
        )
        np.testing.assert_array_equal(
            out["session_seq"].to_numpy(), oracle["session_seq"].to_numpy()
        )

    def test_session_ids_scoped_to_entity(self, events_ds):
        out = sessionize(events_ds, "user_id", "ts", gap="30min", num_buckets=4).to_pandas()
        # session_id embeds the entity, so ids are globally unique per entity
        assert out["session_id"].str.split("#").str[0].astype(int).equals(out["user_id"])


class TestAsofJoin:
    def _sides(self, events_pd):
        left = events_pd[events_pd["event_type"] == "view"][["user_id", "ts", "event_id"]]
        right = events_pd[events_pd["event_type"] == "purchase"][
            ["user_id", "ts", "value"]
        ]
        return left, right

    def test_vs_duckdb_asof(self, ray_session, events_pd, sf_dir):
        import ray.data

        left, right = self._sides(events_pd)
        out = (
            asof_join(
                ray.data.from_pandas(left).repartition(4),
                ray.data.from_pandas(right).repartition(3),
                key="user_id",
                ts="ts",
                right_cols=["value"],
                num_buckets=4,
            )
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        oracle = (
            duck_sql(sf_dir,
                """
            SELECT l.user_id, l.ts, l.event_id, r.value
            FROM (SELECT user_id, ts, event_id FROM events WHERE event_type='view') l
            ASOF LEFT JOIN
                 (SELECT user_id, ts, value FROM events WHERE event_type='purchase') r
              ON l.user_id = r.user_id AND r.ts <= l.ts
            ORDER BY l.event_id
            """
            )
        )
        assert len(out) == len(oracle)
        np.testing.assert_allclose(
            out["value"].to_numpy(), oracle["value"].to_numpy(), equal_nan=True
        )

    def test_broadcast_variant_matches(self, ray_session, events_pd):
        import ray.data

        left, right = self._sides(events_pd)
        a = (
            asof_join(
                ray.data.from_pandas(left).repartition(4),
                ray.data.from_pandas(right).repartition(2),
                key="user_id",
                ts="ts",
                right_cols=["value"],
                num_buckets=3,
            )
            .to_pandas()
            .sort_values("event_id")["value"]
            .to_numpy()
        )
        b = (
            asof_join_broadcast(
                ray.data.from_pandas(left).repartition(4),
                right,
                key="user_id",
                ts="ts",
                right_cols=["value"],
            )
            .to_pandas()
            .sort_values("event_id")["value"]
            .to_numpy()
        )
        np.testing.assert_allclose(a, b, equal_nan=True)

    def test_zero_temporal_leakage(self, ray_session):
        """Right rows strictly later than the left row must NEVER match."""
        import ray.data

        left = pd.DataFrame(
            {"k": ["e1", "e1"], "ts": pd.to_datetime(["2024-01-05", "2024-01-10"]),
             "row": [1, 2]}
        )
        right = pd.DataFrame(
            {
                "k": ["e1", "e1", "e1"],
                "ts": pd.to_datetime(["2024-01-04", "2024-01-07", "2024-01-20"]),
                "attr": [10.0, 20.0, 999.0],
            }
        )
        out = (
            asof_join(
                ray.data.from_pandas(left),
                ray.data.from_pandas(right),
                key="k",
                ts="ts",
                right_cols=["attr"],
                num_buckets=2,
            )
            .to_pandas()
            .sort_values("row")
        )
        assert list(out["attr"]) == [10.0, 20.0]  # 999.0 (future) never leaks

    def test_no_match_gives_null(self, ray_session):
        import ray.data

        left = pd.DataFrame(
            {"k": ["a"], "ts": pd.to_datetime(["2024-01-01"]), "row": [1]}
        )
        right = pd.DataFrame(
            {"k": ["a"], "ts": pd.to_datetime(["2024-06-01"]), "attr": [5.0]}
        )
        out = asof_join(
            ray.data.from_pandas(left),
            ray.data.from_pandas(right),
            key="k",
            ts="ts",
            right_cols=["attr"],
            num_buckets=2,
        ).to_pandas()
        assert out["attr"].isna().all()


class TestTumblingWindow:
    def test_vs_sql(self, events_ds, sf_dir):
        out = (
            tumbling_window(events_ds, "user_id", "ts", "1h", "value")
            .to_pandas()
            .sort_values(["user_id", "window_start"])
            .reset_index(drop=True)
        )
        oracle = (
            duck_sql(sf_dir,
                """
            SELECT user_id, time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
                   count(*) AS n_events, sum(value) AS sum_value,
                   min(value) AS min_value, max(value) AS max_value,
                   avg(value) AS mean_value
            FROM events GROUP BY 1, 2 ORDER BY 1, 2
            """
            )
        )
        assert len(out) == len(oracle)
        np.testing.assert_array_equal(
            out["n_events"].to_numpy(), oracle["n_events"].to_numpy()
        )
        np.testing.assert_allclose(
            out["sum_value"].to_numpy(), oracle["sum_value"].to_numpy(), rtol=1e-9
        )
        np.testing.assert_allclose(
            out["mean_value"].to_numpy(), oracle["mean_value"].to_numpy(), rtol=1e-9
        )


class TestAsofVariants:
    def _data(self):
        left = pd.DataFrame(
            {
                "k": ["a"] * 3,
                "ts": pd.to_datetime(["2024-01-05", "2024-01-10", "2024-01-20"]),
                "row": [1, 2, 3],
            }
        )
        right = pd.DataFrame(
            {
                "k": ["a"] * 3,
                "ts": pd.to_datetime(["2024-01-04", "2024-01-12", "2024-01-30"]),
                "attr": [1.0, 2.0, 3.0],
            }
        )
        return left, right

    def _run(self, direction=None, tolerance=None, allow_exact=True):
        import ray.data

        left, right = self._data()
        kwargs = {}
        if direction:
            kwargs["direction"] = direction
        out = asof_join(
            ray.data.from_pandas(left),
            ray.data.from_pandas(right),
            key="k",
            ts="ts",
            right_cols=["attr"],
            num_buckets=2,
            tolerance=tolerance,
            allow_exact_matches=allow_exact,
            **kwargs,
        ).to_pandas().sort_values("row")
        return list(out["attr"])

    def test_forward(self, ray_session):
        # next right row at ts >= left ts
        assert self._run(direction="forward") == [2.0, 2.0, 3.0]

    def test_nearest(self, ray_session):
        assert self._run(direction="nearest") == [1.0, 2.0, 2.0]

    def test_tolerance(self, ray_session):
        # backward within 2 days only: row1 matches 01-04 (1d); row2's
        # latest earlier row is 01-04 (6d, out of tolerance); row3's is
        # 01-12 (8d, out)
        out = self._run(tolerance="2D")
        assert out[0] == 1.0
        assert np.isnan(out[1]) and np.isnan(out[2])

    def test_exact_match_excluded(self, ray_session):
        import ray.data

        left, right = self._data()
        left.loc[0, "ts"] = right.loc[0, "ts"]  # exact tie at 2024-01-04
        out = (
            asof_join(
                ray.data.from_pandas(left),
                ray.data.from_pandas(right),
                key="k",
                ts="ts",
                right_cols=["attr"],
                num_buckets=2,
                allow_exact_matches=False,
            )
            .to_pandas()
            .sort_values("row")
        )
        assert np.isnan(out["attr"].iloc[0])  # same-instant row must not match


class TestTiebreakDeterminism:
    """Rows tied on (key, ts) follow arrival order (same as the SQL
    window they mirror) — not reproducible after an unordered upstream.
    The explicit ``tiebreak`` column must pin the output."""

    @staticmethod
    def _tied_events(n=400, seed=0):
        rng = np.random.RandomState(seed)
        return pd.DataFrame(
            {
                "event_id": np.arange(n),
                "user_id": rng.randint(0, 5, n),
                # only 20 distinct hours -> heavy (user, ts) ties
                "ts": pd.to_datetime("2024-01-01")
                + pd.to_timedelta(rng.randint(0, 20, n), unit="h"),
                "value": rng.randn(n),
            }
        )

    def test_lag_lead_invariant_with_tiebreak(self, ray_session):
        import ray.data

        from mobray.pipelines.temporal import lag_lead

        df = self._tied_events()
        outs = []
        for seed in (None, 1, 2):
            ds = ray.data.from_pandas(df)
            if seed is not None:
                ds = ds.random_shuffle(seed=seed)
            o = lag_lead(
                ds, key="user_id", ts="ts", cols=["value"], tiebreak="event_id"
            ).to_pandas().sort_values("event_id").reset_index(drop=True)
            outs.append(o["value_lag1"].fillna(-9.0))
        assert outs[0].equals(outs[1]) and outs[0].equals(outs[2])

    def test_topk_rank_invariant_with_tiebreak(self, ray_session):
        import ray.data

        from mobray.pipelines.temporal import topk_per_key

        df = self._tied_events()
        df["value"] = np.round(df["value"], 0)  # force value ties
        outs = []
        for seed in (None, 3):
            ds = ray.data.from_pandas(df)
            if seed is not None:
                ds = ds.random_shuffle(seed=seed)
            o = topk_per_key(
                ds, key="user_id", value_col="value", k=5, tiebreak="event_id"
            ).to_pandas().sort_values(["user_id", "rank"]).reset_index(drop=True)
            outs.append(o[["user_id", "rank", "event_id"]])
        pd.testing.assert_frame_equal(outs[0], outs[1])


class TestBucketKeySafety:
    def test_prebucket_other_key_not_reused(self, ray_session):
        """A dataset pre-bucketed on key A must be RE-bucketed when an
        operator partitions on key B (regression: silent reuse split
        entities across buckets)."""
        import ray.data

        from mobray.pipelines.temporal import bucket_col_for, sessionize, with_buckets

        df = pd.DataFrame(
            {
                "a": np.repeat(np.arange(20), 5),
                "b": np.tile(np.arange(5), 20),
                "ts": pd.to_datetime(np.tile(np.arange(5), 20), unit="h"),
            }
        )
        ds = with_buckets(ray.data.from_pandas(df), "a", num_buckets=4)
        assert bucket_col_for("a") in ds.schema().names
        out = sessionize(ds, "b", "ts", gap="30min", num_buckets=4).to_pandas()
        # per-entity-b session count must match a single-node oracle
        oracle = (
            df.sort_values(["b", "ts"], kind="stable")
            .groupby("b")["ts"]
            .apply(lambda s: int((s.diff().isna() | (s.diff() > pd.Timedelta("30min"))).sum()))
        )
        got = out.groupby("b")["session_seq"].max()
        assert got.sort_index().tolist() == oracle.sort_index().tolist()


class TestTimestampUnits:
    def test_tumbling_ns_timestamps(self, ray_session):
        """timestamp[ns] input must yield the same windows as [us]
        (regression: raw int64 cast made windows 1000x too small)."""
        import ray.data

        from mobray.pipelines.temporal import tumbling_window

        ts = pd.date_range("2024-01-01", periods=100, freq="7min")
        df = pd.DataFrame({"k": np.tile([1, 2], 50), "ts": ts, "v": np.arange(100.0)})
        assert df["ts"].dtype == "datetime64[ns]"
        out_ns = tumbling_window(ray.data.from_pandas(df), "k", "ts", "1h", "v").to_pandas()
        df_us = df.assign(ts=df["ts"].astype("datetime64[us]"))
        out_us = tumbling_window(ray.data.from_pandas(df_us), "k", "ts", "1h", "v").to_pandas()
        cols = ["k", "window_start", "n_events", "sum_value"]
        a = out_ns[cols].sort_values(["k", "window_start"]).reset_index(drop=True)
        b = out_us[cols].sort_values(["k", "window_start"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)
        # 100 events x 7min over 2 keys -> ~12h span => 12-ish windows/key
        assert out_ns.groupby("k")["n_events"].sum().tolist() == [50, 50]
        assert len(out_ns) < 30  # would be ~100 with the ns bug

    def test_hopping_ns_timestamps(self, ray_session):
        import ray.data

        from mobray.pipelines.temporal import hopping_window

        ts = pd.date_range("2024-01-01", periods=40, freq="11min")
        df = pd.DataFrame({"k": np.ones(40, dtype=np.int64), "ts": ts, "v": np.ones(40)})
        out = hopping_window(ray.data.from_pandas(df), "k", "ts", "v", window="1h", hop="30min").to_pandas()
        # every event lands in exactly 2 windows
        assert out["n_events"].sum() == 80


class TestPadPrecision:
    def test_int64_hash_survives_padded_union(self, ray_session):
        """Int64 values above 2^53 must cross the padded-union as-of
        exchange bit-exactly. Null padding turned the column float64 in
        the pandas bucket frame and silently wiped the low ~11 bits of
        64-bit hash values (caught by diffing the exchange against the
        shuffle-free co-partitioned job); integer padding keeps the
        dtype."""
        import pyarrow as pa
        import ray.data

        from mobray.pipelines.temporal import asof_join

        big = np.array(
            [-7359337045717344419, 2**63 - 11, -(2**62) - 7, 12345],
            dtype=np.int64,
        )
        left = pa.table(
            {
                "k": pa.array([1, 1, 2, 2], pa.int64()),
                "ts": pa.array(
                    pd.to_datetime(
                        ["2024-01-01 00:01", "2024-01-01 00:05",
                         "2024-01-01 00:01", "2024-01-01 00:05"]
                    )
                ),
                "h": pa.array(big, pa.int64()),
                "flag": pa.array([True, False, True, False]),
            }
        )
        right = pa.table(
            {
                "k": pa.array([1, 2], pa.int64()),
                "ts": pa.array(pd.to_datetime(["2024-01-01 00:00"] * 2)),
                "v": pa.array([10.0, 20.0], pa.float64()),
            }
        )
        out = (
            asof_join(
                ray.data.from_arrow(left).repartition(2),
                ray.data.from_arrow(right),
                key="k", ts="ts", right_cols=["v"], num_buckets=4,
            )
            .to_pandas()
            .sort_values(["k", "ts"])
            .reset_index(drop=True)
        )
        assert out["h"].dtype == np.int64
        assert np.array_equal(np.sort(out["h"].to_numpy()), np.sort(big))
        assert out["flag"].dtype == bool
        assert (out["v"] == [10.0, 10.0, 20.0, 20.0]).all()

    def test_int64_hash_survives_hash_join_fallback(self, ray_session):
        import pyarrow as pa
        import ray.data

        from mobray.pipelines.relational import hash_join

        big = np.array([2**63 - 99, -(2**60) - 3], dtype=np.int64)
        left = pa.table(
            {"k": pa.array([1, 2], pa.int64()), "h": pa.array(big, pa.int64())}
        )
        right = pa.table(
            {"k": pa.array([1, 2], pa.int64()), "v": pa.array([5.0, 6.0])}
        )
        out = (
            hash_join(
                ray.data.from_arrow(left), ray.data.from_arrow(right),
                on="k", how="inner", num_buckets=2, engine="padded",
            )
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        assert out["h"].dtype == np.int64
        assert np.array_equal(out["h"].to_numpy(), big)


class TestAsofCopartitioned:
    def test_matches_exchange_asof(self, ray_session, tmp_path):
        """asof_join_copartitioned over hash-aligned file pairs must
        equal the exchange-based asof_join on the same data (incl. the
        tolerance variant)."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray.data

        from mobray.pipelines.temporal import (
            _hash_bucket,
            asof_join,
            asof_join_copartitioned,
        )

        rng = np.random.RandomState(8)
        n = 4000
        left = pd.DataFrame(
            {
                "k": rng.randint(0, 50, n),
                "ts": pd.to_datetime("2024-01-01")
                + pd.to_timedelta(rng.randint(0, 10**6, n), unit="s"),
                "x": rng.normal(size=n),
            }
        )
        right = pd.DataFrame(
            {
                "k": rng.randint(0, 50, n // 2),
                "ts": pd.to_datetime("2024-01-01")
                + pd.to_timedelta(rng.randint(0, 10**6, n // 2), unit="s"),
                "v": rng.normal(size=n // 2),
            }
        )
        # co-partition both sides by hash(k) % 4
        pairs = []
        for b in range(4):
            lp, rp = tmp_path / f"l{b}.parquet", tmp_path / f"r{b}.parquet"
            lm = _hash_bucket(left["k"].to_numpy(), 4) == b
            rm = _hash_bucket(right["k"].to_numpy(), 4) == b
            pq.write_table(pa.Table.from_pandas(left[lm], preserve_index=False), lp)
            pq.write_table(pa.Table.from_pandas(right[rm], preserve_index=False), rp)
            pairs.append((lp, rp))

        for tol in (None, "1h"):
            got = (
                asof_join_copartitioned(
                    pairs, key="k", ts="ts", right_cols=["v"], tolerance=tol
                )
                .to_pandas()
                .sort_values(["k", "ts", "x"])
                .reset_index(drop=True)
            )
            want = (
                asof_join(
                    ray.data.from_pandas(left).repartition(3),
                    ray.data.from_pandas(right).repartition(2),
                    key="k", ts="ts", right_cols=["v"], num_buckets=8,
                    tolerance=tol,
                )
                .to_pandas()
                .sort_values(["k", "ts", "x"])
                .reset_index(drop=True)
            )
            pd.testing.assert_frame_equal(
                got[sorted(got.columns)], want[sorted(want.columns)],
                check_like=True,
            )

    def test_violation_raises(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from mobray.pipelines.temporal import asof_join_copartitioned

        lp, rp = tmp_path / "l.parquet", tmp_path / "r.parquet"
        ts = pd.to_datetime(["2024-01-01"] * 2)
        pq.write_table(
            pa.Table.from_pandas(pd.DataFrame({"k": [1, 2], "ts": ts, "x": [0.0, 1.0]})), lp
        )
        pq.write_table(
            pa.Table.from_pandas(pd.DataFrame({"k": [1, 99], "ts": ts, "v": [5.0, 6.0]})), rp
        )
        with pytest.raises(Exception, match="co-partitioning violated"):
            asof_join_copartitioned(
                [(lp, rp)], key="k", ts="ts", right_cols=["v"]
            ).to_pandas()

    def test_right_only_keys_tolerated_with_global_left_keys(
        self, ray_session, tmp_path
    ):
        """A right key with NO left rows anywhere is harmless for a left
        as-of join: with the global left_keys set supplied it must pass
        validation (and contribute nothing), while a key that exists on
        the left globally but is absent from this pair still raises."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from mobray.pipelines.temporal import asof_join_copartitioned

        ts = pd.to_datetime(["2024-01-01"] * 2)
        lp, rp = tmp_path / "l.parquet", tmp_path / "r.parquet"
        pq.write_table(
            pa.Table.from_pandas(
                pd.DataFrame({"k": [1, 2], "ts": ts, "x": [0.0, 1.0]})
            ),
            lp,
        )
        # k=99 exists ONLY on the right side (purchase-only user)
        pq.write_table(
            pa.Table.from_pandas(
                pd.DataFrame({"k": [1, 99], "ts": ts, "v": [5.0, 6.0]})
            ),
            rp,
        )
        out = asof_join_copartitioned(
            [(lp, rp)], key="k", ts="ts", right_cols=["v"],
            left_keys={1, 2},
        ).to_pandas()
        assert len(out) == 2
        assert out.loc[out["k"] == 1, "v"].iloc[0] == 5.0
        assert out.loc[out["k"] == 2, "v"].isna().all()

        # k=99 DOES exist globally on the left -> genuine misplacement
        with pytest.raises(Exception, match="co-partitioning violated"):
            asof_join_copartitioned(
                [(lp, rp)], key="k", ts="ts", right_cols=["v"],
                left_keys={1, 2, 99},
            ).to_pandas()
