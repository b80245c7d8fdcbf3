"""phash near-dup, hopping windows, embedding centroids."""

import numpy as np
import pandas as pd
import pytest

from mobray.pipelines.dedup import phash_neardup_pairs
from mobray.pipelines.embeddings import group_centroids
from mobray.pipelines.temporal import hopping_window


class TestPhashNearDup:
    def test_finds_planted_pairs(self, ray_session):
        import ray.data

        rng = np.random.RandomState(11)
        hashes = rng.randint(-(2**62), 2**62, size=50).astype(np.int64)
        # plant: 10 == 30 exactly; 20 within hamming 2 of 40
        hashes[30] = hashes[10]
        hashes[40] = hashes[20] ^ 0b101
        df = pd.DataFrame({"image_id": range(50), "phash": hashes})
        out = phash_neardup_pairs(
            ray.data.from_pandas(df).repartition(3), "phash", "image_id",
            hamming_radius=3,
        )
        pairs = {(a, b): h for a, b, h in zip(out["a"], out["b"], out["hamming"])}
        assert pairs.get((10, 30)) == 0
        assert pairs.get((20, 40)) == 2

    def test_on_generated_images(self, ray_session, tmp_path):
        from mobray.sources.imagegen import generate_image_table, read_image_table

        d = str(tmp_path / "imgs")
        generate_image_table(d, n_entities=20, snapshots=4, seed=42)
        ds = read_image_table(d, columns=["image_id", "phash", "event_ts"])

        def add_row_id(t):
            import pyarrow as pa
            import pyarrow.compute as pc

            rid = pc.binary_join_element_wise(
                t["image_id"], pc.cast(pc.cast(t["event_ts"], pa.int64()), pa.string()), "#"
            )
            return t.append_column("row_id", rid)

        ds = ds.map_batches(add_row_id, batch_format="pyarrow")
        out = phash_neardup_pairs(ds, "phash", "row_id", hamming_radius=4)
        # snapshots of the same entity are small perturbations -> many
        # near-dup pairs within entities
        same_entity = sum(
            a.split("#")[0] == b.split("#")[0] for a, b in zip(out["a"], out["b"])
        )
        assert same_entity > 0


class TestHoppingWindow:
    def test_vs_pandas_oracle(self, ray_session, sf_dir):
        import ray.data

        ds = ray.data.read_parquet(f"{sf_dir}/events.parquet")
        out = (
            hopping_window(ds, "user_id", "ts", "value", window="1h", hop="30min")
            .to_pandas()
            .sort_values(["user_id", "window_start"])
            .reset_index(drop=True)
        )
        ev = pd.read_parquet(f"{sf_dir}/events.parquet")
        ts_us = ev["ts"].astype("int64") // 1000 * 1000  # ns -> us
        hop = 1800 * 1_000_000
        rows = []
        for i in range(2):
            start = (ts_us // hop) * hop - i * hop
            rows.append(pd.DataFrame({"user_id": ev["user_id"], "ws": start, "v": ev["value"]}))
        expanded = pd.concat(rows)
        oracle = (
            expanded.groupby(["user_id", "ws"])
            .agg(n_events=("v", "count"), sum_value=("v", "sum"))
            .reset_index()
            .sort_values(["user_id", "ws"])
            .reset_index(drop=True)
        )
        assert len(out) == len(oracle)
        np.testing.assert_array_equal(out["n_events"], oracle["n_events"])
        np.testing.assert_allclose(out["sum_value"], oracle["sum_value"], rtol=1e-9)
        # window_start values line up
        np.testing.assert_array_equal(
            out["window_start"].astype("int64"), oracle["ws"].astype("int64")
        )

    def test_each_event_in_k_windows(self, ray_session):
        import ray.data

        df = pd.DataFrame(
            {
                "k": ["a"],
                "ts": pd.to_datetime(["2024-01-01 10:15:00"]),
                "v": [1.0],
            }
        )
        out = hopping_window(
            ray.data.from_pandas(df), "k", "ts", "v", window="1h", hop="15min"
        ).to_pandas()
        assert len(out) == 4  # 1h/15min = 4 overlapping windows

    def test_rejects_nonmultiple(self, ray_session):
        import ray.data

        with pytest.raises(ValueError, match="multiple"):
            hopping_window(
                ray.data.range(1), "id", "id", "id", window="1h", hop="25min"
            )


class TestGroupCentroids:
    def test_matches_numpy(self, ray_session, sf_dir):
        import ray.data

        ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
        out = group_centroids(ds, "embedding", "label")
        pdf = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
        for _, row in out.iterrows():
            expect = np.array(
                pdf[pdf["label"] == row["group"]]["embedding"].tolist()
            ).mean(axis=0)
            # float32 source vectors: accumulation-order differences cap
            # agreement near float32 epsilon
            np.testing.assert_allclose(
                np.array(row["centroid"]), expect, rtol=1e-5, atol=1e-7
            )
            assert row["n"] == (pdf["label"] == row["group"]).sum()
