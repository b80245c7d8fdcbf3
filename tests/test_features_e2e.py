"""End-to-end flagship pipeline + decode verification + resumable
checkpoint (SURVEY.md §5 items 4-5)."""

import json
import os

import numpy as np
import pandas as pd
import pytest

from mobray.pipelines.features import (
    decode_verification_report,
    image_feature_pipeline,
)
from mobray.sources.imagegen import generate_image_table
from mobray.state.checkpoint import load_manifests, resumable_write


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("imgtable"))
    generate_image_table(out, n_entities=60, snapshots=5, seed=42)
    return out


class TestGeneratorOutput:
    def test_files_exist(self, image_dir):
        assert os.path.isdir(f"{image_dir}/images")
        assert os.path.isdir(f"{image_dir}/attrs")

    def test_regen_is_noop(self, image_dir):
        import time

        t0 = time.time()
        generate_image_table(image_dir, n_entities=60, snapshots=5, seed=42)
        assert time.time() - t0 < 0.5  # skipped via _GEN_DONE marker


class TestDecodeVerification:
    def test_all_gates_pass(self, ray_session, image_dir):
        rep = decode_verification_report(image_dir, concurrency=2)
        assert rep["n"] == 300
        assert rep["n_ok"] == rep["n"]
        assert rep["n_phash_match"] == rep["n"]
        assert rep["n_psnr_ge_40"] == rep["n"]

    def test_psnr_gate_catches_corruption(self):
        """The PSNR gate compares against the generator's stored
        reference thumb — a corrupted-but-decodable payload must FAIL it
        (regression: the gate used to compare the decode against itself
        and could never fail)."""
        import pyarrow as pa

        from mobray.functions.phash import phash64
        from mobray.sources.codec import raw_encode, resize_area
        from mobray.sources.imagegen import REF_THUMB_SIZE
        from mobray.stages.decode import DecodeVerifyStage

        rng = np.random.RandomState(9)
        px = rng.randint(0, 256, (32, 32, 3), np.uint8)
        good = raw_encode(px)
        corrupt = bytearray(good)
        corrupt[: len(corrupt) // 2] = bytes(len(corrupt) // 2)  # zero half
        ref = resize_area(px, REF_THUMB_SIZE, REF_THUMB_SIZE).tobytes()
        batch = pa.table(
            {
                "bytes": pa.array([good, bytes(corrupt)], pa.binary()),
                "w": pa.array([32, 32], pa.int32()),
                "h": pa.array([32, 32], pa.int32()),
                "fmt": ["raw", "raw"],
                "phash": pa.array([phash64(px)] * 2, pa.int64()),
                "ref_thumb": pa.array([ref, ref], pa.binary()),
            }
        )
        out = DecodeVerifyStage()(batch)
        ok = out["decode_ok"].to_pylist()
        ps = out["psnr_db"].to_pylist()
        ph = out["phash_match"].to_pylist()
        assert ok == [True, True]  # same length -> raw decode succeeds
        assert ps[0] == float("inf")  # pristine lossless: exact
        assert ps[1] < 40.0  # corrupted payload FAILS the 40 dB gate
        assert ph[0] and not ph[1]

    def test_psnr_nan_without_reference(self):
        """No ref_thumb column -> psnr_db is NaN (gate explicitly not
        claimed), never a fake inf."""
        import pyarrow as pa

        from mobray.functions.phash import phash64
        from mobray.sources.codec import raw_encode
        from mobray.stages.decode import DecodeVerifyStage

        px = np.random.RandomState(3).randint(0, 256, (16, 16, 3), np.uint8)
        batch = pa.table(
            {
                "bytes": pa.array([raw_encode(px)], pa.binary()),
                "w": pa.array([16], pa.int32()),
                "h": pa.array([16], pa.int32()),
                "fmt": ["raw"],
                "phash": pa.array([phash64(px)], pa.int64()),
            }
        )
        out = DecodeVerifyStage()(batch)
        assert out["decode_ok"].to_pylist() == [True]
        assert np.isnan(out["psnr_db"].to_pylist()[0])

    def test_caption_exact_equality(self, ray_session, image_dir):
        """Captions must survive the storage round-trip byte-identically."""
        from mobray.sources.imagegen import gen_entity_rows, read_image_table

        got = (
            read_image_table(image_dir, columns=["image_id", "caption", "event_ts"])
            .to_pandas()
            .sort_values(["image_id", "event_ts"])
        )
        for entity in (0, 17, 59):
            expect = gen_entity_rows(42, entity, 5)
            rows = got[got["image_id"] == f"img-{entity:09d}"]
            assert list(rows["caption"]) == expect["caption"]


class TestFlagshipPipeline:
    def test_feature_rows(self, ray_session, image_dir):
        features, model = image_feature_pipeline(image_dir, num_buckets=8)
        df = features.to_pandas()
        assert len(df) == 300
        expected_cols = {
            "image_id", "event_ts", "pop", "pop_woe", "pop_bin",
            "attr", "attr_lag1", "attr_lead1", "attr_filled", "session_seq",
        }
        assert expected_cols <= set(df.columns)
        assert model.is_binary
        # woe values consistent with the broadcast model
        lab_to_woe = dict(zip(model.labels, model.woe))
        valid = df.dropna(subset=["pop_woe"])
        np.testing.assert_allclose(
            valid["pop_woe"].to_numpy(),
            valid["pop_bin"].map(lab_to_woe).to_numpy(),
            rtol=1e-12,
        )

    def test_no_temporal_leakage_in_attr(self, ray_session, image_dir):
        """Joined attr must come from an attrs row at ts <= event_ts."""
        import pyarrow.parquet as pq

        features, _ = image_feature_pipeline(image_dir, num_buckets=8)
        df = features.to_pandas()
        attrs = pq.read_table(f"{image_dir}/attrs").to_pandas()
        # brute-force oracle on a sample of entities
        for entity in ["img-000000000", "img-000000033"]:
            sub = df[df["image_id"] == entity].sort_values("event_ts")
            asub = attrs[attrs["image_id"] == entity].sort_values("event_ts")
            for _, row in sub.iterrows():
                earlier = asub[asub["event_ts"] <= row["event_ts"]]
                if len(earlier):
                    assert row["attr"] == earlier["attr"].iloc[-1]
                else:
                    assert pd.isna(row["attr"])


class TestResumableWrite:
    def test_write_resume_skip(self, ray_session, image_dir, tmp_path):
        import ray.data

        out_dir = str(tmp_path / "out")
        ds = ray.data.read_parquet(f"{image_dir}/attrs")
        m1 = resumable_write(ds, out_dir, key="image_id", num_buckets=4)
        assert len(m1) == 4
        assert not m1["skipped"].any()
        manifests = load_manifests(out_dir)
        assert len(manifests) == 4
        total_rows = sum(m["rows"] for m in manifests)
        assert total_rows == ds.count()

        # second run: all partitions skipped, bytes identical
        m2 = resumable_write(ds, out_dir, key="image_id", num_buckets=4)
        assert m2["skipped"].all()
        assert list(m2["content_hash"]) == list(m1["content_hash"])

    def test_partial_resume_after_crash(self, ray_session, image_dir, tmp_path):
        """Delete one partition's manifest (simulated crash between data
        file and manifest) -> only that partition is rewritten, output
        byte-equal."""
        import ray.data

        out_dir = str(tmp_path / "out2")
        ds = ray.data.read_parquet(f"{image_dir}/attrs")
        m1 = resumable_write(ds, out_dir, key="image_id", num_buckets=4)
        victim = int(m1["pid"].iloc[1])
        os.remove(os.path.join(out_dir, "_manifest", f"{victim:05d}.json"))

        m2 = resumable_write(ds, out_dir, key="image_id", num_buckets=4)
        redone = m2[~m2["skipped"]]
        assert list(redone["pid"]) == [victim]
        # content hash of the redone partition matches the original
        assert (
            m2.set_index("pid").loc[victim, "content_hash"]
            == m1.set_index("pid").loc[victim, "content_hash"]
        )

    def test_checkpointed_pipeline_end_to_end(self, ray_session, image_dir, tmp_path):
        out_dir = str(tmp_path / "feat")
        metrics, model = image_feature_pipeline(
            image_dir, num_buckets=4, out_dir=out_dir
        )
        assert metrics["rows"].sum() == 300
        import pyarrow.parquet as pq

        written = pq.read_table(out_dir).to_pandas()
        assert len(written) == 300


class TestFullJob:
    def test_single_pass_gates_and_features(self, ray_session, image_dir, tmp_path):
        from mobray.pipelines.features import full_job

        out_dir = str(tmp_path / "fj")
        metrics, model, report = full_job(
            image_dir, out_dir, num_buckets=4, decode_concurrency=2
        )
        assert report["n"] == 300
        assert report["n_ok"] == 300
        assert report["n_phash_match"] == 300
        assert report["n_psnr_ge_40"] == 300
        # gate counts live on the lineage records
        assert "n_decode_ok" in metrics.columns
        import pyarrow.parquet as pq

        written = pq.read_table(out_dir).to_pandas()
        assert "thumb_phash" in written.columns
        assert "pop_woe" in written.columns
        assert (written["decode_ok"]).all()

    def test_resume_reports_skipped(self, ray_session, image_dir, tmp_path):
        from mobray.pipelines.features import full_job

        out_dir = str(tmp_path / "fj2")
        full_job(image_dir, out_dir, num_buckets=4, decode_concurrency=2)
        metrics, _, report = full_job(
            image_dir, out_dir, num_buckets=4, decode_concurrency=2
        )
        assert metrics["skipped"].all()
        assert report["n_skipped_rows"] == 300


class TestOverlappedFit:
    def test_overlap_identical_to_serial(self, ray_session, image_dir, tmp_path):
        """full_job(overlap_fit=True) runs the metadata fit concurrently
        with the payload pass via the ModelHolder rendezvous; the model
        and every per-partition content hash must equal the serial path."""
        from mobray.pipelines.features import full_job

        m1, mod1, rep1 = full_job(
            image_dir, str(tmp_path / "ovl"), num_buckets=8,
            decode_concurrency=2, overlap_fit=True,
        )
        m0, mod0, rep0 = full_job(
            image_dir, str(tmp_path / "ser"), num_buckets=8,
            decode_concurrency=2, overlap_fit=False,
        )
        assert np.array_equal(mod0.rights, mod1.rights)
        assert np.array_equal(mod0.woe, mod1.woe)
        assert rep0 == rep1
        h0 = m0["content_hash"].sort_values().to_numpy()
        h1 = m1["content_hash"].sort_values().to_numpy()
        assert len(h0) == len(h1) and (h0 == h1).all()

    def test_fit_failure_surfaces(self, ray_session, image_dir, tmp_path):
        """A failing overlapped fit must raise on the driver (via the
        holder's error slot reaching the payload actors, or the join),
        never hang the payload actors in the model poll loop."""
        from mobray.core.constraints import BinningConstraints
        from mobray.pipelines.features import image_feature_pipeline

        class BoomConstraints(BinningConstraints):
            def copy(self):  # first constraints call inside the core fit
                raise RuntimeError("boom-fit")

        with pytest.raises(Exception, match="boom"):
            image_feature_pipeline(
                image_dir, out_dir=str(tmp_path / "boom"), num_buckets=8,
                verify_decode=True, decode_concurrency=2, overlap_fit=True,
                constraints=BoomConstraints(),
            )


class TestCoPartitionedExchange:
    def test_bit_identical_to_shuffle(self, ray_session, image_dir, tmp_path):
        """The shuffle-free co-partitioned job (entity-aligned shards,
        zero exchange) must produce feature rows BIT-identical to the
        bucketed shuffle — including int64 hash columns above 2^53,
        which is exactly what caught the null-padding float64 corruption
        (see temporal.pad_column)."""
        import glob

        import pyarrow.parquet as pq

        from mobray.pipelines.features import full_job

        m1, mod1, rep1 = full_job(
            image_dir, str(tmp_path / "cop"), num_buckets=8,
            decode_concurrency=2, exchange="copartitioned",
        )
        m0, mod0, rep0 = full_job(
            image_dir, str(tmp_path / "shf"), num_buckets=8,
            decode_concurrency=2, exchange="shuffle",
        )
        assert rep0 == rep1
        assert np.array_equal(mod0.rights, mod1.rights)

        def read_all(out):
            fs = sorted(glob.glob(os.path.join(str(out), "part-*.parquet")))
            return pd.concat(
                [pq.read_table(f).to_pandas() for f in fs], ignore_index=True
            )

        a, b = read_all(tmp_path / "cop"), read_all(tmp_path / "shf")
        cols = sorted(set(a.columns) & set(b.columns))
        a2 = a[cols].sort_values(["image_id", "event_ts"]).reset_index(drop=True)
        b2 = b[cols].sort_values(["image_id", "event_ts"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(a2, b2, check_like=True)
        # full-precision phash survived both exchanges
        assert a2["phash"].dtype == np.int64

    def test_resume_skips_without_reading(self, ray_session, image_dir, tmp_path):
        import time

        from mobray.pipelines.features import full_job

        out = str(tmp_path / "res")
        full_job(image_dir, out, num_buckets=8, decode_concurrency=2,
                 exchange="copartitioned")
        t0 = time.time()
        m2, _, _ = full_job(image_dir, out, num_buckets=8,
                            decode_concurrency=2, exchange="copartitioned")
        assert m2["skipped"].all()
        assert time.time() - t0 < 15  # no decode: shards skipped pre-read

    def test_violated_copartitioning_raises(self, ray_session, image_dir, tmp_path):
        """An attrs shard with entities the image shard lacks must fail
        loudly with guidance, not silently drop rows."""
        import glob
        import shutil

        import pytest as _pytest

        from mobray.pipelines.features import full_job

        broken = str(tmp_path / "broken_src")
        shutil.copytree(image_dir, broken)
        ashards = sorted(glob.glob(os.path.join(broken, "attrs", "*.parquet")))
        # swap two attrs shards -> entity sets no longer align
        if len(ashards) >= 2:
            tmp = ashards[0] + ".swap"
            os.replace(ashards[0], tmp)
            os.replace(ashards[1], ashards[0])
            os.replace(tmp, ashards[1])
            with _pytest.raises(Exception, match="co-partitioning violated"):
                full_job(broken, str(tmp_path / "bout"), num_buckets=8,
                         decode_concurrency=2, exchange="copartitioned")
