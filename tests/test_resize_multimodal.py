"""Resize stage (real) + multimodal stub plumbing."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from mobray.sources.codec import png_decode, resize_area
from mobray.stages.decode import (
    AudioFeatureStage,
    ImageResizeStage,
    VideoFrameSampleStage,
    decode_batch_size_for,
)


class TestResizeArea:
    def test_exact_downscale(self):
        # 4x4 -> 2x2 with known block means
        px = np.zeros((4, 4, 3), np.uint8)
        px[:2, :2] = 100
        px[:2, 2:] = 200
        px[2:, :2] = 40
        px[2:, 2:] = 8
        out = resize_area(px, 2, 2)
        assert out.shape == (2, 2, 3)
        assert out[0, 0, 0] == 100 and out[0, 1, 0] == 200
        assert out[1, 0, 0] == 40 and out[1, 1, 0] == 8

    def test_mean_preserved(self):
        px = np.random.RandomState(1).randint(0, 256, (48, 64, 3), np.uint8)
        out = resize_area(px, 16, 16)
        assert abs(float(out.mean()) - float(px.mean())) < 2.0

    def test_nonsquare_and_upscale(self):
        px = np.random.RandomState(2).randint(0, 256, (10, 7, 3), np.uint8)
        assert resize_area(px, 3, 5).shape == (5, 3, 3)
        assert resize_area(px, 14, 20).shape == (20, 14, 3)

    def test_upscale_values_nearest_cell(self):
        # uniform image must stay uniform (regression: zero-width cells
        # used to divide by zero and clip to 255)
        px = np.full((2, 2, 3), 100, np.uint8)
        out = resize_area(px, 4, 4)
        assert (out == 100).all()
        # distinct pixels: 2x upscale repeats each source pixel 2x2
        px = np.array([[[10] * 3, [20] * 3], [[30] * 3, [40] * 3]], np.uint8)
        out = resize_area(px, 4, 4)
        expect = np.repeat(np.repeat(px, 2, axis=0), 2, axis=1)
        assert (out == expect).all()

    def test_upscale_mixed_axis(self):
        # upscale rows, downscale cols in one call
        px = np.random.RandomState(3).randint(0, 256, (4, 8, 3), np.uint8)
        out = resize_area(px, 4, 8)
        assert out.shape == (8, 4, 3)
        # row i of output = source row i//2 averaged over col pairs
        for i in range(8):
            src = px[i // 2].reshape(4, 2, 3).mean(axis=1)
            assert np.abs(out[i].astype(float) - src).max() <= 0.5 + 1e-9


class TestResizeStage:
    def test_resizes_batch(self, ray_session, tmp_path):
        from mobray.sources.imagegen import generate_image_table, read_image_table

        d = str(tmp_path / "imgs")
        generate_image_table(d, n_entities=10, snapshots=2, seed=42)
        ds = read_image_table(d)
        out = ds.map_batches(
            ImageResizeStage,
            fn_constructor_kwargs={"out_w": 16, "out_h": 16, "out_fmt": "png"},
            batch_format="pyarrow",
            batch_size=8,
            concurrency=2,
            num_cpus=1,
        ).to_pandas()
        assert (out["w"] == 16).all() and (out["h"] == 16).all()
        px = png_decode(out["bytes"].iloc[0])
        assert px.shape == (16, 16, 3)
        # phash recomputed on resized pixels
        from mobray.functions.phash import phash64

        assert phash64(px) == out["phash"].iloc[0]

    def test_batch_size_from_bytes(self):
        assert decode_batch_size_for(1 << 20, budget_bytes=64 << 20) == 64
        assert decode_batch_size_for(0) >= 1


class TestMultimodalStubs:
    def test_video_stub_schema_and_raise(self):
        stage = VideoFrameSampleStage(every_n_frames=10)
        assert stage.every_n_frames == 10
        assert "frame_bytes" in VideoFrameSampleStage.OUTPUT_SCHEMA.names
        with pytest.raises(NotImplementedError, match="video"):
            stage(pa.table({"video_id": ["v1"], "bytes": [b""]}))

    def test_audio_stub_schema_and_raise(self):
        stage = AudioFeatureStage()
        assert "rms" in AudioFeatureStage.OUTPUT_SCHEMA.names
        with pytest.raises(NotImplementedError, match="audio"):
            stage(pa.table({"audio_id": ["a1"], "bytes": [b""]}))
