"""PNG/raw codec + phash + generator determinism."""

import numpy as np
import pytest

from mobray.functions.phash import hamming64, phash64, phash64_batch, popcount64
from mobray.sources.codec import (
    decode_image,
    encode_image,
    png_decode,
    png_encode,
    psnr,
    psnr_batch,
    raw_decode,
    raw_encode,
    resize_area,
    resize_area_batch,
)
from mobray.sources.imagegen import gen_attrs_table, gen_entities_table, gen_entity_rows


class TestPng:
    def test_roundtrip_exact(self):
        rng = np.random.RandomState(0)
        for h, w in [(1, 1), (7, 3), (32, 48), (64, 64)]:
            px = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
            out = png_decode(png_encode(px))
            assert np.array_equal(out, px)

    def test_psnr_gate(self):
        """North-star gate: lossless decode => PSNR >= 40 dB (inf here)."""
        px = np.random.RandomState(1).randint(0, 256, (16, 16, 3), dtype=np.uint8)
        assert psnr(px, png_decode(png_encode(px))) == float("inf")

    def test_filters_decoded(self):
        """Decoder must handle Sub/Up/Average/Paeth-filtered rows, not just
        the filter-0 rows our encoder emits."""
        import struct
        import zlib

        px = np.arange(4 * 3 * 3, dtype=np.uint8).reshape(3, 4, 3)
        # hand-build a PNG with one row per filter type 0,1,2
        h, w = 3, 4
        stride = w * 3
        rows = []
        flat = px.reshape(h, stride).astype(np.int32)
        rows.append(bytes([0]) + (flat[0] & 0xFF).astype(np.uint8).tobytes())
        sub = flat[1].copy()
        sub[3:] = (flat[1][3:] - flat[1][:-3]) & 0xFF
        rows.append(bytes([1]) + sub.astype(np.uint8).tobytes())
        up = (flat[2] - flat[1]) & 0xFF
        rows.append(bytes([2]) + up.astype(np.uint8).tobytes())
        raw = b"".join(rows)

        def chunk(tag, payload):
            crc = zlib.crc32(tag + payload) & 0xFFFFFFFF
            return struct.pack(">I", len(payload)) + tag + payload + struct.pack(">I", crc)

        data = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )
        assert np.array_equal(png_decode(data), px)

    def test_bad_signature(self):
        with pytest.raises(ValueError, match="signature"):
            png_decode(b"nope" * 4)

    def test_unknown_fmt_raises(self):
        px = np.zeros((2, 2, 3), np.uint8)
        with pytest.raises(NotImplementedError):
            encode_image(px, "jpeg")
        with pytest.raises(NotImplementedError):
            decode_image(b"", 2, 2, "jpeg")


class TestRaw:
    def test_roundtrip(self):
        px = np.random.RandomState(2).randint(0, 256, (5, 9, 3), dtype=np.uint8)
        assert np.array_equal(raw_decode(raw_encode(px), 9, 5), px)

    def test_length_check(self):
        with pytest.raises(ValueError):
            raw_decode(b"\x00" * 10, 2, 2)


class TestPsnr:
    def test_known_value(self):
        a = np.zeros((4, 4, 3), np.uint8)
        b = a.copy()
        b[0, 0, 0] = 16  # mse = 256/48
        expect = 10 * np.log10(255**2 / (256 / 48))
        assert psnr(a, b) == pytest.approx(expect)


class TestPhash:
    def test_deterministic(self):
        px = np.random.RandomState(3).randint(0, 256, (32, 32, 3), dtype=np.uint8)
        assert phash64(px) == phash64(px.copy())

    def test_similar_images_close(self):
        px = np.random.RandomState(4).randint(0, 256, (64, 64, 3), dtype=np.uint8)
        px2 = px.copy()
        px2[:2, :2] = 0
        d = hamming64(np.array([phash64(px)]), np.array([phash64(px2)]))[0]
        assert d <= 8

    def test_different_images_far(self):
        a = np.random.RandomState(5).randint(0, 256, (32, 32, 3), dtype=np.uint8)
        gradient = np.tile(np.arange(32, dtype=np.uint8)[None, :, None] * 8, (32, 1, 3))
        d = hamming64(np.array([phash64(a)]), np.array([phash64(gradient)]))[0]
        assert d > 8

    def test_popcount(self):
        assert popcount64(np.array([0]))[0] == 0
        assert popcount64(np.array([-1]))[0] == 64
        assert popcount64(np.array([0b1011]))[0] == 3

    def test_nonsquare(self):
        px = np.random.RandomState(6).randint(0, 256, (48, 96, 3), dtype=np.uint8)
        assert isinstance(phash64(px), int)


class TestGenerator:
    def test_deterministic_across_sharding(self):
        r1 = gen_entity_rows(42, 3, 4)
        r2 = gen_entity_rows(42, 3, 4)
        assert r1["bytes"] == r2["bytes"]
        assert r1["caption"] == r2["caption"]
        assert r1["event_ts"] == r2["event_ts"]

    def test_table_schema_and_roundtrip(self):
        t = gen_entities_table(42, [0, 1], 3)
        assert t.num_rows == 6
        assert t.schema.names == [
            "image_id", "bytes", "w", "h", "fmt", "caption", "phash", "event_ts", "label",
            "ref_thumb",
        ]
        # every row's bytes decode to pixels whose phash matches the column
        for i in range(t.num_rows):
            row = {c: t[c][i].as_py() for c in t.schema.names}
            px = decode_image(row["bytes"], row["w"], row["h"], row["fmt"])
            assert px.shape == (row["h"], row["w"], 3)
            assert phash64(px) == row["phash"]

    def test_timestamps_increasing_per_entity(self):
        r = gen_entity_rows(42, 7, 10)
        ts = r["event_ts"]
        assert all(b > a for a, b in zip(ts, ts[1:]))

    def test_attrs_interleave(self):
        t = gen_attrs_table(42, [0, 1], 4)
        assert t.num_rows == 12  # (4+2) per entity
        assert t.schema.names == ["image_id", "event_ts", "attr"]

    def test_label_monotone_in_popcount(self):
        """Aggregate check: event rate increases with popcount(phash)."""
        t = gen_entities_table(42, list(range(150)), 4)
        pop = popcount64(t["phash"].to_numpy())
        y = t["label"].to_numpy()
        lo = y[pop < 30].mean() if (pop < 30).any() else 0.0
        hi = y[pop > 34].mean() if (pop > 34).any() else 1.0
        assert hi > lo


class TestGeneratorRegen:
    def test_regen_clears_stale_shards(self, tmp_path):
        """A layout change between generations must not leave stale shard
        files behind (regression: v1 shards without ref_thumb survived a
        v2 regen and doubled+corrupted the table)."""
        import os

        from mobray.sources.imagegen import generate_image_table

        d = str(tmp_path / "gen")
        generate_image_table(d, n_entities=8, snapshots=2, seed=1)
        # plant a stale shard mimicking an old layout
        stale = os.path.join(d, "images", "shard-99999.parquet")
        with open(stale, "wb") as f:
            f.write(b"junk")
        # marker mismatch (different params) -> full regeneration
        generate_image_table(d, n_entities=10, snapshots=2, seed=1)
        assert not os.path.exists(stale)
        files = os.listdir(os.path.join(d, "images"))
        assert all(f.startswith("shard-") for f in files)
        # cache hit leaves everything in place
        before = sorted(os.listdir(os.path.join(d, "images")))
        generate_image_table(d, n_entities=10, snapshots=2, seed=1)
        assert sorted(os.listdir(os.path.join(d, "images"))) == before


class TestBatchKernels:
    """The decode stage runs verify/feature kernels on same-shape stacks;
    each batched kernel must be bit-exact vs its per-image original."""

    def test_resize_area_batch_bit_exact(self):
        rng = np.random.default_rng(11)
        for h, w in [(32, 32), (17, 31), (64, 48)]:
            stack = rng.integers(0, 256, (6, h, w, 3), dtype=np.uint8)
            for oh, ow in [(8, 8), (16, 16), (40, 40)]:
                got = resize_area_batch(stack, ow, oh)
                assert got.dtype == np.uint8
                for k in range(len(stack)):
                    assert np.array_equal(got[k], resize_area(stack[k], ow, oh))

    def test_resize_area_upscale_values(self):
        """Upscaling repeats source pixels (zero-width cells clamp to the
        single boundary pixel, not inf/255)."""
        px = np.full((2, 2, 3), 100, dtype=np.uint8)
        assert np.all(resize_area(px, 4, 4) == 100)
        grad = np.arange(4, dtype=np.uint8).reshape(2, 2)[:, :, None].repeat(3, 2)
        up = resize_area(grad * 50, 4, 4)
        assert set(np.unique(up)) == {0, 50, 100, 150}

    def test_phash64_batch_bit_exact(self):
        rng = np.random.default_rng(12)
        for h, w in [(32, 32), (24, 40)]:
            stack = rng.integers(0, 256, (9, h, w, 3), dtype=np.uint8)
            got = phash64_batch(stack)
            assert got.dtype == np.int64
            for k in range(len(stack)):
                assert int(got[k]) == phash64(stack[k])

    def test_psnr_batch_bit_exact(self):
        rng = np.random.default_rng(13)
        a = rng.integers(0, 256, (5, 16, 16, 3), dtype=np.uint8)
        b = a.copy()
        b[1] = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
        b[3, 0, 0, 0] ^= 1  # single-bit corruption
        got = psnr_batch(a, b)
        assert np.isinf(got[0]) and np.isinf(got[2]) and np.isinf(got[4])
        for k in range(5):
            assert got[k] == psnr(a[k], b[k])


class TestFusedDecodeGates:
    def test_fused_cells_match_standalone_kernels(self):
        """DecodeVerifyStage computes phash / PSNR thumb / brightness /
        32x32 thumb from ONE shared cell reduction (the 8x8 grid nests in
        the 32x32 grid); outputs must be bit-identical to the standalone
        kernels at every size class, including the non-nesting and
        sub-8px fallbacks."""
        import pyarrow as pa

        from mobray.functions.phash import phash64, phash64_batch
        from mobray.sources.codec import raw_encode, resize_area
        from mobray.sources.imagegen import REF_THUMB_SIZE
        from mobray.stages.decode import DecodeVerifyStage

        rng = np.random.RandomState(2)
        for h, w in [(7, 5), (9, 40), (16, 48), (31, 33), (32, 32),
                     (40, 40), (96, 64), (128, 128)]:
            px = rng.randint(0, 256, (h, w, 3), np.uint8)
            ref = resize_area(px, REF_THUMB_SIZE, REF_THUMB_SIZE).tobytes()
            b = pa.table(
                {
                    "bytes": pa.array([raw_encode(px)], pa.binary()),
                    "w": pa.array([w], pa.int32()),
                    "h": pa.array([h], pa.int32()),
                    "fmt": ["raw"],
                    "phash": pa.array([phash64(px)], pa.int64()),
                    "ref_thumb": pa.array([ref], pa.binary()),
                }
            )
            out = DecodeVerifyStage(extract_thumb=True)(b)
            assert out["decode_ok"].to_pylist() == [True], (h, w)
            assert out["phash_match"].to_pylist() == [True], (h, w)
            assert out["psnr_db"].to_pylist() == [float("inf")], (h, w)
            assert out["brightness"].to_pylist()[0] == np.mean(
                px, dtype=np.float64
            ), (h, w)
            want_thumb_ph = int(
                phash64_batch(resize_area(px, 32, 32)[None, ...])[0]
            )
            assert out["thumb_phash"].to_pylist() == [want_thumb_ph], (h, w)

    def test_metadata_dim_mismatch_is_corrupt(self):
        """A decodable PNG whose true dimensions disagree with its row's
        (w, h) metadata is rejected at the gate (decode_ok False)."""
        import pyarrow as pa

        from mobray.sources.codec import png_encode

        px = np.random.RandomState(3).randint(0, 256, (16, 16, 3), np.uint8)
        b = pa.table(
            {
                "bytes": pa.array([png_encode(px)], pa.binary()),
                "w": pa.array([32], pa.int32()),  # lies about the size
                "h": pa.array([32], pa.int32()),
                "fmt": ["png"],
                "phash": pa.array([0], pa.int64()),
            }
        )
        from mobray.stages.decode import DecodeVerifyStage

        out = DecodeVerifyStage()(b)
        assert out["decode_ok"].to_pylist() == [False]
