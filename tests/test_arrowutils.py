"""embedding_matrix zero-copy extraction + byte-budgeted payload batch."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from mobray.functions.arrowutils import embedding_matrix


class TestEmbeddingMatrix:
    def test_list_array(self):
        vecs = [[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]]
        col = pa.array(vecs, pa.list_(pa.float64()))
        np.testing.assert_array_equal(embedding_matrix(col), np.array(vecs))

    def test_fixed_size_list(self):
        vals = np.arange(12, dtype=np.float32)
        col = pa.FixedSizeListArray.from_arrays(pa.array(vals), 4)
        out = embedding_matrix(col)
        assert out.dtype == np.float64
        np.testing.assert_array_equal(out, vals.reshape(3, 4))

    def test_chunked_and_sliced(self):
        vecs = [[float(i), float(i + 1)] for i in range(6)]
        chunked = pa.chunked_array(
            [pa.array(vecs[:2], pa.list_(pa.float64())),
             pa.array(vecs[2:], pa.list_(pa.float64()))]
        )
        np.testing.assert_array_equal(embedding_matrix(chunked), np.array(vecs))
        sliced = pa.array(vecs, pa.list_(pa.float64())).slice(2, 3)
        np.testing.assert_array_equal(embedding_matrix(sliced), np.array(vecs[2:5]))

    def test_matches_pylist_roundtrip(self):
        rng = np.random.RandomState(0)
        m = rng.normal(size=(50, 16))
        col = pa.array(list(m), pa.list_(pa.float64()))
        np.testing.assert_array_equal(
            embedding_matrix(col), np.array(col.to_pylist(), dtype=np.float64)
        )

    def test_ragged_raises(self):
        col = pa.array([[1.0, 2.0], [3.0]], pa.list_(pa.float64()))
        with pytest.raises(ValueError, match="ragged"):
            embedding_matrix(col)

    def test_nulls_raise(self):
        col = pa.array([[1.0, 2.0], None], pa.list_(pa.float64()))
        with pytest.raises(ValueError, match="null"):
            embedding_matrix(col)

    def test_empty(self):
        col = pa.array([], pa.list_(pa.float64()))
        assert embedding_matrix(col).shape == (0, 0)


class TestPayloadBatchSize:
    def test_budget_scales_with_row_width(self, tmp_path):
        import os

        import pyarrow.parquet as pq

        from mobray.pipelines.features import payload_batch_size

        def make(dirname, blob_bytes):
            d = tmp_path / dirname / "images"
            os.makedirs(d)
            rng = np.random.RandomState(0)
            t = pa.table(
                {"image_id": [f"i{k}" for k in range(64)],
                 "bytes": [rng.bytes(blob_bytes) for _ in range(64)]}
            )
            pq.write_table(t, str(d / "shard-0.parquet"))
            return str(tmp_path / dirname)

        small = make("small", 2_000)
        big = make("big", 64_000)
        bs_small = payload_batch_size(small)
        bs_big = payload_batch_size(big)
        # wider rows -> fewer rows per batch, same byte budget
        assert bs_small > bs_big
        assert 64 <= bs_big <= bs_small <= 2048

    def test_no_files_falls_back(self, tmp_path):
        from mobray.pipelines.features import payload_batch_size

        assert payload_batch_size(str(tmp_path)) == 256


class TestShardLimit:
    def test_read_image_table_shard_subset(self, ray_session, tmp_path):
        from mobray.sources.imagegen import generate_image_table, read_image_table

        d = str(tmp_path / "imgs")
        generate_image_table(d, n_entities=40, snapshots=2, seed=42, shards=4)
        full = read_image_table(d, columns=["image_id"]).count()
        half = read_image_table(d, columns=["image_id"], shard_limit=2).count()
        assert full == 80
        # shards hold contiguous entity ranges; 2 of 4 shards = half
        assert half == 40


class TestBenchHelpers:
    def test_shard_limit_fraction(self, tmp_path, monkeypatch):
        import os
        import sys

        sys.path.insert(0, "/root/repo")
        import bench

        img = tmp_path / "images"
        os.makedirs(img)
        for i in range(10):
            (img / f"shard-{i:05d}.parquet").write_bytes(b"x")
        monkeypatch.setenv("BENCH_SHARD_FRAC", "0.5")
        assert bench._shard_limit(str(tmp_path)) == 5
        monkeypatch.setenv("BENCH_SHARD_FRAC", "1")
        assert bench._shard_limit(str(tmp_path)) is None
        monkeypatch.setenv("BENCH_SHARD_FRAC", "0.01")
        assert bench._shard_limit(str(tmp_path)) == 1


class TestBinaryViews:
    def test_matches_pylist(self):
        from mobray.functions.arrowutils import binary_views

        vals = [b"\x89PNG\r\n", b"", b"abc", bytes(range(256))]
        arr = pa.array(vals, pa.binary())
        got = binary_views(arr)
        assert [bytes(v) for v in got] == vals
        # content-comparable against bytes (the PNG signature check)
        assert got[0][:4] == b"\x89PNG"

    def test_nulls_slices_chunks_large(self):
        from mobray.functions.arrowutils import binary_views

        vals = [b"aa", None, b"bbb", b"", b"cc\xff"]
        for typ in (pa.binary(), pa.large_binary()):
            arr = pa.array(vals, typ)
            got = binary_views(arr)
            assert [None if v is None else bytes(v) for v in got] == vals
            sl = arr.slice(1, 3)
            got = binary_views(sl)
            assert [None if v is None else bytes(v) for v in got] == vals[1:4]
            ch = pa.chunked_array([arr.slice(0, 2), arr.slice(2)])
            got = binary_views(ch)
            assert [None if v is None else bytes(v) for v in got] == vals

    def test_numpy_and_zlib_consume_views(self):
        import zlib

        from mobray.functions.arrowutils import binary_views

        payload = np.arange(64, dtype=np.uint8).tobytes()
        arr = pa.array([payload, zlib.compress(payload)], pa.binary())
        v0, v1 = binary_views(arr)
        assert np.array_equal(np.frombuffer(v0, dtype=np.uint8), np.arange(64))
        assert zlib.decompress(v1) == payload


class TestReadParquetClean:
    def test_strips_unhashable_metadata(self, ray_session, tmp_path):
        """pandas-written parquet carries schema metadata that makes
        pa.Schema unhashable (defeating Ray Data's schema-dedup fast
        path); the clean reader must deliver hashable block schemas,
        with and without column pruning."""
        import pyarrow.parquet as pa_pq

        from mobray.sources.readers import read_parquet_clean

        df = pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"], "c": [0.5] * 3})
        p = str(tmp_path / "t.parquet")
        df.to_parquet(p)
        raw_schema = pa_pq.read_schema(p)
        with pytest.raises(TypeError):
            hash(raw_schema)

        for cols in (None, ["a", "c"]):
            ds = read_parquet_clean(p, columns=cols)
            t = ds.take_batch(3, batch_format="pyarrow")
            assert not t.schema.metadata
            hash(t.schema)  # must not raise
            if cols:
                assert t.schema.names == cols
        assert read_parquet_clean(p).count() == 3

    def test_homogeneous_shard_dir_gets_clean_schema(self, ray_session, tmp_path):
        from mobray.sources.readers import read_parquet_clean

        d = tmp_path / "shards"
        d.mkdir()
        for i in range(3):
            pd.DataFrame({"a": [i], "b": [float(i)]}).to_parquet(
                str(d / f"s{i}.parquet")
            )
        ds = read_parquet_clean(str(d))
        t = ds.take_batch(3, batch_format="pyarrow")
        assert not t.schema.metadata
        assert ds.count() == 3

    def test_heterogeneous_shards_fall_back_not_coerce(
        self, ray_session, tmp_path
    ):
        """Shards with different schemas must NOT be silently coerced to
        the first shard's footer schema — the reader falls back to plain
        read_parquet (losing only the schema-dedup fast path)."""
        from mobray.sources.readers import read_parquet_clean

        d = tmp_path / "hetero"
        d.mkdir()
        pd.DataFrame({"a": [1], "b": [1.0]}).to_parquet(str(d / "s0.parquet"))
        pd.DataFrame({"a": [2], "c": ["x"]}).to_parquet(str(d / "s1.parquet"))
        ds = read_parquet_clean(str(d))
        assert ds.count() == 2  # plain reader semantics, no schema override


class TestEmptySchemaWarningFilter:
    def test_drops_only_the_empty_schema_variant(self):
        import logging

        from mobray.functions.rayutils import (
            _DropEmptySchemaWarning,
            install_empty_schema_warning_filter,
        )

        f = _DropEmptySchemaWarning()

        def rec(msg):
            return logging.LogRecord("x", logging.WARNING, "f", 1, msg, (), None)

        benign = (
            "Operator produced a RefBundle with a different schema than the "
            "previous one. Previous schema: a: int64, new schema: . This may "
            "lead to unexpected behavior."
        )
        real = (
            "Operator produced a RefBundle with a different schema than the "
            "previous one. Previous schema: a: int64, new schema: b: double. "
            "This may lead to unexpected behavior."
        )
        assert f.filter(rec(benign)) is False
        assert f.filter(rec(real)) is True
        assert f.filter(rec("unrelated message")) is True

        # idempotent install
        install_empty_schema_warning_filter()
        install_empty_schema_warning_filter()
        logger = logging.getLogger(
            "ray.data._internal.execution.streaming_executor_state"
        )
        n = sum(isinstance(x, _DropEmptySchemaWarning) for x in logger.filters)
        assert n == 1
