"""Dedup pipelines: exact / MinHash-LSH / SimHash / n-gram Jaccard /
embedding near-dup, with oracles."""

import numpy as np
import pandas as pd
import pytest

from mobray.functions.hashing import (
    char_shingles,
    estimate_jaccard,
    jaccard,
    minhash_params,
    minhash_signature,
    simhash64,
    stable_hash64,
)
from mobray.pipelines.dedup import (
    embedding_neardup_pairs,
    exact_dedup,
    minhash_lsh_dedup,
    ngram_jaccard_pairs,
    simhash_dedup,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill in the morning sun with great interest"
)


def corpus():
    """Docs 0/1 near-identical, 2 identical to 0, 3/4 unrelated."""
    docs = [
        BASE,
        BASE.replace("morning", "evening"),
        BASE,
        "completely different text about database query optimization and join ordering",
        "yet another unrelated document discussing neural network training dynamics",
    ]
    return pd.DataFrame({"doc_id": range(len(docs)), "text": docs})


class TestHashPrimitives:
    def test_stable_hash_deterministic(self):
        a = stable_hash64(["abc", "def"])
        b = stable_hash64(["abc", "def"])
        np.testing.assert_array_equal(a, b)
        assert a[0] != a[1]

    def test_minhash_estimates_jaccard(self):
        a, b = minhash_params(256)
        s1 = char_shingles(BASE)
        s2 = char_shingles(BASE.replace("morning", "evening"))
        sig1 = minhash_signature(stable_hash64(s1), a, b)
        sig2 = minhash_signature(stable_hash64(s2), a, b)
        true_j = jaccard(s1, s2)
        est = estimate_jaccard(sig1, sig2)
        assert abs(est - true_j) < 0.12

    def test_identical_docs_sig_equal(self):
        a, b = minhash_params(64)
        s = char_shingles(BASE)
        np.testing.assert_array_equal(
            minhash_signature(stable_hash64(s), a, b),
            minhash_signature(stable_hash64(s), a, b),
        )

    def test_simhash_near_for_similar(self):
        from mobray.functions.phash import hamming64

        h1 = simhash64(BASE.split())
        h2 = simhash64(BASE.replace("morning", "evening").split())
        h3 = simhash64("totally different words about other things entirely".split())
        d12 = hamming64(np.array([h1]), np.array([h2]))[0]
        d13 = hamming64(np.array([h1]), np.array([h3]))[0]
        assert d12 < d13


class TestExactDedup:
    def test_vs_oracle(self, ray_session):
        import ray.data

        df = corpus()
        out = (
            exact_dedup(ray.data.from_pandas(df).repartition(3), "text", "doc_id")
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        # oracle: min doc_id per distinct text
        oracle = (
            df.groupby("text", sort=False)
            .agg(doc_id=("doc_id", "min"), n_dups=("doc_id", "count"))
            .reset_index()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert list(out["doc_id"]) == list(oracle["doc_id"])
        assert list(out["n_dups"]) == list(oracle["n_dups"])
        assert 2 not in set(out["doc_id"])  # the exact dup was dropped


class TestMinhashLsh:
    def test_clusters_near_dups(self, ray_session):
        import ray.data

        out = minhash_lsh_dedup(
            ray.data.from_pandas(corpus()).repartition(2),
            "text",
            "doc_id",
            threshold=0.5,
        )
        got = dict(zip(out["doc_id"], out["cluster"]))
        # 0, 1, 2 must share a cluster; 3 and 4 must not appear
        assert got.get(1) == 0 and got.get(2) == 0
        assert 3 not in got and 4 not in got


class TestSimhashDedup:
    def test_finds_identical_and_near(self, ray_session):
        import ray.data

        out = simhash_dedup(
            ray.data.from_pandas(corpus()).repartition(2), "text", "doc_id",
            hamming_radius=6,
        )
        pairs = set(zip(out["a"], out["b"]))
        assert (0, 2) in pairs  # identical
        assert (0, 1) in pairs or (1, 2) in pairs  # near-dup
        assert not any(3 in p or 4 in p for p in pairs)


class TestAllNullTextBlocks:
    """An all-null text partition infers Arrow's null type (e.g. a
    from_pandas block where every caption is missing); the text dedup
    family must treat it as empty docs, not crash in the utf8 kernels."""

    def _null_ds(self, n=6):
        import pandas as pd
        import ray.data

        return ray.data.from_pandas(
            pd.DataFrame({"doc_id": range(n), "text": [None] * n})
        )

    def test_simhash_all_null(self, ray_session):
        out = simhash_dedup(self._null_ds(), "text", "doc_id", hamming_radius=3)
        # all signatures are 0 -> every distinct pair at hamming 0
        assert len(out) == 6 * 5 // 2
        assert (out["hamming"] == 0).all()

    def test_minhash_all_null(self, ray_session):
        from mobray.pipelines.dedup import minhash_lsh_dedup

        out = minhash_lsh_dedup(self._null_ds(), "text", "doc_id", threshold=0.8)
        # empty docs share the empty-shingle-set signature, so all six
        # docs form one cluster rooted at doc 0; the (id, cluster) output
        # lists the non-root members
        got = dict(zip(out["doc_id"], out["cluster"]))
        assert got == {i: 0 for i in range(1, 6)}

    def test_ngram_all_null(self, ray_session):
        out = ngram_jaccard_pairs(self._null_ds(), "text", "doc_id").to_pandas()
        assert set(out.columns) >= {"a", "b", "jaccard"}


class TestNgramJaccard:
    def test_pairs(self, ray_session):
        import ray.data

        out = (
            ngram_jaccard_pairs(
                ray.data.from_pandas(corpus()).repartition(2),
                "text",
                "doc_id",
                threshold=0.3,
            )
            .to_pandas()
        )
        pairs = set(zip(out["a"], out["b"]))
        assert (0, 2) in pairs
        ex = out[(out["a"] == 0) & (out["b"] == 2)]
        assert ex["jaccard"].iloc[0] == pytest.approx(1.0)


class TestEmbeddingNearDup:
    def test_finds_planted_neardups(self, ray_session):
        import ray.data

        rng = np.random.RandomState(5)
        base = rng.normal(size=(20, 16))
        emb = base.copy()
        emb[7] = base[3] + rng.normal(scale=0.01, size=16)  # planted near-dup
        df = pd.DataFrame({"vec_id": range(20), "embedding": list(emb)})
        out = (
            embedding_neardup_pairs(
                ray.data.from_pandas(df).repartition(2),
                "embedding",
                "vec_id",
                threshold=0.95,
                n_planes=8,
            )
        )
        pairs = set(zip(out["a"], out["b"]))
        assert (3, 7) in pairs
        # random gaussian pairs almost surely below 0.95 cosine
        assert all(p == (3, 7) for p in pairs)

    def test_on_real_embeddings(self, ray_session, sf_dir):
        import ray.data

        ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
        out = embedding_neardup_pairs(
            ds, "embedding", "vec_id", threshold=0.99, n_planes=6
        )
        # smoke: runs; random gaussian embeddings have no 0.99-cosine pairs
        assert len(out) == 0 or list(out.columns) == ["a", "b", "cosine"]


class TestHashKernels:
    def test_mulmod61_exact(self):
        import numpy as np

        from mobray.functions.hashing import _MERSENNE, mulmod61

        rng = np.random.Generator(np.random.PCG64(5))
        a = rng.integers(0, _MERSENNE, size=500, dtype=np.uint64)
        x = rng.integers(0, _MERSENNE, size=500, dtype=np.uint64)
        got = mulmod61(a, x)
        want = [(int(ai) * int(xi)) % _MERSENNE for ai, xi in zip(a, x)]
        assert got.tolist() == want

    def test_mulmod61_full_uint64_range(self):
        # operands ABOVE the modulus (raw 64-bit hashes) must reduce
        # exactly too — the division-free fold path has its own bounds
        import numpy as np

        from mobray.functions.hashing import _MERSENNE, mulmod61

        rng = np.random.Generator(np.random.PCG64(6))
        a = rng.integers(0, 2**64, size=500, dtype=np.uint64)
        x = rng.integers(0, 2**64, size=500, dtype=np.uint64)
        got = mulmod61(a, x)
        want = [(int(ai) * int(xi)) % _MERSENNE for ai, xi in zip(a, x)]
        assert got.tolist() == want
        edges = [0, 1, _MERSENNE - 1, _MERSENNE, _MERSENNE + 1, 2**61, 2**64 - 1]
        for ai in edges:
            for xi in edges:
                g = mulmod61(
                    np.array([ai], dtype=np.uint64), np.array([xi], dtype=np.uint64)
                )[0]
                assert int(g) == (ai * xi) % _MERSENNE, (ai, xi)

    def test_minhash_signatures_duplicate_shingles_invariant(self):
        # min over a SET == min over the multiset: the batched kernel
        # dedups per-doc shingles as a kernel-cost optimization
        import numpy as np

        from mobray.functions.hashing import (
            minhash_params,
            minhash_signature,
            minhash_signatures,
        )

        rng = np.random.Generator(np.random.PCG64(7))
        base = rng.integers(0, 2**64, size=40, dtype=np.uint64)
        dup = np.concatenate([base, base[:17], base[5:9]])
        a, b = minhash_params(32)
        batch = minhash_signatures(dup, np.array([0], dtype=np.int64), a, b)
        assert batch[0].tolist() == minhash_signature(base, a, b).tolist()

    def test_minhash_signatures_batch_matches_scalar(self):
        import numpy as np

        from mobray.functions.hashing import (
            char_shingles,
            minhash_params,
            minhash_signature,
            minhash_signatures,
            stable_hash64,
        )

        texts = ["the quick brown fox", "", "jumps over the lazy dog", "xy"]
        a, b = minhash_params(16)
        all_sh, offsets = [], []
        for t in texts:
            offsets.append(len(all_sh))
            all_sh.extend(char_shingles(t, 4))
        batch = minhash_signatures(stable_hash64(all_sh), np.array(offsets), a, b)
        for i, t in enumerate(texts):
            sh = char_shingles(t, 4)
            scalar = minhash_signature(
                stable_hash64(sh) if sh else np.empty(0, np.uint64), a, b
            )
            assert batch[i].tolist() == scalar.tolist(), t

    def test_shingle_hash_stream_matches_naive_spec(self):
        """The vectorized one-buffer shingle pass must equal the
        oracle's straight-line per-doc reimplementation byte for byte,
        including the edge cases: empty, null, shorter-than-k, pure
        whitespace, tab/newline runs, repeated shingles, non-ascii."""
        import numpy as np
        import pyarrow as pa

        from mobray.functions.hashing import shingle_hash_stream
        from mobray.oracle.naive import _shingle_hashes

        texts = [
            "The quick  Brown\tfox",
            "",
            None,
            "ab",
            "   \t\n  ",
            "aaaaaaaaaa",
            "Ünïcödé tëxt ünïcödé",
            " leading and trailing  ",
            "x",
        ]
        for k in (3, 5, 7):
            hashes, offsets = shingle_hash_stream(
                pa.array(texts, pa.string()), k
            )
            counts = np.diff(np.append(offsets, len(hashes)))
            for i, t in enumerate(texts):
                exp = _shingle_hashes(t, k)
                got = hashes[offsets[i] : offsets[i] + counts[i]].tolist()
                assert got == exp, (k, t)

    def test_shingle_hash_stream_chunked_and_offset_inputs(self):
        import pyarrow as pa

        from mobray.functions.hashing import shingle_hash_stream

        base = pa.array(["hello world", "foo bar baz", "zap"], pa.string())
        whole = shingle_hash_stream(base, 5)
        sliced = shingle_hash_stream(base.slice(1), 5)
        chunked = shingle_hash_stream(
            pa.chunked_array([base.slice(0, 1), base.slice(1)]), 5
        )
        assert whole[0].tolist() == chunked[0].tolist()
        assert whole[0][len(whole[0]) - len(sliced[0]):].tolist() == sliced[0].tolist()

    def test_simhash_batch_matches_scalar(self):
        import numpy as np

        from mobray.functions.hashing import simhash64, simhash64_batch, stable_hash64

        texts = ["alpha beta gamma", "", "delta", "alpha alpha beta"]
        toks, offsets = [], []
        for t in texts:
            offsets.append(len(toks))
            toks.extend(t.split())
        batch = simhash64_batch(stable_hash64(toks), np.array(offsets))
        for i, t in enumerate(texts):
            assert int(batch[i]) == simhash64(t.split()), t

    def test_simhash_batch_matches_straightline_majority(self):
        """The unpackbits/packbits kernel must stay bit-identical to the
        definition: per doc, bit k of the signature is set iff strictly
        more than half the token hashes have bit k set. The scalar path
        routes through the batch kernel, so this independent per-bit
        counting loop is the real regression guard."""
        import numpy as np

        from mobray.functions.hashing import simhash64_batch

        def straightline(hashes, offsets):
            total = len(hashes)
            out = np.zeros(len(offsets), dtype=np.int64)
            bounds = list(offsets) + [total]
            for i in range(len(offsets)):
                doc = hashes[bounds[i]:bounds[i + 1]]
                if len(doc) == 0:
                    continue
                sig = 0
                for k in range(64):
                    ones = sum((int(h) >> k) & 1 for h in doc)
                    if 2 * ones > len(doc):
                        sig |= 1 << k
                out[i] = np.uint64(sig).astype(np.int64)
            return out

        rng = np.random.RandomState(11)
        for trial in range(8):
            n_docs = rng.randint(0, 12)
            counts = rng.randint(0, 9, n_docs)
            offsets = (
                np.concatenate(([0], np.cumsum(counts)[:-1])).astype(np.int64)
                if n_docs else np.empty(0, np.int64)
            )
            # include high-bit-set hashes (sign bit) and duplicates
            total = int(counts.sum()) if n_docs else 0
            h = rng.randint(0, 2**63, total).astype(np.uint64) * np.uint64(2)
            h[::2] |= np.uint64(1)
            np.testing.assert_array_equal(
                simhash64_batch(h, offsets), straightline(h, offsets), err_msg=str(trial)
            )


class TestEmbeddingNeardupRecall:
    def test_planted_pairs_all_found(self, ray_session):
        """Multi-table hyperplane LSH + exact verify must find every
        planted near-dup pair (recall 1 vs brute force on this fixture)."""
        import numpy as np
        import pandas as pd
        import ray.data

        from mobray.pipelines.dedup import embedding_neardup_pairs

        rng = np.random.RandomState(21)
        base = rng.normal(size=(200, 32))
        planted = base[:30] + rng.normal(scale=0.02, size=(30, 32))
        emb = np.concatenate([base, planted])
        ids = list(range(200)) + [1000 + i for i in range(30)]
        ds = ray.data.from_pandas(
            pd.DataFrame({"vec_id": ids, "embedding": [r.tolist() for r in emb]})
        )
        pairs = embedding_neardup_pairs(
            ds, "embedding", "vec_id", threshold=0.98, n_planes=6, n_tables=4
        )
        # brute-force oracle
        nrm = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        sims = nrm @ nrm.T
        ii, jj = np.where(np.triu(sims, 1) >= 0.98)
        want = sorted((min(ids[i], ids[j]), max(ids[i], ids[j])) for i, j in zip(ii, jj))
        got = sorted(zip(pairs["a"].astype(int), pairs["b"].astype(int)))
        assert got == want
        assert len(want) >= 30  # every planted pair is a true near-dup


class TestDistributedCC:
    def test_matches_driver_union_find(self, ray_session):
        """Min-label propagation must produce the same components as the
        driver union-find on a random sparse graph."""
        import numpy as np
        import pandas as pd
        import ray.data

        from mobray.pipelines.dedup import (
            _union_find,
            connected_components_distributed,
        )

        rng = np.random.RandomState(13)
        edges = [
            tuple(sorted(p))
            for p in rng.randint(0, 60, size=(40, 2))
            if p[0] != p[1]
        ]
        pairs = pd.DataFrame(edges, columns=["a", "b"]).drop_duplicates()
        ds = ray.data.from_pandas(pairs).repartition(4)
        got = (
            connected_components_distributed(ds, "a", "b", num_buckets=8)
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        want = _union_find(list(zip(pairs["a"], pairs["b"])))
        # CC also labels each component's root (cluster = itself), which
        # the driver union-find map omits; add the roots for comparison
        all_nodes = set(pairs["a"]) | set(pairs["b"])
        for n_ in all_nodes:
            want.setdefault(n_, n_)
        want_df = pd.DataFrame(
            sorted(want.items()), columns=["node", "cluster"]
        )
        pd.testing.assert_frame_equal(
            got.astype("int64"), want_df.astype("int64")
        )

    def test_long_chain(self, ray_session):
        """A path graph (worst-case diameter) still converges to one
        component labelled by the minimum node."""
        import pandas as pd
        import ray.data

        from mobray.pipelines.dedup import connected_components_distributed

        pairs = pd.DataFrame({"a": list(range(0, 9)), "b": list(range(1, 10))})
        got = connected_components_distributed(
            ray.data.from_pandas(pairs), "a", "b", num_buckets=8
        ).to_pandas()
        assert sorted(got["node"]) == list(range(10))
        assert set(got["cluster"]) == {0}

    def test_minhash_distributed_backend(self, ray_session, sf_dir):
        import ray.data

        from mobray.pipelines.dedup import minhash_lsh_dedup

        ds = ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        drv = minhash_lsh_dedup(ds, "text", "doc_id", threshold=0.7)
        dist = (
            minhash_lsh_dedup(
                ds, "text", "doc_id", threshold=0.7,
                cluster_backend="distributed",
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert drv.reset_index(drop=True).astype("int64").equals(
            dist.astype("int64")
        )


class TestAutoBuckets:
    def test_scales_with_input_bytes(self, ray_session, tmp_path):
        import numpy as np
        import pandas as pd
        import pyarrow.parquet as pq
        import pyarrow as pa
        import ray.data

        from mobray.pipelines.temporal import auto_num_buckets

        rng = np.random.RandomState(0)
        small = pd.DataFrame({"x": np.arange(1000), "y": rng.rand(1000)})
        # genuinely random rows: repeated data would compress away the
        # size difference this test is about
        big = pd.DataFrame({"x": np.arange(40000), "y": rng.rand(40000)})
        pq.write_table(pa.Table.from_pandas(small), str(tmp_path / "small.parquet"))
        pq.write_table(pa.Table.from_pandas(big), str(tmp_path / "big.parquet"))
        ds_s = ray.data.read_parquet(str(tmp_path / "small.parquet"))
        ds_b = ray.data.read_parquet(str(tmp_path / "big.parquet"))
        n_s = auto_num_buckets(ds_s, floor=4, target_bytes=8_000)
        n_b = auto_num_buckets(ds_b, floor=4, target_bytes=8_000)
        assert n_b > n_s  # proportionally more buckets for more bytes
        assert n_b >= 20
        # floor respected for in-memory datasets (no input files)
        assert auto_num_buckets(ray.data.from_pandas(small), floor=7) == 7


class TestPairOutputModes:
    """The Dataset-returning escape hatches (output='dataset'/'clusters')
    must agree with the default driver-collected pandas path — mirrors
    TestDistributedCC for the rest of the near-dup family."""

    def _ds(self):
        import ray.data

        return ray.data.from_pandas(corpus()).repartition(2)

    def test_simhash_dataset_matches_pandas(self, ray_session):
        want = simhash_dedup(self._ds(), "text", "doc_id", hamming_radius=6)
        got = (
            simhash_dedup(
                self._ds(), "text", "doc_id", hamming_radius=6, output="dataset"
            )
            .to_pandas()
            .sort_values(["a", "b"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got[["a", "b", "hamming"]].astype("int64"),
            want[["a", "b", "hamming"]].astype("int64"),
        )

    def test_simhash_clusters_match_union_find(self, ray_session):
        from mobray.pipelines.dedup import _union_find

        want_pairs = simhash_dedup(self._ds(), "text", "doc_id", hamming_radius=6)
        want = sorted(_union_find(list(zip(want_pairs["a"], want_pairs["b"]))).items())
        got = (
            simhash_dedup(
                self._ds(), "text", "doc_id", hamming_radius=6, output="clusters"
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert list(zip(got["doc_id"], got["cluster"])) == want

    def test_phash_dataset_matches_pandas(self, ray_session):
        import ray.data

        from mobray.pipelines.dedup import phash_neardup_pairs

        rng = np.random.RandomState(11)
        hashes = rng.randint(-(2**62), 2**62, size=50).astype(np.int64)
        hashes[30] = hashes[10]
        hashes[40] = hashes[20] ^ 0b101
        df = pd.DataFrame({"image_id": [f"img{i:03d}" for i in range(50)],
                           "phash": hashes})
        ds = ray.data.from_pandas(df).repartition(3)
        want = phash_neardup_pairs(ds, "phash", "image_id", hamming_radius=3)
        got = (
            phash_neardup_pairs(
                ds, "phash", "image_id", hamming_radius=3, output="dataset"
            )
            .to_pandas()
            .sort_values(["a", "b"])
            .reset_index(drop=True)
        )
        # string ids exercise the dtype-stable empty-group schema
        pd.testing.assert_frame_equal(got[["a", "b", "hamming"]], want)

    def test_embedding_clusters(self, ray_session):
        import ray.data

        rng = np.random.RandomState(5)
        base = rng.normal(size=(20, 16))
        emb = base.copy()
        emb[7] = base[3] + rng.normal(scale=0.01, size=16)
        df = pd.DataFrame({"vec_id": range(20), "embedding": list(emb)})
        ds = ray.data.from_pandas(df).repartition(2)
        got = (
            embedding_neardup_pairs(
                ds, "embedding", "vec_id", threshold=0.95, n_planes=8,
                output="clusters",
            )
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        assert list(zip(got["vec_id"], got["cluster"])) == [(7, 3)]

    def test_unknown_output_mode_raises(self, ray_session):
        with pytest.raises(ValueError, match="output mode"):
            simhash_dedup(self._ds(), "text", "doc_id", output="bogus")

    def test_float64_input_shuffles_float32(self, ray_session):
        """A float64 source embedding column must be downcast to float32
        in the replicated (bucket, id, emb) exchange rows — the verify is
        threshold-based, and the cast halves the dominant shuffle bytes —
        while still finding the planted pair."""
        import pyarrow as pa
        import ray.data

        rng = np.random.RandomState(5)
        base = rng.normal(size=(20, 16))  # float64
        emb = base.copy()
        emb[7] = base[3] + rng.normal(scale=0.01, size=16)
        t = pa.table(
            {
                "vec_id": pa.array(range(20), pa.int64()),
                "embedding": pa.array(list(emb), pa.list_(pa.float64())),
            }
        )
        ds = ray.data.from_arrow(t).repartition(2)
        out = embedding_neardup_pairs(
            ds, "embedding", "vec_id", threshold=0.95, n_planes=8,
            output="dataset",
        )
        assert set(zip(*out.to_pandas()[["a", "b"]].to_numpy().T)) == {(3, 7)}

    def test_ship_ids_equals_ship_vectors(self, ray_session):
        """The (bucket, id)-only exchange with vector join-back must find
        exactly the pairs the vector-shipping exchange finds."""
        import ray.data

        rng = np.random.RandomState(5)
        base = rng.normal(size=(40, 16))
        emb = base.copy()
        emb[7] = base[3] + rng.normal(scale=0.01, size=16)
        emb[21] = base[11] + rng.normal(scale=0.01, size=16)
        df = pd.DataFrame({"vec_id": range(40), "embedding": list(emb)})
        ds = ray.data.from_pandas(df).repartition(3)
        kw = dict(threshold=0.95, n_planes=8, n_tables=4)
        want = embedding_neardup_pairs(ds, "embedding", "vec_id", **kw)
        got = embedding_neardup_pairs(
            ds, "embedding", "vec_id", ship="ids", **kw
        )
        assert list(zip(got["a"], got["b"])) == list(zip(want["a"], want["b"]))
        assert {(3, 7), (11, 21)} <= set(zip(got["a"], got["b"]))
        np.testing.assert_allclose(
            got["cosine"].to_numpy(), want["cosine"].to_numpy(), rtol=1e-6
        )
