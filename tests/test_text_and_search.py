"""Text analysis stage + similarity search pipelines."""

import numpy as np
import pandas as pd
import pytest

from mobray.functions.textfns import (
    bpe_token_count,
    detect_language,
    quality_metrics,
    rolling_fingerprint,
    tokenize_lower_batch,
    ws_token_count,
)
from mobray.pipelines.simsearch import knn_bruteforce, knn_ivf, train_centroids
from mobray.stages.text import TextAnalysisStage


class TestTextFns:
    def test_token_counts(self):
        s = pd.Series(["one two three", "", "a b"])
        np.testing.assert_array_equal(ws_token_count(s), [3, 0, 2])
        assert bpe_token_count(pd.Series(["hello, world!"]))[0] == 4  # hello , world !

    def test_quality_metrics(self):
        q = quality_metrics(pd.Series(["the cat sat on the mat with a hat", "!!!"]))
        assert q["n_tokens"][0] == 9
        assert q["quality_score"][0] > q["quality_score"][1]
        assert 0 <= q["quality_score"].min() and q["quality_score"].max() <= 1

    def test_langid(self):
        texts = pd.Series(
            [
                "the cat is on the mat and it is warm",
                "der Hund ist nicht mit der Katze auf dem Dach und das ist gut",
                "el perro es grande y la casa es blanca con un jardin",
                "le chien est dans la maison et les enfants sont pour le parc",
                "zzzz qqqq xxxx",
            ]
        )
        out = detect_language(texts)
        assert list(out) == ["en", "de", "es", "fr", "und"]

    def test_fingerprint_stability(self):
        s = pd.Series(["alpha beta gamma delta epsilon zeta eta theta iota kappa"])
        f1 = rolling_fingerprint(s)
        f2 = rolling_fingerprint(s.copy())
        assert f1[0] == f2[0] != 0
        # a local edit far from the minimizing window often preserves it;
        # at minimum the fingerprint stays deterministic and non-zero
        assert rolling_fingerprint(pd.Series([""]))[0] == 0


class TestTextStage:
    def test_on_documents(self, ray_session, sf_dir):
        import ray.data

        ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet")
        out = ds.map_batches(
            TextAnalysisStage, batch_format="pyarrow", concurrency=2
        ).to_pandas()
        assert {"n_ws_tokens", "n_bpe_tokens", "quality_score", "lang_pred", "fingerprint"} <= set(out.columns)
        assert (out["n_ws_tokens"] > 0).all()
        # oracle: whitespace token count == duckdb's split count
        import duckdb

        con = duckdb.connect()
        oracle = con.sql(
            f"""SELECT doc_id, len(string_split_regex(trim(text), '\\s+')) AS n
                FROM read_parquet('{sf_dir}/documents.parquet') ORDER BY doc_id"""
        ).df()
        con.close()
        got = out.sort_values("doc_id")["n_ws_tokens"].to_numpy()
        np.testing.assert_array_equal(got, oracle["n"].to_numpy())


class TestKnn:
    @pytest.fixture(scope="class")
    def emb_df(self):
        rng = np.random.RandomState(9)
        emb = rng.normal(size=(200, 32))
        return pd.DataFrame({"vec_id": range(200), "embedding": list(emb)})

    def test_bruteforce_exact(self, ray_session, emb_df):
        import ray.data

        queries = np.array(emb_df["embedding"].tolist())[:3]  # query = rows 0..2
        out = knn_bruteforce(
            ray.data.from_pandas(emb_df).repartition(4),
            "embedding",
            "vec_id",
            queries,
            k=5,
        )
        # numpy oracle
        emb = np.array(emb_df["embedding"].tolist())
        embn = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
        sims = qn @ embn.T
        for qi in range(3):
            expect = set(np.argsort(-sims[qi])[:5])
            got = set(out[out["query_id"] == qi]["id"])
            assert got == expect
            # rank 1 is the query row itself (cosine 1.0)
            top1 = out[(out["query_id"] == qi) & (out["rank"] == 1)]
            assert top1["id"].iloc[0] == qi
            assert top1["cosine"].iloc[0] == pytest.approx(1.0)

    def test_ivf_recall(self, ray_session, emb_df):
        import ray.data

        ds = ray.data.from_pandas(emb_df).repartition(4)
        queries = np.array(emb_df["embedding"].tolist())[:5]
        exact = knn_bruteforce(ds, "embedding", "vec_id", queries, k=3)
        approx = knn_ivf(
            ds, "embedding", "vec_id", queries, k=3, n_centroids=8, n_probe=4
        )
        # top-1 recall should be high with half the centroids probed
        hits = 0
        for qi in range(5):
            e1 = exact[(exact["query_id"] == qi) & (exact["rank"] == 1)]["id"].iloc[0]
            a = approx[approx["query_id"] == qi]["id"].tolist()
            hits += e1 in a
        assert hits >= 4

    def test_on_real_embeddings(self, ray_session, sf_dir):
        import ray.data

        ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
        first = np.array(ds.take(2)[0]["embedding"], dtype=float)
        out = knn_bruteforce(ds, "embedding", "vec_id", first[None, :], k=3)
        assert len(out) == 3
        assert out[out["rank"] == 1]["cosine"].iloc[0] == pytest.approx(1.0)

    def test_centroids_trainable(self, ray_session, emb_df):
        import ray.data

        cent = train_centroids(
            ray.data.from_pandas(emb_df), "embedding", n_centroids=8
        )
        assert cent.shape == (8, 32)
        np.testing.assert_allclose(np.linalg.norm(cent, axis=1), 1.0, rtol=1e-9)


class TestIvfRecall:
    def test_recall_at_10_vs_bruteforce(self, ray_session):
        """IVF with n_probe=half the cells must keep recall@10 >= 0.75 on
        unstructured vectors (it is exact when clusters exist; this
        fixture is the adversarial no-structure case)."""
        import numpy as np
        import ray.data

        from mobray.pipelines.simsearch import knn_bruteforce, knn_ivf

        rng = np.random.RandomState(7)
        emb = rng.normal(size=(400, 32))
        df = {"vec_id": list(range(400)), "embedding": [r.tolist() for r in emb]}
        import pandas as pd

        ds = ray.data.from_pandas(pd.DataFrame(df))
        qs = emb[:10]
        bf = knn_bruteforce(ds, "embedding", "vec_id", qs, k=10)
        iv = knn_ivf(ds, "embedding", "vec_id", qs, k=10, n_centroids=8, n_probe=4)
        recs = []
        for qi in range(10):
            b = set(bf[bf.query_id == qi]["id"])
            v = set(iv[iv.query_id == qi]["id"])
            recs.append(len(b & v) / len(b))
        assert np.mean(recs) >= 0.75

    def test_ivf_exact_with_cluster_structure(self, ray_session):
        """With genuinely clustered vectors IVF at n_probe=2 is exact for
        in-cluster queries (the 100-TB scale path: probe a few cells)."""
        import numpy as np
        import pandas as pd
        import ray.data

        from mobray.pipelines.simsearch import knn_bruteforce, knn_ivf

        rng = np.random.RandomState(11)
        centers = rng.normal(size=(5, 32)) * 10
        emb = np.concatenate([c + rng.normal(size=(80, 32)) for c in centers])
        ds = ray.data.from_pandas(
            pd.DataFrame(
                {"vec_id": list(range(400)), "embedding": [r.tolist() for r in emb]}
            )
        )
        qs = emb[[0, 100, 200, 300]]
        bf = knn_bruteforce(ds, "embedding", "vec_id", qs, k=5)
        iv = knn_ivf(ds, "embedding", "vec_id", qs, k=5, n_centroids=5, n_probe=2)
        assert iv["id"].tolist() == bf["id"].tolist()


class TestFingerprintReferenceLoop:
    def test_batched_matches_per_doc_loop(self):
        """The batched reduceat fingerprint must stay bit-identical to
        the straightforward per-document construction it replaced."""
        import numpy as np
        import pandas as pd

        from mobray.functions.hashing import stable_hash64

        def per_doc(texts, window):
            out = np.zeros(len(texts), dtype=np.int64)
            for i, t in enumerate(texts.fillna("")):
                toks = t.lower().split()
                if not toks:
                    continue
                th = stable_hash64(toks)
                if len(th) <= window:
                    out[i] = np.int64(th.min() & np.uint64(0x7FFFFFFFFFFFFFFF))
                    continue
                w = np.lib.stride_tricks.sliding_window_view(th, window)
                combined = w[:, 0].copy()
                for k in range(1, window):
                    combined = combined * np.uint64(1099511628211) + w[:, k]
                out[i] = np.int64(combined.min() & np.uint64(0x7FFFFFFFFFFFFFFF))
            return out

        rng = np.random.RandomState(7)
        words = ["alpha", "beta", "gamma", "delta", "x", "yy", "zzz", "lorem"]
        texts = [" ".join(rng.choice(words, n)) for n in
                 [0, 1, 7, 8, 9, 16, 100, 3, 0, 8, 40]]
        texts += [None, "", "ONE two Three", "a " * 120]
        s = pd.Series(texts)
        for w in (1, 2, 8, 16):
            np.testing.assert_array_equal(rolling_fingerprint(s, w), per_doc(s, w))


class TestTokenizeLowerBatch:
    CASES = [
        "Hello  World",
        "",
        "   ",
        None,
        "a\tb\nc",
        " lead trail ",
        "x\x1cy",       # \x1c is whitespace to both str.split and Arrow
        "tab\x85nl",
        "MiXeD Case 123 a.b,c",
        "a " * 50,
    ]

    @staticmethod
    def _reference(texts):
        toks, offsets = [], []
        for t in texts:
            offsets.append(len(toks))
            toks.extend((t or "").lower().split())
        return toks, offsets

    def _check(self, texts):
        import pyarrow as pa

        for col in (pa.array(texts, pa.string()), pd.Series(texts, dtype=object)):
            toks, offsets = tokenize_lower_batch(col)
            ref_toks, ref_offsets = self._reference(texts)
            assert list(toks) == ref_toks
            assert list(offsets) == ref_offsets

    def test_ascii_fast_path_token_identical(self):
        self._check(self.CASES)

    def test_non_ascii_falls_back_to_python_semantics(self):
        # 'İ'.lower() is 'i̇' (2 codepoints) in Python but 'i' under
        # Arrow's utf8_lower — the fallback must keep Python semantics
        self._check(self.CASES + ["Ünïcode STRAßE İstanbul", "çok  güzel"])

    def test_empty_batch(self):
        toks, offsets = tokenize_lower_batch(pd.Series([], dtype=object))
        assert len(toks) == 0 and len(offsets) == 0

    def test_chunked_input(self):
        import pyarrow as pa

        col = pa.chunked_array([self.CASES[:4], self.CASES[4:]], pa.string())
        toks, offsets = tokenize_lower_batch(col)
        ref_toks, ref_offsets = self._reference(self.CASES)
        assert list(toks) == ref_toks and list(offsets) == ref_offsets


class TestStopwordAlternation:
    def test_alternation_equals_per_word_sum(self):
        """One \\b(?:w1|w2|...)\\b scan per language must count exactly
        what the per-word \\b-bounded counts sum to — including the
        prefix-word cases (de/des, la/las) where the shorter alternative
        fails its trailing boundary and backtracks into the longer one."""
        import re

        import numpy as np
        import pandas as pd

        from mobray.functions.textfns import STOPWORDS, _STOP_RES

        texts = pd.Series(
            [
                "des de la las los el un una es",
                "the theory and android of to at",
                "für den nicht ein eine einer",
                "de des du dans le les",
                "",
                None,
                "LA DE Des THE",  # caller lowercases; raw stays uncounted
            ]
        )
        lower = texts.str.lower()
        for lang, words in STOPWORDS.items():
            new = lower.str.count(_STOP_RES[lang]).fillna(0).to_numpy(np.int64)
            old = sum(
                lower.str.count(rf"\b{re.escape(w)}\b")
                .fillna(0)
                .to_numpy(np.int64)
                for w in words
            )
            assert np.array_equal(new, old), lang


class TestKnnDatasetOutput:
    def test_dataset_mode_matches_pandas(self, ray_session):
        import ray.data

        from mobray.pipelines.simsearch import knn_bruteforce, knn_ivf

        rng = np.random.RandomState(11)
        emb = rng.normal(size=(200, 12))
        df = pd.DataFrame({"vec_id": range(200), "embedding": list(emb)})
        ds = ray.data.from_pandas(df).repartition(4)
        queries = emb[:3]
        want = knn_bruteforce(ds, "embedding", "vec_id", queries, k=5)
        got = (
            knn_bruteforce(ds, "embedding", "vec_id", queries, k=5,
                           output="dataset")
            .to_pandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got.astype(want.dtypes.to_dict()), want
        )
        got_ivf = (
            knn_ivf(ds, "embedding", "vec_id", queries, k=5, n_centroids=4,
                    n_probe=4, output="dataset")
            .to_pandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        # n_probe == n_centroids -> exhaustive -> equals brute force
        pd.testing.assert_frame_equal(
            got_ivf.astype(want.dtypes.to_dict()), want
        )
