"""Approximate-nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k — one numpy matmul per batch against
a broadcast query matrix (``ray.put`` once, read per task), per-batch
top-k, tiny driver-side merge of k x n_batches candidates. Exact, scan
cost O(rows x dim), shuffle-free.

Scale path: IVF — k-means-lite coarse centroids (sampled, driver-side
Lloyd iterations), assign rows to their nearest centroid in map_batches,
search only rows whose centroid is among the ``n_probe`` closest to each
query. Same per-batch matmul kernel; scan cost drops by
~n_probe/n_centroids at a small recall cost.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

from mobray.functions.arrowutils import embedding_matrix


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def _finalize_topk(cands_ds, k: int, output: str):
    """Merge per-batch candidate top-k rows into the global per-query
    top-k — the same escape-hatch convention as the near-dup family:

    - 'pandas' (default): tiny driver-side merge of k x n_batches rows.
      Right for a handful of queries.
    - 'dataset': lazy Dataset (query_id, rank, id, cosine) via a
      per-query groupby — nothing lands on the driver, for many-query
      batch workloads where even k x n_batches x n_queries rows is a
      shuffle-sized result.
    """
    if output == "dataset":
        from mobray.functions.arrowutils import table_from_pandas

        def topk_group(g: pd.DataFrame) -> pa.Table:
            g = g.sort_values("cosine", ascending=False).head(k).copy()
            g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
            return table_from_pandas(g[["query_id", "rank", "id", "cosine"]])

        return cands_ds.groupby("query_id").map_groups(
            topk_group, batch_format="pandas"
        )
    if output != "pandas":
        raise ValueError(f"unknown output mode {output!r}")
    cands = cands_ds.to_pandas()
    if len(cands) == 0:
        return pd.DataFrame({"query_id": [], "rank": [], "id": [], "cosine": []})
    cands = cands.sort_values(["query_id", "cosine"], ascending=[True, False])
    top = cands.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    top["rank"] = top.groupby("query_id").cumcount() + 1
    return top[["query_id", "rank", "id", "cosine"]]


def knn_bruteforce(
    ds, emb_col: str, id_col: str, queries: np.ndarray, k: int = 10, *,
    output: str = "pandas",
):
    """Exact cosine top-k for each query row. Returns a pandas DataFrame
    (query_id, rank, id, cosine) — (n_queries x k) rows — or a lazy
    Dataset of the same schema under ``output='dataset'``
    (see ``_finalize_topk``)."""
    import ray

    q = _normalize(np.asarray(queries, dtype=np.float64))
    qref = ray.put(q)

    def batch_topk(batch: pa.Table) -> pa.Table:
        qm = ray.get(qref)
        emb = _normalize(embedding_matrix(batch[emb_col]))
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sims = qm @ emb.T  # (n_queries, batch_rows)
        kk = min(k, sims.shape[1])
        top = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        out_q = np.repeat(np.arange(sims.shape[0], dtype=np.int64), kk)
        out_id = ids[top.ravel()]
        out_sim = np.take_along_axis(sims, top, axis=1).ravel()
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "id": pa.array(out_id),
                "cosine": pa.array(out_sim, pa.float64()),
            }
        )

    return _finalize_topk(
        ds.map_batches(batch_topk, batch_format="pyarrow"), k, output
    )


def train_centroids(
    ds, emb_col: str, n_centroids: int = 16, sample_rows: int = 2048, iters: int = 8,
    seed: int = 3,
) -> np.ndarray:
    """k-means-lite coarse quantizer trained on a driver-side RANDOM
    sample (``ds.random_sample``, seeded — a ``limit()`` would read only
    the first blocks and bias the centroids toward whatever entities
    sort first in storage)."""
    n = ds.count()
    if n <= sample_rows:
        sample = ds.to_pandas()
    else:
        # oversample slightly so the post-limit keeps ~sample_rows
        frac = min(1.0, 1.5 * sample_rows / n)
        sample = ds.random_sample(frac, seed=seed).limit(sample_rows).to_pandas()
    x = _normalize(np.array(sample[emb_col].tolist(), dtype=np.float64))
    rng = np.random.Generator(np.random.PCG64(seed))
    cent = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(iters):
        assign = (x @ cent.T).argmax(axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                cent[c] = x[m].mean(axis=0)
        cent = _normalize(cent)
    return cent


def knn_ivf(
    ds,
    emb_col: str,
    id_col: str,
    queries: np.ndarray,
    k: int = 10,
    *,
    centroids: Optional[np.ndarray] = None,
    n_centroids: int = 16,
    n_probe: int = 4,
    output: str = "pandas",
):
    """IVF-style ANN: scan only rows assigned to the n_probe centroids
    nearest each query. Returns the same schema as knn_bruteforce
    (``output='dataset'`` for the driver-free merge)."""
    import ray

    if centroids is None:
        centroids = train_centroids(ds, emb_col, n_centroids)
    q = _normalize(np.asarray(queries, dtype=np.float64))
    probe = np.argsort(-(q @ centroids.T), axis=1)[:, :n_probe]  # (nq, n_probe)
    qref = ray.put((q, probe))
    cref = ray.put(centroids)

    def batch_topk(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        qm, probe_lists = ray.get(qref)
        cent = ray.get(cref)
        nq = qm.shape[0]
        emb = _normalize(embedding_matrix(batch[emb_col]))
        cell = (emb @ cent.T).argmax(axis=1)
        # allowed[c, q] = centroid c is among query q's probe cells; one
        # gather turns it into the (rows x queries) visibility mask — no
        # per-query Python loop (the old shape: ~nq isin+matmul passes)
        allowed = np.zeros((len(cent), nq), dtype=bool)
        allowed[
            probe_lists.ravel(),
            np.repeat(np.arange(nq, dtype=np.int64), probe_lists.shape[1]),
        ] = True
        mask = allowed[cell]  # (rows, nq)
        rows_keep = np.flatnonzero(mask.any(axis=1))
        id_arr = batch[id_col].combine_chunks()
        if len(rows_keep) == 0:
            # typed empty (pc.take keeps the id dtype for empty output)
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "id": pc.take(id_arr, pa.array([], pa.int64())),
                    "cosine": pa.array([], pa.float64()),
                }
            )
        sims = emb[rows_keep] @ qm.T  # (kept_rows, nq) — ONE matmul
        np.copyto(sims, -np.inf, where=~mask[rows_keep])
        kk = min(k, sims.shape[0])
        top = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # (kk, nq)
        top_sims = np.take_along_axis(sims, top, axis=0)
        valid = np.isfinite(top_sims)  # a query may probe < kk rows here
        qq = np.broadcast_to(np.arange(nq, dtype=np.int64), (kk, nq))
        row_idx = rows_keep[top[valid]]
        return pa.table(
            {
                "query_id": pa.array(qq[valid], pa.int64()),
                "id": pc.take(id_arr, pa.array(row_idx, pa.int64())),
                "cosine": pa.array(top_sims[valid], pa.float64()),
            }
        )

    return _finalize_topk(
        ds.map_batches(batch_topk, batch_format="pyarrow"), k, output
    )
