"""Embedding-column aggregate operators.

Vector columns (``list<float>``) aggregate with the same partial+final
combiner pattern as scalars: per-batch sums of vectors per group (one
partial row per group per batch, payload = dim floats), then a per-group
final reduce. Shuffle volume is O(groups x batches x dim), never rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from mobray.functions.arrowutils import embedding_matrix


def group_centroids(ds, emb_col: str, group_col: str, normalize: bool = False):
    """Mean embedding per group -> pandas DataFrame
    (group, centroid:list<float>, n)."""

    def partial(batch: pa.Table) -> pa.Table:
        emb = embedding_matrix(batch[emb_col])
        groups = batch[group_col].to_numpy(zero_copy_only=False)
        # one segmented-sum over the batch's vectors: factorize group
        # values, sort rows by code, reduceat at code boundaries
        codes, uniques = pd.factorize(groups, sort=False)
        order = np.argsort(codes, kind="stable")
        sorted_codes = codes[order]
        starts = np.flatnonzero(np.diff(sorted_codes, prepend=-1))
        sums = np.add.reduceat(emb[order], starts, axis=0)
        counts = np.diff(np.append(starts, len(codes)))
        return pa.table(
            {
                "g": pa.array(np.asarray(uniques)[sorted_codes[starts]]),
                "vsum": pa.array(list(sums), pa.list_(pa.float64())),
                "n": pa.array(counts, pa.int64()),
            }
        )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        vsum = np.array(g["vsum"].tolist(), dtype=np.float64).sum(axis=0)
        n = int(g["n"].sum())
        cent = vsum / n
        if normalize:
            cent = cent / max(np.linalg.norm(cent), 1e-12)
        return pd.DataFrame(
            {"group": [g["g"].iloc[0]], "centroid": [cent.tolist()], "n": [n]}
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("g")
        .map_groups(final, batch_format="pandas")
        .to_pandas()
        .sort_values("group")
        .reset_index(drop=True)
    )
