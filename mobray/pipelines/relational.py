"""General relational joins for large-large inputs.

The broadcast pattern (``ray.put`` a small side, look up inside
map_batches — see ``__ray_entry__.q_customer_nation_join``) covers
dimension tables; this module covers the large-large case with the
portable partitioned hash join: tag + hash-bucket both sides on the key,
co-locate buckets with ONE groupby exchange, and run a vectorized pandas
merge per bucket.

PARTITIONING ASSUMPTION: equal keys hash to the same bucket (stable
``pd.util.hash_array``). Skewed keys: a hot key cannot be split for an
inner/left join without replicating the other side; bucket fan-out
(``num_buckets``) bounds the blast radius, and ``hash_join_salted``
implements the classic salt-and-replicate refinement — left hot-key
rows scatter across ``salt`` sub-keys, the (small) right side's hot-key
rows are replicated once per sub-key, and the per-bucket merge runs on
the composite (key, salt).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

from mobray.pipelines.temporal import (
    _arrow_types,
    _resolve_buckets,
    _hash_bucket,
    _per_bucket,
    bucket_col_for,
    is_bucket_col,
    pad_column,
    restore_pad_dtypes,
)


def _join_aggregator_args(nb: int) -> dict:
    """Size the per-partition aggregator reservation for Dataset.join.

    Ray's two-input join spawns ``num_partitions`` CONCURRENT aggregator
    actors at 1 CPU each by default: any partition count at or above the
    cluster's CPU count starves the producer tasks and deadlocks the
    streaming pipeline (reproduced with the default 64-bucket floor on a
    4-CPU session — the join never returned). Reserve a fraction per
    aggregator so the whole pool takes AT MOST half the cluster, leaving
    the rest for the producer/read tasks — the bound must hold strictly
    (a 0.05/aggregator floor at nb=64 on 4 CPUs reserved 3.2 of 4 and
    still deadlocked; 2.0 of 4 completes reliably), so the per-actor
    share is floored to 3 decimals, never rounded up."""
    import math

    import ray

    try:
        # never auto-init from library code — the driver owns the session
        cpus = (
            float(ray.cluster_resources().get("CPU", 0))
            if ray.is_initialized() else 0.0
        ) or 4.0
    except Exception:
        cpus = 4.0
    share = cpus * 0.5 / max(nb, 1)
    agg_cpus = min(1.0, max(0.001, math.floor(share * 1000) / 1000))
    return {"num_cpus": agg_cpus}


def hash_join(
    left,
    right,
    *,
    on: str,
    how: str = "inner",
    right_cols: Optional[Sequence[str]] = None,
    suffix: str = "_r",
    num_buckets: Optional[int] = None,
    engine: str = "native",
):
    """Distributed equi-join of two Datasets on ``on``.

    ``how``: 'inner' or 'left'. ``right_cols`` limits the right-side
    payload (default: all non-key columns). SQL-equivalent:
    ``SELECT ... FROM left [INNER|LEFT] JOIN right USING (on)``.

    ``engine='native'`` (default) uses Ray Data's two-input hash join
    (``Dataset.join``) — a real co-partitioned exchange where each side
    ships only its own columns. ``engine='padded'`` is the portable
    union-of-padded-schemas fallback; it moves a null-padded copy of the
    left schema with every right row, which inflates the exchange when
    the left table is wide (kept for Ray builds without Dataset.join and
    as the reference implementation for tests).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")

    if engine == "native" and hasattr(left, "join"):
        right_names = [c for c in right.schema().names if not is_bucket_col(c)]
        rcols = [c for c in (right_cols or right_names) if c != on]
        rsel = right.select_columns([on] + rcols)
        nb = _resolve_buckets(left, num_buckets)
        return left.join(
            rsel,
            join_type="inner" if how == "inner" else "left_outer",
            num_partitions=nb,
            on=(on,),
            right_suffix=suffix,
            aggregator_ray_remote_args=_join_aggregator_args(nb),
        )

    left_names = [c for c in left.schema().names if not is_bucket_col(c)]
    right_names = [c for c in right.schema().names if not is_bucket_col(c)]
    rcols = [c for c in (right_cols or right_names) if c != on]
    out_rcols = [c + suffix if c in left_names else c for c in rcols]

    right_types = _arrow_types(right.schema())
    left_types = _arrow_types(left.schema())
    num_buckets = _resolve_buckets(left, num_buckets)
    bc = bucket_col_for(on)

    def pad_left(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        batch = batch.select(left_names)
        batch = batch.append_column("__side", pa.array(np.zeros(n, dtype=np.int8)))
        for rc, oc in zip(rcols, out_rcols):
            batch = batch.append_column(oc, pad_column(n, right_types[rc]))
        kv = batch[on].to_numpy(zero_copy_only=False)
        return batch.append_column(
            bc, pa.array(_hash_bucket(kv, num_buckets), pa.int32())
        )

    def pad_right(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        out = pa.table({on: batch[on]})
        out = out.append_column("__side", pa.array(np.ones(n, dtype=np.int8)))
        for lc in left_names:
            if lc == on:
                continue
            out = out.append_column(lc, pad_column(n, left_types[lc]))
        for rc, oc in zip(rcols, out_rcols):
            out = out.append_column(oc, batch[rc])
        kv = out[on].to_numpy(zero_copy_only=False)
        out = out.append_column(
            bc, pa.array(_hash_bucket(kv, num_buckets), pa.int32())
        )
        order = left_names + ["__side"] + out_rcols + [bc]
        return out.select(order)

    lpad = left.map_batches(pad_left, batch_format="pyarrow")
    rpad = right.map_batches(pad_right, batch_format="pyarrow")
    both = lpad.union(rpad)

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        ldf = g[g["__side"] == 0].drop(columns=["__side"] + out_rcols)
        # SQL null semantics (what the native engine and every SQL oracle
        # produce): a NULL key matches nothing — pd.merge would match
        # NaN to NaN, so null-keyed right rows are dropped up front
        rdf = g[g["__side"] == 1][[on] + out_rcols]
        rdf = rdf[rdf[on].notna()]
        if len(ldf) == 0:
            return ldf.assign(**{c: pd.Series(dtype=rdf[c].dtype) for c in out_rcols})
        merged = ldf.merge(rdf, on=on, how=how)
        merged = restore_pad_dtypes(merged, left_types)
        if how == "inner":
            merged = restore_pad_dtypes(merged, {
                oc: right_types[rc] for rc, oc in zip(rcols, out_rcols)
            })
        return merged

    return _per_bucket(both, on, num_buckets, fn)


def _salted_bucket(kv: np.ndarray, salts: np.ndarray, num_buckets: int) -> np.ndarray:
    """Stable bucket of the composite (key, salt): the key's 64-bit hash
    combined with the salt by an odd-multiplier mix (wraparound uint64),
    identical on both sides. Collisions only affect load balance — the
    per-bucket merge joins on the real (key, salt) columns."""
    h = pd.util.hash_array(kv, hash_key="0123456789123456")
    h = (h + salts.astype(np.uint64)) * np.uint64(0x9E3779B97F4A7C15)
    h ^= h >> np.uint64(29)
    return (h % np.uint64(num_buckets)).astype(np.int32)


def hash_join_salted(
    left,
    right,
    *,
    on: str,
    hot_keys: Sequence,
    salt: int = 8,
    how: str = "inner",
    right_cols: Optional[Sequence[str]] = None,
    suffix: str = "_r",
    num_buckets: Optional[int] = None,
):
    """Skew-safe equi-join: salt-and-replicate the hot keys.

    A hot join key puts a disproportionate share of BOTH sides into one
    hash bucket and that bucket's task straggles the stage no matter how
    many buckets exist (a key cannot be split by plain hashing). This
    variant splits each hot key into ``salt`` sub-keys:

      - LEFT rows of a hot key scatter round-robin across the sub-keys
        (any assignment is valid — it only spreads work);
      - the RIGHT side's hot-key rows are REPLICATED once per sub-key
        (right is the small/dimension side by convention, so the
        replication cost is salt x hot_right_rows, not salt x table);
      - bucketing and the per-bucket vectorized merge run on the
        composite (key, __salt), so each left row meets each matching
        right row EXACTLY once — output equals hash_join's bit-for-bit
        (asserted in tests/test_skew.py).

    ``hot_keys`` comes from the caller (a cheap map-side count +
    threshold pre-pass, or prior knowledge). Non-hot keys pay nothing:
    salt 0 on both sides, one copy of every row.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    if salt < 2:
        raise ValueError(f"salt must be >= 2, got {salt}")
    hot = np.asarray(list(hot_keys))
    left_names = [c for c in left.schema().names if not is_bucket_col(c)]
    right_names = [c for c in right.schema().names if not is_bucket_col(c)]
    rcols = [c for c in (right_cols or right_names) if c != on]
    out_rcols = [c + suffix if c in left_names else c for c in rcols]
    right_types = _arrow_types(right.schema())
    left_types = _arrow_types(left.schema())
    num_buckets = _resolve_buckets(left, num_buckets)
    bc = bucket_col_for(on)

    def pad_left(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        batch = batch.select(left_names)
        kv = batch[on].to_numpy(zero_copy_only=False)
        salts = np.zeros(n, dtype=np.int32)
        mask = np.isin(kv, hot)
        salts[mask] = np.arange(int(mask.sum()), dtype=np.int32) % salt
        batch = batch.append_column("__salt", pa.array(salts, pa.int32()))
        batch = batch.append_column("__side", pa.array(np.zeros(n, dtype=np.int8)))
        for rc, oc in zip(rcols, out_rcols):
            batch = batch.append_column(oc, pad_column(n, right_types[rc]))
        return batch.append_column(
            bc, pa.array(_salted_bucket(kv, salts, num_buckets), pa.int32())
        )

    def pad_right(batch: pa.Table) -> pa.Table:
        kv = batch[on].to_numpy(zero_copy_only=False)
        mask = np.isin(kv, hot)
        cold_idx = np.flatnonzero(~mask)
        hot_idx = np.flatnonzero(mask)
        take = np.concatenate([cold_idx, np.repeat(hot_idx, salt)])
        salts = np.concatenate(
            [
                np.zeros(len(cold_idx), dtype=np.int32),
                np.tile(np.arange(salt, dtype=np.int32), len(hot_idx)),
            ]
        )
        rep = batch.take(pa.array(take, pa.int64()))
        n = rep.num_rows
        out = pa.table({on: rep[on]})
        out = out.append_column("__salt", pa.array(salts, pa.int32()))
        out = out.append_column("__side", pa.array(np.ones(n, dtype=np.int8)))
        for lc in left_names:
            if lc == on:
                continue
            out = out.append_column(lc, pad_column(n, left_types[lc]))
        for rc, oc in zip(rcols, out_rcols):
            out = out.append_column(oc, rep[rc])
        kv_rep = rep[on].to_numpy(zero_copy_only=False)
        out = out.append_column(
            bc, pa.array(_salted_bucket(kv_rep, salts, num_buckets), pa.int32())
        )
        order = left_names + ["__salt", "__side"] + out_rcols + [bc]
        return out.select(order)

    lpad = left.map_batches(pad_left, batch_format="pyarrow")
    rpad = right.map_batches(pad_right, batch_format="pyarrow")
    both = lpad.union(rpad)

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        ldf = g[g["__side"] == 0].drop(columns=["__side"] + out_rcols)
        # SQL null semantics: see hash_join's padded merge
        rdf = g[g["__side"] == 1][[on, "__salt"] + out_rcols]
        rdf = rdf[rdf[on].notna()]
        if len(ldf) == 0:
            out = ldf.assign(
                **{c: pd.Series(dtype=rdf[c].dtype) for c in out_rcols}
            )
        else:
            out = ldf.merge(rdf, on=[on, "__salt"], how=how)
            out = restore_pad_dtypes(out, left_types)
            if how == "inner":
                out = restore_pad_dtypes(
                    out,
                    {oc: right_types[rc] for rc, oc in zip(rcols, out_rcols)},
                )
        return out.drop(columns="__salt")

    return _per_bucket(both, on, num_buckets, fn)


def semi_join(
    left,
    right,
    *,
    on: str,
    anti: bool = False,
    num_buckets: Optional[int] = None,
    engine: str = "native",
):
    """Semi (rows of left with a match in right) / anti join shipping
    ONLY the right side's key column. ``engine='native'`` uses Ray
    Data's left_semi/left_anti join; ``'padded'`` is the portable
    union-exchange fallback. For a small right side prefer a broadcast
    key-set filter instead."""
    if engine == "native" and hasattr(left, "join"):
        nb = _resolve_buckets(left, num_buckets)
        return left.join(
            right.select_columns([on]),
            join_type="left_anti" if anti else "left_semi",
            num_partitions=nb,
            on=(on,),
            aggregator_ray_remote_args=_join_aggregator_args(nb),
        )
    left_names = [c for c in left.schema().names if not is_bucket_col(c)]
    left_types = _arrow_types(left.schema())
    num_buckets = _resolve_buckets(left, num_buckets)
    bc = bucket_col_for(on)

    def pad_left(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        batch = batch.select(left_names)
        batch = batch.append_column("__side", pa.array(np.zeros(n, dtype=np.int8)))
        kv = batch[on].to_numpy(zero_copy_only=False)
        return batch.append_column(
            bc, pa.array(_hash_bucket(kv, num_buckets), pa.int32())
        )

    def pad_right(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        out = pa.table({on: batch[on]})
        out = out.append_column("__side", pa.array(np.ones(n, dtype=np.int8)))
        for lc in left_names:
            if lc == on:
                continue
            out = out.append_column(lc, pad_column(n, left_types[lc]))
        kv = out[on].to_numpy(zero_copy_only=False)
        out = out.append_column(
            bc, pa.array(_hash_bucket(kv, num_buckets), pa.int32())
        )
        return out.select(left_names + ["__side", bc])

    both = left.map_batches(pad_left, batch_format="pyarrow").union(
        right.map_batches(pad_right, batch_format="pyarrow")
    )

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        ldf = g[g["__side"] == 0].drop(columns="__side")
        # SQL null semantics: NULL = NULL is not true, so a null right
        # key matches nothing (isin would match NaN to NaN) and a null
        # left key never semi-matches / always anti-survives
        keys = set(g.loc[g["__side"] == 1, on].dropna())
        mask = ldf[on].isin(keys) & ldf[on].notna()
        out = ldf[~mask] if anti else ldf[mask]
        return restore_pad_dtypes(out.copy(), left_types)

    return _per_bucket(both, on, num_buckets, fn)
