"""Driver contract for the mobray engine.

``entry()`` runs the flagship operator chain (binning fit -> woe/interval
transform -> as-of join -> fused windows/sessionize) on sf0.001.
``queries()`` exposes one callable per implemented operator family from
SURVEY.md §2; ``oracle_sql()`` gives the DuckDB-equivalent SQL where the
op is SQL-expressible (the rest get the driver's rows-only check).

Ray is initialised by the DRIVER before importing this module; nothing
here calls ray.init/shutdown.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

# Ray workers do not inherit the driver's sys.path mutations; register the
# engine's modules for pickle-by-value so closures shipping mobray
# functions work even when workers cannot import the package themselves.
def _register_by_value() -> None:
    try:
        import mobray.core.binner  # noqa: F401
        import mobray.pipelines.dedup  # noqa: F401
        import mobray.pipelines.features  # noqa: F401
        import mobray.pipelines.fit  # noqa: F401
        import mobray.pipelines.simsearch  # noqa: F401
        import mobray.pipelines.temporal  # noqa: F401
        import mobray.sources.imagegen  # noqa: F401
        import mobray.stages.binning  # noqa: F401
        import mobray.stages.decode  # noqa: F401
        import mobray.stages.text  # noqa: F401
        from ray import cloudpickle

        for name, mod in list(sys.modules.items()):
            if name == "mobray" or name.startswith("mobray."):
                try:
                    cloudpickle.register_pickle_by_value(mod)
                except Exception:
                    pass
    except Exception:
        pass


_register_by_value()

try:
    # drop ONLY Ray's benign empty-schema divergence warning (its sort
    # reduce emits zero-column blocks for empty range partitions); typed
    # schema mismatches still warn — see functions/rayutils.py
    from mobray.functions.rayutils import install_empty_schema_warning_filter

    install_empty_schema_warning_filter()
except Exception:
    pass


def _read(path, columns=None, **kwargs):
    """read_parquet with a metadata-free schema: testdata parquet carries
    pandas schema metadata that makes pa.Schema unhashable, defeating Ray
    Data's schema-dedup fast path (and spamming 'Failed to hash the
    schemas' warnings from every task)."""
    from mobray.sources.readers import read_parquet_clean

    return read_parquet_clean(path, columns=columns, **kwargs)


_SF001 = "/root/testdata/sf0.001"
_SF01 = "/root/testdata/sf0.01"  # oracle_sql edge computation runs at sf0.01


# --------------------------------------------------------------------------
# entry
# --------------------------------------------------------------------------

def entry() -> Any:
    """Flagship chain on sf0.001 events: distributed binning fit on
    (value, is_purchase) -> WoE + interval transform -> as-of join of the
    latest purchase value per user -> fused lag/backfill/sessionize."""
    import pandas as pd
    import ray.data

    from mobray.pipelines.fit import fit_dataset, transform_dataset
    from mobray.pipelines.temporal import asof_join

    events = _read(f"{_SF001}/events.parquet")

    def add_target(batch):
        import pyarrow as pa
        import pyarrow.compute as pc

        y = pc.cast(pc.equal(batch["event_type"], "purchase"), pa.float64())
        return batch.append_column("is_purchase", y)

    ds = events.map_batches(add_target, batch_format="pyarrow")
    model = fit_dataset(ds, "value", "is_purchase")
    scored = transform_dataset(ds, model, "value", assign="woe", out_col="value_woe")
    scored = transform_dataset(scored, model, "value", assign="interval", out_col="value_bin")

    def purchases_only(t):
        import pyarrow.compute as pc

        return (
            t.filter(pc.equal(t["event_type"], "purchase"))
            .select(["user_id", "ts", "value"])
            .rename_columns(["user_id", "ts", "purchase_value"])
        )

    purchases = ds.map_batches(purchases_only, batch_format="pyarrow")

    def windows(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values(["user_id", "ts"], kind="stable")
        grouped = g.groupby("user_id", sort=False)
        g["purchase_value_filled"] = grouped["purchase_value"].ffill()
        g["value_lag1"] = grouped["value"].shift(1)
        prev = grouped["ts"].shift(1)
        new = prev.isna() | ((g["ts"] - prev) > pd.Timedelta("30min"))
        g["session_seq"] = new.astype("int64").groupby(g["user_id"]).cumsum()
        return g

    return asof_join(
        scored,
        purchases,
        key="user_id",
        ts="ts",
        right_cols=["purchase_value"],
        num_buckets=8,
        post_fn=windows,
    )


# --------------------------------------------------------------------------
# queries — callables over sf_dir
# --------------------------------------------------------------------------

def _events(sf_dir):
    import ray.data

    return _read(f"{sf_dir}/events.parquet")


def _lineitem_xy(sf_dir):
    """lineitem with x=l_quantity, binary y = (l_returnflag == 'R')."""
    import ray.data

    ds = _read(
        f"{sf_dir}/lineitem.parquet", columns=["l_quantity", "l_returnflag"]
    )

    def add_y(batch):
        import pyarrow as pa
        import pyarrow.compute as pc

        y = pc.cast(pc.equal(batch["l_returnflag"], "R"), pa.float64())
        return batch.append_column("y", y)

    return ds.map_batches(add_y, batch_format="pyarrow")


def _fit_lineitem_model(sf_dir):
    from mobray.pipelines.fit import fit_dataset

    return fit_dataset(_lineitem_xy(sf_dir), "l_quantity", "y")


def _core_lineitem_model(sf_dir):
    """Single-node numpy-core fit — the independent oracle path."""
    import pyarrow.parquet as pq

    from mobray.core.binner import fit_binning

    t = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_quantity", "l_returnflag"]
    )
    x = t["l_quantity"].to_numpy()
    y = (t["l_returnflag"].to_numpy(zero_copy_only=False) == "R").astype(float)
    return fit_binning(x, y)


def q_fit_groups(sf_dir):
    """The fit's wide aggregation: per-distinct-x sufficient stats."""
    from ray.data.aggregate import Max, Min, Sum

    from mobray.stages.binning import make_partial_agg

    ds = _lineitem_xy(sf_dir).select_columns(["l_quantity", "y"])
    partials = ds.map_batches(
        make_partial_agg("l_quantity", "y"), batch_format="pyarrow"
    )
    agg = (
        partials.groupby(["tag", "xk"])
        .aggregate(
            Sum("nv", alias_name="n"),
            Sum("s", alias_name="sum_y"),
            Min("mn", alias_name="min_y"),
            Max("mx", alias_name="max_y"),
        )
        .to_pandas()
    )
    out = agg[agg["tag"] == "c"].drop(columns="tag").rename(columns={"xk": "x"})
    return out.sort_values("x").reset_index(drop=True)


def q_bin_transform_counts(sf_dir):
    """Distributed fit + transform, then count rows per bin label."""
    from ray.data.aggregate import Count

    from mobray.pipelines.fit import transform_dataset

    model = _fit_lineitem_model(sf_dir)
    scored = transform_dataset(
        _lineitem_xy(sf_dir), model, "l_quantity", assign="interval", out_col="bucket"
    )
    out = scored.groupby("bucket").aggregate(Count(alias_name="n")).to_pandas()
    return out.sort_values("bucket").reset_index(drop=True)


def q_binning_bins(sf_dir):
    """Full fitted bins table (PAVA + statistical merge); oracle = the
    single-node numpy core fit emitted as a VALUES literal."""
    import numpy as np

    df = _fit_lineitem_model(sf_dir).bins_df()
    for c in ("mean", "std"):
        df[c] = np.round(df[c], 6)
    return df.sort_values("left").reset_index(drop=True)


def q_binning_summary(sf_dir):
    """Summary with WoE/IV; oracle = single-node core fit."""
    import numpy as np

    df = _fit_lineitem_model(sf_dir).summary_df()
    for c in ("count_pct", "mean", "std", "woe", "iv"):
        if c in df.columns:
            df[c] = np.round(df[c], 6)
    return df.sort_values("bucket").reset_index(drop=True)


def q_asof_join_events(sf_dir):
    from mobray.pipelines.temporal import asof_join

    ev = _events(sf_dir)
    def views_only(t):
        import pyarrow.compute as pc

        return t.filter(pc.equal(t["event_type"], "view")).select(
            ["event_id", "user_id", "ts"]
        )

    def purchases_only(t):
        import pyarrow.compute as pc

        return t.filter(pc.equal(t["event_type"], "purchase")).select(
            ["user_id", "ts", "value"]
        )

    left = ev.map_batches(views_only, batch_format="pyarrow")
    right = ev.map_batches(purchases_only, batch_format="pyarrow")
    out = asof_join(
        left, right, key="user_id", ts="ts", right_cols=["value"], num_buckets=16
    )
    out = out.map_batches(
        lambda t: t.select(["event_id", "user_id", "value"]), batch_format="pyarrow"
    )
    # map_groups block order is nondeterministic -> sort by key for the
    # driver's order-sensitive value hash (values themselves are exact)
    return out.to_pandas().sort_values("event_id").reset_index(drop=True)


def q_lag_lead_events(sf_dir):
    from mobray.pipelines.temporal import lag_lead

    out = lag_lead(
        _events(sf_dir), "user_id", "ts", ["value"], lags=[1], leads=[1], num_buckets=16
    )
    out = out.map_batches(
        lambda t: t.select(["event_id", "value_lag1", "value_lead1"]),
        batch_format="pyarrow",
    )
    return out.to_pandas().sort_values("event_id").reset_index(drop=True)


def q_lag_tiebreak_events(sf_dir):
    """Deterministic lag over heavily TIED timestamps: ts truncated to
    the hour (many events share a (user, hour) slot), with the explicit
    ``tiebreak`` column pinning tie order (pipelines/temporal.py
    lag_lead) — mirrors ``LAG(value) OVER (PARTITION BY user_id ORDER BY
    date_trunc('hour', ts), event_id)`` exactly."""
    import pyarrow.compute as pc

    from mobray.pipelines.temporal import lag_lead

    ev = _events(sf_dir).map_batches(
        lambda t: t.append_column(
            "ts_h", pc.floor_temporal(t["ts"], unit="hour")
        ),
        batch_format="pyarrow",
    )
    out = lag_lead(
        ev, "user_id", "ts_h", ["value"], lags=[1], num_buckets=16,
        tiebreak="event_id",
    )
    out = out.map_batches(
        lambda t: t.select(["event_id", "value_lag1"]), batch_format="pyarrow"
    )
    return out.to_pandas().sort_values("event_id").reset_index(drop=True)


def q_sessionize_events(sf_dir):
    from mobray.pipelines.temporal import sessionize

    out = sessionize(_events(sf_dir), "user_id", "ts", gap="30min", num_buckets=16)
    out = out.map_batches(
        lambda t: t.select(["event_id", "session_seq"]), batch_format="pyarrow"
    )
    return out.to_pandas().sort_values("event_id").reset_index(drop=True)


def q_backfill_events(sf_dir):
    import pyarrow as pa
    import pyarrow.compute as pc

    from mobray.pipelines.temporal import backfill

    def null_non_purchase(batch):
        pv = pc.if_else(
            pc.equal(batch["event_type"], "purchase"),
            batch["value"],
            pa.nulls(batch.num_rows, pa.float64()),
        )
        return batch.append_column("pv", pv)

    ds = _events(sf_dir).map_batches(null_non_purchase, batch_format="pyarrow")
    out = backfill(ds, "user_id", "ts", ["pv"], num_buckets=16)
    out = out.map_batches(
        lambda t: t.select(["event_id", "pv_filled"]), batch_format="pyarrow"
    )
    return out.to_pandas().sort_values("event_id").reset_index(drop=True)


def q_tumbling_events(sf_dir):
    import numpy as np

    from mobray.pipelines.temporal import tumbling_window

    out = tumbling_window(_events(sf_dir), "user_id", "ts", "1h", "value").to_pandas()
    out["sum_value"] = np.round(out["sum_value"], 4)
    out = out.sort_values(["user_id", "window_start"]).reset_index(drop=True)
    return out[
        ["user_id", "window_start", "n_events", "sum_value", "min_value", "max_value"]
    ]


def q_rolling_events(sf_dir):
    import numpy as np

    from mobray.pipelines.temporal import rolling_window

    out = rolling_window(
        _events(sf_dir), "user_id", "ts", "value", window_rows=4, num_buckets=16
    ).to_pandas()
    out["value_rmean"] = np.round(out["value_rmean"], 6)
    out = out.sort_values("event_id").reset_index(drop=True)
    return out[["event_id", "value_rmean", "value_rmin", "value_rmax", "value_rcount"]]


def q_topk_events(sf_dir):
    from mobray.pipelines.temporal import topk_per_key

    out = topk_per_key(_events(sf_dir), "user_id", "value", k=3, num_buckets=16)
    out = out.map_batches(
        lambda t: t.select(["user_id", "rank", "value"]), batch_format="pyarrow"
    )
    return out.to_pandas().sort_values(["user_id", "rank"]).reset_index(drop=True)


def q_session_stats_events(sf_dir):
    import numpy as np

    from mobray.pipelines.temporal import session_stats

    out = session_stats(
        _events(sf_dir), "user_id", "ts", "value", gap="30min", num_buckets=16
    ).to_pandas()
    out["sum_value"] = np.round(out["sum_value"], 4)
    out = out.sort_values(["user_id", "session_seq"]).reset_index(drop=True)
    return out[["user_id", "session_seq", "n_events", "sum_value", "duration_us"]]


def q_distinct_users(sf_dir):
    from ray.data.aggregate import Count

    pairs = (
        _events(sf_dir)
        .groupby(["event_type", "user_id"])
        .aggregate(Count(alias_name="__c"))
    )
    out = (
        pairs.groupby("event_type")
        .aggregate(Count(alias_name="n_users"))
        .map_batches(lambda t: t.select(["event_type", "n_users"]), batch_format="pyarrow")
    )
    return out.to_pandas().sort_values("event_type").reset_index(drop=True)


def q_orders_customer_join(sf_dir):
    """Large-large partitioned hash join: orders x customer."""
    import numpy as np
    import ray.data

    from mobray.pipelines.relational import hash_join

    orders = _read(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_totalprice"]
    ).map_batches(lambda t: t.rename_columns(["o_orderkey", "custkey", "o_totalprice"]),
                  batch_format="pyarrow")
    customer = _read(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).map_batches(lambda t: t.rename_columns(["custkey", "c_mktsegment"]),
                  batch_format="pyarrow")
    joined = hash_join(orders, customer, on="custkey", how="inner",
                       right_cols=["c_mktsegment"], num_buckets=16)
    out = joined.to_pandas()
    out["o_totalprice"] = np.round(out["o_totalprice"], 2)
    out = out.sort_values("o_orderkey").reset_index(drop=True)
    return out[["o_orderkey", "custkey", "o_totalprice", "c_mktsegment"]]


def q_orders_semi_join(sf_dir):
    """Semi join: orders whose customer is in the BUILDING segment."""
    import pyarrow.compute as pc
    import ray.data

    from mobray.pipelines.relational import semi_join

    orders = _read(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).map_batches(lambda t: t.rename_columns(["o_orderkey", "custkey"]),
                  batch_format="pyarrow")
    building = _read(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).map_batches(
        lambda t: t.filter(pc.equal(t["c_mktsegment"], "BUILDING"))
        .select(["c_custkey"])
        .rename_columns(["custkey"]),
        batch_format="pyarrow",
    )
    out = semi_join(orders, building, on="custkey", num_buckets=16)
    out = out.map_batches(lambda t: t.select(["o_orderkey"]), batch_format="pyarrow")
    return out.to_pandas().sort_values("o_orderkey").reset_index(drop=True)


def q_orders_bigkey_join(sf_dir):
    """Padded-union hash join carrying an int64 column that is NOT
    float64-representable (odd values above 2^53): guards the exchange's
    integer padding end-to-end — null padding used to convert the column
    to float64 in the bucket frames and silently wipe the low bits
    (mobray/pipelines/temporal.py:pad_column)."""
    import numpy as np
    import ray.data

    from mobray.pipelines.relational import hash_join

    orders = _read(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )

    def add_bigkey(t):
        import numpy as _np
        import pyarrow as _pa

        k = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(_np.int64)
        # odd offsets above 2^53 are unrepresentable in float64, so any
        # float round-trip in the exchange would corrupt them
        h = k * _np.int64(1 << 40) + k + _np.int64((1 << 53) + 1)
        t = t.append_column("bigkey", _pa.array(h, _pa.int64()))
        return t.rename_columns(["o_orderkey", "custkey", "bigkey"])

    left = orders.map_batches(add_bigkey, batch_format="pyarrow")
    customer = _read(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).map_batches(
        lambda t: t.rename_columns(["custkey", "c_mktsegment"]),
        batch_format="pyarrow",
    )
    joined = hash_join(
        left, customer, on="custkey", how="inner",
        right_cols=["c_mktsegment"], num_buckets=16, engine="padded",
    )
    out = joined.to_pandas().sort_values("o_orderkey").reset_index(drop=True)
    return out[["o_orderkey", "bigkey", "c_mktsegment"]].astype(
        {"o_orderkey": "int64", "bigkey": "int64"}
    )


def q_orders_anti_join(sf_dir):
    """Anti join: orders whose customer is NOT in the BUILDING segment
    (semi_join(anti=True), mobray/pipelines/relational.py:254-316)."""
    import pyarrow.compute as pc
    import ray.data

    from mobray.pipelines.relational import semi_join

    orders = _read(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).map_batches(lambda t: t.rename_columns(["o_orderkey", "custkey"]),
                  batch_format="pyarrow")
    building = _read(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).map_batches(
        lambda t: t.filter(pc.equal(t["c_mktsegment"], "BUILDING"))
        .select(["c_custkey"])
        .rename_columns(["custkey"]),
        batch_format="pyarrow",
    )
    out = semi_join(orders, building, on="custkey", anti=True, num_buckets=16)
    out = out.map_batches(lambda t: t.select(["o_orderkey"]), batch_format="pyarrow")
    return out.to_pandas().sort_values("o_orderkey").reset_index(drop=True)


def q_orders_hotkey_join(sf_dir):
    """Skew-safe salt-and-replicate join (hash_join_salted): one customer
    key is made to hold ~30% of all orders, then the join must still
    produce exactly the plain-join rows. The hot key's left rows scatter
    across 8 salts and only the right side's hot rows replicate."""
    import numpy as np
    import ray.data

    from mobray.pipelines.relational import hash_join_salted

    orders = _read(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )

    def make_hot(t):
        import numpy as _np
        import pyarrow as _pa

        ok = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(_np.int64)
        ck = t["o_custkey"].to_numpy(zero_copy_only=False).astype(_np.int64)
        hot = _np.where(ok % 10 < 3, _np.int64(1), ck)
        t = t.append_column("custkey", _pa.array(hot, _pa.int64()))
        return t.select(["o_orderkey", "custkey"])

    left = orders.map_batches(make_hot, batch_format="pyarrow")
    customer = _read(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).map_batches(
        lambda t: t.rename_columns(["custkey", "c_mktsegment"]),
        batch_format="pyarrow",
    )
    joined = hash_join_salted(
        left, customer, on="custkey", hot_keys=[1], salt=8,
        right_cols=["c_mktsegment"], num_buckets=16,
    )
    out = joined.to_pandas().sort_values("o_orderkey").reset_index(drop=True)
    return out[["o_orderkey", "custkey", "c_mktsegment"]].astype(
        {"o_orderkey": "int64", "custkey": "int64"}
    )


def q_top_orders(sf_dir):
    """Global sort + limit: top-10 orders by total price."""
    import ray.data

    ds = _read(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )
    out = ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(10)
    return out


def q_group_centroids(sf_dir):
    """Per-label embedding centroid (vector-sum partials); compared on
    the first 4 components rounded to 3 decimals (float32 source)."""
    import numpy as np
    import ray.data

    from mobray.pipelines.embeddings import group_centroids

    ds = _read(f"{sf_dir}/embeddings.parquet")
    out = group_centroids(ds, "embedding", "label")
    cents = np.array(out["centroid"].tolist(), dtype=float)
    import pandas as pd

    return pd.DataFrame(
        {
            "label": out["group"].astype("int64"),
            "n": out["n"].astype("int64"),
            "c0": np.round(cents[:, 0], 3),
            "c1": np.round(cents[:, 1], 3),
            "c2": np.round(cents[:, 2], 3),
            "c3": np.round(cents[:, 3], 3),
        }
    ).sort_values("label").reset_index(drop=True)


def q_hopping_events(sf_dir):
    import numpy as np

    from mobray.pipelines.temporal import hopping_window

    out = hopping_window(
        _events(sf_dir), "user_id", "ts", "value", window="1h", hop="30min"
    ).to_pandas()
    out["sum_value"] = np.round(out["sum_value"], 4)
    out = out.sort_values(["user_id", "window_start"]).reset_index(drop=True)
    return out[["user_id", "window_start", "n_events", "sum_value"]]


def q_dedup_exact_docs(sf_dir):
    import ray.data

    from mobray.pipelines.dedup import exact_dedup

    ds = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = exact_dedup(ds, "text", "doc_id")
    out = out.map_batches(
        lambda t: t.select(["doc_id", "n_dups"]), batch_format="pyarrow"
    )
    return out.to_pandas().sort_values("doc_id").reset_index(drop=True)


def q_text_tokens_docs(sf_dir):
    import ray.data

    from mobray.stages.text import TextAnalysisStage

    ds = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    # instance (stateless tasks) rather than an actor pool: never reserves
    # CPUs away from the read stage regardless of the driver's session size
    out = ds.map_batches(TextAnalysisStage(), batch_format="pyarrow")
    out = out.map_batches(
        lambda t: t.select(["doc_id", "n_ws_tokens"]), batch_format="pyarrow"
    )
    return out.to_pandas().sort_values("doc_id").reset_index(drop=True)


def q_filter_docs(sf_dir):
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    ds = _read(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars", "lang"]
    )
    langs = pa.array(["en", "de"])

    def flt(t: "pa.Table") -> "pa.Table":
        mask = pc.and_(
            pc.greater_equal(t["n_chars"], 200), pc.is_in(t["lang"], value_set=langs)
        )
        return t.filter(mask).select(["doc_id"])

    out = ds.map_batches(flt, batch_format="pyarrow")
    return out.to_pandas().sort_values("doc_id").reset_index(drop=True)


def q_lang_counts_docs(sf_dir):
    from ray.data.aggregate import Count
    import ray.data

    ds = _read(f"{sf_dir}/documents.parquet", columns=["lang"])
    out = ds.groupby("lang").aggregate(Count(alias_name="n"))
    return out.to_pandas().sort_values("lang").reset_index(drop=True)


def q_orders_status_agg(sf_dir):
    import numpy as np
    from ray.data.aggregate import Count, Sum
    import ray.data

    ds = _read(
        f"{sf_dir}/orders.parquet", columns=["o_orderstatus", "o_totalprice"]
    )
    out = (
        ds.groupby("o_orderstatus")
        .aggregate(Count(alias_name="n"), Sum("o_totalprice", alias_name="sum_total"))
        .to_pandas()
    )
    out["sum_total"] = np.round(out["sum_total"], 2)
    return out.sort_values("o_orderstatus").reset_index(drop=True)


def q_customer_nation_join(sf_dir):
    """Broadcast hash join: tiny nation table shipped once via closure."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data
    from ray.data.aggregate import Count

    nation = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    # dense int keys -> a positional numpy take is the vectorized lookup
    # (the general small-side pattern is pd.Series(keys).map(dict))
    import numpy as np

    # size-0 lookup when the small side is empty (max() would raise)
    top_key = int(nation["n_nationkey"].max()) + 1 if len(nation) else 0
    names_by_key = np.full(top_key, None, dtype=object)
    names_by_key[nation["n_nationkey"].to_numpy()] = nation["n_name"].to_numpy()

    def add_nation(batch: "pa.Table") -> "pa.Table":
        keys = batch["c_nationkey"].to_numpy(zero_copy_only=False)
        valid = (keys >= 0) & (keys < len(names_by_key))
        names = np.full(len(keys), None, dtype=object)
        names[valid] = names_by_key[keys[valid]]
        return batch.append_column("n_name", pa.array(names, pa.string()))

    ds = _read(f"{sf_dir}/customer.parquet", columns=["c_nationkey"])
    out = (
        ds.map_batches(add_nation, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(Count(alias_name="n"))
    )
    return out.to_pandas().sort_values("n_name").reset_index(drop=True)


def q_knn_cosine(sf_dir):
    import numpy as np
    import ray.data

    from mobray.pipelines.simsearch import knn_bruteforce

    ds = _read(f"{sf_dir}/embeddings.parquet")
    q0 = np.array(ds.take(1)[0]["embedding"], dtype=float)
    out = knn_bruteforce(ds, "embedding", "vec_id", q0[None, :], k=5)
    out = out.rename(columns={"id": "vec_id"})
    return out[["vec_id"]]


def q_knn_ivf(sf_dir):
    import numpy as np
    import ray.data

    from mobray.pipelines.simsearch import knn_ivf

    ds = _read(f"{sf_dir}/embeddings.parquet")
    q0 = np.array(ds.take(1)[0]["embedding"], dtype=float)
    # n_probe=6/8: real cell pruning, yet exact top-5 on this table (the
    # random fixture has no cluster structure, so deeper pruning trades
    # recall — quantified by the recall@k test in test_text_and_search)
    out = knn_ivf(ds, "embedding", "vec_id", q0[None, :], k=5, n_centroids=8, n_probe=6)
    out = out.rename(columns={"id": "vec_id"})
    return out[["vec_id"]]


def q_knn_batch_dataset(sf_dir):
    """Many-query knn through the DATASET-returning merge path
    (output='dataset': per-query groupby top-k, nothing on the driver
    until this query's final to_pandas; simsearch.py:_finalize_topk).
    Queries = the vectors of vec_id 0..2, so query_id == vec_id."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data

    from mobray.pipelines.simsearch import knn_bruteforce

    qt = (
        pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
        .to_pandas()
        .sort_values("vec_id")
        .head(3)
    )
    queries = np.array(qt["embedding"].tolist(), dtype=float)
    ds = _read(f"{sf_dir}/embeddings.parquet")
    out = knn_bruteforce(
        ds, "embedding", "vec_id", queries, k=5, output="dataset"
    ).to_pandas()
    out = out.rename(columns={"id": "vec_id"})
    out = out.sort_values(["query_id", "rank"]).reset_index(drop=True)
    return out[["query_id", "rank", "vec_id"]].astype(
        {"query_id": "int64", "rank": "int64", "vec_id": "int64"}
    )


def q_minhash_dedup_docs(sf_dir):
    """MinHash+LSH near-dup clusters; oracle = independent single-node
    naive reimplementation of the same spec (mobray/oracle/naive.py)."""
    import ray.data

    from mobray.pipelines.dedup import minhash_lsh_dedup

    ds = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = minhash_lsh_dedup(ds, "text", "doc_id", threshold=0.7)
    return out.astype({"doc_id": "int64", "cluster": "int64"})


def q_simhash_pairs_docs(sf_dir):
    import ray.data

    from mobray.pipelines.dedup import simhash_dedup

    ds = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = simhash_dedup(ds, "text", "doc_id", hamming_radius=3)
    return out.astype({"a": "int64", "b": "int64", "hamming": "int64"})


def q_simhash_clusters_docs(sf_dir):
    """SimHash near-dup CLUSTERS via the Dataset-returning distributed
    path: pairs stay in a Dataset and distributed connected components
    assigns labels (output='clusters'; nothing collected on the driver
    until this query's final to_pandas). Oracle = independent naive
    simhash pairs + independent union-find (mobray/oracle/naive.py)."""
    import ray.data

    from mobray.pipelines.dedup import simhash_dedup

    ds = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = simhash_dedup(
        ds, "text", "doc_id", hamming_radius=3, output="clusters"
    ).to_pandas()
    return (
        out.sort_values("doc_id")
        .reset_index(drop=True)
        .astype({"doc_id": "int64", "cluster": "int64"})
    )


def q_ngram_jaccard_docs(sf_dir):
    """Exact word-3-gram Jaccard pairs within fingerprint buckets."""
    import numpy as np
    import ray.data

    from mobray.pipelines.dedup import ngram_jaccard_pairs

    ds = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = ngram_jaccard_pairs(ds, "text", "doc_id", n=3, threshold=0.2).to_pandas()
    out = out.sort_values(["a", "b"]).reset_index(drop=True)
    out["jaccard"] = np.round(out["jaccard"], 6)
    return out.astype({"a": "int64", "b": "int64"})


# embedding near-dup fixture: the base table is near-orthogonal random
# vectors (max natural cosine ~0.51), so the query plants 20 deterministic
# near-duplicates — vec_id < _PLANT_K re-emitted with id+1000000 and
# +_PLANT_DELTA on coordinate 0 (cosine ~0.9987 to the base row). The SQL
# oracle derives the identical rows from the table itself.
_PLANT_K = 20
_PLANT_DELTA = 0.05
_EMB_THRESHOLD = 0.98


def _embedding_neardup(sf_dir, ship: str):
    """Embedding-cosine near-dup pairs via multi-table hyperplane LSH
    with exact in-bucket verification, on base + planted vectors.
    ``ship`` selects the exchange byte profile (dedup.py:496-690):
    'vectors' replicates vectors x n_tables through one shuffle; 'ids'
    ships only (bucket, id) rows, prunes singletons map-side, and joins
    vectors back candidate-sized."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from mobray.pipelines.dedup import embedding_neardup_pairs

    et = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    sel = et.to_pandas()
    sel = sel[sel["vec_id"] < _PLANT_K].sort_values("vec_id")
    pert = np.array(sel["embedding"].tolist(), dtype=np.float32)
    pert[:, 0] = pert[:, 0] + np.float32(_PLANT_DELTA)
    planted = pa.table(
        {
            "vec_id": pa.array((sel["vec_id"] + 1000000).to_numpy(), pa.int64()),
            "embedding": pa.array(
                [row.tolist() for row in pert], et.schema.field("embedding").type
            ),
        }
    )
    base = _read(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    un = base.union(ray.data.from_arrow(planted))
    pairs = embedding_neardup_pairs(
        un, "embedding", "vec_id",
        threshold=_EMB_THRESHOLD, n_planes=6, n_tables=4, ship=ship,
    )
    return pairs[["a", "b"]].astype({"a": "int64", "b": "int64"})


def q_embedding_neardup(sf_dir):
    return _embedding_neardup(sf_dir, "vectors")


def q_embedding_neardup_ids(sf_dir):
    """Same fixture and oracle as q_embedding_neardup, through the
    candidate-proportional ship='ids' scale path (the 100-TB profile for
    wide vectors: LSH shuffle carries ~16 bytes x n_tables per row and
    vector bytes move only for surviving candidates)."""
    return _embedding_neardup(sf_dir, "ids")


# phash near-dup fixture: a synthetic int64 hash column derived
# deterministically from doc_id (pd.util.hash_array on the int64 ids —
# process-stable, no PYTHONHASHSEED), with _PH_PLANT_K planted near-hashes:
# doc_id < K re-emitted as doc_id+1000000 with THREE bits flipped
# (_PH_FLIP_MASK puts one bit in each of three distinct 16-bit chunks, so
# the radius-3 pigeonhole LSH must recover every planted pair). Natural
# radius-3 collisions between 64-bit hashes are ~1e-13 per pair. The SQL
# oracle gets the hash column as a VALUES input and does the pair-finding
# itself: brute-force popcount(xor) over the self-join.
_PH_PLANT_K = 20
_PH_FLIP_MASK = (1 << 1) | (1 << 17) | (1 << 33)


def _ph_hash_ids(ids) -> "Any":
    import numpy as np
    import pandas as pd

    return pd.util.hash_array(np.asarray(ids, dtype=np.int64)).view("int64")


def q_phash_neardup_docs(sf_dir):
    """Image-style perceptual-hash near-dup pairs (16-bit-chunk LSH +
    bucketed Hamming verify) over a synthesized int64 hash column; see
    the fixture comment above. mobray/pipelines/dedup.py:458-493."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from mobray.pipelines.dedup import phash_neardup_pairs

    base = _read(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def add_hash(t: "pa.Table") -> "pa.Table":
        # self-contained (workers cannot import __ray_entry__): must stay
        # identical to _ph_hash_ids
        import numpy as _np
        import pandas as _pd
        import pyarrow as _pa

        ids_ = _np.asarray(
            t["doc_id"].to_numpy(zero_copy_only=False), dtype=_np.int64
        )
        h = _pd.util.hash_array(ids_).view("int64")
        return t.append_column("phash", _pa.array(h, _pa.int64()))

    hashed = base.map_batches(add_hash, batch_format="pyarrow")

    ids = (
        pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
        .column("doc_id")
        .to_numpy()
    )
    m = ids < _PH_PLANT_K
    planted = pa.table(
        {
            "doc_id": pa.array(ids[m] + 1000000, pa.int64()),
            "phash": pa.array(
                _ph_hash_ids(ids[m]) ^ np.int64(_PH_FLIP_MASK), pa.int64()
            ),
        }
    )
    un = hashed.union(ray.data.from_arrow(planted))
    out = phash_neardup_pairs(un, "phash", "doc_id", hamming_radius=3)
    out = out.sort_values(["a", "b"]).reset_index(drop=True)
    return out.astype({"a": "int64", "b": "int64", "hamming": "int64"})


def q_asof_tolerance_events(sf_dir):
    """As-of join with a 1-hour match tolerance: a view only picks up the
    latest purchase within the preceding hour (zero temporal leakage AND
    bounded staleness). mobray/pipelines/temporal.py:350-414."""
    import pyarrow.compute as pc

    from mobray.pipelines.temporal import asof_join

    ev = _events(sf_dir)

    def views_only(t):
        return t.filter(pc.equal(t["event_type"], "view")).select(
            ["event_id", "user_id", "ts"]
        )

    def purchases_only(t):
        return t.filter(pc.equal(t["event_type"], "purchase")).select(
            ["user_id", "ts", "value"]
        )

    left = ev.map_batches(views_only, batch_format="pyarrow")
    right = ev.map_batches(purchases_only, batch_format="pyarrow")
    out = asof_join(
        left, right, key="user_id", ts="ts", right_cols=["value"],
        num_buckets=16, tolerance="1h",
    )
    out = out.map_batches(
        lambda t: t.select(["event_id", "user_id", "value"]), batch_format="pyarrow"
    )
    return out.to_pandas().sort_values("event_id").reset_index(drop=True)


def q_asof_copartitioned_events(sf_dir):
    """The SHUFFLE-FREE co-partitioned as-of join (zero-exchange scale
    path; mobray/pipelines/temporal.py:asof_join_copartitioned): events
    are hash-bucketed by user into aligned (views, purchases) parquet
    pairs under /tmp, then each pair joins locally. Must equal the same
    DuckDB ASOF oracle as the exchange-based asof_join_events."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from mobray.pipelines.temporal import _hash_bucket, asof_join_copartitioned

    ev = pq.read_table(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type", "value"],
    ).to_pandas()
    views = ev[ev["event_type"] == "view"][["event_id", "user_id", "ts"]]
    purch = ev[ev["event_type"] == "purchase"][["user_id", "ts", "value"]]
    k = 4
    d = tempfile.mkdtemp(prefix="mobray_cop_asof_")
    pairs = []
    for b in range(k):
        lp = os.path.join(d, f"views-{b}.parquet")
        rp = os.path.join(d, f"purch-{b}.parquet")
        lm = _hash_bucket(views["user_id"].to_numpy(), k) == b
        rm = _hash_bucket(purch["user_id"].to_numpy(), k) == b
        pq.write_table(pa.Table.from_pandas(views[lm], preserve_index=False), lp)
        pq.write_table(pa.Table.from_pandas(purch[rm], preserve_index=False), rp)
        pairs.append((lp, rp))
    out = asof_join_copartitioned(
        pairs, key="user_id", ts="ts", right_cols=["value"],
        # global left key set: a purchase-only user (harmless for this
        # LEFT as-of join) must not trip the misplacement validation
        left_keys=set(views["user_id"].unique()),
    )
    out = out.map_batches(
        lambda t: t.select(["event_id", "user_id", "value"]), batch_format="pyarrow"
    )
    return out.to_pandas().sort_values("event_id").reset_index(drop=True)


def q_quality_docs(sf_dir):
    import numpy as np
    import ray.data

    from mobray.stages.text import TextAnalysisStage

    ds = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = ds.map_batches(TextAnalysisStage(), batch_format="pyarrow")
    out = out.map_batches(
        lambda t: t.select(["doc_id", "quality_score", "lang_pred"]),
        batch_format="pyarrow",
    ).to_pandas()
    out["quality_score"] = np.round(out["quality_score"], 6)
    return out.sort_values("doc_id").reset_index(drop=True)


def q_fingerprint_docs(sf_dir):
    """Winnowing document fingerprints; oracle = naive single-node
    reimplementation (plain Python rolling hash)."""
    import ray.data

    from mobray.stages.text import TextAnalysisStage

    ds = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = ds.map_batches(TextAnalysisStage(), batch_format="pyarrow")
    out = out.map_batches(
        lambda t: t.select(["doc_id", "fingerprint"]), batch_format="pyarrow"
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "fit_groups": q_fit_groups,
        "bin_transform_counts": q_bin_transform_counts,
        "binning_bins": q_binning_bins,
        "binning_summary": q_binning_summary,
        "asof_join_events": q_asof_join_events,
        "lag_lead_events": q_lag_lead_events,
        "lag_tiebreak_events": q_lag_tiebreak_events,
        "sessionize_events": q_sessionize_events,
        "backfill_events": q_backfill_events,
        "tumbling_events": q_tumbling_events,
        "rolling_events": q_rolling_events,
        "topk_events": q_topk_events,
        "session_stats_events": q_session_stats_events,
        "distinct_users": q_distinct_users,
        "orders_customer_join": q_orders_customer_join,
        "orders_semi_join": q_orders_semi_join,
        "orders_anti_join": q_orders_anti_join,
        "orders_bigkey_join": q_orders_bigkey_join,
        "orders_hotkey_join": q_orders_hotkey_join,
        "top_orders": q_top_orders,
        "group_centroids": q_group_centroids,
        "hopping_events": q_hopping_events,
        "dedup_exact_docs": q_dedup_exact_docs,
        "text_tokens_docs": q_text_tokens_docs,
        "filter_docs": q_filter_docs,
        "lang_counts_docs": q_lang_counts_docs,
        "orders_status_agg": q_orders_status_agg,
        "customer_nation_join": q_customer_nation_join,
        "knn_cosine": q_knn_cosine,
        "knn_ivf": q_knn_ivf,
        "knn_batch_dataset": q_knn_batch_dataset,
        "minhash_dedup_docs": q_minhash_dedup_docs,
        "phash_neardup_docs": q_phash_neardup_docs,
        "asof_tolerance_events": q_asof_tolerance_events,
        "asof_copartitioned_events": q_asof_copartitioned_events,
        "simhash_pairs_docs": q_simhash_pairs_docs,
        "simhash_clusters_docs": q_simhash_clusters_docs,
        "ngram_jaccard_docs": q_ngram_jaccard_docs,
        "embedding_neardup": q_embedding_neardup,
        "embedding_neardup_ids": q_embedding_neardup_ids,
        "quality_docs": q_quality_docs,
        "fingerprint_docs": q_fingerprint_docs,
    }


# --------------------------------------------------------------------------
# oracle SQL
# --------------------------------------------------------------------------

_ORACLE_CACHE: dict = {}

# shared by embedding_neardup (ship='vectors') and embedding_neardup_ids
# (ship='ids'): both exchange profiles must produce the same pair set
_EMB_NEARDUP_SQL = f"""
    WITH planted AS (
      SELECT vec_id + 1000000 AS vec_id,
             list_prepend(embedding[1] + {_PLANT_DELTA},
                          embedding[2:]) AS embedding
      FROM embeddings WHERE vec_id < {_PLANT_K}
    ), all_vecs AS (
      SELECT vec_id, embedding FROM embeddings
      UNION ALL SELECT vec_id, embedding FROM planted
    )
    SELECT a.vec_id AS a, b.vec_id AS b
    FROM all_vecs a JOIN all_vecs b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding, b.embedding)
          >= {_EMB_THRESHOLD}
    ORDER BY 1, 2
"""


def _sql_lit(v) -> str:
    """SQL literal for a python value (handles inf/nan doubles, strings)."""
    import math

    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, float):
        if math.isinf(v):
            return "CAST('inf' AS DOUBLE)" if v > 0 else "CAST('-inf' AS DOUBLE)"
        if math.isnan(v):
            return "CAST('nan' AS DOUBLE)"
        return f"CAST({v!r} AS DOUBLE)"
    return str(int(v))


def _values_sql(df, int_cols=(), order_by=None) -> str:
    """Literal VALUES table for a (small) expected-result DataFrame —
    the emission format for oracles whose expected values come from an
    independent single-node implementation (numpy binning core /
    mobray.oracle.naive) rather than from SQL-expressible logic."""
    cols = list(df.columns)
    rows = []
    for t in df.itertuples(index=False):
        vals = []
        for c, v in zip(cols, t):
            if c in int_cols:
                # explicit BIGINT: bare VALUES ints type as INT32
                vals.append(f"CAST({int(v)} AS BIGINT)")
            else:
                vals.append(_sql_lit(v if not hasattr(v, "item") else v.item()))
        rows.append("(" + ", ".join(vals) + ")")
    body = ",\n  ".join(rows)
    quoted = ", ".join(f'"{c}"' for c in cols)  # left/right are reserved
    order = ""
    if order_by:
        order = " ORDER BY " + ", ".join(
            f'"{c.strip()}"' for c in order_by.split(",")
        )
    return f"SELECT * FROM (VALUES\n  {body}\n) AS t({quoted}){order}"


def _naive_docs(sf_dir):
    import pyarrow.parquet as pq

    docs = (
        pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .to_pandas()
        .sort_values("doc_id")
    )
    return docs["text"].tolist(), docs["doc_id"].tolist()


def _minhash_oracle_sql() -> str:
    if "minhash" not in _ORACLE_CACHE:
        from mobray.oracle.naive import naive_minhash_clusters

        texts, ids = _naive_docs(_SF01)
        df = naive_minhash_clusters(texts, ids, threshold=0.7)
        _ORACLE_CACHE["minhash"] = _values_sql(
            df, int_cols=("doc_id", "cluster"), order_by="doc_id"
        )
    return _ORACLE_CACHE["minhash"]


def _simhash_oracle_sql() -> str:
    if "simhash" not in _ORACLE_CACHE:
        from mobray.oracle.naive import naive_simhash_pairs

        texts, ids = _naive_docs(_SF01)
        df = naive_simhash_pairs(texts, ids, hamming_radius=3)
        _ORACLE_CACHE["simhash"] = _values_sql(
            df, int_cols=("a", "b", "hamming"), order_by="a, b"
        )
    return _ORACLE_CACHE["simhash"]


def _simhash_clusters_oracle_sql() -> str:
    if "simhash_clusters" not in _ORACLE_CACHE:
        import pandas as pd

        from mobray.oracle.naive import _union_find_clusters, naive_simhash_pairs

        texts, ids = _naive_docs(_SF01)
        pairs = naive_simhash_pairs(texts, ids, hamming_radius=3)
        cl = _union_find_clusters(list(zip(pairs["a"], pairs["b"])))
        df = pd.DataFrame(sorted(cl.items()), columns=["doc_id", "cluster"])
        _ORACLE_CACHE["simhash_clusters"] = _values_sql(
            df, int_cols=("doc_id", "cluster"), order_by="doc_id"
        )
    return _ORACLE_CACHE["simhash_clusters"]


def _ngram_oracle_sql() -> str:
    if "ngram" not in _ORACLE_CACHE:
        import numpy as np

        from mobray.oracle.naive import naive_ngram_jaccard_pairs

        texts, ids = _naive_docs(_SF01)
        df = naive_ngram_jaccard_pairs(texts, ids, n=3, threshold=0.2)
        df["jaccard"] = np.round(df["jaccard"], 6)
        _ORACLE_CACHE["ngram"] = _values_sql(
            df, int_cols=("a", "b"), order_by="a, b"
        )
    return _ORACLE_CACHE["ngram"]


def _fingerprint_oracle_sql() -> str:
    if "fingerprint" not in _ORACLE_CACHE:
        import pandas as pd

        from mobray.oracle.naive import _fingerprint

        texts, ids = _naive_docs(_SF01)
        df = pd.DataFrame(
            {"doc_id": ids, "fingerprint": [_fingerprint(t) for t in texts]}
        )
        _ORACLE_CACHE["fingerprint"] = _values_sql(
            df, int_cols=("doc_id", "fingerprint"), order_by="doc_id"
        )
    return _ORACLE_CACHE["fingerprint"]


def _phash_neardup_oracle_sql() -> str:
    """Hashes are the INPUT (emitted as a VALUES CTE from the sf0.01
    doc_ids with the same deterministic id->hash map the query uses); the
    pair-finding under test — planting, LSH recall, Hamming radius — is
    genuinely recomputed by SQL as a brute-force popcount(xor) self-join."""
    if "phash_neardup" not in _ORACLE_CACHE:
        import pyarrow.parquet as pq

        ids = (
            pq.read_table(f"{_SF01}/documents.parquet", columns=["doc_id"])
            .column("doc_id")
            .to_numpy()
        )
        h = _ph_hash_ids(ids)
        rows = ",\n  ".join(
            f"(CAST({int(i)} AS BIGINT), CAST({int(v)} AS BIGINT))"
            for i, v in zip(ids, h)
        )
        _ORACLE_CACHE["phash_neardup"] = f"""
            WITH base(doc_id, h) AS (VALUES
              {rows}
            ),
            planted AS (
              SELECT doc_id + 1000000 AS doc_id,
                     xor(h, CAST({_PH_FLIP_MASK} AS BIGINT)) AS h
              FROM base WHERE doc_id < {_PH_PLANT_K}
            ),
            allh AS (
              SELECT * FROM base UNION ALL SELECT * FROM planted
            )
            SELECT a.doc_id AS a, b.doc_id AS b,
                   CAST(bit_count(xor(a.h, b.h)) AS BIGINT) AS hamming
            FROM allh a JOIN allh b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.h, b.h)) <= 3
            ORDER BY 1, 2
        """
    return _ORACLE_CACHE["phash_neardup"]


def _binning_bins_oracle_sql() -> str:
    """Expected bins table from the SINGLE-NODE numpy core fit — the
    independent path the distributed fit must reproduce."""
    if "bins" not in _ORACLE_CACHE:
        import numpy as np

        df = _core_lineitem_model(_SF01).bins_df()
        for c in ("mean", "std"):
            df[c] = np.round(df[c], 6)
        _ORACLE_CACHE["bins"] = _values_sql(df, int_cols=("n",), order_by="left")
    return _ORACLE_CACHE["bins"]


def _binning_summary_oracle_sql() -> str:
    if "summary" not in _ORACLE_CACHE:
        import numpy as np

        df = _core_lineitem_model(_SF01).summary_df()
        for c in ("count_pct", "mean", "std", "woe", "iv"):
            if c in df.columns:
                df[c] = np.round(df[c], 6)
        _ORACLE_CACHE["summary"] = _values_sql(
            df, int_cols=("count",), order_by="bucket"
        )
    return _ORACLE_CACHE["summary"]


def _transform_case_sql() -> str:
    """CASE expression reproducing the fitted bin labels; edges come from
    the SINGLE-NODE numpy core fit at sf0.01 (the independent oracle
    path), so this genuinely cross-checks the distributed fit+transform."""
    model = _core_lineitem_model(_SF01)
    clauses = []
    for i in range(model.n_bins - 1):
        clauses.append(
            f"WHEN l_quantity < {model.rights[i]!r} THEN '{model.labels[i]}'"
        )
    case = "CASE " + " ".join(clauses) + f" ELSE '{model.labels[-1]}' END"
    return (
        f"SELECT {case} AS bucket, count(*) AS n FROM lineitem "
        f"GROUP BY 1 ORDER BY bucket"
    )


def oracle_sql() -> dict[str, str]:
    return {
        "fit_groups": """
            SELECT CAST(l_quantity AS DOUBLE) AS x,
                   count(*) AS n,
                   CAST(sum(CASE WHEN l_returnflag='R' THEN 1 ELSE 0 END) AS DOUBLE) AS sum_y,
                   CAST(min(CASE WHEN l_returnflag='R' THEN 1 ELSE 0 END) AS DOUBLE) AS min_y,
                   CAST(max(CASE WHEN l_returnflag='R' THEN 1 ELSE 0 END) AS DOUBLE) AS max_y
            FROM lineitem GROUP BY 1 ORDER BY 1
        """,
        "bin_transform_counts": _transform_case_sql(),
        "asof_join_events": """
            SELECT l.event_id, l.user_id, r.value
            FROM (SELECT event_id, user_id, ts FROM events WHERE event_type='view') l
            ASOF LEFT JOIN
                 (SELECT user_id, ts, value FROM events WHERE event_type='purchase') r
              ON l.user_id = r.user_id AND r.ts <= l.ts
        """,
        "lag_lead_events": """
            SELECT event_id,
                   LAG(value)  OVER (PARTITION BY user_id ORDER BY ts) AS value_lag1,
                   LEAD(value) OVER (PARTITION BY user_id ORDER BY ts) AS value_lead1
            FROM events
        """,
        "lag_tiebreak_events": """
            SELECT event_id,
                   LAG(value) OVER (PARTITION BY user_id
                                    ORDER BY date_trunc('hour', ts), event_id)
                       AS value_lag1
            FROM events
        """,
        "sessionize_events": """
            SELECT event_id,
                   CAST(SUM(CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END)
                     OVER (PARTITION BY user_id ORDER BY ts) AS BIGINT) AS session_seq
            FROM (SELECT event_id, user_id, ts,
                         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
                  FROM events)
        """,
        "backfill_events": """
            SELECT event_id,
                   LAST_VALUE(CASE WHEN event_type='purchase' THEN value END IGNORE NULLS)
                     OVER (PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv_filled
            FROM events
        """,
        "tumbling_events": """
            SELECT user_id, time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
                   count(*) AS n_events,
                   round(sum(value), 4) AS sum_value,
                   min(value) AS min_value, max(value) AS max_value
            FROM events GROUP BY 1, 2
        """,
        "rolling_events": """
            SELECT event_id,
                   round(AVG(value) OVER w, 6) AS value_rmean,
                   MIN(value) OVER w AS value_rmin,
                   MAX(value) OVER w AS value_rmax,
                   COUNT(value) OVER w AS value_rcount
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts
                         ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
        """,
        "topk_events": """
            SELECT user_id, rank, value FROM (
                SELECT user_id, value,
                       ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value DESC) AS rank
                FROM events)
            WHERE rank <= 3
        """,
        "session_stats_events": """
            WITH tagged AS (
                SELECT user_id, ts, value,
                       CAST(SUM(CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 30 MINUTE
                                THEN 1 ELSE 0 END)
                         OVER (PARTITION BY user_id ORDER BY ts) AS BIGINT) AS session_seq
                FROM (SELECT user_id, ts, value,
                             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
                      FROM events))
            SELECT user_id, session_seq,
                   count(*) AS n_events,
                   round(sum(value), 4) AS sum_value,
                   date_diff('microsecond', min(ts), max(ts)) AS duration_us
            FROM tagged GROUP BY 1, 2
        """,
        "distinct_users": """
            SELECT event_type, count(DISTINCT user_id) AS n_users
            FROM events GROUP BY 1
        """,
        "orders_customer_join": """
            SELECT o.o_orderkey, o.o_custkey AS custkey,
                   round(o.o_totalprice, 2) AS o_totalprice, c.c_mktsegment
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        """,
        "orders_semi_join": """
            SELECT o_orderkey FROM orders
            WHERE o_custkey IN (SELECT c_custkey FROM customer
                                WHERE c_mktsegment = 'BUILDING')
        """,
        "orders_anti_join": """
            SELECT o_orderkey FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey
                                AND c.c_mktsegment = 'BUILDING')
            ORDER BY o_orderkey
        """,
        "orders_hotkey_join": """
            WITH l AS (
              SELECT o_orderkey,
                     CASE WHEN o_orderkey % 10 < 3 THEN 1
                          ELSE o_custkey END AS custkey
              FROM orders)
            SELECT l.o_orderkey, CAST(l.custkey AS BIGINT) AS custkey,
                   c.c_mktsegment
            FROM l JOIN customer c ON l.custkey = c.c_custkey
        """,
        "orders_bigkey_join": """
            SELECT o.o_orderkey,
                   o.o_orderkey * CAST(1099511627776 AS BIGINT)
                     + o.o_orderkey + CAST(9007199254740993 AS BIGINT)
                     AS bigkey,
                   c.c_mktsegment
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        """,
        "top_orders": """
            SELECT o_orderkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
        """,
        "group_centroids": """
            SELECT CAST(label AS BIGINT) AS label, count(*) AS n,
                   round(avg(embedding[1]), 3) AS c0,
                   round(avg(embedding[2]), 3) AS c1,
                   round(avg(embedding[3]), 3) AS c2,
                   round(avg(embedding[4]), 3) AS c3
            FROM embeddings GROUP BY 1
        """,
        "hopping_events": """
            WITH offsets AS (SELECT unnest([0, 1]) AS i)
            SELECT user_id,
                   time_bucket(INTERVAL 30 MINUTE, ts) - i * INTERVAL 30 MINUTE
                     AS window_start,
                   count(*) AS n_events,
                   round(sum(value), 4) AS sum_value
            FROM events, offsets
            GROUP BY 1, 2
        """,
        "dedup_exact_docs": """
            SELECT min(doc_id) AS doc_id, count(*) AS n_dups
            FROM documents GROUP BY text
        """,
        "text_tokens_docs": r"""
            SELECT doc_id,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE len(string_split_regex(trim(text), '\s+')) END AS n_ws_tokens
            FROM documents
        """,
        "filter_docs": """
            SELECT doc_id FROM documents
            WHERE n_chars >= 200 AND lang IN ('en', 'de')
        """,
        "lang_counts_docs": "SELECT lang, count(*) AS n FROM documents GROUP BY lang",
        "orders_status_agg": """
            SELECT o_orderstatus, count(*) AS n,
                   round(sum(o_totalprice), 2) AS sum_total
            FROM orders GROUP BY 1
        """,
        "customer_nation_join": """
            SELECT n.n_name, count(*) AS n
            FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY 1
        """,
        "knn_cosine": """
            SELECT e.vec_id
            FROM embeddings e,
                 (SELECT embedding FROM embeddings ORDER BY vec_id LIMIT 1) q
            ORDER BY list_cosine_similarity(e.embedding, q.embedding) DESC
            LIMIT 5
        """,
        "knn_ivf": """
            SELECT e.vec_id
            FROM embeddings e,
                 (SELECT embedding FROM embeddings ORDER BY vec_id LIMIT 1) q
            ORDER BY list_cosine_similarity(e.embedding, q.embedding) DESC
            LIMIT 5
        """,
        "knn_batch_dataset": """
            WITH q AS (SELECT vec_id AS query_id, embedding
                       FROM embeddings ORDER BY vec_id LIMIT 3)
            SELECT query_id, rank, vec_id FROM (
                SELECT q.query_id, e.vec_id,
                       ROW_NUMBER() OVER (
                         PARTITION BY q.query_id
                         ORDER BY list_cosine_similarity(
                           e.embedding, q.embedding) DESC) AS rank
                FROM embeddings e, q)
            WHERE rank <= 5 ORDER BY query_id, rank
        """,
        "quality_docs": r"""
            WITH m AS (
              SELECT doc_id,
                     length(text) AS n_chars,
                     len(regexp_extract_all(text, '\S+')) AS n_tokens,
                     len(regexp_extract_all(text, '[^\p{L}\p{N}_\s]')) AS n_punct,
                     len(regexp_extract_all(text, '[0-9]')) AS n_digit,
                     len(regexp_extract_all(lower(text),
                         '\b(the|and|of|to|a|in|is|that|it|for|on|with|as|was|at)\b')) AS st_en,
                     len(regexp_extract_all(lower(text),
                         '\b(der|die|das|und|ist|von|zu|mit|den|nicht|ein|eine|auf|für)\b')) AS st_de,
                     len(regexp_extract_all(lower(text),
                         '\b(el|la|de|que|y|en|un|una|es|por|con|para|los|las)\b')) AS st_es,
                     len(regexp_extract_all(lower(text),
                         '\b(le|la|les|de|des|et|est|en|un|une|du|que|pour|dans)\b')) AS st_fr
              FROM documents
            )
            SELECT doc_id,
                   round(
                     least(n_tokens / 50.0, 1.0) * 0.4
                     + greatest(least(1.0 - 4.0 * (n_punct / greatest(n_chars, 1)::DOUBLE), 1.0), 0.0) * 0.2
                     + greatest(least(1.0 - 4.0 * (n_digit / greatest(n_chars, 1)::DOUBLE), 1.0), 0.0) * 0.2
                     + least((st_en / greatest(n_tokens, 1)::DOUBLE) * 5.0, 1.0) * 0.2
                   , 6) AS quality_score,
                   CASE WHEN greatest(st_en, st_de, st_es, st_fr) <= 0 THEN 'und'
                        WHEN st_en >= st_de AND st_en >= st_es AND st_en >= st_fr THEN 'en'
                        WHEN st_de >= st_es AND st_de >= st_fr THEN 'de'
                        WHEN st_es >= st_fr THEN 'es'
                        ELSE 'fr' END AS lang_pred
            FROM m ORDER BY doc_id
        """,
        "embedding_neardup": _EMB_NEARDUP_SQL,
        "embedding_neardup_ids": _EMB_NEARDUP_SQL,
        "minhash_dedup_docs": _minhash_oracle_sql(),
        "phash_neardup_docs": _phash_neardup_oracle_sql(),
        "asof_tolerance_events": """
            SELECT l.event_id, l.user_id,
                   CASE WHEN r.ts >= l.ts - INTERVAL 1 HOUR THEN r.value
                        END AS value
            FROM (SELECT event_id, user_id, ts FROM events
                  WHERE event_type='view') l
            ASOF LEFT JOIN
                 (SELECT user_id, ts, value FROM events
                  WHERE event_type='purchase') r
              ON l.user_id = r.user_id AND r.ts <= l.ts
        """,
        "asof_copartitioned_events": """
            SELECT l.event_id, l.user_id, r.value
            FROM (SELECT event_id, user_id, ts FROM events WHERE event_type='view') l
            ASOF LEFT JOIN
                 (SELECT user_id, ts, value FROM events WHERE event_type='purchase') r
              ON l.user_id = r.user_id AND r.ts <= l.ts
        """,
        "simhash_pairs_docs": _simhash_oracle_sql(),
        "simhash_clusters_docs": _simhash_clusters_oracle_sql(),
        "ngram_jaccard_docs": _ngram_oracle_sql(),
        "fingerprint_docs": _fingerprint_oracle_sql(),
        "binning_bins": _binning_bins_oracle_sql(),
        "binning_summary": _binning_summary_oracle_sql(),
    }


if __name__ == "__main__":
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    ds = entry()
    print(ds.schema())
    print("rows:", ds.count())
    ray.shutdown()
