"""Resumable partitioned output with per-partition lineage + metrics.

Layout (the "resumable from checkpoint" contract of the north rule):

    out_dir/
      part-{pid:05d}.parquet      one file per hash partition
      _manifest/{pid:05d}.json    lineage record, written AFTER the data
                                  file is atomically renamed into place

A partition is "done" iff its manifest exists and matches the data file's
row count and content hash. On re-run, done partitions are skipped (the
write is idempotent: same input -> same partition id -> same file). The
manifest doubles as the per-partition metrics record (rows, bytes, wall
time, content hash, writer info).

Write path per partition: tmp file in the same directory -> fsync-free
atomic ``os.replace`` -> manifest. A crash between the two leaves a data
file without a manifest; the next run rewrites it (safe: replace is
atomic).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from mobray.pipelines.temporal import bucket_col_for, with_buckets

_HASH_KEY = "0123456789123456"


def _content_hash(df: pd.DataFrame) -> str:
    """Order-insensitive 64-bit content hash of a partition."""
    if len(df) == 0:
        return "0"
    h = pd.util.hash_pandas_object(df, index=False, hash_key=_HASH_KEY)
    return f"{int(np.bitwise_xor.reduce(h.to_numpy())):016x}"


def _manifest_path(out_dir: str, pid: int) -> str:
    return os.path.join(out_dir, "_manifest", f"{pid:05d}.json")


def _part_path(out_dir: str, pid: int) -> str:
    return os.path.join(out_dir, f"part-{pid:05d}.parquet")


def _is_done(out_dir: str, pid: int) -> Optional[Dict]:
    mpath = _manifest_path(out_dir, pid)
    ppath = _part_path(out_dir, pid)
    if not (os.path.exists(mpath) and os.path.exists(ppath)):
        return None
    try:
        with open(mpath) as f:
            manifest = json.load(f)
        if pq.read_metadata(ppath).num_rows != manifest["rows"]:
            return None
        return manifest
    except Exception:
        return None


def partition_done(out_dir: str, pid: int) -> Optional[Dict]:
    """Public resume probe: the partition's manifest if it is already
    written and consistent, else None. Lets a shard-local job skip ALL
    work for finished partitions (the bucketed path can only skip the
    final write — it has already paid the shuffle by then)."""
    return _is_done(out_dir, pid)


def write_partition(g: pd.DataFrame, out_dir: str, pid: int, job_id: str = "job") -> Dict:
    """Write one partition idempotently (skip if manifest valid); returns
    its metrics record. Usable from any per-bucket function so the write
    can be FUSED into an existing shuffle."""
    t0 = time.time()
    existing = _is_done(out_dir, pid)
    if existing is not None:
        return {
            "pid": pid,
            "rows": existing["rows"],
            "bytes": existing["bytes"],
            "wall_s": 0.0,
            "skipped": True,
            "content_hash": existing["content_hash"],
        }
    os.makedirs(os.path.join(out_dir, "_manifest"), exist_ok=True)
    ppath = _part_path(out_dir, pid)
    tmp = ppath + f".tmp-{os.getpid()}"
    pq.write_table(pa.Table.from_pandas(g, preserve_index=False), tmp)
    os.replace(tmp, ppath)
    chash = _content_hash(g)
    manifest = {
        "pid": pid,
        "job_id": job_id,
        "rows": int(len(g)),
        "bytes": int(os.path.getsize(ppath)),
        "content_hash": chash,
        "wall_s": round(time.time() - t0, 4),
        "written_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    mtmp = _manifest_path(out_dir, pid) + ".tmp"
    with open(mtmp, "w") as f:
        json.dump(manifest, f)
    os.replace(mtmp, _manifest_path(out_dir, pid))
    return {
        "pid": pid,
        "rows": manifest["rows"],
        "bytes": manifest["bytes"],
        "wall_s": manifest["wall_s"],
        "skipped": False,
        "content_hash": chash,
    }


def resumable_write(
    ds,
    out_dir: str,
    key: str,
    num_buckets: Optional[int] = None,
    job_id: str = "job",
) -> pd.DataFrame:
    """Write ``ds`` hash-partitioned by ``key`` with per-partition
    manifests; skip partitions already done. Returns the metrics table
    (one row per partition: pid, rows, bytes, wall_s, skipped, hash).

    PARTITIONING ASSUMPTION: partition id = stable hash(key) % num_buckets,
    so a re-run over the same input reproduces the same partition
    contents regardless of block layout or worker count.
    """
    os.makedirs(os.path.join(out_dir, "_manifest"), exist_ok=True)
    if num_buckets is None:
        from mobray.pipelines.temporal import auto_num_buckets

        num_buckets = auto_num_buckets(ds, floor=32)
    bc = bucket_col_for(key)
    bucketed = ds if bc in ds.schema().names else with_buckets(ds, key, num_buckets)

    def write_bucket(g: pd.DataFrame) -> pd.DataFrame:
        pid = int(g[bc].iloc[0])
        g = g.drop(columns=[bc])
        return pd.DataFrame([write_partition(g, out_dir, pid, job_id)])

    metrics = (
        bucketed.groupby(bc)
        .map_groups(write_bucket, batch_format="pandas")
        .to_pandas()
        .sort_values("pid")
        .reset_index(drop=True)
    )
    return metrics


def load_manifests(out_dir: str) -> List[Dict]:
    mdir = os.path.join(out_dir, "_manifest")
    if not os.path.isdir(mdir):
        return []
    out = []
    for name in sorted(os.listdir(mdir)):
        if name.endswith(".json"):
            with open(os.path.join(mdir, name)) as f:
                out.append(json.load(f))
    return out


def load_metrics(out_dir: str) -> pd.DataFrame:
    return pd.DataFrame(load_manifests(out_dir))
