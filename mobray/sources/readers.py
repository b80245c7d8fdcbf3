"""Parquet -> Ray Dataset readers with hashable (metadata-free) schemas.

Parquet files written through pandas carry a ``pandas`` schema-metadata
blob whose value makes ``hash(pa.Schema)`` raise (``unhashable type:
'dict'``). Ray Data hashes schemas to deduplicate them when unifying
block metadata; an unhashable schema silently defeats that fast path and
logs a ``Failed to hash the schemas (for deduplication)`` warning from
every map task and reduce. Passing the footer schema with
``remove_metadata()`` to ``read_parquet`` gives every downstream block a
clean, hashable schema at zero cost.
"""

from __future__ import annotations

import glob
import os
from typing import List, Optional


def read_parquet_clean(
    path, *, columns: Optional[List[str]] = None, **kwargs
):
    """``ray.data.read_parquet`` with the file's schema stripped of
    metadata (and projected to ``columns`` — read_parquet requires the
    override schema to match the projection).

    The override schema is derived from the shard footers and VALIDATED
    across all flat-directory shards (footer reads are metadata-only and
    cheap): heterogeneous shard schemas, nested directory layouts, or
    any footer-read failure fall back to plain ``read_parquet`` — a
    silent coercion to the first shard's schema would corrupt, and the
    fallback only costs the schema-dedup fast path (a log-spam issue,
    not a correctness one)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    schema = None
    try:
        first = path[0] if isinstance(path, (list, tuple)) else path
        footers = [first]
        if os.path.isdir(first):
            footers = sorted(glob.glob(os.path.join(first, "*.parquet")))
        if footers:
            schemas = {
                pq.read_schema(f).remove_metadata() for f in footers
            }
            if len(schemas) == 1:
                schema = schemas.pop()
                if columns is not None:
                    schema = pa.schema([schema.field(c) for c in columns])
    except Exception:
        schema = None
    if schema is None:
        return ray.data.read_parquet(path, columns=columns, **kwargs)
    return ray.data.read_parquet(path, columns=columns, schema=schema, **kwargs)
