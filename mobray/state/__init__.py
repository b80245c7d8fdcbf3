"""Checkpoint manifests, lineage and per-partition metrics records."""

from mobray.state.checkpoint import (
    load_manifests,
    load_metrics,
    resumable_write,
)

__all__ = ["resumable_write", "load_manifests", "load_metrics"]
