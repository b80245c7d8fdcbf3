"""Arrow column -> numpy helpers (zero-copy where the layout allows)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def embedding_matrix(col, dtype=np.float64) -> np.ndarray:
    """(Fixed-size) list column of numbers -> (n, dim) matrix without a
    Python-object round-trip: ``flatten()`` + ``to_numpy`` on the child
    values, reshaped. The ``np.array(col.to_pylist())`` alternative
    copies every vector through Python lists per batch; this path is a
    single buffer view (plus at most one dtype cast).

    Raises on nulls or ragged row lengths — an embedding column must be
    rectangular to matmul.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col.type, pa.ExtensionType):
        # Ray tensor extension arrays expose the (n, dim) matrix directly
        vals = col.to_numpy(zero_copy_only=False)
        if vals.dtype == object:
            vals = np.stack(vals)
        return np.ascontiguousarray(vals).astype(dtype, copy=False)
    if col.null_count:
        raise ValueError(f"embedding column has {col.null_count} nulls")
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=dtype)
    flat = col.flatten()  # offset/slice-aware for both list layouts
    vals = flat.to_numpy(zero_copy_only=False)
    if vals.size % n:
        raise ValueError("ragged list column cannot form a matrix")
    dim = vals.size // n
    if not pa.types.is_fixed_size_list(col.type):
        widths = np.diff(col.offsets.to_numpy(zero_copy_only=False))
        if len(widths) and not (widths == dim).all():
            raise ValueError("ragged list column cannot form a matrix")
    return np.ascontiguousarray(vals.reshape(n, dim)).astype(dtype, copy=False)
