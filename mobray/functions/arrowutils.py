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
        raise ValueError(
            f"embedding column has {col.null_count} nulls — a null vector "
            "cannot be ranked; drop or impute those rows before the vector "
            "op (e.g. filter inside map_batches on pc.is_valid)"
        )
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


def binary_views(col) -> list:
    """Binary/large_binary column -> list of zero-copy memoryviews over
    the Arrow data buffer (None for null slots).

    ``to_pylist()`` materializes every payload as a Python ``bytes``
    object — for an image column that is one heap copy of the whole
    batch. A memoryview sliced from the value buffer is a pointer pair;
    the codecs (``zlib``, ``np.frombuffer``, ``struct.unpack``) all
    consume the buffer protocol directly."""
    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    out: list = []
    for ch in chunks:
        if len(ch) == 0:
            continue
        odt = np.int64 if pa.types.is_large_binary(ch.type) else np.int32
        bufs = ch.buffers()
        # buffers() ignores the slice offset; index with it explicitly
        offs = np.frombuffer(bufs[1], dtype=odt, count=ch.offset + len(ch) + 1)
        # cast to unsigned 'B': Arrow buffers expose signed 'b', whose
        # elements compare as negative ints against bytes literals
        data = (
            memoryview(bufs[2]).cast("B") if bufs[2] is not None else memoryview(b"")
        )
        if ch.null_count:
            valid = ch.is_valid().to_numpy(zero_copy_only=False)
        else:
            valid = None
        for i in range(len(ch)):
            if valid is not None and not valid[i]:
                out.append(None)
            else:
                lo, hi = offs[ch.offset + i], offs[ch.offset + i + 1]
                out.append(data[lo:hi])
    return out


def table_from_pandas(df, preserve_index: bool = False) -> "pa.Table":
    """``pa.Table.from_pandas`` without the pandas schema-metadata blob —
    that blob makes the schema unhashable and defeats Ray Data's
    schema-dedup fast path (see mobray.sources.readers)."""
    return pa.Table.from_pandas(
        df, preserve_index=preserve_index
    ).replace_schema_metadata(None)
