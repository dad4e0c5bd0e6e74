"""Shared Arrow list-column -> numpy matrix conversion.

Every embedding-consuming kernel (frequent directions, the exact
Gramian companion, k-means) needs the same conversion: an Arrow
``list<float>`` / ``fixed_size_list<float>`` column to an (n, d)
float64 matrix, with malformed input REJECTED loudly — a null row or a
ragged length must raise, never silently skew a sum (a ragged batch
whose total element count happens to divide the row count would
otherwise reshape into a misaligned matrix and corrupt results without
any error).  One strict implementation here so the validation cannot
drift between copies.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

__all__ = ["rows_from_arrow"]


def rows_from_arrow(arr, dim: Optional[int] = None) -> np.ndarray:
    """Arrow (Chunked)Array of float lists -> (n, d) float64 matrix.

    Raises ValueError on null entries, ragged lengths, or (when ``dim``
    is given) a width mismatch.  Empty input returns a (0, dim or 0)
    matrix instead of tripping numpy's empty-reshape error.
    """
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        raise ValueError("null embeddings not supported")
    if isinstance(arr, pa.FixedSizeListArray):
        width = arr.type.list_size
        if dim is not None and width != int(dim):
            # the type carries the true width even for 0 rows — check
            # BEFORE the empty shortcut so an all-empty-partition run
            # over a wrong-width column fails as loudly as a full one
            raise ValueError(f"expected dim {dim}, got {width}")
        if len(arr) == 0:  # reshape(0, -1) raises in numpy
            return np.zeros((0, width))
        rows = np.asarray(arr.values, dtype=np.float64).reshape(len(arr), width)
    else:
        offs = np.asarray(arr.offsets, dtype=np.int64)
        widths = np.diff(offs)
        if len(widths) and not np.all(widths == widths[0]):
            raise ValueError("ragged embedding lengths")
        flat = np.asarray(arr.values, dtype=np.float64)
        rows = (
            flat[offs[0] : offs[-1]].reshape(len(arr), -1)
            if len(arr)
            else flat.reshape(0, dim or 0)
        )
    if dim is not None and rows.shape[0] and rows.shape[1] != int(dim):
        raise ValueError(f"expected dim {dim}, got {rows.shape[1]}")
    return rows
