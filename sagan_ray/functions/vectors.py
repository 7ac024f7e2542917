"""Zero-copy bridges between Arrow list<float> columns and numpy
matrices — the embedding-family hot path.

``np.array(col.to_pylist())`` materializes one Python list per ROW plus
one float object per element before numpy ever sees the data; at
corpus scale that is the whole stage. A non-null fixed-width list
column is just a flat values buffer + offsets, so the matrix is a
``flatten().to_numpy()`` view + reshape — no per-row Python. The
fallback (nulls or ragged rows) keeps the old semantics.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def vec_matrix(col, dtype=np.float64) -> np.ndarray:
    """list<float> column/array -> (n, dim) matrix.

    Zero-copy fast path when every row is non-null and the same length
    (the embedding-table contract); ragged/null rows fall back to the
    per-row conversion with NaN-padding-free strictness (raises on
    ragged input — an embedding column with mixed dims is a data bug,
    not a case to paper over)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0:
        return np.empty((0, 0), dtype=dtype)
    if arr.null_count == 0:
        offs = np.asarray(arr.offsets)
        widths = np.diff(offs)
        if (widths == widths[0]).all():
            flat = arr.flatten().to_numpy(zero_copy_only=False)
            return np.ascontiguousarray(
                flat.reshape(n, int(widths[0]))).astype(dtype, copy=False)
    # slow path: nulls or ragged — surface ragged loudly
    rows = arr.to_pylist()
    dims = {len(r) for r in rows if r is not None}
    if len(dims) > 1:
        raise ValueError(f"ragged embedding column: row dims {sorted(dims)}")
    dim = dims.pop() if dims else 0
    nan_row = [np.nan] * dim
    return np.array([r if r is not None else nan_row for r in rows],
                    dtype=dtype)


def matrix_to_list_array(m: np.ndarray,
                         value_type=pa.float64()) -> pa.ListArray:
    """(n, dim) matrix -> list<value_type> array, one flat buffer (no
    per-row Python lists)."""
    n, d = m.shape
    offsets = pa.array((np.arange(n + 1, dtype=np.int64) * d)
                       .astype(np.int32))
    values = pa.array(np.ascontiguousarray(m).reshape(-1)).cast(value_type)
    return pa.ListArray.from_arrays(offsets, values)
