"""Vectorized helpers for the JVM<->Python Arrow boundary (guide §4.2).

The r15 profile (tools/probe_r15_arrow.py, 1M x 64 floats) of the
three ways to turn a ``list<float>`` column into a numpy matrix inside
a map partition:

- per-row ``np.stack([np.asarray(e) for e in pdf[col]])`` (the r14
  idiom at 13 call sites): 4.48 s wall / 29.4 cpu-s per pass;
- ``np.vstack(series.to_numpy())`` (one C-level concat): 2.19 s wall;
- ``mapInArrow`` + one zero-copy reshape of the flat values buffer:
  1.12 s wall / 18.9 cpu-s — and the id/embedding columns pass back
  through Arrow untouched instead of re-materializing per-row Python
  objects.

All three produce bit-identical float64 matrices (float32 -> float64
widening is exact; asserted by the probe), so converted operators
cannot move an oracle hash.

``list_matrix`` is the mapInArrow fast path: it returns None when the
list column is ragged or carries nulls, and callers fall back to the
per-row path — same behavior, only speed differs.
"""

from __future__ import annotations

import numpy as np


def list_matrix(col, dtype=np.float64):
    """Arrow ``list<float*>`` array -> (n, d) contiguous matrix via
    the flat child-values buffer, or None when the fast path does not
    apply (ragged rows, null rows, null values). Slice-safe: offsets
    are taken relative to the array's own window."""
    import pyarrow as pa

    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if len(arr) == 0:
        return np.empty((0, 0), dtype=dtype)
    if arr.null_count:
        return None
    offs = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    widths = np.diff(offs)
    d = int(widths[0])
    if d <= 0 or not (widths == d).all():
        return None
    values = arr.values
    if values.null_count:
        return None
    flat = values.to_numpy(zero_copy_only=False)
    return np.ascontiguousarray(
        flat[offs[0] : offs[-1]].reshape(len(arr), d), dtype=dtype
    )


def rows_matrix(vals, dtype=np.float64):
    """Per-row fallback (and the pandas-path accelerator): stack a
    sequence/Series of array cells into an (n, d) matrix with ONE
    C-level concat instead of a Python-level per-row copy. Identical
    values to the np.stack/np.asarray idiom it replaces."""
    import pandas as pd

    if isinstance(vals, pd.Series):
        vals = vals.to_numpy()
    if len(vals) == 0:
        return np.empty((0, 0), dtype=dtype)
    return np.vstack(vals).astype(dtype, copy=False)


def matrix_to_list_array(M, value_type=None):
    """(n, d) matrix -> Arrow ``list<value_type>`` with one flat
    values buffer (no per-row Python objects)."""
    import pyarrow as pa

    n, d = M.shape
    values = pa.array(np.ascontiguousarray(M).reshape(-1))
    if value_type is not None:
        values = values.cast(value_type)
    offsets = pa.array(np.arange(0, (n + 1) * d, d, dtype=np.int32))
    return pa.ListArray.from_arrays(offsets, values)
