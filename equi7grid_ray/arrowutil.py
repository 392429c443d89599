"""Small shared Arrow helpers for zero-copy batch access patterns."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["binary_view", "continent_codes"]


def binary_view(col) -> tuple[memoryview, np.ndarray]:
    """(value-buffer memoryview, int64 offsets) for a binary/string
    column -- per-row payloads are ``data[offs[j]:offs[j+1]]`` slices,
    no per-row Python bytes copies."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    bufs = col.buffers()
    wide = pa.types.is_large_binary(col.type) or pa.types.is_large_string(col.type)
    odt = np.int64 if wide else np.int32
    offs = np.frombuffer(bufs[1], dtype=odt)[col.offset : col.offset + len(col) + 1]
    data = memoryview(bufs[2]) if bufs[2] is not None else memoryview(b"")
    return data, offs.astype(np.int64)


def continent_codes(col) -> tuple[np.ndarray, list[str]]:
    """(codes, dictionary) for a string/dictionary continent column --
    grouping by ``codes == k`` avoids materializing per-row Python
    strings."""
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if not pa.types.is_dictionary(col.type):
        col = pc.dictionary_encode(col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    codes = np.asarray(col.indices)
    dictionary = col.dictionary.to_pylist()
    return codes, dictionary


def payload_sums(col, dtype, nodata=None) -> tuple[np.ndarray, np.ndarray]:
    """Per-row (sum, count) over a binary column of C-order numeric
    payloads: ONE reduceat pass over the concatenated value buffer, no
    per-row copies.  ``nodata`` values are excluded from both sum and
    count when given; empty payloads yield (0, 0)."""
    dt = np.dtype(dtype)
    data, offs = binary_view(col)
    flat = np.frombuffer(data, dt).astype(np.int64)
    oe = offs // dt.itemsize  # element offsets
    n = len(oe) - 1
    if not len(flat):
        return np.zeros(n, np.int64), np.zeros(n, np.int64)
    valid = (flat != nodata) if nodata is not None else np.ones(len(flat), bool)
    idx = np.minimum(oe[:-1], len(flat) - 1)
    sums = np.add.reduceat(np.where(valid, flat, 0), idx)
    cnts = np.add.reduceat(valid.astype(np.int64), idx)
    empty = np.diff(oe) == 0
    sums[empty] = 0
    cnts[empty] = 0
    return sums, cnts
