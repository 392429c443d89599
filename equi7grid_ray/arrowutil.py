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
