"""Fast keyed aggregation: hash-partition cogroup + one vectorized
pandas combine per partition.

Ray Data's native ``groupby().aggregate(...)`` AllToAllOperator carries
a large fixed cost per input block (measured on Ray 2.49: 32 tiny
partial blocks -> ~4 s wall with ~5 ms of task compute; 64 blocks ->
~2.5 s at 8 cpus), which dominates every small-partial aggregate in a
sweep.  The equivalent ``groupby(part).map_groups(...)`` Sort path runs
the same reduction in ~0.1 s -- so this module expresses the common
Sum/Min/Max/Count reductions that way: an explicit splitmix64 hash
partition on the key tuple, then ONE vectorized pandas groupby per
partition.  Keys are colocated by construction; results are identical
to the native aggregate (integer sums/mins/maxes are order-free).

At scale the shape is the same one the native operator would use --
every row moves once to its hash partition -- without the per-block
operator overhead.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["hash_aggregate"]

_FNS = {"sum", "min", "max", "count"}


def _key_parts(batch: pa.Table, keys: list[str], n_partitions: int) -> np.ndarray:
    """Deterministic partition ids from the key tuple (int64 via mix64,
    strings via the shared byte hash; multiple keys xor-folded)."""
    from equi7grid_ray.stages.dedup import (_column_bytes, _mix64,
                                            hash_bytes_offsets)

    acc = np.zeros(batch.num_rows, np.uint64)
    for c in keys:
        col = batch.column(c)
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            flat, offs = _column_bytes(col)
            h = hash_bytes_offsets(flat, offs).view(np.uint64)
        else:
            v = col.to_numpy(zero_copy_only=False).astype(np.int64)
            h = _mix64(v.view(np.uint64))
        acc ^= h + np.uint64(0x9E3779B97F4A7C15) + (acc << np.uint64(6))
    return (acc % np.uint64(n_partitions)).astype(np.int32)


def hash_aggregate(ds, *, keys: list[str],
                   aggs: dict[str, tuple[str, str]],
                   n_partitions: int = 32):
    """``ds.groupby(keys).aggregate(...)`` replacement.

    ``aggs``: output column -> (input column, fn) with fn one of
    ``sum | min | max | count`` (count ignores its input column).
    Returns one row per distinct key tuple with columns
    ``keys + list(aggs)``; numeric outputs keep int64.
    """
    for out, (_c, fn) in aggs.items():
        if fn not in _FNS:
            raise ValueError(f"hash_aggregate: unsupported fn {fn!r} for {out}")
    in_cols = sorted({c for c, fn in aggs.values() if fn != "count"})

    def add_part(batch: pa.Table) -> pa.Table:
        cols = {k: batch.column(k) for k in keys}
        for c in in_cols:
            cols[c] = batch.column(c)
        t = pa.table(cols)
        return t.append_column(
            "__part", pa.array(_key_parts(batch, keys, n_partitions)))

    spec = {out: ((c if fn != "count" else keys[0]),
                  (fn if fn != "count" else "size"))
            for out, (c, fn) in aggs.items()}

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(keys, as_index=False).agg(
            **{o: pd.NamedAgg(column=c, aggfunc=f)
               for o, (c, f) in spec.items()})
        casts = {o: np.int64 for o, (c, f) in spec.items()
                 if f == "size" or np.issubdtype(out[o].dtype, np.integer)}
        return out.astype(casts) if casts else out

    return (ds.map_batches(add_part, batch_format="pyarrow")
            .groupby("__part")
            .map_groups(combine, batch_format="pandas"))
