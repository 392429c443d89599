"""Grid-partitioned spatial self-join: all pairs within a radius.

The reference answers "which tiles does this ROI touch" (core.py
get_tiles_in_* family); the corpus-scale sibling question is "which
ROWS are near each other" -- collocated imagery, duplicate acquisition
detection, spatial nearest-neighbour graphs. All-pairs is O(n^2); the
standard distributed shape (grid / PBSM spatial join) is:

1. hash every point to a square cell of side >= radius;
2. REPLICATE each point into its 8 neighbour cells (factor-9 map-side
   blowup of (id, x, y) metadata only -- never payloads);
3. shuffle by cell, one vectorized self-merge per hash PARTITION of
   cells (the partition-cogroup pattern: one pandas merge per
   partition, never per cell);
4. emit pair (a, b) exactly once via the canonical-cell rule: only
   where the SMALLER id is in its home cell (a replica pair is
   counted in the home cell of its min-id endpoint and nowhere else).

Cell side >= radius guarantees the 3x3 neighbourhood covers every
qualifying pair, so the output is EXACT -- the SQL oracle is the plain
O(n^2) inequality self-join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["neighbor_pairs"]

def neighbor_pairs(ds, *, radius: float, x_col: str = "x", y_col: str = "y",
                   id_col: str = "id", cell_size: float | None = None,
                   n_partitions: int = 32):
    """All distinct pairs (id_a < id_b) within euclidean ``radius``.

    Returns a Dataset ``(id_a, id_b, d2)`` where ``d2`` is the squared
    distance (exact integer when the inputs are integral).
    """
    cell = float(cell_size if cell_size is not None else radius)
    if cell < radius:
        raise ValueError("cell_size must be >= radius")
    r2 = float(radius) * float(radius)

    def replicate(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        x = batch.column(x_col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        y = batch.column(y_col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        cx = np.floor(x / cell).astype(np.int64)
        cy = np.floor(y / cell).astype(np.int64)
        n = len(ids)
        outs = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                ck = (cx + dx) * np.int64(1 << 31) + (cy + dy)
                outs.append((ck, dx == 0 and dy == 0))
        ck_all = np.concatenate([o[0] for o in outs])
        home = np.concatenate([
            np.full(n, o[1], dtype=bool) for o in outs])
        from equi7grid_ray.arrowutil import hash_partition
        part = hash_partition(ck_all, n_partitions)
        return pa.table({
            "ck": pa.array(ck_all, pa.int64()),
            id_col: pa.array(np.tile(ids, 9), pa.int64()),
            "x": pa.array(np.tile(x, 9)),
            "y": pa.array(np.tile(y, 9)),
            "home": pa.array(home),
            "part": pa.array(part, pa.int32()),
        })

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        # ONE vectorized merge over this partition's cells.  The LEFT
        # side carries only HOME rows: the canonical rule emits a pair
        # (a < b) solely where a is home, so home x replicated is the
        # complete candidate set -- a 9x smaller intermediate than the
        # naive all x all self-merge (each cell holds ~9x replicas).
        cols = ["ck", id_col, "x", "y"]
        left = g.loc[g["home"].to_numpy(bool), cols]
        j = left.merge(g[cols], on="ck", suffixes=("_a", "_b"))
        a_id = j[f"{id_col}_a"].to_numpy(np.int64)
        b_id = j[f"{id_col}_b"].to_numpy(np.int64)
        dx = j["x_a"].to_numpy() - j["x_b"].to_numpy()
        dy = j["y_a"].to_numpy() - j["y_b"].to_numpy()
        d2 = dx * dx + dy * dy
        keep = (a_id < b_id) & (d2 <= r2)
        return pd.DataFrame({
            "id_a": a_id[keep],
            "id_b": b_id[keep],
            "d2": d2[keep],
        })

    rep = ds.map_batches(replicate, batch_format="pyarrow")
    return rep.groupby("part").map_groups(resolve, batch_format="pandas")
