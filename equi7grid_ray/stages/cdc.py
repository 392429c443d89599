"""CDC / upsert-merge: apply a change stream to a base table.

The incremental-maintenance primitive every large ingestion pipeline
needs (Delta/Iceberg ``MERGE INTO`` semantics): a base snapshot plus a
stream of keyed changes (upserts and deletes, ordered by a sequence
column) collapse to the latest surviving row per key.

Scale shape: ONE hash-partitioned cogroup shuffle (the tagged-union
pattern shared with stages/join.py) -- base rows enter as
sequence -infinity upserts, each partition resolves its keys with a
single vectorized lexsort (no per-key Python), and only the winning
rows leave.  Deletes for absent keys and changes replayed onto their
own output (idempotence) are both well-defined.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["apply_changes"]

OP_UPSERT = "upsert"
OP_DELETE = "delete"


def apply_changes(base, changes, *, key_col: str, seq_col: str,
                  op_col: str = "op", n_partitions: int = 32,
                  tiebreak_cols: tuple[str, ...] = ()):
    """Merge ``changes`` (columns: key, seq, op, payload...) into
    ``base`` (columns: key, payload...); returns the latest surviving
    row per key with the base's schema.

    Semantics (ties broken deterministically): per key, the row with
    the highest ``seq`` wins -- base rows carry seq = -1 (change
    sequences must be >= 0); if the winner's op is ``delete`` the key
    disappears.  Equal-seq duplicates within the change stream are
    resolved by op (delete > upsert), then by ``tiebreak_cols``
    descending (pass the numeric payload columns that should decide
    exact ties; well-formed streams have unique sequences per key and
    never need this).
    """
    from equi7grid_ray.arrowutil import hash_partition

    payload = [c for c in base.schema().names if c != key_col]
    out_names = [key_col] + payload

    def tag_base(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = {key_col: batch.column(key_col).cast(pa.int64())}
        for c in payload:
            cols[c] = batch.column(c)
        cols["__seq"] = pa.array(np.full(n, -1, np.int64), pa.int64())
        cols["__del"] = pa.array(np.zeros(n, np.int8), pa.int8())
        part = hash_partition(
            batch.column(key_col).to_numpy(zero_copy_only=False)
            .astype(np.int64), n_partitions)
        cols["__part"] = pa.array(part, pa.int32())
        return pa.table(cols)

    def tag_changes(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cols = {key_col: batch.column(key_col).cast(pa.int64())}
        for c in payload:
            cols[c] = batch.column(c)
        cols["__seq"] = batch.column(seq_col).cast(pa.int64())
        cols["__del"] = pc.cast(
            pc.equal(batch.column(op_col), OP_DELETE), pa.int8())
        part = hash_partition(
            batch.column(key_col).to_numpy(zero_copy_only=False)
            .astype(np.int64), n_partitions)
        cols["__part"] = pa.array(part, pa.int32())
        return pa.table(cols)

    tagged = base.map_batches(tag_base, batch_format="pyarrow").union(
        changes.map_batches(tag_changes, batch_format="pyarrow"))

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        k = g[key_col].to_numpy(np.int64)
        s = g["__seq"].to_numpy(np.int64)
        d = g["__del"].to_numpy(np.int8)
        # winner per key = max (seq, del, *tiebreaks) -- delete outranks
        # an equal-seq upsert; lexsort is ascending so the winner is the
        # LAST row of each key group
        tb = [g[c].to_numpy() for c in reversed(tiebreak_cols)]
        order = np.lexsort((*tb, d, s, k))
        ks = k[order]
        last = np.ones(len(ks), dtype=bool)
        last[:-1] = ks[1:] != ks[:-1]
        win = order[last]
        keep = win[d[win] == 0]
        return g.iloc[keep][out_names]

    return (tagged.groupby("__part")
            .map_groups(resolve, batch_format="pandas"))
