"""Data-quality constraint validation (the dbt-test / Great-
Expectations role): declarative checks evaluated distributed, one
summary row per check.

A 100-TB ingest gates on exactly these four check shapes:

- ``not_null``   -- per-batch null-count partials, keyed Sum (no rows
  move);
- ``positive``   -- same shape, predicate violations;
- ``unique``     -- violations = total - distinct; the distinct count
  shuffles only per-batch DISTINCT values (combiner-first);
- ``foreign_key``-- orphan rows counted via the broadcast anti-join
  (reference keys ship once; swap in bloom_anti_join when the
  reference side outgrows a broadcast).

Each count is a distributed aggregate reduced to one scalar; the
result table is (check, n_violations) -- O(#checks) rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["check_table"]


def check_table(ds, *, not_null: list[str] | None = None,
                positive: list[str] | None = None,
                unique: list[str] | None = None,
                foreign_key: dict[str, tuple] | None = None):
    """Run the declared checks; returns a pyarrow Table
    ``(check: string, n_violations: int64)`` with one row per check,
    named ``<kind>:<column>``."""
    import pyarrow.compute as pc
    import ray.data as rd

    from ray.data.aggregate import Count, Sum

    from equi7grid_ray.arrowutil import collect_tables
    from equi7grid_ray.stages.join import broadcast_join

    not_null = list(not_null or [])
    positive = list(positive or [])
    unique = list(unique or [])
    foreign_key = dict(foreign_key or {})
    names: list[str] = []
    viols: list[int] = []

    scan_cols = not_null + positive
    if scan_cols:
        def partials(batch: pa.Table) -> pa.Table:
            ck, pn = [], []
            for c in not_null:
                ck.append(f"not_null:{c}")
                pn.append(batch.column(c).null_count)
            for c in positive:
                col = batch.column(c)
                bad = pc.sum(pc.cast(
                    pc.fill_null(pc.less_equal(col, 0), True),
                    pa.int64())).as_py() or 0
                ck.append(f"positive:{c}")
                pn.append(int(bad))
            return pa.table({"check": pa.array(ck, pa.string()),
                             "pn": pa.array(pn, pa.int64())})

        from equi7grid_ray.stages.aggregate import hash_aggregate

        t = collect_tables(
            hash_aggregate(ds.map_batches(partials, batch_format="pyarrow"),
                           keys=["check"], aggs={"n": ("pn", "sum")}),
            schema=pa.schema([("check", pa.string()), ("n", pa.int64())]),
        )
        m = dict(zip(t.column("check").to_pylist(),
                     t.column("n").to_pylist()))
        for c in not_null:
            names.append(f"not_null:{c}")
            viols.append(int(m.get(f"not_null:{c}", 0)))
        for c in positive:
            names.append(f"positive:{c}")
            viols.append(int(m.get(f"positive:{c}", 0)))

    for c in unique:
        sub = ds.select_columns([c])
        total = sub.count()
        # combiner-first distinct: each batch emits its distinct values
        def dedup(batch: pa.Table, c=c) -> pa.Table:
            col = batch.column(c)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            return pa.table({c: col.unique()})

        from equi7grid_ray.stages.aggregate import hash_aggregate

        n_distinct = hash_aggregate(
            sub.map_batches(dedup, batch_format="pyarrow"),
            keys=[c], aggs={"__c": (c, "count")}).count()
        names.append(f"unique:{c}")
        viols.append(int(total - n_distinct))

    for c, (ref_ds, ref_col) in foreign_key.items():
        keys = ref_ds.select_columns([ref_col])
        if ref_col != c:
            def rename(batch: pa.Table, ref_col=ref_col, c=c) -> pa.Table:
                return batch.rename_columns(
                    [c if n == ref_col else n for n in batch.column_names])
            keys = keys.map_batches(rename, batch_format="pyarrow")
        orphans = broadcast_join(ds.select_columns([c]), keys,
                                 on=c, how="anti").count()
        names.append(f"foreign_key:{c}")
        viols.append(int(orphans))

    return pa.table({"check": pa.array(names, pa.string()),
                     "n_violations": pa.array(viols, pa.int64())})
