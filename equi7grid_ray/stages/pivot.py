"""Wide pivot aggregates: long (index, category, value) rows -> one row
per index with per-category columns.

Shape: each batch folds into a dense (distinct-index x category) count/
sum matrix (np.bincount over combined codes -- no Python per row), so
the shuffle carries wide PARTIAL rows bounded by distinct index values
per batch, never input rows; a keyed Sum merge finishes.  The category
domain is fixed and caller-supplied (the SQL-PIVOT contract): rows with
an unlisted category are dropped, matching the explicit CASE columns an
oracle generates.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["pivot_counts", "melt", "cube_counts"]


def pivot_counts(ds, *, index: str, pivot_col: str,
                 categories: tuple[str, ...], value_col: str | None = None):
    """Pivot ``ds`` to one row per ``index`` value with ``n_<cat>``
    count columns (and ``sum_<cat>`` int64 sums of ``value_col`` when
    given).  ``index`` must be integer-typed; ``categories`` fixes the
    output schema."""
    cats = list(categories)
    K = len(cats)
    if K == 0:
        raise ValueError("pivot_counts: need at least one category")
    from ray.data.aggregate import Sum

    n_cols = [f"n_{c}" for c in cats]
    s_cols = [f"sum_{c}" for c in cats] if value_col else []

    def partial(batch: pa.Table) -> pa.Table:
        idx = batch.column(index).to_numpy(zero_copy_only=False).astype(np.int64)
        pv = batch.column(pivot_col)
        if isinstance(pv, pa.ChunkedArray):
            pv = pv.combine_chunks()
        enc = pv.dictionary_encode()
        dict_vals = enc.dictionary.to_pylist()
        pos = {c: i for i, c in enumerate(cats)}
        lut = np.array([pos.get(v, -1) for v in dict_vals] + [-1], np.int64)
        codes = lut[enc.indices.fill_null(-1)
                    .to_numpy(zero_copy_only=False).astype(np.int64)]
        m = codes >= 0  # unlisted categories dropped (fixed-schema contract)
        idx, codes = idx[m], codes[m]
        if not len(idx):
            empty = {index: pa.array([], pa.int64())}
            for c in n_cols + s_cols:
                empty[c] = pa.array([], pa.int64())
            return pa.table(empty)
        uidx, inv = np.unique(idx, return_inverse=True)
        flat = inv * K + codes
        counts = np.bincount(flat, minlength=len(uidx) * K).reshape(-1, K)
        out = {index: pa.array(uidx, pa.int64())}
        for j, c in enumerate(n_cols):
            out[c] = pa.array(counts[:, j].astype(np.int64), pa.int64())
        if value_col:
            vals = batch.column(value_col).to_numpy(
                zero_copy_only=False).astype(np.int64)[m]
            sums = np.bincount(flat, weights=vals.astype(np.float64),
                               minlength=len(uidx) * K).reshape(-1, K)
            for j, c in enumerate(s_cols):
                out[c] = pa.array(np.rint(sums[:, j]).astype(np.int64),
                                  pa.int64())
        return pa.table(out)

    from equi7grid_ray.stages.aggregate import hash_aggregate

    return hash_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=[index], aggs={c: (c, "sum") for c in n_cols + s_cols})


def melt(ds, *, id_cols: list[str], value_cols: list[str],
         var_name: str = "variable", value_name: str = "value"):
    """Unpivot (pandas.melt / SQL UNPIVOT): wide value columns -> long
    (id_cols, var_name, value_name) rows.  Pure map_batches (each batch
    emits len(value_cols) stacked slices -- Arrow take + concat, no
    Python per row), zero shuffle; value columns must share a castable
    type (cast to the first column's type)."""
    if not value_cols:
        raise ValueError("melt: need at least one value column")

    def fn(batch: pa.Table) -> pa.Table:
        vt = batch.column(value_cols[0]).type
        parts = []
        for c in value_cols:
            cols = {k: batch.column(k) for k in id_cols}
            cols[var_name] = pa.array(
                np.full(batch.num_rows, c, dtype=object), pa.string())
            cols[value_name] = batch.column(c).cast(vt)
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    return ds.map_batches(fn, batch_format="pyarrow")


def rollup_counts(ds, *, keys: list[str], all_label: str = "<all>"):
    """SQL ``GROUP BY ROLLUP(k1, k2, ...)``: counts at every prefix
    granularity -- (k1, k2), (k1, <all>), (<all>, <all>).

    Scale shape: only the FINEST level ever aggregates over input rows
    (per-batch value_counts partials, one keyed Sum shuffle); every
    coarser level re-aggregates the finest RESULT, whose size is
    bounded by the key-domain product, not the corpus.  The coarse
    passes are therefore O(domain) regardless of input scale.
    """
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    if not keys:
        raise ValueError("rollup_counts: need at least one key")

    def partial(batch: pa.Table) -> pa.Table:
        # Coarser levels substitute the string `all_label`, so every key
        # column must be string-typed already at the finest level or the
        # per-level union would mix schemas.
        sub = pa.table({k: pc.cast(batch.column(k), pa.string())
                        for k in keys})
        counted = sub.group_by(keys).aggregate([([], "count_all")])
        return counted.rename_columns(keys + ["pn"])

    from equi7grid_ray.stages.aggregate import hash_aggregate

    finest = hash_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=keys, aggs={"pn": ("pn", "sum")},
        # consumed by every level: without materialize each coarser
        # level would re-scan the full input
    ).materialize()

    levels = [finest]
    for lvl in range(len(keys) - 1, -1, -1):
        kept = keys[:lvl]
        if kept:
            agg = hash_aggregate(finest.select_columns(kept + ["pn"]),
                                 keys=kept, aggs={"pn": ("pn", "sum")},
                                 n_partitions=4)
        else:
            from equi7grid_ray.arrowutil import single_group

            def total(t: pa.Table) -> pa.Table:
                cols = {k: pa.array([all_label], pa.string()) for k in keys}
                cols["pn"] = pa.array(
                    [pc.sum(t.column("pn")).as_py() or 0], pa.int64())
                return pa.table(cols)

            levels.append(single_group(
                finest.select_columns(["pn"]), total, keys + ["pn"],
                batch_format="pyarrow"))
            continue

        def relabel(batch: pa.Table, kept=kept) -> pa.Table:
            cols = {k: batch.column(k) for k in kept}
            n = batch.num_rows
            for k in keys[len(kept):]:
                cols[k] = pa.array([all_label] * n, pa.string())
            cols["pn"] = batch.column("pn")
            return pa.table(cols)

        levels.append(agg.map_batches(relabel, batch_format="pyarrow"))

    out = levels[0]
    for lv in levels[1:]:
        out = out.union(lv)

    def rename(batch: pa.Table) -> pa.Table:
        cols = {k: batch.column(k) for k in keys}
        cols["n"] = batch.column("pn")
        return pa.table(cols)

    return out.map_batches(rename, batch_format="pyarrow")


def cube_counts(ds, *, keys: list[str], all_label: str = "<all>"):
    """SQL ``GROUP BY CUBE(k1, ..., kn)``: counts at EVERY subset of
    the keys (2^n grouping sets; ROLLUP's prefixes are the special
    case).  Same scale shape as rollup_counts — only the finest level
    aggregates input rows; all 2^n - 1 other grouping sets re-aggregate
    the finest RESULT (bounded by the key-domain product), so the cube
    costs O(2^n * domain) regardless of corpus size."""
    import pyarrow.compute as pc

    if not keys:
        raise ValueError("cube_counts: need at least one key")

    from equi7grid_ray.stages.aggregate import hash_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        sub = pa.table({k: pc.cast(batch.column(k), pa.string())
                        for k in keys})
        counted = sub.group_by(keys).aggregate([([], "count_all")])
        return counted.rename_columns(keys + ["pn"])

    finest = hash_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=keys, aggs={"pn": ("pn", "sum")},
    ).materialize()

    levels = [finest]
    n = len(keys)
    for mask in range((1 << n) - 2, -1, -1):  # every proper subset
        kept = [keys[i] for i in range(n) if mask & (1 << i)]
        if kept:
            agg = hash_aggregate(finest.select_columns(kept + ["pn"]),
                                 keys=kept, aggs={"pn": ("pn", "sum")},
                                 n_partitions=4)

            def relabel(batch: pa.Table, kept=tuple(kept)) -> pa.Table:
                cols = {}
                m = batch.num_rows
                for k in keys:
                    cols[k] = (batch.column(k) if k in kept
                               else pa.array([all_label] * m, pa.string()))
                cols["pn"] = batch.column("pn")
                return pa.table(cols)

            levels.append(agg.map_batches(relabel, batch_format="pyarrow"))
        else:
            from equi7grid_ray.arrowutil import single_group

            def total(t: pa.Table) -> pa.Table:
                cols = {k: pa.array([all_label], pa.string())
                        for k in keys}
                cols["pn"] = pa.array(
                    [pc.sum(t.column("pn")).as_py() or 0], pa.int64())
                return pa.table(cols)

            levels.append(single_group(
                finest.select_columns(["pn"]), total, keys + ["pn"],
                batch_format="pyarrow"))

    out = levels[0]
    for lv in levels[1:]:
        out = out.union(lv)

    def rename(batch: pa.Table) -> pa.Table:
        cols = {k: batch.column(k) for k in keys}
        cols["n"] = batch.column("pn")
        return pa.table(cols)

    return out.map_batches(rename, batch_format="pyarrow")
