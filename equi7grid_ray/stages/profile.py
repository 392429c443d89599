"""Table profiling: ANALYZE-style per-column statistics.

Before pointing a 100-TB pipeline at a table you profile it -- row
counts, null rates, value ranges, cardinalities -- to size shuffles,
pick partition keys and catch schema rot.  The operator computes, for a
chosen set of int64 and string columns:

  (column, n, n_null, n_distinct, min_v, max_v)

where min_v/max_v are the value range for integer columns and the
LENGTH range for string columns (keeping one int64 output schema).

Scale shape: two map-only passes over the pruned columns --

- a stats fold emitting ONE fixed-size row per column per batch
  (counts + min/max, merged by keyed Sum/Min/Max: O(#columns) rows per
  task, no row ever shuffles);
- a cardinality pass emitting each batch's DISTINCT (column,
  value-hash) pairs, so the only shuffle moves distinct pairs.  String
  values enter as content hashes (collision odds ~n^2/2^64; the
  oracle's exact DISTINCT agrees at any realistic scale).

The two tiny results meet in a broadcast join keyed on the column name.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["profile_columns", "zscore_outliers", "mad_outliers",
           "key_skew_report"]

_I64MAX = np.iinfo(np.int64).max
_I64MIN = np.iinfo(np.int64).min


def profile_columns(ds, *, int_cols: list[str], str_cols: list[str]):
    """Profile the given columns of ``ds``; returns one row per column."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Count, Max, Min, Sum

    from equi7grid_ray.stages.dedup import (_column_bytes, _mix64,
                                            hash_bytes_offsets)
    from equi7grid_ray.stages.join import broadcast_join

    def stats_partials(batch: pa.Table) -> pa.Table:
        name, pn, pnull, pmin, pmax = [], [], [], [], []
        for c in int_cols:
            arr = batch.column(c)
            v = arr.drop_null().to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            name.append(c)
            pn.append(len(arr))
            pnull.append(arr.null_count)
            pmin.append(int(v.min()) if len(v) else _I64MAX)
            pmax.append(int(v.max()) if len(v) else _I64MIN)
        for c in str_cols:
            arr = batch.column(c)
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            lens = pc.utf8_length(arr).drop_null() \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            name.append(c)
            pn.append(len(arr))
            pnull.append(arr.null_count)
            pmin.append(int(lens.min()) if len(lens) else _I64MAX)
            pmax.append(int(lens.max()) if len(lens) else _I64MIN)
        return pa.table({
            "col": pa.array(name, pa.string()),
            "pn": pa.array(pn, pa.int64()),
            "pnull": pa.array(pnull, pa.int64()),
            "pmin": pa.array(pmin, pa.int64()),
            "pmax": pa.array(pmax, pa.int64()),
        })

    def distinct_partials(batch: pa.Table) -> pa.Table:
        names: list[str] = []
        vals: list[np.ndarray] = []
        for c in int_cols:
            v = batch.column(c).drop_null() \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            vals.append(_mix64(np.unique(v).view(np.uint64)).view(np.int64))
            names.append(c)
        for c in str_cols:
            arr = batch.column(c)
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            flat, offs = _column_bytes(arr.drop_null())
            vals.append(np.unique(hash_bytes_offsets(flat, offs)))
            names.append(c)
        col = np.concatenate([np.full(len(v), i, np.int64)
                              for i, v in enumerate(vals)]) \
            if vals else np.empty(0, np.int64)
        return pa.table({
            "col": pa.array([names[i] for i in col], pa.string()),
            "vh": pa.array(np.concatenate(vals) if vals
                           else np.empty(0, np.int64), pa.int64()),
        })

    from equi7grid_ray.stages.aggregate import hash_aggregate

    stats = hash_aggregate(
        ds.map_batches(stats_partials, batch_format="pyarrow"),
        keys=["col"],
        aggs={"n": ("pn", "sum"), "n_null": ("pnull", "sum"),
              "min_v": ("pmin", "min"), "max_v": ("pmax", "max")})
    ndv = hash_aggregate(
        hash_aggregate(
            ds.map_batches(distinct_partials, batch_format="pyarrow"),
            keys=["col", "vh"], aggs={"__c": ("vh", "count")}),
        keys=["col"], aggs={"n_distinct": ("vh", "count")})
    joined = broadcast_join(stats, ndv, on="col", how="left")

    def fill(batch: pa.Table) -> pa.Table:
        # an all-null column emits no distinct partials: n_distinct 0
        nd = pc.fill_null(batch.column("n_distinct"), 0).cast(pa.int64())
        batch = batch.set_column(
            batch.schema.get_field_index("n_distinct"), "n_distinct", nd)
        # an all-null column never contributes a real min/max partial, so
        # the +/-INT64 sentinels would surface; SQL min()/max() is NULL
        all_null = pc.equal(batch.column("n"), batch.column("n_null"))
        for name in ("min_v", "max_v"):
            col = pc.if_else(all_null, pa.scalar(None, pa.int64()),
                             batch.column(name).cast(pa.int64()))
            batch = batch.set_column(
                batch.schema.get_field_index(name), name, col)
        return batch

    return joined.map_batches(fill, batch_format="pyarrow")


def zscore_outliers(ds, *, key_col: str, val_col: str, id_col: str,
                    k: int = 2):
    """Per-group z-score outlier detection over an INTEGER column,
    computed exactly: row x of group g is an outlier when

        |x - mean_g| > k * stddev_g        (sample stddev)

    which, cleared of divisions, is (n*x - s)^2 * (n-1) > k^2 * n *
    (n*ss - s^2) with s = sum, ss = sum of squares -- pure integer
    arithmetic, so the flag is exact at any scale and hash-oracle-able
    against a HUGEINT SQL mirror (no float boundary flips).

    Scale shape: pass 1 folds per-batch (key, n, s, ss) partials --
    O(#keys) rows per task, nothing shuffles; the folded group table is
    broadcast (ray.put) and pass 2 flags rows vectorized.  The per-key
    threshold T = min integer with T^2*(n-1) > k^2*n*(n*ss - s^2) is
    found with arbitrary-precision driver ints (isqrt + local search),
    so the per-row compare is a single int64 |n*x - s| >= T gather --
    no 128-bit math in the hot path.

    Returns outlier rows ``(key_col, id_col, val_col)``.
    """
    import math

    import pandas as pd
    import ray

    from equi7grid_ray.arrowutil import collect_tables

    def partials(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "k": batch.column(key_col).to_pandas(),
            "v": batch.column(val_col).to_numpy(zero_copy_only=False)
            .astype(np.int64),
        })
        df["v2"] = df.v * df.v
        g = df.groupby("k", as_index=False).agg(
            n=("v", "size"), s=("v", "sum"), ss=("v2", "sum"))
        return pa.table({
            key_col: pa.array(g.k), "n": pa.array(g.n, pa.int64()),
            "s": pa.array(g.s, pa.int64()), "ss": pa.array(g.ss, pa.int64()),
        })

    part = collect_tables(
        ds.map_batches(partials, batch_format="pyarrow"),
        schema=None)
    pdf = part.to_pandas().groupby(key_col, as_index=False).agg(
        n=("n", "sum"), s=("s", "sum"), ss=("ss", "sum"))

    keys: list = []
    ns: list[int] = []
    ss_: list[int] = []
    ts: list[int] = []
    for row in pdf.itertuples(index=False):
        n, s, ss = int(row.n), int(row.s), int(row.ss)
        keys.append(getattr(row, key_col))
        ns.append(n)
        ss_.append(s)
        if n <= 1:
            ts.append(1 << 62)  # no variance defined: nothing flags
            continue
        c = k * k * n * (n * ss - s * s)  # exact Python int
        t = math.isqrt(max(c, 0) // (n - 1))
        while t * t * (n - 1) <= c:  # minimal T with T^2 (n-1) > C
            t += 1
        ts.append(t)

    order = np.argsort(np.asarray(keys, dtype=object), kind="stable")
    ref = ray.put((np.asarray(keys, dtype=object)[order],
                   np.asarray(ns, np.int64)[order],
                   np.asarray(ss_, np.int64)[order],
                   np.asarray(ts, np.int64)[order]))

    def flag(batch: pa.Table) -> pa.Table:
        gkeys, gn, gs, gt = ray.get(ref)
        bk = np.asarray(batch.column(key_col).to_pylist(), dtype=object)
        pos = np.searchsorted(gkeys, bk)
        x = batch.column(val_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        a = np.abs(gn[pos] * x - gs[pos])
        keep = a >= gt[pos]
        idx = pa.array(np.nonzero(keep)[0].astype(np.int64))
        return pa.table({
            key_col: batch.column(key_col).take(idx),
            id_col: batch.column(id_col).take(idx),
            val_col: batch.column(val_col).take(idx),
        })

    return ds.map_batches(flag, batch_format="pyarrow")


def mad_outliers(ds, *, key_col: str, val_col: str, id_col: str,
                 k: int = 3):
    """Per-group ROBUST outlier detection over an integer column via
    the median absolute deviation: row x of group g flags when

        |x - median_g| > k * MAD_g,   MAD = median(|x - median|)

    -- the estimator that, unlike the z-score, is not itself dragged by
    the outliers it hunts.  Both medians are the (n-1)//2-th order
    statistic (DuckDB's quantile_disc(0.5) convention), computed
    EXACTLY from per-group value histograms, so the flag is integer-
    exact and hash-oracle-able.

    Scale shape: one pass folds per-batch (key, value, count)
    histogram partials -- bounded by |keys| x |distinct values|, the
    right shape for bounded-range quality metrics (lengths, counts,
    scores); both order statistics and the thresholds come off the
    folded histogram driver-side; a broadcast (key -> med, cut) table
    drives the vectorized flag pass.  Returns ``(key, id, val)``.
    """
    import pandas as pd
    import ray

    from equi7grid_ray.arrowutil import collect_tables

    def partials(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "k": batch.column(key_col).to_pandas(),
            "v": batch.column(val_col).to_numpy(zero_copy_only=False)
            .astype(np.int64),
        })
        g = df.groupby(["k", "v"], as_index=False).size()
        return pa.table({
            key_col: pa.array(g.k), "v": pa.array(g.v, pa.int64()),
            "c": pa.array(g["size"], pa.int64()),
        })

    hist = collect_tables(
        ds.map_batches(partials, batch_format="pyarrow"), schema=None) \
        .to_pandas().groupby([key_col, "v"], as_index=False).agg(
            c=("c", "sum"))

    def _order_stat(vals: np.ndarray, cnts: np.ndarray, idx: int) -> int:
        order = np.argsort(vals, kind="stable")
        cum = np.cumsum(cnts[order])
        pos = np.searchsorted(cum, idx + 1)
        return int(vals[order][pos])

    keys, meds, cuts = [], [], []
    for key, g in hist.groupby(key_col, sort=False):
        vals = g.v.to_numpy()
        cnts = g.c.to_numpy()
        n = int(cnts.sum())
        med = _order_stat(vals, cnts, (n - 1) // 2)
        mad = _order_stat(np.abs(vals - med), cnts, (n - 1) // 2)
        keys.append(key)
        meds.append(med)
        cuts.append(k * mad)

    order = np.argsort(np.asarray(keys, dtype=object), kind="stable")
    ref = ray.put((np.asarray(keys, dtype=object)[order],
                   np.asarray(meds, np.int64)[order],
                   np.asarray(cuts, np.int64)[order]))

    def flag(batch: pa.Table) -> pa.Table:
        gkeys, gmed, gcut = ray.get(ref)
        bk = np.asarray(batch.column(key_col).to_pylist(), dtype=object)
        pos = np.searchsorted(gkeys, bk)
        x = batch.column(val_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        keep = np.abs(x - gmed[pos]) > gcut[pos]
        idx = pa.array(np.nonzero(keep)[0].astype(np.int64))
        return pa.table({
            key_col: batch.column(key_col).take(idx),
            id_col: batch.column(id_col).take(idx),
            val_col: batch.column(val_col).take(idx),
        })

    return ds.map_batches(flag, batch_format="pyarrow")


def key_skew_report(ds, *, key: str, qs: tuple[float, ...] = (0.5, 0.9)):
    """Shuffle-skew diagnostic for a prospective partition key: ONE
    row with the distinct-key count, total rows, the heaviest key and
    its count (ties -> smallest key), disc-quantiles of the group-size
    distribution, and the heaviest key's per-mille share -- the
    numbers that decide between plain hash partitioning, salting and
    broadcast before a groupby/join ships data.

    Shape: one combiner-first keyed count (the only row-bearing
    shuffle); every statistic then derives from the (key, n) table --
    group SIZES have few distinct values, so the quantiles ride the
    exact histogram operator, and the argmax folds from per-batch
    1-row partials."""
    import pandas as pd

    from equi7grid_ray.arrowutil import collect_tables
    from equi7grid_ray.stages.aggregate import hash_aggregate
    from equi7grid_ray.stages.quantiles import grouped_quantiles

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select([key]).group_by(key).aggregate([([], "count_all")])
        return pa.table({key: t.column(key),
                         "n": t.column("count_all")})

    counts = hash_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=[key], aggs={"n": ("n", "sum")},
    ).materialize()  # bounded by the key domain; reused 3x below

    qt = collect_tables(grouped_quantiles(counts, col="n", qs=qs))
    qv = dict(zip(qt.column("q").to_pylist(),
                  qt.column("v").to_pylist()))

    def amax(batch: pa.Table) -> pa.Table:
        n = batch.column("n").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        k = batch.column(key).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        order = np.lexsort((k, -n))
        j = order[0]
        return pa.table({
            "n_keys": pa.array([len(n)], pa.int64()),
            "n_rows": pa.array([int(n.sum())], pa.int64()),
            "max_n": pa.array([int(n[j])], pa.int64()),
            "heavy_key": pa.array([int(k[j])], pa.int64()),
        })

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((g["heavy_key"].to_numpy(),
                            -g["max_n"].to_numpy()))
        j = order[0]
        n_rows = int(g["n_rows"].sum())
        max_n = int(g["max_n"].iloc[j])
        out = {
            "n_keys": [int(g["n_keys"].sum())],
            "n_rows": [n_rows],
            "max_n": [max_n],
            "heavy_key": [int(g["heavy_key"].iloc[j])],
            "top1_pm": [max_n * 1000 // n_rows],
        }
        for q in qs:
            out[f"p{int(q * 100)}_n"] = [int(qv[q])]
        return pd.DataFrame(out)

    return counts.map_batches(amax, batch_format="pyarrow") \
        .repartition(1).map_batches(fold, batch_format="pandas",
                                    batch_size=None)
