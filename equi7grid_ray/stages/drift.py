"""Distribution-drift detection between row groups.

The ML-ops gate a training-data pipeline runs before shipping a new
snapshot: has the feature distribution moved?  PSI's logarithm breaks
exact oracling, but Pearson's chi-squared homogeneity statistic is
rational — per (bucket i, group g):

    contrib = (obs*N - n_g*c_i)^2 / (N * n_g * c_i)

(obs = count in cell, n_g = group total, c_i = bucket total, N = grand
total; the classic (O-E)^2/E with E = n_g*c_i/N, denominators cleared)
— quantized exactly as ``chi2_q = floor(scale * num / den)`` per cell,
identically on both sides, so the operator is hash-oracle-able.

Buckets come from the EXACT global octiles (stages/quantiles.py, the
quantile_disc rule; dyadic q values so the IEEE rank math is identical
in numpy and DuckDB), bucket = count of edges strictly below the
value.  Shape: one bounded quantile fold, edges broadcast, per-batch
(bucket, group) count partials, one keyed aggregate over a <=
(edges+1) x groups cell table, then exact big-int scoring on that
bounded table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["chi2_drift", "OCTILES"]

OCTILES = (0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875)


def chi2_drift(ds, *, col: str, grp_col: str,
               qs: tuple[float, ...] = OCTILES, scale: int = 10**6):
    """Per-(bucket, group) observed counts + exact quantized
    chi-squared contributions.  Output:

        bucket, grp, obs, chi2_q
    """
    import ray

    from equi7grid_ray.arrowutil import collect_tables
    from equi7grid_ray.stages.aggregate import hash_aggregate
    from equi7grid_ray.stages.quantiles import grouped_quantiles

    et = collect_tables(
        grouped_quantiles(ds, col=col, qs=qs),
        schema=pa.schema([("q", pa.float64()), ("v", pa.int64())]))
    edf = et.to_pandas().sort_values("q")
    edges = np.sort(edf["v"].to_numpy(np.int64))
    e_ref = ray.put(edges)

    def partials(batch: pa.Table) -> pa.Table:
        ed = ray.get(e_ref)
        v = batch.column(col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        bucket = np.searchsorted(ed, v, side="left")  # edges < v count
        g = batch.column(grp_col).to_pylist()
        d = pd.DataFrame({"bucket": bucket, "grp": g})
        c = d.groupby(["bucket", "grp"], sort=False).size() \
            .reset_index(name="obs")
        return pa.table({
            "bucket": pa.array(c["bucket"].to_numpy(np.int64), pa.int64()),
            "grp": pa.array(c["grp"].astype(str).to_numpy(), pa.string()),
            "obs": pa.array(c["obs"].to_numpy(np.int64), pa.int64()),
        })

    cells = hash_aggregate(
        ds.map_batches(partials, batch_format="pyarrow"),
        keys=["bucket", "grp"], aggs={"obs": ("obs", "sum")},
        n_partitions=4)

    from equi7grid_ray.arrowutil import single_group

    def score(g: pd.DataFrame) -> pd.DataFrame:
        n_g = g.groupby("grp")["obs"].sum().to_dict()
        c_i = g.groupby("bucket")["obs"].sum().to_dict()
        big_n = int(g["obs"].sum())
        out = []
        for _, r in g.iterrows():  # bounded: buckets x groups cells
            obs, ng, ci = int(r.obs), int(n_g[r.grp]), int(c_i[r.bucket])
            num = scale * (obs * big_n - ng * ci) ** 2  # exact python ints
            out.append(num // (big_n * ng * ci))
        g = g.copy()
        g["chi2_q"] = np.asarray(out, np.int64)
        return g.sort_values(["bucket", "grp"]).reset_index(drop=True)

    return single_group(cells, score, ["bucket", "grp", "obs", "chi2_q"])
