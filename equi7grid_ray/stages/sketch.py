"""Distinct-count sketching (HyperLogLog) over a Ray Dataset column.

Exact COUNT(DISTINCT) is an all-to-all shuffle of every distinct key;
at 100 TB the sketch answer is the one you can afford: per-batch
register partials (O(m) output per batch, m = 2^p registers), merged
with an elementwise max -- the shuffle carries (bucket, rho) rows
capped at m per batch, never data rows.

Flajolet et al., "HyperLogLog: the analysis of a near-optimal
cardinality estimation algorithm", AofA 2007 -- with the 64-bit-hash
variant (Heule et al., EDB 2013) so the large-range correction is
unnecessary.

Determinism/oracle design (driver-gate parity):
- hash = the repo-wide splitmix64 finalizer (stages/dedup._mix64),
  already SQL-mirrored by sqlgen._mix64_ctes;
- register values are capped at ``rho_cap=40``: every 2^-register term
  is then a dyadic rational >= 2^-40, so EVERY partial sum of the
  indicator sum S fits a float64 mantissa exactly (count bits + 40 < 53
  for p <= 12) and the result is independent of summation order --
  numpy pairwise vs DuckDB sequential give bit-identical S.  The cap
  costs nothing in practice: rho > 40 needs ~2^40 items per bucket.
- the alpha_m bias constant is inlined as the same Python float literal
  on both sides, so E = alpha*m*m/S is the same two IEEE ops.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["hll_distinct", "hll_distinct_by", "alpha_m", "hll_sql",
           "hll_by_sql", "cms_heavy_hitters", "cms_sql"]

# golden-ratio multiples, the usual independent-row seeding
_CMS_SEEDS = tuple((0x9E3779B97F4A7C15 * (i + 1)) % (1 << 64)
                   for i in range(8))


def _u64(col: str) -> str:
    """SQL: int64 column -> UBIGINT with two's-complement wrap for
    negatives (matching numpy .view(np.uint64); a bare CAST raises on
    negative values in DuckDB)."""
    return (f"CAST(CASE WHEN {col} < 0 THEN {col}::HUGEINT + {1 << 64} "
            f"ELSE {col}::HUGEINT END AS UBIGINT)")


def alpha_m(m: int) -> float:
    """HLL bias-correction constant (Flajolet et al. Fig. 3)."""
    if m <= 16:
        return 0.673
    if m <= 32:
        return 0.697
    if m <= 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def _clz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros for uint64 (clz(0) = 64)."""
    r = np.zeros(x.shape, np.int64)
    y = x.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        m = y >= (np.uint64(1) << np.uint64(shift))
        r[m] += shift
        y = np.where(m, y >> np.uint64(shift), y)
    return np.where(x > np.uint64(0), 63 - r, 64)


def hll_distinct(ds, *, col: str, p: int = 8, rho_cap: int = 40):
    """Approximate COUNT(DISTINCT ``col``) (int64 column).

    Returns a 1-row Dataset: ``est`` (int64 estimate), ``nonzero``
    (int64 count of occupied registers -- a cheap integer checksum of
    the register state).  Applies the standard linear-counting
    correction below 2.5*m; callers needing SQL-oracle parity should
    size p so the data lands in the raw regime (see hll_sql)."""
    if not (4 <= p <= 12):
        raise ValueError("hll_distinct: p must be in [4, 12]")
    m = 1 << p
    alpha = alpha_m(m)

    from ray.data.aggregate import Max

    from equi7grid_ray.stages.dedup import _mix64

    def partials(batch: pa.Table) -> pa.Table:
        v = batch.column(col).drop_null().to_numpy(zero_copy_only=False)
        h = _mix64(v.astype(np.int64).view(np.uint64))
        bucket = (h >> np.uint64(64 - p)).astype(np.int64)
        rest = np.left_shift(h, np.uint64(p))
        rho = np.minimum(
            np.where(rest > 0, _clz64(rest) + 1, 64 - p + 1), rho_cap
        ).astype(np.int64)
        regs = np.zeros(m, np.int64)
        np.maximum.at(regs, bucket, rho)
        nz = np.flatnonzero(regs)
        return pa.table({"bucket": pa.array(nz, pa.int64()),
                         "rho": pa.array(regs[nz], pa.int64())})

    from equi7grid_ray.stages.aggregate import hash_aggregate

    regs = hash_aggregate(
        ds.map_batches(partials, batch_format="pyarrow"),
        keys=["bucket"], aggs={"rho": ("rho", "max")})

    def estimate(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g["bucket"] >= 0]  # drop the always-present sentinel row
        reg = g["rho"].to_numpy(dtype=np.int64)
        nonzero = len(reg)
        # dyadic-exact sum: order-independent (see module docstring)
        s = float(m - nonzero) + np.sum(np.ldexp(1.0, -reg))
        est = alpha * float(m * m) / s
        v_zero = m - nonzero
        if est <= 2.5 * m and v_zero > 0:
            est = m * np.log(m / float(v_zero))  # linear counting
        return pd.DataFrame({"est": [np.int64(round(est))],
                             "nonzero": [np.int64(nonzero)]})

    import ray.data as rd

    from equi7grid_ray.arrowutil import single_group

    # sentinel guarantees the reduction group exists even on an
    # empty/all-null input (1-row contract; est = 0 via linear counting)
    sentinel = rd.from_arrow(pa.table({
        "bucket": pa.array([-1], pa.int64()),
        "rho": pa.array([0], pa.int64()),
    }))
    return single_group(regs.union(sentinel), estimate, ["est", "nonzero"])


def hll_distinct_by(ds, *, key_col: str, col: str, p: int = 8,
                    rho_cap: int = 40):
    """Per-key approximate COUNT(DISTINCT ``col``): the keyed variant of
    :func:`hll_distinct` (distinct users per segment, distinct docs per
    source, ...).

    Scale shape: each batch folds into a dense (batch-keys x m) register
    matrix (one vectorized maximum.at) and emits only nonzero
    (key, bucket, rho) partials -- bounded by |keys| * m per batch, not
    by rows; ONE keyed Max shuffle merges them; a per-key map_groups
    computes the estimates.  Same dyadic-exact math as hll_distinct, so
    the SQL mirror (hll_by_sql) is hash-identical in the raw regime."""
    if not (4 <= p <= 12):
        raise ValueError("hll_distinct_by: p must be in [4, 12]")
    m = 1 << p
    alpha = alpha_m(m)

    from ray.data.aggregate import Max

    from equi7grid_ray.stages.dedup import _mix64

    def partials(batch: pa.Table) -> pa.Table:
        kcol = batch.column(key_col)
        if isinstance(kcol, pa.ChunkedArray):
            kcol = kcol.combine_chunks()
        mask = pc.and_(pc.is_valid(kcol), pc.is_valid(batch.column(col)))
        sub = batch.filter(mask)
        kd = sub.column(key_col)
        if isinstance(kd, pa.ChunkedArray):
            kd = kd.combine_chunks()
        kd = kd.dictionary_encode()
        codes = kd.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniq = kd.dictionary
        v = sub.column(col).to_numpy(zero_copy_only=False)
        h = _mix64(v.astype(np.int64).view(np.uint64))
        bucket = (h >> np.uint64(64 - p)).astype(np.int64)
        rest = np.left_shift(h, np.uint64(p))
        rho = np.minimum(
            np.where(rest > 0, _clz64(rest) + 1, 64 - p + 1), rho_cap
        ).astype(np.int64)
        regs = np.zeros((len(uniq), m), np.int64)
        np.maximum.at(regs, (codes, bucket), rho)
        ki, bi = np.nonzero(regs)
        return pa.table({
            key_col: uniq.take(pa.array(ki)).cast(pa.string()),
            "bucket": pa.array(bi, pa.int64()),
            "rho": pa.array(regs[ki, bi], pa.int64()),
        })

    from equi7grid_ray.stages.aggregate import hash_aggregate

    regs = hash_aggregate(
        ds.map_batches(partials, batch_format="pyarrow"),
        keys=[key_col, "bucket"], aggs={"rho": ("rho", "max")})

    def estimate(g: pd.DataFrame) -> pd.DataFrame:
        reg = g["rho"].to_numpy(dtype=np.int64)
        nonzero = len(reg)
        s = float(m - nonzero) + np.sum(np.ldexp(1.0, -reg))
        est = alpha * float(m * m) / s
        v_zero = m - nonzero
        if est <= 2.5 * m and v_zero > 0:
            est = m * np.log(m / float(v_zero))  # linear counting
        return pd.DataFrame({key_col: [g[key_col].iloc[0]],
                             "est": [np.int64(round(est))],
                             "nonzero": [np.int64(nonzero)]})

    return regs.groupby(key_col).map_groups(estimate, batch_format="pandas")


def hll_by_sql(table: str, key: str, col: str, p: int = 8,
               rho_cap: int = 40) -> str:
    """DuckDB mirror of hll_distinct_by's RAW regime (see hll_sql)."""
    from equi7grid_ray.sqlgen import _bit_values, _mix64_ctes

    m = 1 << p
    alpha = alpha_m(m)
    two_rest = 1 << (64 - p)
    return f"""
WITH src AS (SELECT {key} AS gk, {_u64(col)} AS k FROM {table}
             WHERE {col} IS NOT NULL AND {key} IS NOT NULL),
{_mix64_ctes('src', 'k', 'gk')},
parts AS (SELECT gk, CAST(h // {two_rest} AS BIGINT) AS bucket,
                 CAST((h % {two_rest})::HUGEINT * {1 << p} AS UBIGINT) AS rest
          FROM mixed),
bits(b, pw) AS (VALUES {_bit_values()}),
rho AS (SELECT gk, bucket,
               CASE WHEN rest = 0 THEN {64 - p + 1}
                    ELSE 64 - max(CASE WHEN (rest // pw) % 2 = 1 THEN b END)
               END AS rho
        FROM parts, bits GROUP BY gk, bucket, rest),
regs AS (SELECT gk, bucket, least(max(rho), {rho_cap}) AS rho
         FROM rho GROUP BY gk, bucket),
s AS (SELECT gk, CAST({m} - count(*) AS DOUBLE) + sum(pow(2.0, -rho)) AS s,
             count(*) AS nonzero FROM regs GROUP BY gk)
SELECT gk AS {key},
       CAST(round(CAST({alpha!r} AS DOUBLE) * CAST({m * m} AS DOUBLE) / s) AS BIGINT) AS est,
       CAST(nonzero AS BIGINT) AS nonzero FROM s"""


def hll_sql(table: str, col: str, p: int = 8, rho_cap: int = 40) -> str:
    """DuckDB mirror of hll_distinct's RAW regime (no linear-counting
    branch: pick p so E > 2.5*m on the oracle input; ln() parity across
    libm implementations is not guaranteed, everything here is exact
    integer/dyadic math plus the same two IEEE float ops)."""
    from equi7grid_ray.sqlgen import _bit_values, _mix64_ctes

    m = 1 << p
    alpha = alpha_m(m)
    two_rest = 1 << (64 - p)
    return f"""
WITH src AS (SELECT {_u64(col)} AS k FROM {table} WHERE {col} IS NOT NULL),
{_mix64_ctes('src', 'k', 'k')},
parts AS (SELECT CAST(h // {two_rest} AS BIGINT) AS bucket,
                 CAST((h % {two_rest})::HUGEINT * {1 << p} AS UBIGINT) AS rest
          FROM mixed),
bits(b, pw) AS (VALUES {_bit_values()}),
rho AS (SELECT bucket,
               CASE WHEN rest = 0 THEN {64 - p + 1}
                    ELSE 64 - max(CASE WHEN (rest // pw) % 2 = 1 THEN b END)
               END AS rho
        FROM parts, bits GROUP BY bucket, rest),
regs AS (SELECT bucket, least(max(rho), {rho_cap}) AS rho
         FROM rho GROUP BY bucket),
s AS (SELECT CAST({m} - count(*) AS DOUBLE) + sum(pow(2.0, -rho)) AS s,
             count(*) AS nonzero FROM regs)
SELECT CAST(round(CAST({alpha!r} AS DOUBLE) * CAST({m * m} AS DOUBLE) / s) AS BIGINT) AS est,
       CAST(nonzero AS BIGINT) AS nonzero FROM s"""


def cms_heavy_hitters(ds, candidates, *, col: str, d: int = 4,
                      w: int = 1024, topk: int = 20):
    """Count-min-sketch heavy hitters: estimated per-key counts of
    ``col`` in ``ds`` for a (small) candidate key Dataset, top-``topk``
    by estimate.

    Scale shape: the big side never shuffles rows -- each batch folds
    into a dense d*w counter vector (np.add.at) and emits only its
    nonzero slots, merged by a fixed-size groupby; the finished sketch
    (d*w int64, ~32 KB) is broadcast to the candidate-scoring stage.
    est(k) = min over rows i of counter[i][hash_i(k)] (Cormode &
    Muthukrishnan, J. Algorithms 2005): an overestimate with error
    <= eps*N at w = e/eps, never an underestimate.

    All-integer math -> the DuckDB mirror (cms_sql) is hash-exact.
    Ties in the top-k are broken by key ascending, so the cut is
    deterministic on both sides."""
    if d > len(_CMS_SEEDS):
        raise ValueError(f"cms_heavy_hitters: d <= {len(_CMS_SEEDS)}")
    from ray.data.aggregate import Sum

    from equi7grid_ray.stages.dedup import _mix64

    seeds = np.array(_CMS_SEEDS[:d], np.uint64)

    def partials(batch: pa.Table) -> pa.Table:
        v = batch.column(col).drop_null().to_numpy(zero_copy_only=False)
        k = v.astype(np.int64).view(np.uint64)
        slots = np.concatenate([
            i * w + (_mix64(k ^ seeds[i]) % np.uint64(w)).astype(np.int64)
            for i in range(d)
        ]) if len(k) else np.empty(0, np.int64)
        counts = np.bincount(slots, minlength=d * w)
        nz = np.flatnonzero(counts)
        return pa.table({"slot": pa.array(nz, pa.int64()),
                         "c": pa.array(counts[nz], pa.int64())})

    from equi7grid_ray.arrowutil import collect_tables

    from equi7grid_ray.stages.aggregate import hash_aggregate

    sketch_tbl = collect_tables(
        hash_aggregate(ds.map_batches(partials, batch_format="pyarrow"),
                       keys=["slot"], aggs={"c": ("c", "sum")}),
        schema=pa.schema([("slot", pa.int64()), ("c", pa.int64())]),
    )
    # fixed-size sketch (d*w slots) -- safe to hold driver-side at any
    # input scale, then ship once per scoring actor
    counters = np.zeros(d * w, np.int64)
    counters[sketch_tbl.column("slot").to_numpy()] = (
        sketch_tbl.column("c").to_numpy())

    class _Score:
        def __init__(self, counters: np.ndarray):
            self.counters = counters

        def __call__(self, batch: pa.Table) -> pa.Table:
            v = batch.column(col).drop_null().to_numpy(zero_copy_only=False)
            k = v.astype(np.int64).view(np.uint64)
            est = np.full(len(k), np.iinfo(np.int64).max, np.int64)
            for i in range(d):
                h = _mix64(k ^ seeds[i]) % np.uint64(w)
                est = np.minimum(
                    est, self.counters[i * w + h.astype(np.int64)])
            return pa.table({col: pa.array(v), "est": pa.array(est)})

    scored = candidates.map_batches(
        _Score, fn_constructor_kwargs=dict(counters=counters),
        batch_format="pyarrow", concurrency=(1, 4), num_cpus=1,
    )
    return scored.sort(["est", col], descending=[True, False]).limit(topk)


def cms_sql(table: str, col: str, d: int = 4, w: int = 1024,
            topk: int = 20) -> str:
    """DuckDB mirror of cms_heavy_hitters with the candidate set =
    DISTINCT keys of the same table (what the driver query uses)."""
    from equi7grid_ray.sqlgen import _mix64_ctes

    seeds = ", ".join(
        f"({i}, {s}::UBIGINT)" for i, s in enumerate(_CMS_SEEDS[:d]))
    return f"""
WITH src AS (SELECT {_u64(col)} AS k FROM {table}
             WHERE {col} IS NOT NULL),
seeds(i, s) AS (VALUES {seeds}),
x AS (SELECT k, i, xor(k, s) AS x0 FROM src, seeds),
{_mix64_ctes('x', 'x0', 'k, i')},
counters AS (SELECT CAST(i AS BIGINT) * {w} + CAST(h % {w} AS BIGINT)
                 AS slot, count(*) AS c
             FROM mixed GROUP BY slot),
cand AS (SELECT DISTINCT k FROM src),
cx AS (SELECT k, i, xor(k, s) AS cx0 FROM cand, seeds),
{_mix64_ctes('cx', 'cx0', 'k, i', prefix='n')},
probes AS (SELECT k, CAST(i AS BIGINT) * {w} + CAST(h % {w} AS BIGINT)
               AS slot FROM nixed),
est AS (SELECT p.k AS k, min(co.c) AS est
        FROM probes p JOIN counters co ON p.slot = co.slot GROUP BY p.k)
SELECT CAST(k AS BIGINT) AS {col}, CAST(est AS BIGINT) AS est
FROM est ORDER BY est DESC, k LIMIT {topk}"""


def hll_set_algebra(ds, *, key_col: str, col: str, p: int = 4,
                    rho_cap: int = 40):
    """HyperLogLog SET ALGEBRA across key groups: for every unordered
    key pair, the RAW-estimator cardinalities of each side, of their
    union (register-wise max -- the lossless HLL merge) and the
    inclusion-exclusion intersection estimate ``est_a + est_b -
    est_union`` (signed; sketch noise can push small overlaps
    negative).  This is the audience-overlap / segment-intersection
    primitive a sketch store answers without touching raw rows.

    The RAW estimator is used on BOTH sides of every estimate -- the
    linear-counting branch does not distribute over register merges,
    so sketch algebra is defined raw-regime only (size p to the data;
    mirrors hll_sql's parity note).  Shape: same bounded
    (key, bucket, rho) Max-merge as hll_distinct_by, then one fold
    over the |keys| x m register table.  Output: ``key_a, key_b,
    est_a, est_b, est_union, est_intersection``."""
    if not (4 <= p <= 12):
        raise ValueError("hll_set_algebra: p must be in [4, 12]")
    m = 1 << p
    alpha = alpha_m(m)

    from equi7grid_ray.arrowutil import single_group
    from equi7grid_ray.stages.aggregate import hash_aggregate
    from equi7grid_ray.stages.dedup import _mix64

    def partials(batch: pa.Table) -> pa.Table:
        kcol = batch.column(key_col)
        if isinstance(kcol, pa.ChunkedArray):
            kcol = kcol.combine_chunks()
        mask = pc.and_(pc.is_valid(kcol), pc.is_valid(batch.column(col)))
        sub = batch.filter(mask)
        kd = sub.column(key_col)
        if isinstance(kd, pa.ChunkedArray):
            kd = kd.combine_chunks()
        kd = kd.dictionary_encode()
        codes = kd.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniq = kd.dictionary
        v = sub.column(col).to_numpy(zero_copy_only=False)
        h = _mix64(v.astype(np.int64).view(np.uint64))
        bucket = (h >> np.uint64(64 - p)).astype(np.int64)
        rest = np.left_shift(h, np.uint64(p))
        rho = np.minimum(
            np.where(rest > 0, _clz64(rest) + 1, 64 - p + 1), rho_cap
        ).astype(np.int64)
        regs = np.zeros((len(uniq), m), np.int64)
        np.maximum.at(regs, (codes, bucket), rho)
        ki, bi = np.nonzero(regs)
        return pa.table({
            key_col: uniq.take(pa.array(ki)).cast(pa.string()),
            "bucket": pa.array(bi, pa.int64()),
            "rho": pa.array(regs[ki, bi], pa.int64()),
        })

    regs = hash_aggregate(
        ds.map_batches(partials, batch_format="pyarrow"),
        keys=[key_col, "bucket"], aggs={"rho": ("rho", "max")})

    def raw_est(reg_vec: np.ndarray) -> np.int64:
        nonzero = int((reg_vec > 0).sum())
        s = float(m - nonzero) + float(np.sum(np.ldexp(1.0, -reg_vec[reg_vec > 0])))
        return np.int64(round(alpha * float(m * m) / s))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        keys = sorted(g[key_col].unique())
        dense = {k: np.zeros(m, np.int64) for k in keys}
        for k, b, r in zip(g[key_col], g["bucket"], g["rho"]):
            dense[k][int(b)] = int(r)
        rows = []
        for i, ka in enumerate(keys):
            for kb in keys[i + 1:]:
                ea = raw_est(dense[ka])
                eb = raw_est(dense[kb])
                eu = raw_est(np.maximum(dense[ka], dense[kb]))
                rows.append((ka, kb, ea, eb, eu, ea + eb - eu))
        return pd.DataFrame(rows, columns=[
            "key_a", "key_b", "est_a", "est_b", "est_union",
            "est_intersection"]).astype({
                c: np.int64 for c in ("est_a", "est_b", "est_union",
                                      "est_intersection")})

    return single_group(regs, fold,
                        ["key_a", "key_b", "est_a", "est_b",
                         "est_union", "est_intersection"])


def hll_pair_sql(table: str, key: str, col: str, p: int = 4,
                 rho_cap: int = 40) -> str:
    """DuckDB mirror of hll_set_algebra (RAW regime; see hll_sql)."""
    from equi7grid_ray.sqlgen import _bit_values, _mix64_ctes

    m = 1 << p
    alpha = alpha_m(m)
    two_rest = 1 << (64 - p)
    return f"""
WITH src AS (SELECT {key} AS gk, {_u64(col)} AS k FROM {table}
             WHERE {col} IS NOT NULL AND {key} IS NOT NULL),
{_mix64_ctes('src', 'k', 'gk')},
parts AS (SELECT gk, CAST(h // {two_rest} AS BIGINT) AS bucket,
                 CAST((h % {two_rest})::HUGEINT * {1 << p} AS UBIGINT) AS rest
          FROM mixed),
bits(b, pw) AS (VALUES {_bit_values()}),
rho AS (SELECT gk, bucket,
               CASE WHEN rest = 0 THEN {64 - p + 1}
                    ELSE 64 - max(CASE WHEN (rest // pw) % 2 = 1 THEN b END)
               END AS rho
        FROM parts, bits GROUP BY gk, bucket, rest),
regs AS (SELECT gk, bucket, least(max(rho), {rho_cap}) AS rho
         FROM rho GROUP BY gk, bucket),
est1 AS (SELECT gk,
    CAST(round(CAST({alpha!r} AS DOUBLE) * CAST({m * m} AS DOUBLE) /
      (CAST({m} - count(*) AS DOUBLE) + sum(pow(2.0, -rho)))) AS BIGINT)
      AS est
  FROM regs GROUP BY gk),
pairs AS (
  SELECT a.gk AS key_a, b.gk AS key_b
  FROM (SELECT DISTINCT gk FROM regs) a
  JOIN (SELECT DISTINCT gk FROM regs) b ON a.gk < b.gk),
uregs AS (
  SELECT p.key_a, p.key_b, r.bucket, max(r.rho) AS rho
  FROM pairs p JOIN regs r ON r.gk = p.key_a OR r.gk = p.key_b
  GROUP BY p.key_a, p.key_b, r.bucket),
uest AS (SELECT key_a, key_b,
    CAST(round(CAST({alpha!r} AS DOUBLE) * CAST({m * m} AS DOUBLE) /
      (CAST({m} - count(*) AS DOUBLE) + sum(pow(2.0, -rho)))) AS BIGINT)
      AS est_union
  FROM uregs GROUP BY key_a, key_b)
SELECT u.key_a, u.key_b, ea.est AS est_a, eb.est AS est_b,
       u.est_union, (ea.est + eb.est - u.est_union)::BIGINT
         AS est_intersection
FROM uest u JOIN est1 ea ON ea.gk = u.key_a
JOIN est1 eb ON eb.gk = u.key_b"""
