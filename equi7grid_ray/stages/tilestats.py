"""Grid-level statistics over the per-tile scene stack: spatial
autocorrelation (Moran's I with rook adjacency on the T6 lattice) and
revisit cadence (acquisition-gap stats per tile).

Both ride the tile-assignment output (reference-side analogue: the
per-tile file inventory a resample_to_equi7_tiles archive produces,
reference warp.py:424-578).  Scale shape: the per-tile COUNT aggregate
is the only thing that ever shuffles; the Moran fold then runs over
the bounded tile table (<= ~27k T6 tiles globally -- the same bounded
materialization as the flagship tile histogram), with all arithmetic
in exact Python bigints so the SQL mirror is bit-identical (division
truncates toward zero, DuckDB's ``//`` rule).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from equi7grid_ray.stages.aggregate import hash_aggregate

__all__ = ["tile_moran", "tile_revisit", "tile_clusters", "tile_kring",
           "tile_erosion_depth", "tile_cost_distance", "coverage_gini"]


def _tdiv(a: int, b: int) -> int:
    """Truncate-toward-zero integer division (DuckDB ``//``)."""
    q = abs(a) // abs(b)
    return q if (a < 0) == (b < 0) else -q


def _parse_names(tiles: pd.Series) -> pd.DataFrame:
    """Vectorized tile-name parse: continent, easting (100 km units),
    SIGNED northing (S tiles negative, the v1.1 codec rule,
    reference core.py:109-132)."""
    cont = tiles.str[:2]
    te = tiles.str[4:7].astype(np.int64)
    tn = tiles.str[8:11].astype(np.int64)
    sign = np.where(tiles.str[7] == "S", -1, 1)
    return pd.DataFrame({"tile": tiles, "cont": cont, "te": te,
                         "tn": tn * sign})


def tile_moran(assigned, *, step: int = 6, q: int = 10**9,
               n_partitions: int = 32):
    """Moran's I of the per-tile scene count over rook-adjacent tiles
    (same continent, +/-``step`` in easting XOR northing; binary
    weights; universe = observed tiles).

        d_i = N*x_i - S   (N-scaled deviation, exact)
        I   = (N * sum_adj d_i d_j) / (W * sum d_i^2)

    reported as ``i_q9`` = trunc(1e9 * I).  Emits one row with the
    exact intermediates (n_tiles, w_pairs, num, den) so the oracle
    pins the whole computation, not just the quotient."""
    import pyarrow.compute as pc

    def ones(batch: pa.Table) -> pa.Table:
        # the assigner emits tile dictionary-encoded; decode for the
        # string-hash partition path
        return pa.table({
            "tile": pc.cast(batch.column("tile"), pa.string()),
            "one": pa.array(np.ones(batch.num_rows, np.int64)),
        })

    counts = hash_aggregate(
        assigned.map_batches(ones, batch_format="pyarrow"),
        keys=["tile"], aggs={"x": ("one", "sum")},
        n_partitions=n_partitions,
    )
    # bounded fold: <= |observed tiles| rows ever reach the driver
    df = counts.to_pandas()
    par = _parse_names(df["tile"].astype(str))
    par["x"] = df["x"].to_numpy()
    n = len(par)
    s = int(par["x"].sum())
    d = (n * par["x"].to_numpy(dtype=object) - s)
    par["d"] = d
    den = int(sum(int(v) * int(v) for v in d))
    # rook neighbours via two self-merges (E/W handled by +step only,
    # counted twice by symmetry -> double; same for N/S)
    east = par.copy()
    east["te"] = east["te"] + step
    me = par.merge(east, on=["cont", "te", "tn"], suffixes=("", "_b"))
    north = par.copy()
    north["tn"] = north["tn"] + step
    mn = par.merge(north, on=["cont", "te", "tn"], suffixes=("", "_b"))
    w = 2 * (len(me) + len(mn))
    num = 2 * (
        sum(int(a) * int(b) for a, b in zip(me["d"], me["d_b"]))
        + sum(int(a) * int(b) for a, b in zip(mn["d"], mn["d_b"]))
    )
    i_q9 = _tdiv(q * n * num, w * den) if w and den else 0
    out = pa.table({
        "n_tiles": pa.array([n], pa.int64()),
        "w_pairs": pa.array([w], pa.int64()),
        "num": pa.array([num], pa.int64()),
        "den": pa.array([den], pa.int64()),
        "i_q9": pa.array([i_q9], pa.int64()),
    })
    import ray.data as rd

    return rd.from_arrow(out)


def tile_revisit(assigned, *, n_partitions: int = 32):
    """Per-tile revisit cadence over the scene index (the acquisition
    -time stand-in): scene count, first/last index, and the largest
    gap between consecutive acquisitions (0 for single-scene tiles).

    One hash partition on tile, then ONE lexsort + reduceat pass per
    partition -- no per-group Python."""
    import pyarrow.compute as pc

    from equi7grid_ray.stages.aggregate import _key_parts

    def prep(batch: pa.Table) -> pa.Table:
        idx = pc.cast(
            pc.utf8_slice_codeunits(batch.column("image_id"), 3, 32),
            pa.int64(),
        )
        t = pa.table({"tile": pc.cast(batch.column("tile"), pa.string()),
                      "i": idx})
        return t.append_column(
            "__part", pa.array(_key_parts(t, ["tile"], n_partitions)))

    def cadence(g: pd.DataFrame) -> pd.DataFrame:
        tcode, tuniq = pd.factorize(g["tile"], sort=False)
        i = g["i"].to_numpy()
        order = np.lexsort((i, tcode))
        tc, i = tcode[order], i[order]
        new = np.empty(len(i), bool)
        new[0] = True
        new[1:] = tc[1:] != tc[:-1]
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, len(i)))
        gaps = np.empty(len(i), np.int64)
        gaps[0] = 0
        gaps[1:] = i[1:] - i[:-1]
        gaps[new] = 0  # boundary slots carry no gap
        return pd.DataFrame({
            "tile": tuniq.take(tc[starts]),
            "n_sc": counts.astype(np.int64),
            "i_min": i[starts],
            "i_max": i[starts + counts - 1],
            "max_gap": np.maximum.reduceat(gaps, starts),
        })

    return (
        assigned.map_batches(prep, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(cadence, batch_format="pandas")
    )


#: alphabetical continent order -- matches tile-name lexicographic order
_CONTS = ("AF", "AN", "AS", "EU", "NA", "OC", "SA")
_CONT_IDX = {c: k for k, c in enumerate(_CONTS)}


def _tile_node_ids(par: pd.DataFrame) -> np.ndarray:
    """Order-isomorphic int64 encoding of tile names (cont alphabetical,
    easting, hemisphere N<S, |northing| digits) -- the min node id of a
    component decodes back to the lexicographically-min tile name."""
    cont = par["cont"].map(_CONT_IDX).to_numpy(np.int64)
    te = par["te"].to_numpy(np.int64)
    tn = par["tn"].to_numpy(np.int64)
    hemi = (tn < 0).astype(np.int64)
    return ((cont * 1000 + te) * 2 + hemi) * 1000 + np.abs(tn)


def _node_to_tile(node: np.ndarray) -> list[str]:
    digits = node % 1000
    node = node // 1000
    hemi = node % 2
    node = node // 2
    te = node % 1000
    cont = node // 1000
    return [
        f"{_CONTS[int(c)]}_E{int(e):03d}{'S' if hm else 'N'}{int(dg):03d}T6"
        for c, e, hm, dg in zip(cont, te, hemi, digits)
    ]


def tile_clusters(assigned, *, step: int = 6, n_partitions: int = 32):
    """Connected clusters of observed tiles (rook adjacency on the T6
    lattice): the contiguous-coverage regions of an archive sweep.
    Emits per cluster: the lexicographically-min member tile as the
    cluster id, member-tile count, and total scene count.

    Shape: per-tile COUNT is the only row shuffle; adjacency edges are
    built over the bounded tile table (same bounded fold as tile_moran)
    and resolved by stages.graph.connected_components (numpy min-label
    fixpoint on this edge scale)."""
    import pyarrow.compute as pc

    import ray.data as rd

    from equi7grid_ray.stages.graph import connected_components

    def ones(batch: pa.Table) -> pa.Table:
        return pa.table({
            "tile": pc.cast(batch.column("tile"), pa.string()),
            "one": pa.array(np.ones(batch.num_rows, np.int64)),
        })

    counts = hash_aggregate(
        assigned.map_batches(ones, batch_format="pyarrow"),
        keys=["tile"], aggs={"x": ("one", "sum")},
        n_partitions=n_partitions,
    )
    df = counts.to_pandas()  # bounded: observed tiles
    par = _parse_names(df["tile"].astype(str))
    par["node"] = _tile_node_ids(par)
    par["x"] = df["x"].to_numpy()
    # rook edges via two shifted self-merges + self-loops (self-loops
    # keep isolated tiles as singleton components)
    east = par[["cont", "te", "tn", "node"]].copy()
    east["te"] = east["te"] + step
    me = par.merge(east, on=["cont", "te", "tn"], suffixes=("", "_b"))
    north = par[["cont", "te", "tn", "node"]].copy()
    north["tn"] = north["tn"] + step
    mn = par.merge(north, on=["cont", "te", "tn"], suffixes=("", "_b"))
    id_a = np.concatenate([par["node"].to_numpy(np.int64),
                           me["node"].to_numpy(np.int64),
                           mn["node"].to_numpy(np.int64)])
    id_b = np.concatenate([par["node"].to_numpy(np.int64),
                           me["node_b"].to_numpy(np.int64),
                           mn["node_b"].to_numpy(np.int64)])
    pairs = rd.from_arrow(pa.table({
        "id_a": pa.array(id_a, pa.int64()),
        "id_b": pa.array(id_b, pa.int64()),
    }))
    comp = connected_components(pairs).to_pandas()
    lab = dict(zip(comp["node"], comp["component"]))
    par["comp"] = par["node"].map(lab)
    agg = par.groupby("comp", as_index=False).agg(
        n_tiles=("node", "size"), n_scenes=("x", "sum"))
    return rd.from_arrow(pa.table({
        "comp_tile": pa.array(
            _node_to_tile(agg["comp"].to_numpy(np.int64)), pa.string()),
        "n_tiles": pa.array(agg["n_tiles"].to_numpy(np.int64), pa.int64()),
        "n_scenes": pa.array(agg["n_scenes"].to_numpy(np.int64), pa.int64()),
    }))


def tile_kring(assigned, *, radius_steps: int = 2, step: int = 6,
               n_partitions: int = 32):
    """K-ring neighborhood density on the T6 lattice: for every
    observed tile, how many observed same-continent tiles (and how
    many scenes) sit within Chebyshev distance ``radius_steps`` —
    itself included.  The halo-planning / coverage-density statistic
    (which tiles can run stencils without remote reads; where the
    archive is thin).

    Shape: the per-tile COUNT is the only row shuffle; the k-ring
    fold runs over the bounded tile table as (2r+1)^2 vectorized
    shifted merges (the tile_clusters pattern).  Emits
    (tile, n_nbrs, nbr_scenes)."""
    import pyarrow.compute as pc

    import ray.data as rd

    def ones(batch: pa.Table) -> pa.Table:
        return pa.table({
            "tile": pc.cast(batch.column("tile"), pa.string()),
            "one": pa.array(np.ones(batch.num_rows, np.int64)),
        })

    counts = hash_aggregate(
        assigned.map_batches(ones, batch_format="pyarrow"),
        keys=["tile"], aggs={"x": ("one", "sum")},
        n_partitions=n_partitions,
    )
    df = counts.to_pandas()  # bounded: observed tiles
    par = _parse_names(df["tile"].astype(str))
    par["x"] = df["x"].to_numpy()
    par["tile"] = df["tile"].to_numpy()
    n_nbrs = np.zeros(len(par), np.int64)
    nbr_sc = np.zeros(len(par), np.int64)
    base = par[["cont", "te", "tn", "x"]].copy()
    for dx in range(-radius_steps, radius_steps + 1):
        for dy in range(-radius_steps, radius_steps + 1):
            sh = base.copy()
            sh["te"] = sh["te"] + dx * step
            sh["tn"] = sh["tn"] + dy * step
            m = par.reset_index().merge(
                sh, on=["cont", "te", "tn"], suffixes=("", "_b"))
            idx = m["index"].to_numpy()
            n_nbrs[idx] += 1
            nbr_sc[idx] += m["x_b"].to_numpy(np.int64)
    return rd.from_arrow(pa.table({
        "tile": pa.array(par["tile"].to_numpy(), pa.string()),
        "n_nbrs": pa.array(n_nbrs, pa.int64()),
        "nbr_scenes": pa.array(nbr_sc, pa.int64()),
    }))


_COST_BIG = 1 << 40


def tile_cost_distance(assigned, *, rounds: int = 8, step: int = 6,
                       n_partitions: int = 32):
    """Least-cost distance over the observed T6 lattice (bounded
    Bellman-Ford -- the cost-distance / accessibility surface of
    raster GIS, run on tile granularity): seeds are each continent's
    busiest tiles (scene count == the continent max, dist 0); stepping
    INTO tile t over a rook edge costs

        w(t) = 1 + scene_count(t) % 4

    and dist relaxes for ``rounds`` synchronous rounds:

        d_k(t) = min(d_{k-1}(t), min over rook nbrs n of
                     d_{k-1}(n) + w(t))

    Tiles not reached within ``rounds`` report dist = -1.  All exact
    integers.

    Shape: the per-tile COUNT is the only row shuffle; the relaxation
    runs over the bounded observed-tile table with the 4 neighbor
    index maps precomputed once (merge -> gather), so each round is
    four numpy gathers.  The SQL mirror unrolls the same rounds as
    chained materialized CTEs with four LEFT JOINs each.  Emits
    (tile, w, dist)."""
    import pyarrow.compute as pc

    import ray.data as rd

    def ones(batch: pa.Table) -> pa.Table:
        return pa.table({
            "tile": pc.cast(batch.column("tile"), pa.string()),
            "one": pa.array(np.ones(batch.num_rows, np.int64)),
        })

    counts = hash_aggregate(
        assigned.map_batches(ones, batch_format="pyarrow"),
        keys=["tile"], aggs={"x": ("one", "sum")},
        n_partitions=n_partitions,
    )
    df = counts.to_pandas()  # bounded: observed tiles
    par = _parse_names(df["tile"].astype(str))
    x = df["x"].to_numpy(np.int64)
    w = 1 + x % 4
    cont_max = par.assign(x=x).groupby("cont")["x"].transform("max") \
        .to_numpy(np.int64)
    dist = np.where(x == cont_max, 0, _COST_BIG).astype(np.int64)
    # neighbor index maps: nbr[d][k] = row index of tile k's neighbor
    # in direction d, or -1
    key = pd.DataFrame({"cont": par["cont"], "te": par["te"],
                        "tn": par["tn"], "idx": np.arange(len(par))})
    nbrs = []
    for dx, dy in ((step, 0), (-step, 0), (0, step), (0, -step)):
        sh = key.copy()
        sh["te"] = sh["te"] + dx
        sh["tn"] = sh["tn"] + dy
        m = key.merge(sh, on=["cont", "te", "tn"], how="left",
                      suffixes=("", "_b"))
        nbrs.append(m["idx_b"].fillna(-1).to_numpy(np.int64))
    for _ in range(rounds):
        nd = dist.copy()
        for nb in nbrs:
            cand = np.where(nb >= 0, dist[nb] + w, _COST_BIG)
            nd = np.minimum(nd, cand)
        dist = nd
    out = np.where(dist >= _COST_BIG, -1, dist)
    return rd.from_arrow(pa.table({
        "tile": pa.array(df["tile"].to_numpy(), pa.string()),
        "w": pa.array(w, pa.int64()),
        "dist": pa.array(out, pa.int64()),
    }))


def tile_erosion_depth(tiles, *, step: int = 6, max_depth: int = 3):
    """Interior depth of the zone-tile lattice: the smallest Chebyshev
    ring d at which a tile's (2d+1)^2 same-continent neighborhood is
    no longer fully zone tiles (capped at ``max_depth`` + 1) — the
    morphological-erosion depth map of each continent's zone, which
    tells a scheduler how far from the projection boundary a stencil
    can run without edge handling.

    ``tiles``: the bounded zone inventory (export.tiles_table —
    O(thousands) rows planet-wide), folded with (2r+1)^2 shifted
    merges.  Emits (tile, n1, n2, n3, depth) where n_d counts zone
    tiles within Chebyshev d (self included)."""
    import ray.data as rd

    df = tiles.to_pandas()  # bounded: the zone inventory
    par = _parse_names(df["tile"].astype(str))
    counts = {d: np.zeros(len(par), np.int64)
              for d in range(1, max_depth + 1)}
    base = par[["cont", "te", "tn"]].copy()
    for dx in range(-max_depth, max_depth + 1):
        for dy in range(-max_depth, max_depth + 1):
            ring = max(abs(dx), abs(dy))
            sh = base.copy()
            sh["te"] = sh["te"] + dx * step
            sh["tn"] = sh["tn"] + dy * step
            m = par.reset_index().merge(sh, on=["cont", "te", "tn"])
            idx = m["index"].to_numpy()
            for d in range(max(1, ring), max_depth + 1):
                counts[d][idx] += 1
    full = {d: (2 * d + 1) ** 2 for d in counts}
    depth = np.full(len(par), max_depth + 1, np.int64)
    for d in range(max_depth, 0, -1):
        depth = np.where(counts[d] < full[d], d, depth)
    cols = {"tile": pa.array(par["tile"].to_numpy(), pa.string())}
    for d in counts:
        cols[f"n{d}"] = pa.array(counts[d], pa.int64())
    cols["depth"] = pa.array(depth, pa.int64())
    return rd.from_arrow(pa.table(cols))


def coverage_gini(assigned, *, n_partitions: int = 32):
    """Per-continent GINI COEFFICIENT of the per-tile scene counts --
    the coverage-equity statistic (0 = every observed tile revisited
    equally, ->1 = acquisitions piled on few tiles) that drives
    tasking/rebalancing decisions in EO mission planning.

    Exact integers, ascending-rank closed form over counts x_1<=...<=x_n:

        gini_num = 2 * sum(r * x_r) - (n + 1) * sum(x)
        gini_den = n * sum(x)
        gini_pm  = 1000 * gini_num // gini_den     (per mille, trunc)

    Equal counts may take any rank order: their contribution to
    sum(r * x_r) is permutation-invariant, so the statistic is
    deterministic without a tie rule.

    Shape: the ONLY shuffle is the per-tile COUNT (metadata);
    the fold runs per continent over the bounded tile table."""
    import pyarrow.compute as pc

    from equi7grid_ray.stages.aggregate import hash_aggregate

    counts = hash_aggregate(
        assigned.map_batches(
            lambda b: pa.table(
                {"tile": pc.cast(b.column("tile"), pa.string())}),
            batch_format="pyarrow"),
        keys=["tile"], aggs={"c": ("tile", "count")},
        n_partitions=n_partitions)

    def with_cont(b: pa.Table) -> pa.Table:
        return b.append_column(
            "cont", pc.utf8_slice_codeunits(b.column("tile"), 0, 2))

    def gini(g: pd.DataFrame) -> pd.DataFrame:
        c = np.sort(g["c"].to_numpy(np.int64))
        n = len(c)
        tot = int(c.sum())
        r = np.arange(1, n + 1, dtype=np.int64)
        num = int(2 * (r * c).sum()) - (n + 1) * tot
        den = n * tot
        return pd.DataFrame({
            "cont": [g["cont"].iloc[0]],
            "n_tiles": np.array([n], np.int64),
            "total": np.array([tot], np.int64),
            "gini_num": np.array([num], np.int64),
            "gini_den": np.array([den], np.int64),
            "gini_pm": np.array([_tdiv(1000 * num, den)], np.int64),
        })

    return (
        counts.map_batches(with_cont, batch_format="pyarrow")
        .groupby("cont")
        .map_groups(gini, batch_format="pandas")
    )


def zone_shape_metrics(tiles):
    """Lattice shape metrics of each continent's T6 projection zone:
    area (tile count), perimeter (count of tile edges facing non-zone
    -- ``sum(4 - n4)`` over the 4-neighborhood), and interior count
    (tiles with all four rook neighbours in-zone).  The discrete
    isoperimetric inputs a partitioner uses to predict halo-exchange
    cost per continent (perimeter/area = fraction of stencil work
    needing edge handling).

    ``tiles``: the bounded zone inventory (export.tiles_table); four
    shifted merges, one rollup -- the tile_erosion_depth fold pattern.
    SQL mirrors with a rook-neighbour self-join on tile-name
    arithmetic over the pinned tiles_t6 golden."""
    import ray.data as rd

    df = tiles.to_pandas()  # bounded: the zone inventory
    par = _parse_names(df["tile"].astype(str))
    n4 = np.zeros(len(par), np.int64)
    base = par[["cont", "te", "tn"]].copy()
    for dx, dy in ((6, 0), (-6, 0), (0, 6), (0, -6)):
        sh = base.copy()
        sh["te"] = sh["te"] + dx
        sh["tn"] = sh["tn"] + dy
        m = par.reset_index().merge(sh, on=["cont", "te", "tn"])
        n4[m["index"].to_numpy()] += 1
    g = par.assign(n4=n4).groupby("cont", as_index=False).agg(
        n_tiles=("tile", "size"),
        perimeter_edges=("n4", lambda s: int((4 - s).sum())),
        n_interior=("n4", lambda s: int((s == 4).sum())),
    )
    return rd.from_arrow(pa.table({
        "continent": pa.array(g["cont"].astype(str), pa.string()),
        "n_tiles": pa.array(g["n_tiles"].to_numpy(np.int64), pa.int64()),
        "perimeter_edges": pa.array(
            g["perimeter_edges"].to_numpy(np.int64), pa.int64()),
        "n_interior": pa.array(
            g["n_interior"].to_numpy(np.int64), pa.int64()),
    }))


def land_regions(tiles):
    """Connected land regions of the T6 lattice per continent (rook
    adjacency over ``covers_land`` tiles): region count, largest
    region size and land-tile count -- the archipelago census that
    sizes per-region work units (a region is the natural halo-exchange
    closure for land-only processing).

    Bounded fold over the zone inventory: 4 shifted merges build the
    adjacency, then a numpy min-label fixpoint (iterations <= lattice
    diameter of the largest region).  SQL mirrors reachability with a
    recursive CTE over the pinned tiles_t6 golden."""
    import ray.data as rd

    df = tiles.to_pandas()
    df = df[df["covers_land"].astype(bool)].reset_index(drop=True)
    par = _parse_names(df["tile"].astype(str))
    n = len(par)
    label = np.arange(n, dtype=np.int64)
    base = par[["cont", "te", "tn"]].reset_index()
    edges = []
    for dx, dy in ((6, 0), (0, 6)):
        sh = base.copy()
        sh["te"] = sh["te"] + dx
        sh["tn"] = sh["tn"] + dy
        m = base.merge(sh, on=["cont", "te", "tn"],
                       suffixes=("_a", "_b"))
        edges.append(np.stack([m["index_a"].to_numpy(np.int64),
                               m["index_b"].to_numpy(np.int64)], 1))
    e = np.concatenate(edges) if edges else np.zeros((0, 2), np.int64)
    while True:
        la = label[e[:, 0]]
        lb = label[e[:, 1]]
        mnl = np.minimum(la, lb)
        new = label.copy()
        np.minimum.at(new, e[:, 0], mnl)
        np.minimum.at(new, e[:, 1], mnl)
        new = new[new]  # pointer-double for faster convergence
        if np.array_equal(new, label):
            break
        label = new
    out = par.assign(root=label).groupby("cont")
    rows = []
    for c, g in out:
        sizes = g.groupby("root").size()
        rows.append((c, int(sizes.size), int(sizes.max()), int(len(g))))
    rows.sort()
    return rd.from_arrow(pa.table({
        "continent": pa.array([r[0] for r in rows], pa.string()),
        "n_regions": pa.array([r[1] for r in rows], pa.int64()),
        "largest_region": pa.array([r[2] for r in rows], pa.int64()),
        "n_land_tiles": pa.array([r[3] for r in rows], pa.int64()),
    }))


def coverage_churn(assigned, *, n_partitions: int = 16):
    """Two-epoch coverage churn per continent: which T6 tiles were
    observed in epoch 0 (even scene index) vs epoch 1 (odd), rolled up
    as kept / gained / lost tile counts -- the acquisition-coverage
    delta an EO operations dashboard tracks between collection cycles.

    One conditional-max keyed aggregate per (tile) with parity
    sentinels (the tile_change_detect trick on presence instead of
    value), then a bounded per-continent rollup."""
    import pyarrow.compute as pc

    from equi7grid_ray.stages.aggregate import hash_aggregate

    def parity(batch: pa.Table) -> pa.Table:
        ids = batch.column("image_id")
        if pa.types.is_dictionary(ids.type):
            ids = ids.cast(pa.string())
        i = pc.utf8_slice_codeunits(ids, 3, 15).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        ep = (i % 2).astype(np.int64)
        tile = batch.column("tile")
        if pa.types.is_dictionary(tile.type):
            tile = tile.cast(pa.string())
        return pa.table({
            "tile": tile,
            "e0": pa.array((ep == 0).astype(np.int64), pa.int64()),
            "e1": pa.array((ep == 1).astype(np.int64), pa.int64()),
        })

    per_tile = hash_aggregate(
        assigned.map_batches(parity, batch_format="pyarrow"),
        keys=["tile"], aggs={"h0": ("e0", "max"), "h1": ("e1", "max")},
        n_partitions=n_partitions)

    def states(batch: pa.Table) -> pa.Table:
        h0 = batch.column("h0").to_numpy()
        h1 = batch.column("h1").to_numpy()
        return pa.table({
            "continent": pc.utf8_slice_codeunits(batch.column("tile"),
                                                 0, 2),
            "n_e0": pa.array(h0.astype(np.int64), pa.int64()),
            "n_e1": pa.array(h1.astype(np.int64), pa.int64()),
            "kept": pa.array((h0 & h1).astype(np.int64), pa.int64()),
            "gained": pa.array((~h0.astype(bool) & h1.astype(bool))
                               .astype(np.int64), pa.int64()),
            "lost": pa.array((h0.astype(bool) & ~h1.astype(bool))
                             .astype(np.int64), pa.int64()),
        })

    return hash_aggregate(
        per_tile.map_batches(states, batch_format="pyarrow"),
        keys=["continent"],
        aggs={c: (c, "sum") for c in ("n_e0", "n_e1", "kept", "gained",
                                      "lost")},
        n_partitions=4)
