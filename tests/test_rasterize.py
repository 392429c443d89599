"""Polygon rasterization: exact-integer PIP vs an independent
half-plane reference (valid for convex rings), crafted rectangles."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from equi7grid_ray.stages.rasterize import (point_in_polygon_mask,
                                            rasterize_polygons)


def _convex_inside(px, py, vx, vy):
    """Strict-interior test for a convex CCW ring via cross products
    (an entirely different algorithm from ray casting).  Boundary
    points are NOT classified consistently with parity rules, so
    callers must avoid exact-boundary probes."""
    inside = np.ones(len(px), dtype=bool)
    n = len(vx)
    for e in range(n):
        x1, y1 = int(vx[e]), int(vy[e])
        x2, y2 = int(vx[(e + 1) % n]), int(vy[(e + 1) % n])
        cross = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
        inside &= cross > 0
    return inside


def test_pip_matches_halfplane_on_random_octagons():
    dx = np.array([2, 1, 0, -1, -2, -1, 0, 1])
    dy = np.array([0, 1, 2, 1, 0, -1, -2, -1])
    rng = np.random.default_rng(5)
    for _ in range(20):
        cx, cy = rng.integers(100, 900, 2)
        r = int(rng.integers(5, 80))
        vx = cx + r * dx
        vy = cy + r * dy
        px = rng.integers(0, 500, 400) * 2 + 1
        py = rng.integers(0, 500, 400) * 2 + 1
        # the two algorithms only agree OFF the boundary; drop probes
        # exactly on an edge segment (collinear + inside its bbox)
        on_edge = np.zeros(len(px), dtype=bool)
        for e in range(8):
            x1, y1 = int(vx[e]), int(vy[e])
            x2, y2 = int(vx[(e + 1) % 8]), int(vy[(e + 1) % 8])
            coll = (x2 - x1) * (py - y1) == (y2 - y1) * (px - x1)
            inb = ((px >= min(x1, x2)) & (px <= max(x1, x2))
                   & (py >= min(y1, y2)) & (py <= max(y1, y2)))
            on_edge |= coll & inb
        keep = ~on_edge
        got = point_in_polygon_mask(px[keep], py[keep], vx, vy)
        exp = _convex_inside(px[keep], py[keep], vx, vy)
        np.testing.assert_array_equal(got, exp)


def test_pip_rectangle_counts_exact():
    # rectangle [10, 30] x [20, 50]: the parity rule closes the
    # bottom/left boundary and opens the top/right -- spans test
    # (y1 > py) != (y2 > py) admits py in [20, 50); the crossing
    # inequality is strict, so px in [10, 30)
    vx = np.array([10, 30, 30, 10])
    vy = np.array([20, 20, 50, 50])
    xs, ys = np.meshgrid(np.arange(0, 40), np.arange(0, 60))
    px, py = xs.ravel(), ys.ravel()
    got = point_in_polygon_mask(px, py, vx, vy)
    inside_x = (px >= 10) & (px < 30)
    inside_y = (py >= 20) & (py < 50)
    np.testing.assert_array_equal(got, inside_x & inside_y)


def test_pip_horizontal_edges_ignored():
    # degenerate: a triangle with one horizontal edge must not crash
    vx = np.array([0, 10, 5])
    vy = np.array([0, 0, 10])
    px = np.array([5, 5, -3])
    py = np.array([3, 11, 3])
    got = point_in_polygon_mask(px, py, vx, vy)
    np.testing.assert_array_equal(got, [True, False, False])


def test_rasterize_polygons_end_to_end(ray_session):
    # one 64x64 square over a unit grid: count is exact
    polys = pa.table({
        "poly_id": pa.array([7], pa.int64()),
        "vx": pa.array([[8, 72, 72, 8]], pa.list_(pa.int64())),
        "vy": pa.array([[8, 8, 72, 72]], pa.list_(pa.int64())),
    })

    def to_cells(batch: pa.Table) -> pa.Table:
        i = batch.column("id").to_numpy()
        return pa.table({
            "px": pa.array(i // 100, pa.int64()),
            "py": pa.array(i % 100, pa.int64()),
        })

    cells = rd.range(10_000).map_batches(to_cells, batch_format="pyarrow")
    out = rasterize_polygons(cells, polys).to_pandas()
    assert len(out) == 1
    row = out.iloc[0]
    # x in [8, 72), y in [8, 72) per the parity rule above
    assert row.poly_id == 7
    assert row.n_cells == 64 * 64
    assert row.sum_px == sum(range(8, 72)) * 64
    assert row.sum_py == sum(range(8, 72)) * 64


def test_rasterize_no_hit_polygon_absent(ray_session):
    polys = pa.table({
        "poly_id": pa.array([1], pa.int64()),
        "vx": pa.array([[1000, 1002, 1001]], pa.list_(pa.int64())),
        "vy": pa.array([[1000, 1000, 1002]], pa.list_(pa.int64())),
    })

    def to_cells(batch: pa.Table) -> pa.Table:
        i = batch.column("id").to_numpy()
        return pa.table({"px": pa.array(i, pa.int64()),
                         "py": pa.array(i, pa.int64())})

    cells = rd.range(100).map_batches(to_cells, batch_format="pyarrow")
    assert rasterize_polygons(cells, polys).count() == 0


def test_poly_stats_known_square(ray_session):
    # CCW unit-order square (0,0)(4,0)(4,4)(0,4): A=16, area2=32,
    # centroid (2,2) -> cx6a = 3*area2*2 = 192
    polys = pa.table({
        "poly_id": pa.array([1], pa.int64()),
        "vx": pa.array([[0, 4, 4, 0]], pa.list_(pa.int64())),
        "vy": pa.array([[0, 0, 4, 4]], pa.list_(pa.int64())),
    })
    from equi7grid_ray.stages.rasterize import poly_stats

    out = poly_stats(rd.from_arrow(polys)).to_pandas().iloc[0]
    assert out.nv == 4 and out.area2 == 32
    assert out.edge_sq == 4 * 16
    assert out.cx6a == 3 * 32 * 2 and out.cy6a == 3 * 32 * 2
    assert (out.min_x, out.max_x, out.min_y, out.max_y) == (0, 4, 0, 4)


def test_poly_stats_orientation_flips_sign(ray_session):
    from equi7grid_ray.stages.rasterize import poly_stats

    polys = pa.table({
        "poly_id": pa.array([1, 2], pa.int64()),
        "vx": pa.array([[0, 4, 4, 0], [0, 0, 4, 4]], pa.list_(pa.int64())),
        "vy": pa.array([[0, 0, 4, 4], [0, 4, 4, 0]], pa.list_(pa.int64())),
    })
    out = (poly_stats(rd.from_arrow(polys)).to_pandas()
           .sort_values("poly_id").reset_index(drop=True))
    assert out.area2[0] == 32 and out.area2[1] == -32


def test_poly_stats_sliced_list_array():
    """The offsets-rebase path: run the batch fn on a SLICE of a larger
    list array (values buffer extends past the slice on both sides)."""
    from equi7grid_ray.stages.rasterize import poly_stats as _ps  # noqa: F401
    import ray.data  # noqa: F401  (stage fn is reached through map_batches)
    from equi7grid_ray.stages import rasterize

    full = pa.table({
        "poly_id": pa.array([0, 1, 2], pa.int64()),
        "vx": pa.array([[9, 9, 9], [0, 4, 4, 0], [7, 7, 7]],
                       pa.list_(pa.int64())),
        "vy": pa.array([[9, 9, 9], [0, 0, 4, 4], [7, 7, 7]],
                       pa.list_(pa.int64())),
    })
    sliced = full.slice(1, 1)
    # invoke the inner map_batches fn directly via a tiny local dataset
    import ray.data as rdl

    out = rasterize.poly_stats(rdl.from_arrow(sliced)).to_pandas().iloc[0]
    assert out.poly_id == 1 and out.area2 == 32


def test_rasterize_zonal_values(ray_session):
    """value_col turns rasterization into zonal stats: sum/max of the
    cell value over each polygon footprint."""
    polys = pa.table({
        "poly_id": pa.array([1], pa.int64()),
        "vx": pa.array([[0, 10, 10, 0]], pa.list_(pa.int64())),
        "vy": pa.array([[0, 0, 10, 10]], pa.list_(pa.int64())),
    })

    def to_cells(batch: pa.Table) -> pa.Table:
        i = batch.column("id").to_numpy()
        return pa.table({
            "px": pa.array(i // 20, pa.int64()),
            "py": pa.array(i % 20, pa.int64()),
            "v": pa.array(i * 3, pa.int64()),
        })

    cells = rd.range(400).map_batches(to_cells, batch_format="pyarrow")
    out = rasterize_polygons(cells, polys, value_col="v").to_pandas()
    # inside: px, py in [0, 10) -> i = 20*px + py
    exp_cells = [(x, y) for x in range(10) for y in range(10)]
    exp_v = [3 * (20 * x + y) for x, y in exp_cells]
    row = out.iloc[0]
    assert row.n_cells == 100
    assert row.sum_v == sum(exp_v)
    assert row.max_v == max(exp_v)


def test_rect_overlap_join_matches_brute(ray_session):
    """PBSM rectangle join vs O(n^2), rects spanning multiple cells."""
    from equi7grid_ray.stages.neighbors import rect_overlap_join

    rng = np.random.default_rng(17)
    n = 400
    x0 = rng.integers(0, 2000, n).astype(np.int64)
    y0 = rng.integers(0, 2000, n).astype(np.int64)
    x1 = x0 + rng.integers(1, 600, n)   # up to 600 wide vs 256 cells:
    y1 = y0 + rng.integers(1, 600, n)   # rects span up to 3x3 cells
    rects = pa.table({
        "id": pa.array(np.arange(n), pa.int64()),
        "x0": pa.array(x0), "x1": pa.array(x1),
        "y0": pa.array(y0), "y1": pa.array(y1),
    })
    got_df = rect_overlap_join(rd.from_arrow(rects),
                               cell_shift=8).to_pandas()
    got = {(a, b): v for a, b, v in
           zip(got_df.id_a, got_df.id_b, got_df.ov_area)}
    exp = {}
    for i in range(n):
        for j in range(i + 1, n):
            ox = min(x1[i], x1[j]) - max(x0[i], x0[j])
            oy = min(y1[i], y1[j]) - max(y0[i], y0[j])
            if ox > 0 and oy > 0:
                exp[(i, j)] = int(ox * oy)
    assert got == exp


def test_rect_overlap_touching_edges_excluded(ray_session):
    from equi7grid_ray.stages.neighbors import rect_overlap_join

    rects = pa.table({
        "id": pa.array([1, 2, 3], pa.int64()),
        "x0": pa.array([0, 10, 5], pa.int64()),
        "x1": pa.array([10, 20, 6], pa.int64()),
        "y0": pa.array([0, 0, 0], pa.int64()),
        "y1": pa.array([10, 10, 10], pa.int64()),
    })
    got = rect_overlap_join(rd.from_arrow(rects), cell_shift=3).to_pandas()
    # 1|2 touch at x=10 (no area); 3 sits inside 1 only
    assert set(zip(got.id_a, got.id_b)) == {(1, 3)}
    assert got.ov_area.tolist() == [10]


def test_rasterize_majority_mode_and_tie(ray_session):
    from equi7grid_ray.stages.rasterize import rasterize_majority

    polys = pa.table({
        "poly_id": pa.array([1], pa.int64()),
        "vx": pa.array([[0, 10, 10, 0]], pa.list_(pa.int64())),
        "vy": pa.array([[0, 0, 10, 10]], pa.list_(pa.int64())),
    })

    def to_cells(batch: pa.Table) -> pa.Table:
        i = batch.column("id").to_numpy()
        # values: 40 cells of v=7, 40 of v=3, 20 of v=9 inside the box
        v = np.where(i % 5 < 2, 7, np.where(i % 5 < 4, 3, 9))
        return pa.table({
            "px": pa.array(i // 10, pa.int64()),
            "py": pa.array(i % 10, pa.int64()),
            "v": pa.array(v.astype(np.int64), pa.int64()),
        })

    cells = rd.range(100).map_batches(to_cells, batch_format="pyarrow")
    out = rasterize_majority(cells, polys).to_pandas()
    row = out.iloc[0]
    # v=7 and v=3 both have 40 cells: tie -> smallest value wins
    assert (row.mode_v, row.mode_n, row.n_vals) == (3, 40, 3)


def test_poly_simplify_matches_scalar(ray_session):
    import ray

    from equi7grid_ray.stages.rasterize import poly_simplify

    rng = np.random.default_rng(11)
    rings = [rng.integers(0, 2000, size=(3 + rng.integers(0, 10), 2))
             for _ in range(200)]
    offs = np.zeros(len(rings) + 1, np.int32)
    np.cumsum([len(r) for r in rings], out=offs[1:])
    flat = np.concatenate(rings)
    t = pa.table({
        "poly_id": pa.array(np.arange(len(rings)), pa.int64()),
        "vx": pa.ListArray.from_arrays(pa.array(offs, pa.int32()),
                                       pa.array(flat[:, 0], pa.int64())),
        "vy": pa.ListArray.from_arrays(pa.array(offs, pa.int32()),
                                       pa.array(flat[:, 1], pa.int64())),
    })
    tol2 = 300 ** 2
    out = poly_simplify(ray.data.from_arrow(t), tol2=tol2).to_pandas() \
        .sort_values("poly_id").reset_index(drop=True)
    for i, ring in enumerate(rings):
        lx, ly = int(ring[0][0]), int(ring[0][1])
        kept, cks = 1, lx + 7 * ly
        for x, y in ring[1:]:
            if (int(x) - lx) ** 2 + (int(y) - ly) ** 2 > tol2:
                lx, ly = int(x), int(y)
                kept += 1
                cks += lx + 7 * ly
        r = out.iloc[i]
        assert (r["nv"], r["n_kept"], r["kept_cksum"]) == \
            (len(ring), kept, cks)


def test_poly_self_intersections_crafted(ray_session):
    import ray.data as rd

    from equi7grid_ray.stages.rasterize import poly_self_intersections

    # ring 0: bowtie (hourglass) -- segments (0,1) and (2,3) cross -> 1
    # ring 1: convex square -> 0
    # ring 2: pentagram star (classic 5-crossing self-intersection)
    rings = [
        ([0, 10, 0, 10], [0, 10, 10, 0]),
        ([0, 10, 10, 0], [0, 0, 10, 10]),
        ([0, 40, -30, 20, -20], [60, 0, 40, 40, 0]),
    ]
    offs = [0]
    vx, vy = [], []
    for xs, ys in rings:
        vx += xs
        vy += ys
        offs.append(len(vx))
    tbl = pa.table({
        "poly_id": pa.array([0, 1, 2], pa.int64()),
        "vx": pa.ListArray.from_arrays(
            pa.array(offs, pa.int32()), pa.array(vx, pa.int64())),
        "vy": pa.ListArray.from_arrays(
            pa.array(offs, pa.int32()), pa.array(vy, pa.int64())),
    })
    got = poly_self_intersections(rd.from_arrow(tbl)).to_pandas() \
        .sort_values("poly_id").reset_index(drop=True)
    assert got["n_cross"].tolist() == [1, 0, 5]


def test_poly_self_intersections_matches_naive(ray_session):
    import ray.data as rd

    from equi7grid_ray.stages.rasterize import poly_self_intersections

    rng = np.random.default_rng(3)
    n_rings, max_v = 200, 9

    def ccw(ax, ay, bx, by, cx, cy):
        return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)

    offs = [0]
    vx, vy = [], []
    exp = []
    for r in range(n_rings):
        s = int(rng.integers(3, max_v + 1))
        xs = rng.integers(0, 100, s).tolist()
        ys = rng.integers(0, 100, s).tolist()
        vx += xs
        vy += ys
        offs.append(len(vx))
        cnt = 0
        for i in range(s):
            for j in range(i + 2, s):
                if i == 0 and j == s - 1:
                    continue
                p1 = (xs[i], ys[i])
                p2 = (xs[(i + 1) % s], ys[(i + 1) % s])
                p3 = (xs[j], ys[j])
                p4 = (xs[(j + 1) % s], ys[(j + 1) % s])
                d1 = ccw(*p1, *p2, *p3)
                d2 = ccw(*p1, *p2, *p4)
                d3 = ccw(*p3, *p4, *p1)
                d4 = ccw(*p3, *p4, *p2)
                if d1 * d2 < 0 and d3 * d4 < 0:
                    cnt += 1
        exp.append(cnt)
    tbl = pa.table({
        "poly_id": pa.array(range(n_rings), pa.int64()),
        "vx": pa.ListArray.from_arrays(
            pa.array(offs, pa.int32()), pa.array(vx, pa.int64())),
        "vy": pa.ListArray.from_arrays(
            pa.array(offs, pa.int32()), pa.array(vy, pa.int64())),
    })
    got = poly_self_intersections(rd.from_arrow(tbl)).to_pandas() \
        .sort_values("poly_id").reset_index(drop=True)
    assert got["n_cross"].tolist() == exp
