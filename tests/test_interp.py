"""Gridded-interpolation projector: accuracy bound vs the exact solver
and end-to-end tile-assignment equivalence.

The reference pins coordinate accuracy at assert_allclose rtol=1e-7
(/root/reference/tests/test_equi7grid.py:50-99), i.e. ~0.6 m at zone
scale; the interpolator must sit orders of magnitude inside that."""

import numpy as np
import pyarrow as pa

from equi7grid_ray import aeqd
from equi7grid_ray.interp import build_zone_projectors
from equi7grid_ray.zones import get_zone_classifier

MAX_ERR_M = 2e-3  # 2 mm interpolation budget (contract is ~0.6 m)


def test_interp_accuracy_all_zones():
    zc = get_zone_classifier(False)
    projs = build_zone_projectors(zc.polys, ["AF", "AS", "EU", "NA", "OC", "SA"])
    rng = np.random.default_rng(7)
    for cont, p in projs.items():
        poly = zc.polys[cont]
        lon = rng.uniform(poly.bbox[0], poly.bbox[2], 100_000)
        lat = rng.uniform(poly.bbox[1], poly.bbox[3], 100_000)
        m = zc.contains(cont, lon, lat)
        lon, lat = lon[m], lat[m]
        xe, ye = aeqd.forward(cont, lon, lat)
        xi, yi = p(lon, lat)
        err = np.hypot(xi - xe, yi - ye)
        assert err.max() < MAX_ERR_M, (cont, err.max())


def test_interp_matches_reference_accuracy_contract():
    """The interpolated forward passes the reference's own golden
    tolerance on its pinned coordinates."""
    zc = get_zone_classifier(False)
    projs = build_zone_projectors(zc.polys, ["EU", "NA", "AF"])
    # EU golden: test_equi7grid.py:50-56
    x, y = projs["EU"](np.array([15.1]), np.array([45.3]))
    np.testing.assert_allclose(x, 5138743.127891, rtol=1e-7)
    np.testing.assert_allclose(y, 1307029.157093, rtol=1e-6)


def test_tile_assignment_identical_interp_vs_exact():
    from equi7grid_ray.stages.tile_assign import TileAssigner

    rng = np.random.default_rng(11)
    n = 50_000
    lon = rng.uniform(-180.0, 180.0, n)
    lat = rng.uniform(-90.0, 90.0, n)
    batch = pa.table(
        {
            "image_id": pa.array(np.arange(n, dtype=np.int64)),
            "lon": pa.array(lon),
            "lat": pa.array(lat),
        }
    )
    def canon(t: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "image_id": t.column("image_id"),
                "tile": t.column("tile").cast(pa.string()),
                "covers_land": t.column("covers_land"),
            }
        )
        return t.sort_by([("image_id", "ascending"), ("tile", "ascending")])

    fast = canon(TileAssigner(decode=False, emit_cell=False, emit_xy=False)(batch))
    exact = canon(
        TileAssigner(
            decode=False, emit_cell=False, emit_xy=False, exact_projection=True
        )(batch)
    )
    assert fast.num_rows == exact.num_rows
    assert fast.column("tile").equals(exact.column("tile"))
    assert fast.column("covers_land").equals(exact.column("covers_land"))


def test_tile_assignment_identical_buffered_spec():
    """Interp-vs-exact identity also holds under the buffered grid spec
    (bigger zone polygons -> bigger interpolation grids)."""
    from equi7grid_ray.grid import GridSpec
    from equi7grid_ray.stages.tile_assign import TileAssigner

    spec = GridSpec.standard(buffered=True)
    rng = np.random.default_rng(13)
    n = 20_000
    batch = pa.table({
        "image_id": pa.array(np.arange(n, dtype=np.int64)),
        "lon": pa.array(rng.uniform(-180, 180, n)),
        "lat": pa.array(rng.uniform(-90, 90, n)),
    })

    def canon(t):
        t = pa.table({
            "image_id": t.column("image_id"),
            "tile": t.column("tile").cast(pa.string()),
        })
        return t.sort_by([("image_id", "ascending"), ("tile", "ascending")])

    fast = canon(TileAssigner(spec=spec, decode=False, emit_cell=False,
                              emit_xy=False)(batch))
    exact = canon(TileAssigner(spec=spec, decode=False, emit_cell=False,
                               emit_xy=False, exact_projection=True)(batch))
    assert fast.num_rows == exact.num_rows
    assert fast.column("tile").equals(exact.column("tile"))
