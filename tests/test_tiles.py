"""Tile addressing / raster-math conformance
(goldens from /root/reference/tests/test_equi7grid.py:120-252)."""

import numpy.testing as nptest
import pytest

from equi7grid_ray import api
from equi7grid_ray.errors import TileOutOfZoneError
from equi7grid_ray.grid import GridSpec, allowed_samplings


def test_rc2xy():
    # test_equi7grid.py:120-142
    tile = api.get_tile_from_xy("EU", 3245631, 5146545, tiling_id="T6")
    x, y = tile.rc2xy(444, 333)
    nptest.assert_allclose(3166500, x)
    nptest.assert_allclose(5177500, y)

    x, y = tile.rc2xy(444, 333, px_origin="c")
    nptest.assert_allclose(3166750, x)
    nptest.assert_allclose(5177750, y)

    tile = api.get_tile_from_xy("EU", 4800123, 1200123, tiling_id="T6")
    x, y = tile.rc2xy(tile.n_rows - 1, 0, px_origin="ll")
    nptest.assert_allclose(4800000, x)
    nptest.assert_allclose(1200000, y)


def test_xy2rc():
    # test_equi7grid.py:145-151
    tile = api.get_tile_from_xy("EU", 3245631, 5146545)
    r, c = tile.xy2rc(3166500, 5178000)
    nptest.assert_allclose(444, r)
    nptest.assert_allclose(333, c)


def test_tile_extents():
    # test_equi7grid.py:154-162
    t = api.get_tile_from_name("EU_E048N012T6")
    assert t.outer_boundary_extent == (4800000.0, 1200000.0, 5400000.0, 1800000.0)
    assert t.coord_extent == (4800000.0, 1200000.0, 5399500.0, 1799500.0)


def test_lonlat2rc_in_tile():
    # test_equi7grid.py:164-174
    lon, lat = 18.507, 44.571
    tile = api.get_tile_from_lonlat(lon, lat, tiling_id="T6", continent="EU")
    x, y = api.system_lonlat_to_xy("EU", lon, lat)
    r, c = tile.xy2rc(float(x), float(y))
    assert tile.name == "EU_E048N012T6"
    assert (int(r), int(c)) == (1199, 1199)


def test_decode_tilename():
    # test_equi7grid.py:214-224
    tile = api.get_tile_from_name("EU_E042N006T6")
    assert tile.x_pixel_size == 500
    assert tile.outer_boundary_corners[0] == (4200000, 600000)
    with pytest.raises(TileOutOfZoneError):
        api.get_tile_from_name("EU_E240N006T6")


def test_invalid_tilename():
    # test_equi7grid.py:227-232
    with pytest.raises(ValueError):
        api.get_tile_from_name("EU_E011N023T6")


def test_children():
    # test_equi7grid.py:235-243
    kids = api.get_children_from_name("EU_E042N006T6")
    assert sorted(k.name for k in kids) == [
        "EU_E042N006T3",
        "EU_E042N009T3",
        "EU_E045N006T3",
        "EU_E045N009T3",
    ]


def test_parent():
    # test_equi7grid.py:245-252
    assert api.get_parent_from_name("EU_E041N011T1").name == "EU_E039N009T3"
    t3 = api.get_parent_from_name("EU_E044N015T1")
    assert api.get_parent_from_name(t3.name).name == "EU_E042N012T6"


def test_geotrans():
    t = api.get_tile_from_name("EU_E048N012T6")
    assert t.geotrans == (4800000.0, 500.0, 0.0, 1800000.0, 0.0, -500.0)


def test_allowed_samplings():
    s = allowed_samplings(600_000)
    assert 500.0 in s and 10_000.0 in s and 7.0 not in s
    assert max(s) <= 10_000


def test_user_tilings():
    # user-defined T2=200 km tiling (grid.ipynb) and per-level sampling maps
    spec = GridSpec(sampling={"T2": 100}, tilings={1: ("T2", 200_000.0)})
    assert spec.tile_size("T2") == 200_000.0
    assert spec.sampling_of("T2") == 100
    spec.validate()


def test_grid_def_roundtrip(tmp_path):
    # to_grid_def/from_file parity (core.py:605-648)
    spec = GridSpec.standard(500.0, buffered=True, continent_order=["EU", "AS"])
    p = tmp_path / "grid.json"
    spec.to_file(p)
    back = GridSpec.from_file(p)
    assert back.buffered and back.continent_order == ("EU", "AS")
    assert back.tile_size("T6") == 600_000.0


def test_tile_polygon_topology():
    """Shapely-style topology vs projected rings (reference tile.ipynb
    'Topological operations' over core.py:39-52 tile objects)."""
    import numpy as np

    from equi7grid_ray import api

    t = api.get_tile_from_name("EU_E048N012T6")
    x0, y0, x1, y1 = t.ll_x, t.ll_y, t.ur_x, t.ur_y

    def ring(a, b, c, d):
        return np.array([[a, b], [c, b], [c, d], [a, d], [a, b]])

    big = ring(x0 - 1e5, y0 - 1e5, x1 + 1e5, y1 + 1e5)       # covers tile
    small = ring(x0 + 1e5, y0 + 1e5, x0 + 2e5, y0 + 2e5)     # inside tile
    part = ring(x0 - 1e5, y0 + 1e5, x0 + 1e5, y0 + 2e5)      # partial overlap
    adjacent = ring(x1, y0, x1 + 2e5, y1)                    # shares an edge
    far = ring(x1 + 5e5, y1 + 5e5, x1 + 6e5, y1 + 6e5)       # disjoint

    assert t.within(big) and t.intersects(big)
    assert not t.overlaps(big) and not t.touches(big)

    assert t.contains_geom(small) and t.intersects(small)
    assert not t.overlaps(small) and not t.within(small)

    assert t.overlaps(part) and t.intersects(part)
    assert not t.within(part) and not t.touches(part)

    assert t.touches(adjacent) and t.intersects(adjacent)
    assert not t.overlaps(adjacent)

    assert not t.intersects(far)
    assert not t.touches(far) and not t.overlaps(far) and not t.within(far)


def test_xy_coords_meshgrid():
    from equi7grid_ray import api

    t = api.get_tile_from_name("EU_E048N012T6")
    X, Y = t.xy_coords()
    assert X.shape == t.shape and Y.shape == t.shape
    assert X[0, 0] == t.x_coords()[0] and Y[0, 0] == t.y_coords()[0]
    assert X[5, 7] == t.x_coords()[7] and Y[5, 7] == t.y_coords()[5]
