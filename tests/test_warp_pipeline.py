"""Warp-surface tests: overlap router semantics (warp.py:333-401 incl.
ValueError), boundary extraction, resumable end-to-end resample
(fragment skip on rerun), export surface."""

import json

import numpy as np
import pytest

from equi7grid_ray.pipelines.warp import (
    ftilenames_to_tiles,
    get_overlapping_tiles,
    resample_to_equi7_tiles,
)
from equi7grid_ray.stages.boundary import accurate_boundary, dilate, raster_extent


def test_router_requires_exactly_one():
    with pytest.raises(ValueError):
        get_overlapping_tiles()
    with pytest.raises(ValueError):
        get_overlapping_tiles(geog_bbox=(0, 30, 10, 40), xy_bbox_map={"EU": [0, 0, 1, 1]})


def test_router_paths_agree_with_roi():
    a = get_overlapping_tiles(geog_bbox=(16, 48, 18, 50))
    assert a == ["EU_E048N012T6", "EU_E048N018T6", "EU_E054N012T6", "EU_E054N018T6"]
    b = get_overlapping_tiles(
        xy_bbox_map={"EU": [5138743, 1111111, 6200015, 1534657]}
    )
    assert len(b) == 6


def test_ftilenames_to_tiles():
    tiles = ftilenames_to_tiles(["EU_E048N012T6", "EU_E042N006T6"])
    assert tiles[0].outer_boundary_extent == (4800000.0, 1200000.0, 5400000.0, 1800000.0)


def test_boundary_extraction():
    img = np.full((64, 64), -9999.0)
    img[10:40, 20:50] = 7.0  # valid block
    ring = accurate_boundary(
        img, nodata=-9999.0, lon_c=10.0, lat_c=50.0, res=0.01
    )
    assert len(ring) > 4 and (ring[0] == ring[-1]).all()
    # ring must enclose the valid block's center
    lon_ctr = 10.0 + (35 - 32) * 0.01
    lat_ctr = 50.0 - (25 - 32) * 0.01
    assert ring[:, 0].min() <= lon_ctr <= ring[:, 0].max()
    assert ring[:, 1].min() <= lat_ctr <= ring[:, 1].max()
    # dilation grows the mask
    m = np.zeros((9, 9), bool)
    m[4, 4] = True
    assert dilate(m, 3).sum() == 25  # L1 ball radius 3

    ext = raster_extent(10.0, 50.0, 100, 60, 0.01)
    assert ext == (9.5, 49.7, 10.5, 50.3)


def test_resample_resumable(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from equi7grid_ray.sources.images import make_batch

    src = tmp_path / "imgs"
    src.mkdir()
    pq.write_table(make_batch(0, 25), src / "frag-a.parquet")
    pq.write_table(make_batch(25, 25), src / "frag-b.parquet")
    out = tmp_path / "warped"

    c1 = resample_to_equi7_tiles(str(src), str(out), concurrency=(1, 2))
    assert c1["rows_out"] > 40
    manifests = sorted((out / "_manifest").glob("*.json"))
    assert len(manifests) == 2
    before = [m.stat().st_mtime for m in manifests]

    # rerun: both fragments skipped, manifests untouched
    c2 = resample_to_equi7_tiles(str(src), str(out), concurrency=(1, 2))
    after = [m.stat().st_mtime for m in sorted((out / "_manifest").glob("*.json"))]
    assert before == after and c2 == c1

    m0 = json.loads(manifests[0].read_text())
    assert m0["input_fragments"] and m0["n_tiles"] >= 1


def test_export_surface(tmp_path):
    from equi7grid_ray.export import (
        tiles_table,
        to_ogc_tms_json,
        write_grid_def,
        write_tiles_parquet,
    )

    t = tiles_table("T6", continents=["EU"])
    assert t.num_rows == 97  # EU T6 tile count (pinned by tile-set tests)
    assert "boundary_wkt" in t.column_names

    p = write_tiles_parquet(tmp_path / "tiles.parquet", "T6", continents=["EU"])
    assert p.exists()

    tms = to_ogc_tms_json("EU")
    assert tms["crs"] == "EPSG:27704"
    assert [m["id"] for m in tms["tileMatrices"]] == ["T6", "T3", "T1"]
    assert tms["tileMatrices"][0]["tileWidth"] == 1200

    g = write_grid_def(tmp_path / "grid.json")
    back = json.loads(g.read_text())
    assert back["system_order"][0] == "AF" and back["tilings"]["1"]["name"] == "T6"


def test_lonlat_raster_tile_discovery_golden():
    """Reference warp golden (tests/test_warp.py:129-171): the lonlat
    fixture extent (50, 60.7, 51.2, 63.2) overlaps exactly these 4 tiles
    across the AS/EU seam; EU-only grid -> 2 tiles."""
    from equi7grid_ray import roi

    tiles = roi.tiles_in_geog_bbox((50.0, 60.7, 51.2, 63.2), "T6")
    assert sorted(tiles) == [
        "AS_E018N066T6",
        "AS_E018N072T6",
        "EU_E066N030T6",
        "EU_E072N030T6",
    ]
    eu_only = roi.tiles_in_geog_bbox((50.0, 60.7, 51.2, 63.2), "T6",
                                     continents=["EU"])
    assert sorted(eu_only) == ["EU_E066N030T6", "EU_E072N030T6"]


def test_webmercator_raster_tile_discovery_golden():
    """Reference warp golden (tests/test_warp.py:213-260): the EPSG:3857
    fixture extent (4.9e6, 7.81e6, 6.18e6, 8.75e6) m -> 4 EU tiles."""
    from equi7grid_ray import mercator, roi

    lon0, lat0 = mercator.inverse(4.9e6, 7.81e6)
    lon1, lat1 = mercator.inverse(6.18e6, 8.75e6)
    tiles = roi.tiles_in_geog_bbox(
        (float(lon0), float(lat0), float(lon1), float(lat1)), "T6",
        continents=["EU"],
    )
    assert sorted(tiles) == [
        "EU_E066N024T6",
        "EU_E066N030T6",
        "EU_E072N024T6",
        "EU_E072N030T6",
    ]


def test_mercator_roundtrip():
    from equi7grid_ray import mercator

    import numpy as np

    lon = np.linspace(-179, 179, 50)
    lat = np.linspace(-85, 85, 50)
    x, y = mercator.forward(lon, lat)
    lo, la = mercator.inverse(x, y)
    assert np.allclose(lo, lon) and np.allclose(la, lat, atol=1e-9)


def test_naming_traffo_per_file(ray_session, tmp_path):
    """Per-tile output naming parity (reference warp.py:243-288): each
    tile directory is EQUI7_{continent}/{tilename}/ and holds one file
    named by the naming_traffo hook applied to (stem, full_tilename)."""
    import pyarrow.parquet as pq

    from equi7grid_ray.pipelines.warp import resample_to_equi7_tiles
    from equi7grid_ray.sources.images import make_batch

    src = tmp_path / "in"
    src.mkdir()
    pq.write_table(make_batch(0, 40), src / "scene0.parquet")
    out = tmp_path / "out"
    resample_to_equi7_tiles(
        str(src), str(out),
        naming_traffo=lambda stem, ftile: f"V1_{stem}__{ftile}.parquet",
    )
    files = sorted(out.glob("part-scene0/EQUI7_*/*/*.parquet"))
    assert files, "no tile files written"
    for f in files[:10]:
        cont = f.parent.parent.name.removeprefix("EQUI7_")
        tile = f.parent.name  # PARTIAL name dir, reference warp.py:276-288
        assert "_" not in tile  # e.g. E018N072T6, not AS_E018N072T6
        assert f.name == f"V1_scene0__{cont}_{tile}.parquet"
        t = pq.read_table(f)
        assert set(t.column("tile").cast("string").to_pylist()) == {
            f"{cont}_{tile}"
        }
