"""Flagship pipeline tests: end-to-end Ray runs, ordered output parity,
phash dedup on the image table, API coverage details."""

import numpy as np
import pyarrow as pa
import pytest

from equi7grid_ray.sources.images import make_batch


def test_flagship_end_to_end(ray_session, tmp_path):
    import ray.data as rd

    from equi7grid_ray.pipelines.flagship import (
        ordered_assignments,
        tile_assignments,
        tile_histogram,
    )

    ds = rd.from_arrow(make_batch(0, 2000))
    out = tile_assignments(ds, decode=True, batch_size=512)
    table = ordered_assignments(out).to_pandas()
    assert len(table) >= 1995  # ~every image lands in >= 1 zone
    # ordered: continent_rank ascending, then ll_x, ll_y within
    r = table["continent_rank"].to_numpy()
    assert (np.diff(r) >= 0).all()
    for rank in np.unique(r):
        seg = table[table.continent_rank == rank]
        key = seg.ll_x.to_numpy() * 4096 + seg.ll_y.to_numpy() / 1e5
        assert (np.diff(key) >= 0).all()
    assert "px_mean" in table.columns  # decode ran

    hist = tile_histogram(tile_assignments(rd.from_arrow(make_batch(0, 2000)))).to_pandas()
    assert hist.n.sum() == len(table)


def test_dedup_images_by_phash(ray_session):
    import ray.data as rd

    from equi7grid_ray.pipelines.flagship import dedup_images_by_phash

    b = make_batch(0, 3000)
    ds = rd.from_arrow(b)
    kept = dedup_images_by_phash(ds).to_pandas()
    # the synthetic pattern yields genuine duplicate images (same shape,
    # i = i' mod 256 -> identical bytes); survivors = distinct phashes,
    # min id wins per group
    import pandas as pd

    expected = pd.Series(b.column("phash").to_pylist()).nunique()
    assert len(kept) == expected < 3000
    # the planted duplicates of row 0 are dropped
    assert "img000000001000" not in set(kept.image_id)
    assert "img000000002000" not in set(kept.image_id)
    assert "img000000000000" in set(kept.image_id)


def test_api_details():
    from equi7grid_ray import api
    from equi7grid_ray.errors import GeomOutOfZoneError

    with pytest.raises(GeomOutOfZoneError):
        api.system_lonlat_to_xy("EU", -100.0, 10.0)  # far outside EU zone

    t = api.get_tile_from_name("EU_E048N012T6")
    assert t.covers_land  # Balkans tile
    xs = t.x_coords()
    assert len(xs) == 1200 and xs[0] == 4800000.0 and xs[-1] == 5399500.0
    ys = t.y_coords()
    assert ys[0] == 1799500.0 and ys[-1] == 1200000.0
    assert t.intersects_extent((5.3e6, 1.1e6, 5.5e6, 1.3e6))
    assert not t.intersects_extent((6.0e6, 1.1e6, 6.2e6, 1.3e6))
    assert t.boundary_wkt.startswith("POLYGON ((4800000.0 1200000.0")
    assert bool(t.contains_xy(5.0e6, 1.5e6))


def test_entry_contract(ray_session):
    import __ray_entry__ as e

    ds = e.entry()
    n = ds.count()
    assert n > 5000
    cols = set(ds.schema().names)
    assert {"image_id", "continent", "tile", "covers_land"} <= cols
    qs = e.queries()
    orc = e.oracle_sql()
    assert set(orc) <= set(qs)  # every oracle has a query
    assert len(qs) >= 25 and len(orc) >= 12
    # README advertises the exact counts; keep it from drifting.
    import re
    from pathlib import Path

    readme = (Path(__file__).resolve().parent.parent / "README.md").read_text()
    m = re.search(r"exposes (\d+) operator queries; (\d+) carry", readme)
    assert m, "README query-count sentence missing"
    assert (int(m.group(1)), int(m.group(2))) == (len(qs), len(orc))


def test_flagship_checkpointed_resume(ray_session, tmp_path):
    import json

    import pyarrow.parquet as pq

    from equi7grid_ray.pipelines.flagship import run_flagship_checkpointed

    src = tmp_path / "frags"
    src.mkdir()
    pq.write_table(make_batch(0, 600), src / "f0.parquet")
    pq.write_table(make_batch(600, 600), src / "f1.parquet")
    out = tmp_path / "ckpt"
    c1 = run_flagship_checkpointed(str(src), str(out))
    assert c1["rows_out"] >= 1195
    files = sorted((out / "_manifest").glob("*.json"))
    assert len(files) == 2
    m0 = json.loads(files[0].read_text())
    assert m0["n_tiles"] >= 1 and m0["rows_in"] == 600
    stamps = [f.stat().st_mtime for f in files]
    # rerun skips both fragments
    c2 = run_flagship_checkpointed(str(src), str(out))
    assert c2 == c1
    assert [f.stat().st_mtime for f in sorted((out / "_manifest").glob("*.json"))] == stamps


def test_flagship_checkpointed_tile_layout(ray_session, tmp_path):
    """The per-fragment output mirrors the reference's
    EQUI7_{continent}/{tilename}/ directory scheme (warp.py:276-288) and
    every tile directory holds only its own tile's rows."""
    import pyarrow.parquet as pq

    from equi7grid_ray.pipelines.flagship import run_flagship_checkpointed

    src = tmp_path / "frags"
    src.mkdir()
    pq.write_table(make_batch(0, 300), src / "f0.parquet")
    out = tmp_path / "ckpt"
    run_flagship_checkpointed(str(src), str(out))
    tile_dirs = sorted((out / "part-f0").glob("EQUI7_*/**/*.parquet"))
    assert len(tile_dirs) >= 50  # global sweep hits many tiles
    seen_conts = set()
    for f in tile_dirs[:20]:
        cont = f.parent.parent.name.removeprefix("EQUI7_")
        tile = f.parent.name  # PARTIAL name dir (reference warp.py:276-288)
        assert "_" not in tile
        seen_conts.add(cont)
        t = pq.read_table(f)
        tiles = set(t.column("tile").cast("string").to_pylist())
        assert tiles == {f"{cont}_{tile}"}
    assert len(seen_conts) >= 1


def test_flagship_checkpointed_stale_tmp_recovery(ray_session, tmp_path):
    """A crash mid-fragment leaves a stale .tmp-part dir and no manifest
    row: the rerun must clean it up and complete the fragment."""
    import pyarrow.parquet as pq

    from equi7grid_ray.pipelines.flagship import run_flagship_checkpointed

    src = tmp_path / "frags"
    src.mkdir()
    pq.write_table(make_batch(0, 200), src / "f0.parquet")
    out = tmp_path / "ckpt"
    stale = out / ".tmp-part-f0" / "EQUI7_XX" / "BOGUS"
    stale.mkdir(parents=True)
    (stale / "data.parquet").write_bytes(b"garbage")
    c = run_flagship_checkpointed(str(src), str(out))
    assert c["rows_out"] >= 199
    assert not (out / ".tmp-part-f0").exists()
    assert (out / "part-f0").exists()
    assert not list((out / "part-f0").glob("EQUI7_XX*"))


def test_decode_batch_edge_cases():
    """Review round-2 regressions: 1-byte final raw payload must not be
    double-counted; unknown formats raise; payload/size mismatch raises."""
    import pyarrow as pa
    import pytest

    from equi7grid_ray.stages.tile_assign import TileAssigner

    ta = TileAssigner(decode=True, emit_cell=False, emit_xy=False,
                      exact_projection=True)

    def mkbatch(payloads, fmts, ws, hs):
        n = len(payloads)
        return pa.table({
            "image_id": pa.array([f"img{i:012d}" for i in range(n)]),
            "bytes": pa.array(payloads, pa.binary()),
            "w": pa.array(ws, pa.int32()),
            "h": pa.array(hs, pa.int32()),
            "fmt": pa.array(fmts, pa.string()),
            "lon": pa.array([10.0] * n),
            "lat": pa.array([48.0] * n),
        })

    # 1-byte raw payload at the very end of the buffer
    out = ta(mkbatch([bytes([40, 60]), bytes([200])],
                     ["raw", "raw"], [2, 1], [1, 1]))
    means = dict(zip(
        out.column("image_id").to_pylist(),
        out.column("px_mean").to_pylist(),
    ))
    assert means["img000000000000"] == 50.0
    assert means["img000000000001"] == 200.0  # was 400.0 (double count)

    with pytest.raises(NotImplementedError):
        ta(mkbatch([b"xx"], ["jpeg"], [1, ], [2, ]))

    with pytest.raises(ValueError):
        ta(mkbatch([bytes(5)], ["raw"], [2], [2]))  # 5 bytes for w*h=4


def test_checkpointed_empty_fragment(ray_session, tmp_path):
    """A zero-row input fragment completes with an empty manifest row
    instead of crashing concat_tables (review round-2)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from equi7grid_ray.pipelines.flagship import run_flagship_checkpointed

    src = tmp_path / "frags"
    src.mkdir()
    pq.write_table(make_batch(0, 100), src / "f0.parquet")
    empty = make_batch(0, 1).slice(0, 0)
    pq.write_table(empty, src / "f1.parquet")
    out = tmp_path / "ckpt"
    c = run_flagship_checkpointed(str(src), str(out))
    assert c["rows_out"] >= 99
    files = sorted((out / "_manifest").glob("*.json"))
    assert len(files) == 2


def test_ipc_roundtrip_exact(ray_session, tmp_path):
    """Arrow IPC export -> read_binary_files + ipc decode round-trips
    every Arrow type exactly (timestamps and doubles included)."""
    import pyarrow.parquet as pq

    from equi7grid_ray.sources.text_formats import export_ipc, read_ipc_table

    sf = "/root/testdata/sf0.001"
    cols = ["l_orderkey", "l_extendedprice", "l_shipdate"]
    path = export_ipc(sf, "lineitem", cols)
    got = read_ipc_table(path).to_pandas() \
        .sort_values(cols).reset_index(drop=True)
    exp = pq.read_table(f"{sf}/lineitem.parquet", columns=cols) \
        .to_pandas().sort_values(cols).reset_index(drop=True)
    assert got.equals(exp[got.columns])
