"""Perceptual dHash stage + banded near-dup operator.

Reference semantics: classic difference-hash (9x8 grid, horizontal
adjacent compare, 64 bits MSB-first) with a deterministic point-sample
downsample so the hash is pure integer math (mirrored bit-exactly by
sqlgen.image_dhash_sql).  The banded candidate filter (4 bands of 16
bits) is EXACT for Hamming distance <= 3 by pigeonhole -- asserted here
against O(n^2) brute force.
"""

import numpy as np
import pyarrow as pa

from equi7grid_ray.codec import decode_image
from equi7grid_ray.sources.images import make_batch
from equi7grid_ray.stages.multimodal import DHashImages, dhash_near_dup


def _naive_dhash(tbl: pa.Table, i: int) -> int:
    b = tbl.column("bytes")[i].as_py()
    f = tbl.column("fmt")[i].as_py()
    w = tbl.column("w")[i].as_py()
    h = tbl.column("h")[i].as_py()
    img = decode_image(b, f, w, h)
    ri = np.arange(8) * h // 8
    ci = np.arange(9) * w // 9
    g = img[np.ix_(ri, ci)].astype(np.int64)
    v = 0
    for k, bit in enumerate((g[:, 1:] > g[:, :-1]).reshape(-1)):
        if bit:
            v |= 1 << (63 - k)
    return v - (1 << 64) if v >= 1 << 63 else v


def _brute_pairs(dh: np.ndarray, max_dist: int) -> set[tuple[int, int]]:
    u = dh.view(np.uint64)
    x = u[:, None] ^ u[None, :]
    ham = np.unpackbits(x.view(np.uint8).reshape(len(u), len(u), 8),
                        axis=2).sum(axis=2)
    ia, ib = np.where((ham <= max_dist)
                      & (np.arange(len(u))[:, None] < np.arange(len(u))[None, :]))
    return set(zip(ia.tolist(), ib.tolist()))


def test_dhash_stage_matches_naive_reference():
    tbl = make_batch(0, 120)  # covers all 9 (w, h) classes + both fmts
    out = DHashImages()(tbl)
    got = out.column("dhash").to_numpy()
    for i in range(120):
        assert got[i] == _naive_dhash(tbl, i), i


def test_dhash_sql_mirror_bit_exact():
    import duckdb

    from equi7grid_ray import sqlgen

    tbl = make_batch(0, 200)
    got = DHashImages()(tbl).column("dhash").to_numpy()
    rows = duckdb.sql(
        sqlgen.image_dhash_sql(200) + " ORDER BY image_id").fetchall()
    assert np.array_equal(got, np.array([r[1] for r in rows], np.int64))


def test_banded_near_dup_exact_recall(ray_session):
    import ray.data as rd

    tbl = make_batch(0, 400)
    dh = DHashImages()(tbl).column("dhash").to_numpy()
    ids = tbl.column("image_id").to_pylist()
    want = {(ids[a], ids[b]) for a, b in _brute_pairs(dh, 3)}
    assert want, "fixture must contain near-duplicate images"

    pairs = dhash_near_dup(rd.from_arrow(tbl), max_dist=3).to_pandas()
    got = set(zip(pairs.id_a, pairs.id_b))
    assert got == want  # recall AND precision = 1 (banding is exact)


def test_near_dup_empty_and_identical(ray_session):
    import ray.data as rd

    # two byte-identical images -> distance 0 pair; a third far image
    one = make_batch(0, 1)
    twin = one.set_column(0, "image_id", pa.array(["imgTWIN"], pa.string()))
    far = make_batch(7, 1)
    ds = rd.from_arrow(pa.concat_tables([one, twin, far]))
    pairs = dhash_near_dup(ds, max_dist=0).to_pandas()
    assert set(zip(pairs.id_a, pairs.id_b)) == {("img000000000000", "imgTWIN")}
