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


def _bitcraft_image(bits8x8: np.ndarray) -> bytes:
    """9x8 raw image whose dHash comparison bits equal bits8x8."""
    px = np.zeros((8, 9), np.int16)
    px[:, 0] = 128
    for c in range(8):
        # bit 1 <=> px[r, c] > px[r, c+1]
        px[:, c + 1] = px[:, c] + np.where(bits8x8[:, c] == 1, -15, 15)
    return px.astype(np.uint8).tobytes()


def test_dhash_near_dup_capped_bucket_keeps_other_band_pairs(ray_session):
    """Review finding: with max_bucket set, a pair whose FIRST matching
    band sits in a dropped mega-bucket must still be emitted via a
    later surviving band."""
    import pyarrow as pa
    import ray.data as rd

    from equi7grid_ray.stages.multimodal import dhash_near_dup

    rng = np.random.default_rng(3)
    rows = []
    # 5 images share rows 0-1 (band 0 bucket of size 5 -> dropped at
    # max_bucket=4); images 0 and 1 are fully identical (bands 1-3
    # buckets of size 2 -> kept)
    shared_top = rng.integers(0, 2, (2, 8))
    rest0 = rng.integers(0, 2, (6, 8))
    for i in range(5):
        rest = rest0 if i <= 1 else rng.integers(0, 2, (6, 8))
        bits = np.vstack([shared_top, rest])
        rows.append({"image_id": f"v{i}", "bytes": _bitcraft_image(bits),
                     "w": 9, "h": 8, "fmt": "raw"})
    tbl = pa.table({
        "image_id": pa.array([r["image_id"] for r in rows]),
        "bytes": pa.array([r["bytes"] for r in rows], pa.binary()),
        "w": pa.array([r["w"] for r in rows], pa.int32()),
        "h": pa.array([r["h"] for r in rows], pa.int32()),
        "fmt": pa.array([r["fmt"] for r in rows]),
    })
    got = dhash_near_dup(rd.from_arrow(tbl), max_dist=0,
                         max_bucket=4).to_pandas()
    pairs = set(zip(got["id_a"], got["id_b"]))
    assert ("v0", "v1") in pairs, pairs


def test_banded_hamming_pairs_int_ids_brute_force(ray_session):
    """Generic banded pairing with integer ids: exact vs brute force,
    both capped and uncapped paths."""
    import numpy as np
    import pyarrow as pa
    import ray

    from equi7grid_ray.stages.hamming import banded_hamming_pairs

    rng = np.random.default_rng(5)
    base = rng.integers(0, 2**63 - 1, 60, dtype=np.int64)
    hashes = [int(v) for v in base]
    # plant near-dups at distances 0..3 plus a distance-4 decoy
    for d in (0, 1, 2, 3, 4):
        h = int(base[d])
        for b in range(d):
            h ^= 1 << (b * 17)
        hashes.append(h)
    ids = np.arange(len(hashes), dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({
        "vid": pa.array(ids), "h": pa.array(hashes, pa.int64())}))
    want = set()
    for i in range(len(hashes)):
        for j in range(i + 1, len(hashes)):
            if bin((hashes[i] ^ hashes[j]) & (2**64 - 1)).count("1") <= 3:
                want.add((i, j))
    for cap in (None, 100):
        out = banded_hamming_pairs(
            ds, hash_col="h", id_col="vid", max_dist=3, max_bucket=cap,
        ).to_pandas()
        got = {(int(min(a, b)), int(max(a, b)))
               for a, b in zip(out["id_a"], out["id_b"])}
        assert got == want, cap
    assert any(d for d in want)  # planted pairs actually present


def _naive_ahash(tbl: pa.Table, i: int) -> int:
    b = tbl.column("bytes")[i].as_py()
    f = tbl.column("fmt")[i].as_py()
    w = tbl.column("w")[i].as_py()
    h = tbl.column("h")[i].as_py()
    img = decode_image(b, f, w, h)
    ri = np.arange(8) * h // 8
    ci = np.arange(8) * w // 8
    g = img[np.ix_(ri, ci)].astype(np.int64)
    total = int(g.sum())
    v = 0
    for k, px in enumerate(g.reshape(-1)):
        if 64 * int(px) > total:
            v |= 1 << (63 - k)
    return v - (1 << 64) if v >= 1 << 63 else v


def test_ahash_stage_matches_naive_reference():
    from equi7grid_ray.stages.multimodal import AHashImages

    tbl = make_batch(0, 120)  # covers all 9 (w, h) classes + both fmts
    out = AHashImages()(tbl)
    got = out.column("ahash").to_numpy()
    for i in range(120):
        assert got[i] == _naive_ahash(tbl, i), i


def test_ahash_sql_mirror_bit_exact():
    import duckdb

    from equi7grid_ray import sqlgen
    from equi7grid_ray.stages.multimodal import AHashImages

    tbl = make_batch(0, 200)
    got = AHashImages()(tbl).column("ahash").to_numpy()
    rows = duckdb.sql(
        sqlgen.image_ahash_sql(200) + " ORDER BY image_id").fetchall()
    assert np.array_equal(got, np.array([r[1] for r in rows], np.int64))


def test_image_canonical_ids_planted_cluster(ray_session):
    """Three byte-identical copies + one isolated image: the copies form
    one component with the minimum id as canonical; the isolated image
    maps to itself."""
    import ray.data as rd

    from equi7grid_ray.stages.multimodal import image_canonical_ids

    one = make_batch(0, 1)

    def renamed(n: int) -> pa.Table:
        return one.set_column(
            0, "image_id", pa.array([f"img{n:012d}"], pa.string()))

    far = make_batch(7, 1)
    ds = rd.from_arrow(pa.concat_tables([one, renamed(5), renamed(9), far]))
    got = image_canonical_ids(ds, max_dist=0).to_pandas()
    m = dict(zip(got.image_id, got.canonical))
    assert m == {
        "img000000000000": "img000000000000",
        "img000000000005": "img000000000000",
        "img000000000009": "img000000000000",
        "img000000000007": "img000000000007",
    }


def _naive_phash(tbl: pa.Table, i: int) -> int:
    from equi7grid_ray.stages.multimodal import phash_basis

    b = tbl.column("bytes")[i].as_py()
    f = tbl.column("fmt")[i].as_py()
    w = tbl.column("w")[i].as_py()
    h = tbl.column("h")[i].as_py()
    img = decode_image(b, f, w, h)
    ri = np.arange(16) * h // 16
    ci = np.arange(16) * w // 16
    g = img[np.ix_(ri, ci)].astype(object)  # Python ints: no overflow
    B = phash_basis().astype(object)
    coeff = B @ g @ B.T
    vals = [int(coeff[u, v]) for u in range(8) for v in range(8)][1:]
    med = sorted(vals)[31]
    v = 0
    for j, c in enumerate(vals):
        if c > med:
            v |= 1 << (63 - j)
    return v - (1 << 64) if v >= 1 << 63 else v


def test_phash_stage_matches_naive_reference():
    from equi7grid_ray.stages.multimodal import PHashImages

    tbl = make_batch(0, 60)
    got = PHashImages()(tbl).column("phash_dct").to_numpy()
    for i in range(60):
        assert got[i] == _naive_phash(tbl, i), i


def test_phash_sql_mirror_bit_exact():
    import duckdb

    from equi7grid_ray import sqlgen
    from equi7grid_ray.stages.multimodal import PHashImages

    tbl = make_batch(0, 150)
    got = PHashImages()(tbl).column("phash_dct").to_numpy()
    rows = duckdb.sql(
        sqlgen.image_phash_sql(150) + " ORDER BY image_id").fetchall()
    assert np.array_equal(got, np.array([r[1] for r in rows], np.int64))


def test_phash_brightness_invariance_and_twin():
    """pHash drops the DC term, so a constant brightness shift leaves
    the hash unchanged (the property dHash does NOT have); byte-twins
    hash identically."""
    from equi7grid_ray.stages.multimodal import PHashImages

    rng = np.random.default_rng(11)
    img = rng.integers(0, 200, size=(64, 64)).astype(np.uint8)
    shifted = (img + 40).astype(np.uint8)  # no wrap: img < 200

    def row(a, iid):
        return pa.table({
            "image_id": pa.array([iid]),
            "bytes": pa.array([a.tobytes()], pa.binary()),
            "w": pa.array([64], pa.int32()),
            "h": pa.array([64], pa.int32()),
            "fmt": pa.array(["raw"]),
        })

    tbl = pa.concat_tables([row(img, "a"), row(shifted, "b"), row(img, "c")])
    got = PHashImages()(tbl).column("phash_dct").to_numpy()
    assert got[0] == got[1] == got[2]


def test_patch_stats_truncates_partial_patches():
    """A 40x56 image at P=16 yields 2x3 full patches; trailing 8 rows /
    8 cols are truncated.  Sums checked against a naive reference."""
    from equi7grid_ray.stages.multimodal import PatchStats

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (40, 56), dtype=np.uint8)
    tbl = pa.table({
        "image_id": pa.array(["t"]),
        "bytes": pa.array([img.tobytes()], pa.binary()),
        "w": pa.array([56], pa.int32()),
        "h": pa.array([40], pa.int32()),
        "fmt": pa.array(["raw"]),
    })
    out = PatchStats(patch=16)(tbl)
    assert out.num_rows == 2 * 3
    got = {(out.column("pr")[i].as_py(), out.column("pc")[i].as_py()):
           out.column("px_sum")[i].as_py() for i in range(out.num_rows)}
    for pr in range(2):
        for pc_ in range(3):
            want = int(img[pr * 16:(pr + 1) * 16,
                           pc_ * 16:(pc_ + 1) * 16].astype(np.int64).sum())
            assert got[(pr, pc_)] == want


def test_ensemble_dedup_merges_either_signal(ray_session):
    """Byte twins pair under BOTH hashes; the ensemble must merge a
    chain linked through either signal into one component."""
    import ray.data as rd

    from equi7grid_ray.stages.multimodal import image_ensemble_canonical_ids

    one = make_batch(0, 1)

    def renamed(n: int) -> pa.Table:
        return one.set_column(
            0, "image_id", pa.array([f"img{n:012d}"], pa.string()))

    far = make_batch(7, 1)
    ds = rd.from_arrow(pa.concat_tables([one, renamed(3), far]))
    got = image_ensemble_canonical_ids(ds, max_dist=0).to_pandas()
    m = dict(zip(got.image_id, got.canonical))
    assert m["img000000000003"] == "img000000000000"
    assert m["img000000000007"] == "img000000000007"
