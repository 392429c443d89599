"""Property-based invariants (hypothesis): name-codec round trips,
pixel addressing inverses, geodesic round trips, cell hierarchy."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from equi7grid_ray import aeqd
from equi7grid_ray.cells import cell_children, cell_id, cell_parent
from equi7grid_ray.grid import (
    full_names,
    parse_tile_names,
    rc2xy,
    tile_ll_from_xy,
    xy2rc,
)

CONTS = ["AF", "AN", "AS", "EU", "NA", "OC", "SA"]


@settings(max_examples=40, deadline=None)
@given(
    cont=st.sampled_from(CONTS),
    tx=st.integers(min_value=0, max_value=120),
    ty=st.integers(min_value=-18, max_value=120),
    tiling=st.sampled_from(["T6", "T3", "T1"]),
)
def test_name_codec_roundtrip(cont, tx, ty, tiling):
    size = {"T6": 6, "T3": 3, "T1": 1}[tiling]
    llx = float(tx * size) * 1e5
    lly = float(ty * size) * 1e5
    name = str(full_names(cont, np.array([llx]), np.array([lly]), tiling)[0])
    p = parse_tile_names(name)
    assert str(p["continent"]) == cont
    assert float(p["ll_x"]) == llx and float(p["ll_y"]) == lly
    assert bool(p["valid"])


@settings(max_examples=40, deadline=None)
@given(
    r=st.integers(min_value=0, max_value=1199),
    c=st.integers(min_value=0, max_value=1199),
)
def test_pixel_addressing_inverse(r, c):
    llx, lly, size, s = 3.0e6, 4.8e6, 600_000.0, 500.0
    x, y = rc2xy(r, c, llx, lly, size, s, "c")  # pixel centers
    rr, cc = xy2rc(float(x), float(y), llx, lly, size, s, "ll")
    assert int(rr) == r and int(cc) == c


@settings(max_examples=30, deadline=None)
@given(
    cont=st.sampled_from(["AF", "AS", "EU", "NA", "OC", "SA", "AN"]),
    lon=st.floats(min_value=-179.9, max_value=179.9),
    lat=st.floats(min_value=-89.5, max_value=89.5),
)
def test_projection_roundtrip(cont, lon, lat):
    x, y = aeqd.forward(cont, lon, lat)
    lo, la = aeqd.inverse(cont, float(x), float(y))
    dlon = abs((float(lo) - lon + 180) % 360 - 180) * np.cos(np.radians(lat))
    assert dlon < 1e-8
    assert abs(float(la) - lat) < 1e-8


@settings(max_examples=40, deadline=None)
@given(
    lon=st.floats(min_value=-179.99, max_value=179.99),
    lat=st.floats(min_value=-89.99, max_value=89.99),
    level=st.integers(min_value=2, max_value=20),
)
def test_cell_hierarchy(lon, lat, level):
    cid = cell_id(np.array([lon]), np.array([lat]), level)
    parent = cell_parent(cid)
    kids = cell_children(parent)
    assert (kids == cid[:, None]).any()
    # parent at level-1 contains the same point
    pid = cell_id(np.array([lon]), np.array([lat]), level - 1)
    assert int(parent[0]) == int(pid[0])


@settings(max_examples=30, deadline=None)
@given(
    # subnormal negatives (e.g. -5e-324 m) underflow to -0.0 in the
    # floor division and snap to tile 0 instead of -600000 -- physically
    # meaningless at 1e-324 metres, excluded by contract
    x=st.floats(min_value=0.0, max_value=1.2e7, allow_subnormal=False),
    y=st.floats(min_value=-1.8e6, max_value=1.2e7, allow_subnormal=False),
)
def test_tile_floor_contains_point(x, y):
    llx, lly = tile_ll_from_xy(x, y, 600_000.0)
    assert float(llx) <= x < float(llx) + 600_000.0
    assert float(lly) <= y < float(lly) + 600_000.0


@settings(max_examples=40, deadline=None)
@given(
    texts=st.lists(st.binary(min_size=0, max_size=300), min_size=1, max_size=30),
)
def test_hash_bytes_offsets_matches_scalar_reference(texts):
    """The chunked offset-buffer hash equals a direct scalar evaluation
    of the same polynomial+splitmix definition, and is invariant to the
    internal chunk size."""
    from equi7grid_ray.stages import dedup as dd

    flat = np.frombuffer(b"".join(texts), dtype=np.uint8)
    lens = np.array([len(t) for t in texts], dtype=np.int64)
    offs = np.concatenate([[0], np.cumsum(lens)])
    got = dd.hash_bytes_offsets(flat, offs).view(np.uint64)

    # scalar reference
    P = int(dd._PRIME)
    M = 1 << 64
    for i, t in enumerate(texts):
        h = 0
        for j, b in enumerate(t):
            h = (h + b * pow(P, j, M)) % M
        h = (h ^ (len(t) * P) % M ^ int(dd._SEED)) % M
        # splitmix64
        h ^= h >> 33
        h = (h * 0xFF51AFD7ED558CCD) % M
        h ^= h >> 33
        h = (h * 0xC4CEB9FE1A85EC53) % M
        h ^= h >> 33
        assert int(got[i]) == h, i

    # chunk-size invariance: a 7-byte processing chunk crosses document
    # boundaries arbitrarily and must produce identical hashes
    tiny = dd.hash_bytes_offsets(flat, offs, chunk=7).view(np.uint64)
    assert (tiny == got).all()


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=(1 << 64) - 1),
                min_size=1, max_size=40))
def test_clz64_matches_bit_length(vals):
    from equi7grid_ray.stages.sketch import _clz64

    x = np.array(vals, dtype=np.uint64)
    got = _clz64(x)
    exp = np.array([64 - int(v).bit_length() for v in vals], np.int64)
    assert (got == exp).all()


@settings(max_examples=30, deadline=None)
@given(st.lists(st.text(alphabet=st.characters(min_codepoint=32,
                                               max_codepoint=126),
                        min_size=0, max_size=30),
                min_size=1, max_size=8),
       st.integers(min_value=2, max_value=6))
def test_shingle_hashes_match_scalar_reference(texts, k):
    import pyarrow as pa

    from equi7grid_ray.stages.dedup import _PRIME, shingle_hashes

    col = pa.array(texts, pa.string())
    h, doc_of = shingle_hashes(col, k)
    # scalar reference: Horner over each doc's k-byte windows
    exp_h, exp_d = [], []
    for d, t in enumerate(texts):
        b = t.encode()
        for i in range(len(b) - k + 1):
            acc = 0
            for ch in b[i:i + k]:
                acc = (acc * int(_PRIME) + ch) % (1 << 64)
            exp_h.append(acc)
            exp_d.append(d)
    assert doc_of.tolist() == exp_d
    assert [int(v) for v in h] == exp_h


@settings(max_examples=30, deadline=None)
@given(st.lists(st.binary(min_size=0, max_size=24), min_size=1, max_size=10),
       st.integers(min_value=0, max_value=2))
def test_payload_sums_on_sliced_arrays(payloads, drop):
    import pyarrow as pa

    from equi7grid_ray.arrowutil import payload_sums

    # pad every payload to even length (int16 elements)
    payloads = [p + b"\x00" * (len(p) % 2) for p in payloads]
    arr = pa.array(payloads, pa.binary())
    sl = arr.slice(0, max(1, len(arr) - drop))
    sums, cnts = payload_sums(sl, np.int16)
    for j in range(len(sl)):
        ref = np.frombuffer(payloads[j], np.int16)
        assert sums[j] == ref.astype(np.int64).sum()
        assert cnts[j] == len(ref)
