"""Hierarchical lon/lat quadtree cells -- the engine's coarse spatial
pre-index (H3/S2 role demanded by the north rule; the reference has no
counterpart, SURVEY.md section 2.8).

A cell id packs (level, iy, ix) into one int64:

    id = (level << 58) | (iy << 29) | ix

with ix in [0, 2^level) columns of 360/2^level deg and iy in
[0, 2^level) rows of 180/2^level deg.  Pure integer math -> identical
semantics in numpy and ANSI SQL (the DuckDB oracles reproduce it), and a
well-distributed shuffle key (salting helpers included for the EU/AS hot
zones).
"""

from __future__ import annotations

import numpy as np

__all__ = ["cell_id", "cell_center", "cell_parent", "cell_children", "salt_keys"]


def cell_id(lon, lat, level: int) -> np.ndarray:
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    n = 1 << level
    ix = np.clip((np.floor((lon + 180.0) / 360.0 * n)).astype(np.int64), 0, n - 1)
    iy = np.clip((np.floor((lat + 90.0) / 180.0 * n)).astype(np.int64), 0, n - 1)
    return (np.int64(level) << 58) | (iy << 29) | ix


def cell_decode(cid) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    cid = np.asarray(cid, dtype=np.int64)
    level = cid >> 58
    iy = (cid >> 29) & ((1 << 29) - 1)
    ix = cid & ((1 << 29) - 1)
    return level, iy, ix


def cell_center(cid) -> tuple[np.ndarray, np.ndarray]:
    level, iy, ix = cell_decode(cid)
    n = (1 << level).astype(np.float64)
    lon = -180.0 + (ix + 0.5) * 360.0 / n
    lat = -90.0 + (iy + 0.5) * 180.0 / n
    return lon, lat


def cell_parent(cid) -> np.ndarray:
    level, iy, ix = cell_decode(cid)
    return ((level - 1) << 58) | ((iy >> 1) << 29) | (ix >> 1)


def cell_children(cid) -> np.ndarray:
    """(n, 4) child ids."""
    level, iy, ix = cell_decode(cid)
    base_l = (level + 1) << 58
    out = np.empty(cid.shape + (4,), dtype=np.int64)
    k = 0
    for dy in (0, 1):
        for dx in (0, 1):
            out[..., k] = base_l | (((iy << 1) | dy) << 29) | ((ix << 1) | dx)
            k += 1
    return out


def salt_keys(keys, row_index, n_salts: int) -> np.ndarray:
    """Spread a hot shuffle key over ``n_salts`` sub-keys (skew handling:
    key' = key * S + row_hash % S).  Merge partial aggregates afterwards."""
    keys = np.asarray(keys, dtype=np.int64)
    row_index = np.asarray(row_index, dtype=np.uint64)
    with np.errstate(over="ignore"):
        h = (row_index * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)
    return keys * np.int64(n_salts) + (h % np.uint64(n_salts)).astype(np.int64)
