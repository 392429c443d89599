"""Raster boundary extraction: the 'accurate boundary' role of
/root/reference/src/equi7grid/warp.py:79-156 (downsample ~400x, nodata
mask, 3-iteration binary dilation, polygonize) re-expressed in pure
numpy (scipy/rasterio absent).

``accurate_boundary`` returns a rectilinear outline polygon (per-row
min/max valid columns of the dilated validity mask) in world
coordinates -- a conservative hull of the valid-data region, equivalent
in role to the reference's shapes() polygonize for footprint clipping.
"""

from __future__ import annotations

import numpy as np

__all__ = ["validity_mask", "dilate", "accurate_boundary", "raster_extent"]


def validity_mask(img: np.ndarray, nodata: float | None) -> np.ndarray:
    if nodata is None:
        return np.ones(img.shape, dtype=bool)
    return img != nodata


def _block_reduce_any(mask: np.ndarray, factor: int) -> np.ndarray:
    """Downsample a bool mask by OR over factor x factor blocks."""
    if factor <= 1:
        return mask
    h, w = mask.shape
    ph = (-h) % factor
    pw = (-w) % factor
    if ph or pw:
        mask = np.pad(mask, ((0, ph), (0, pw)))
    h2, w2 = mask.shape
    return mask.reshape(h2 // factor, factor, w2 // factor, factor).any(axis=(1, 3))


def dilate(mask: np.ndarray, iterations: int = 3) -> np.ndarray:
    """4-connected binary dilation (the scipy.ndimage role)."""
    out = mask.copy()
    for _ in range(iterations):
        d = out.copy()
        d[1:, :] |= out[:-1, :]
        d[:-1, :] |= out[1:, :]
        d[:, 1:] |= out[:, :-1]
        d[:, :-1] |= out[:, 1:]
        out = d
    return out


def raster_extent(lon_c: float, lat_c: float, w: int, h: int, res: float):
    """Footprint bbox of a north-up raster centered at (lon_c, lat_c)
    (the get_raster_extent role, warp.py:160-182)."""
    return (
        lon_c - w * res / 2.0,
        lat_c - h * res / 2.0,
        lon_c + w * res / 2.0,
        lat_c + h * res / 2.0,
    )


def accurate_boundary(
    img: np.ndarray,
    *,
    nodata: float | None,
    lon_c: float,
    lat_c: float,
    res: float,
    target_cells: int = 400,
    dilation_iters: int = 3,
) -> np.ndarray:
    """Valid-data outline as an (N, 2) lon/lat ring.

    Mirrors the reference recipe: downsample so the mask has ~
    ``target_cells`` cells, dilate ``dilation_iters`` times, trace a
    rectilinear outline, map cell corners back through the affine
    transform."""
    h, w = img.shape
    mask = validity_mask(img, nodata)
    factor = max(1, int(np.sqrt(max(1, (h * w) // target_cells))))
    small = _block_reduce_any(mask, factor)
    small = dilate(small, dilation_iters)
    rows = np.flatnonzero(small.any(axis=1))
    if len(rows) == 0:
        return np.empty((0, 2))
    # rectilinear outline: walk down the left edge, up the right edge
    left = np.array([np.flatnonzero(small[r]).min() for r in rows])
    right = np.array([np.flatnonzero(small[r]).max() for r in rows])
    cres = res * factor
    lon0 = lon_c - w * res / 2.0
    lat0 = lat_c + h * res / 2.0  # top edge
    pts = []
    for r, c in zip(rows, left):
        pts.append((lon0 + c * cres, lat0 - r * cres))
        pts.append((lon0 + c * cres, lat0 - (r + 1) * cres))
    for r, c in zip(rows[::-1], right[::-1]):
        pts.append((lon0 + (c + 1) * cres, lat0 - (r + 1) * cres))
        pts.append((lon0 + (c + 1) * cres, lat0 - r * cres))
    ring = np.asarray(pts)
    return np.vstack([ring, ring[:1]])
