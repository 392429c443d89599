"""Gridded interpolation of the AEQD forward projection.

The Karney inverse-geodesic solve behind ``aeqd.forward`` costs ~1.5 us
per point and streams ~30 float64 temporaries per Newton pass -- at high
worker concurrency the hot tile-assignment path becomes DRAM-bound on
those temporaries.  This module trades that for a precomputed per-zone
lookup grid + separable 4-point Lagrange (bicubic) interpolation:

* build once per (continent, bbox): exact ``aeqd.forward`` evaluated on a
  regular ``step``-degree lon/lat grid (a few MB per zone, built on the
  driver and broadcast with the stage state);
* evaluate per batch: 16 gathers + ~40 flops per point, no temporaries
  beyond the 4-tap weight vectors.

Accuracy: 4-point Lagrange interpolation of a C^inf function has error
O(step^4 * |f''''|).  Measured against the exact solver on dense random
points the max error at step=0.25 deg is < 2e-3 m (see
tests/test_interp.py) -- more than two orders inside the reference's own
pinned accuracy contract of rtol=1e-7 (~0.6 m at zone scale,
/root/reference/tests/test_equi7grid.py:50-99), so tile assignments are
identical to the exact path.  The same design -- approximate the exact
transformer on a grid, bounded by an error budget -- is what GDAL's
default approximate transformer and PROJ interpolation grids do.

The AEQD projection is smooth everywhere except the antipode of the
projection center; grid nodes within ~0.5 deg of the antipode may carry
inaccurate values, but no point that zone-classifies into a continent
lies anywhere near that continent's antipode, and the interpolation
stencil is strictly local (4x4 cells).
"""

from __future__ import annotations

import numpy as np

from equi7grid_ray import aeqd
from equi7grid_ray.constants import ContinentDef

__all__ = ["CubicGridProjector", "build_zone_projectors"]


def _lagrange_weights(f: np.ndarray) -> tuple[np.ndarray, ...]:
    """4-point Lagrange weights for taps at offsets (-1, 0, 1, 2) given
    the fractional position f in [0, 1)."""
    fm = f - 1.0
    fp = f + 1.0
    f2 = f - 2.0
    w0 = -f * fm * f2 / 6.0
    w1 = fp * fm * f2 / 2.0
    w2 = -fp * f * f2 / 2.0
    w3 = fp * f * fm / 6.0
    return w0, w1, w2, w3


class CubicGridProjector:
    """Per-zone forward projector: lon/lat (deg) -> AEQD x/y (m)."""

    def __init__(
        self,
        continent: str | ContinentDef,
        bbox: tuple[float, float, float, float],
        step: float = 0.25,
    ):
        self.continent = continent
        cdef = continent if isinstance(continent, ContinentDef) else None
        if cdef is None:
            from equi7grid_ray.constants import CONTINENTS

            cdef = CONTINENTS[continent]
        self._far_lon = (cdef.lon_0 + 180.0 + 180.0) % 360.0 - 180.0
        lon0, lat0, lon1, lat1 = bbox
        pad = 2.0 * step
        lon0 -= pad
        lon1 += pad
        lat0 -= pad
        lat1 += pad
        self.step = float(step)
        self.lon0 = float(lon0)
        self.lat0 = float(lat0)
        nlon = int(np.ceil((lon1 - lon0) / step)) + 1
        nlat = int(np.ceil((lat1 - lat0) / step)) + 1
        lons = lon0 + step * np.arange(nlon)
        lats = lat0 + step * np.arange(nlat)
        glon, glat = np.meshgrid(lons, lats)
        glon = glon.ravel()
        glat = glat.ravel()
        # grid nodes past a pole continue the projection smoothly OVER the
        # pole: f(lon, 90 + d) == f(lon + 180, 90 - d).  (Clipping them to
        # the pole instead would put a wrong sample at the node position
        # and cost km-scale interpolation error for points near lat 90.)
        over = glat > 90.0
        under = glat < -90.0
        glon_e = np.where(over | under, glon + 180.0, glon)
        glat_e = np.where(over, 180.0 - glat, np.where(under, -180.0 - glat, glat))
        x, y = aeqd.forward(continent, glon_e, glat_e)
        self.gx = np.ascontiguousarray(x.reshape(nlat, nlon))
        self.gy = np.ascontiguousarray(y.reshape(nlat, nlon))
        self.nlon = nlon
        self.nlat = nlat

    #: exact-solver fallback bands: the interpolation error concentrates
    #: (a) in the last degree at the poles and (b) in a narrow band along
    #: the projection center's far meridian (lon_0 + 180), where the
    #: azimuth-of-departure changes fastest (measured up to ~0.5 m there
    #: vs < 1e-4 m everywhere else).  Together the bands cover ~1.5% of a
    #: uniform global sweep.
    EXACT_LAT = 89.0
    EXACT_FAR_LON_BAND = 2.0

    def __call__(self, lon, lat) -> tuple[np.ndarray, np.ndarray]:
        lon = np.asarray(lon, dtype=np.float64)
        lat = np.asarray(lat, dtype=np.float64)
        far = np.abs(
            (lon - self._far_lon + 180.0) % 360.0 - 180.0
        ) < self.EXACT_FAR_LON_BAND
        polar = (np.abs(lat) > self.EXACT_LAT) | far
        if polar.any():
            x = np.empty_like(lon, dtype=np.float64)
            y = np.empty_like(lon, dtype=np.float64)
            x[polar], y[polar] = aeqd.forward(
                self.continent, lon[polar], lat[polar]
            )
            rest = ~polar
            x[rest], y[rest] = self._interp(lon[rest], lat[rest])
            return x, y
        return self._interp(lon, lat)

    def _interp(self, lon, lat) -> tuple[np.ndarray, np.ndarray]:
        t = (lon - self.lon0) / self.step
        u = (lat - self.lat0) / self.step
        # integer cell such that the 4-tap window [i-1, i+2] stays in-grid
        it = np.clip(t.astype(np.int64), 1, self.nlon - 3)
        iu = np.clip(u.astype(np.int64), 1, self.nlat - 3)
        ft = t - it
        fu = u - iu
        wt = _lagrange_weights(ft)
        wu = _lagrange_weights(fu)
        x = np.zeros_like(t)
        y = np.zeros_like(t)
        base_r = iu - 1
        base_c = it - 1
        for a in range(4):
            rows = base_r + a
            # interpolate along lon for this tap row, weight along lat
            rx = (
                wt[0] * self.gx[rows, base_c]
                + wt[1] * self.gx[rows, base_c + 1]
                + wt[2] * self.gx[rows, base_c + 2]
                + wt[3] * self.gx[rows, base_c + 3]
            )
            ry = (
                wt[0] * self.gy[rows, base_c]
                + wt[1] * self.gy[rows, base_c + 1]
                + wt[2] * self.gy[rows, base_c + 2]
                + wt[3] * self.gy[rows, base_c + 3]
            )
            x += wu[a] * rx
            y += wu[a] * ry
        return x, y

    @property
    def nbytes(self) -> int:
        return self.gx.nbytes + self.gy.nbytes


_CACHE: dict[tuple, CubicGridProjector] = {}


def get_projector(
    continent: str, bbox: tuple[float, float, float, float], step: float = 0.25
) -> CubicGridProjector:
    """Process-cached projector (grids are pure functions of
    continent/bbox/step; reuse across stages and tests)."""
    key = (str(continent), tuple(round(float(v), 6) for v in bbox), float(step))
    if key not in _CACHE:
        _CACHE[key] = CubicGridProjector(continent, bbox, step=step)
    return _CACHE[key]


def build_zone_projectors(
    polys: dict, continents: list[str], step: float = 0.25
) -> dict[str, CubicGridProjector]:
    """Build projectors for the non-polar continents from the zone
    classifier's polygon bboxes (the only region whose points can
    classify into the zone).  The polar AN zone keeps the exact
    closed-form polar-aspect forward (already cheap)."""
    from equi7grid_ray.constants import CONTINENTS

    out: dict[str, CubicGridProjector] = {}
    for cont in continents:
        cdef = CONTINENTS[cont]
        if cdef.polar:
            continue
        poly = polys.get(cont)
        if poly is None:
            continue
        x0, y0, x1, y1 = poly.bbox
        out[cont] = get_projector(cont, (x0, y0, x1, y1), step=step)
    return out
