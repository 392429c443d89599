"""Ellipsoidal azimuthal-equidistant (AEQD) forward/inverse transforms for
the seven Equi7 continental systems, vectorized over numpy arrays.

Semantics match PROJ's ellipsoidal ``aeqd`` (geodesic-based oblique
aspect, meridian-arc polar aspect), which is what EPSG:27701-27707
resolve to.  Golden values pinned by
/root/reference/tests/test_equi7grid.py:50-117 (rtol 1e-7).

- oblique/equatorial (AF AS EU NA OC SA): solve the inverse geodesic from
  the projection centre to the point: x = x0 + s12*sin(azi1),
  y = y0 + s12*cos(azi1).
- polar (AN, lat_0 = -90): x = x0 + rho*sin(lon - lon_0),
  y = y0 + rho*cos(lon - lon_0) with rho the meridian arc from the pole.

Length distortion k follows /root/reference/src/equi7grid/core.py:292-324
(planar) and :416-452 (ellipsoidal): k = d / (a * sin(d / a)).
"""

from __future__ import annotations

import numpy as np

from equi7grid_ray.constants import CONTINENTS, ContinentDef
from equi7grid_ray.geodesic import (
    WGS84_A,
    geodesic_direct,
    geodesic_inverse,
    meridian_arc_from_equator,
    meridian_arc_to_latitude,
)

__all__ = ["forward", "inverse", "length_distortion_planar", "length_distortion_ellipsoid"]


def _cdef(continent: str | ContinentDef) -> ContinentDef:
    return continent if isinstance(continent, ContinentDef) else CONTINENTS[continent]


def forward(continent: str | ContinentDef, lon, lat) -> tuple[np.ndarray, np.ndarray]:
    """lon/lat (deg) -> continental AEQD x/y (m), vectorized."""
    c = _cdef(continent)
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    if c.polar:
        # south polar aspect (AN)
        pole_arc = meridian_arc_from_equator(-90.0)
        rho = meridian_arc_from_equator(lat) - pole_arc
        dlam = np.radians(lon - c.lon_0)
        x = c.x_0 + rho * np.sin(dlam)
        y = c.y_0 + rho * np.cos(dlam)
        return x, y
    s12, azi1, _ = geodesic_inverse(c.lat_0, c.lon_0, lat, lon)
    az = np.radians(azi1)
    x = c.x_0 + s12 * np.sin(az)
    y = c.y_0 + s12 * np.cos(az)
    return np.asarray(x), np.asarray(y)


def inverse(continent: str | ContinentDef, x, y) -> tuple[np.ndarray, np.ndarray]:
    """Continental AEQD x/y (m) -> lon/lat (deg), vectorized."""
    c = _cdef(continent)
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    dx = x - c.x_0
    dy = y - c.y_0
    if c.polar:
        rho = np.hypot(dx, dy)
        pole_arc = meridian_arc_from_equator(-90.0)
        lat = meridian_arc_to_latitude(pole_arc + rho)
        lon = c.lon_0 + np.degrees(np.arctan2(dx, dy))
        lon = np.where(rho == 0.0, c.lon_0, lon)
        lat = np.where(rho == 0.0, -90.0, lat)
        lon = np.remainder(lon + 180.0, 360.0) - 180.0
        return np.asarray(lon), np.asarray(lat)
    s12 = np.hypot(dx, dy)
    azi1 = np.degrees(np.arctan2(dx, dy))
    lat, lon, _ = geodesic_direct(c.lat_0, c.lon_0, azi1, s12)
    return lon, lat


def length_distortion_planar(continent: str | ContinentDef, x, y) -> np.ndarray:
    """k = d/(a*sin(d/a)) with d the planar distance to the projection
    centre (cf. /root/reference/src/equi7grid/core.py:292-324)."""
    c = _cdef(continent)
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    d = np.hypot(x - c.x_0, y - c.y_0)
    with np.errstate(invalid="ignore", divide="ignore"):
        k = d / WGS84_A / np.sin(d / WGS84_A)
    return np.where(d == 0.0, 1.0, k)


def length_distortion_ellipsoid(continent: str | ContinentDef, lon, lat) -> np.ndarray:
    """k via the geodesic distance centre->point
    (cf. /root/reference/src/equi7grid/core.py:416-452)."""
    c = _cdef(continent)
    if c.polar:
        pole_arc = meridian_arc_from_equator(-90.0)
        d = np.asarray(meridian_arc_from_equator(lat) - pole_arc)
    else:
        d, _, _ = geodesic_inverse(c.lat_0, c.lon_0, lat, lon)
    with np.errstate(invalid="ignore", divide="ignore"):
        k = d / WGS84_A / np.sin(d / WGS84_A)
    return np.where(d == 0.0, 1.0, k)
