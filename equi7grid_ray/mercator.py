"""Spherical web-mercator (EPSG:3857) forward/inverse -- supports the
reference's second warp source CRS (tests/test_warp.py:83-124 builds a
webmercator fixture; rasterio handles it there, closed-form math here)."""

from __future__ import annotations

import numpy as np

R = 6378137.0

__all__ = ["R", "forward", "inverse"]


def forward(lon, lat) -> tuple[np.ndarray, np.ndarray]:
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    x = R * np.radians(lon)
    y = R * np.log(np.tan(np.pi / 4.0 + np.radians(np.clip(lat, -89.9999, 89.9999)) / 2.0))
    return x, y


def inverse(x, y) -> tuple[np.ndarray, np.ndarray]:
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = np.degrees(x / R)
    lat = np.degrees(2.0 * np.arctan(np.exp(y / R)) - np.pi / 2.0)
    return lon, lat
