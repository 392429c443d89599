"""Vectorized geodesic computations on the WGS84 ellipsoid (pure numpy).

Implements Karney's series solution of the direct and inverse geodesic
problems (C. F. F. Karney, "Algorithms for geodesics", J. Geodesy 87(1),
43-55, 2013, doi:10.1007/s00190-012-0578-z), truncated at 6th order in the
expansion parameter -- the same order geographiclib uses in double
precision.  Everything is vectorized over numpy arrays so a whole Arrow
batch of coordinates is transformed with no Python-level loop.

This replaces the reference engine's dependency on ``geographiclib`` /
``pyproj`` (see /root/reference/src/equi7grid/core.py:13 and the golden
coordinate tests in /root/reference/tests/test_equi7grid.py:50-117, which
pin accuracy to assert_allclose rtol=1e-7).

Scope note: the Newton iteration for the inverse problem uses the simple
(non-antipodal) starting guess.  Point pairs closer than ~2 degrees to
exact antipodality converge slowly or to a non-shortest geodesic; Equi7
zone geometry keeps every zone point well inside that envelope, and
far-outside points only need approximate positions (they are discarded by
the zone clip).  See ``INVERSE_ANTIPODAL_MARGIN_DEG``.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "WGS84_A",
    "WGS84_F",
    "geodesic_inverse",
    "geodesic_direct",
    "meridian_arc_from_equator",
    "meridian_arc_to_latitude",
]

WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563
_F1 = 1.0 - WGS84_F
_B = WGS84_A * _F1
_E2 = WGS84_F * (2.0 - WGS84_F)
_EP2 = _E2 / (1.0 - _E2)  # second eccentricity squared
_N = WGS84_F / (2.0 - WGS84_F)  # third flattening

INVERSE_ANTIPODAL_MARGIN_DEG = 2.0
_TINY = np.sqrt(np.finfo(np.float64).tiny)
_TOL = 1e-14
#: cache-block size for the vectorized solvers (~8 KB * ~30 live
#: temporaries ~ a few hundred KB working set -- fits per-core L2)
_CHUNK = 16_384


def _norm_pair(s: np.ndarray, c: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Normalize (s, c) so that s**2 + c**2 == 1."""
    h = np.hypot(s, c)
    return s / h, c / h


def _ang_normalize_deg(x: np.ndarray) -> np.ndarray:
    """Reduce angle in degrees to (-180, 180]."""
    y = np.remainder(x, 360.0)
    y = np.where(y > 180.0, y - 360.0, y)
    y = np.where(y <= -180.0, y + 360.0, y)
    return y


# ---------------------------------------------------------------------------
# Series coefficients (Karney 2013, eqs. 17, 18, 21, 42, 43, 24, 25),
# 6th order in eps.
# ---------------------------------------------------------------------------


def _a1m1(eps: np.ndarray) -> np.ndarray:
    e2 = eps * eps
    t = e2 * (e2 * (e2 + 4.0) + 64.0) / 256.0
    return (t + eps) / (1.0 - eps)  # A1 - 1


def _c1(eps: np.ndarray) -> list[np.ndarray]:
    e = eps
    e2 = e * e
    return [
        e * (-0.5 + e2 * (3.0 / 16.0 - e2 / 32.0)),
        e2 * (-1.0 / 16.0 + e2 * (1.0 / 32.0 - 9.0 * e2 / 2048.0)),
        e * e2 * (-1.0 / 48.0 + e2 * (3.0 / 256.0)),
        e2 * e2 * (-5.0 / 512.0 + e2 * (3.0 / 512.0)),
        e * e2 * e2 * (-7.0 / 1280.0),
        e2 * e2 * e2 * (-7.0 / 2048.0),
    ]


def _c1p(eps: np.ndarray) -> list[np.ndarray]:
    e = eps
    e2 = e * e
    return [
        e * (0.5 + e2 * (-9.0 / 32.0 + e2 * (205.0 / 1536.0))),
        e2 * (5.0 / 16.0 + e2 * (-37.0 / 96.0 + e2 * (1335.0 / 4096.0))),
        e * e2 * (29.0 / 96.0 + e2 * (-75.0 / 128.0)),
        e2 * e2 * (539.0 / 1536.0 + e2 * (-2391.0 / 2560.0)),
        e * e2 * e2 * (3467.0 / 7680.0),
        e2 * e2 * e2 * (38081.0 / 61440.0),
    ]


def _a2m1(eps: np.ndarray) -> np.ndarray:
    e2 = eps * eps
    t = e2 * (e2 * (25.0 * e2 + 36.0) + 64.0) / 256.0
    return (t - eps) / (1.0 + eps)  # A2 - 1


def _c2(eps: np.ndarray) -> list[np.ndarray]:
    e = eps
    e2 = e * e
    return [
        e * (0.5 + e2 * (1.0 / 16.0 + e2 / 32.0)),
        e2 * (3.0 / 16.0 + e2 * (1.0 / 32.0 + 35.0 * e2 / 2048.0)),
        e * e2 * (5.0 / 48.0 + e2 * (5.0 / 256.0)),
        e2 * e2 * (35.0 / 512.0 + e2 * (7.0 / 512.0)),
        e * e2 * e2 * (63.0 / 1280.0),
        e2 * e2 * e2 * (77.0 / 2048.0),
    ]


def _a3(eps: np.ndarray) -> np.ndarray:
    n = _N
    a = (
        1.0,
        -(0.5 - 0.5 * n),
        -(0.25 + n / 8.0 - 3.0 * n * n / 8.0),
        -(1.0 / 16.0 + 3.0 * n / 16.0 + n * n / 16.0),
        -(3.0 / 64.0 + n / 32.0),
        -3.0 / 128.0,
    )
    out = np.full_like(eps, a[5])
    for coeff in a[4::-1]:
        out = out * eps + coeff
    return out


def _c3(eps: np.ndarray) -> list[np.ndarray]:
    n = _N
    e = eps
    e2 = e * e
    c31 = e * (
        (0.25 - 0.25 * n)
        + e * ((1.0 - n * n) / 8.0 + e * ((3.0 + 3.0 * n - n * n) / 64.0 + e * ((5.0 + 2.0 * n) / 128.0 + e * (3.0 / 128.0))))
    )
    c32 = e2 * (
        (2.0 - 3.0 * n + n * n) / 32.0
        + e * ((3.0 - 2.0 * n - 3.0 * n * n) / 64.0 + e * ((3.0 + n) / 128.0 + e * (5.0 / 256.0)))
    )
    c33 = e * e2 * ((5.0 - 9.0 * n + 5.0 * n * n) / 192.0 + e * ((9.0 - 10.0 * n) / 384.0 + e * (7.0 / 512.0)))
    c34 = e2 * e2 * ((7.0 - 14.0 * n) / 512.0 + e * (7.0 / 512.0))
    c35 = e * e2 * e2 * (21.0 / 2560.0)
    return [c31, c32, c33, c34, c35]


def _sin_series(sinx: np.ndarray, cosx: np.ndarray, coeffs: list[np.ndarray]) -> np.ndarray:
    """Clenshaw sum of c[l-1] * sin(2*l*x) for l = 1..len(coeffs)."""
    ar = 2.0 * (cosx - sinx) * (cosx + sinx)  # 2 cos(2x)
    y0 = np.zeros_like(ar)
    y1 = np.zeros_like(ar)
    for c in coeffs[::-1]:
        y0, y1 = ar * y0 - y1 + c, y0
    return 2.0 * sinx * cosx * y0  # sin(2x) * y0


def _eps_from_calp0(calp0: np.ndarray) -> np.ndarray:
    k2 = calp0 * calp0 * _EP2
    return k2 / (2.0 * (1.0 + np.sqrt(1.0 + k2)) + k2)


# ---------------------------------------------------------------------------
# Inverse problem
# ---------------------------------------------------------------------------


def geodesic_inverse(
    lat1, lon1, lat2, lon2, *, max_iter: int = 30
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Solve the inverse geodesic problem, vectorized.

    Parameters are in degrees; broadcast against each other.

    Returns
    -------
    (s12, azi1, azi2):
        distance in metres and forward azimuths (degrees, clockwise from
        north) at the two endpoints.
    """
    lat1, lon1, lat2, lon2 = np.broadcast_arrays(
        *(np.asarray(v, dtype=np.float64) for v in (lat1, lon1, lat2, lon2))
    )
    shape = lat1.shape
    lat1, lon1, lat2, lon2 = (np.ravel(v).copy() for v in (lat1, lon1, lat2, lon2))

    # Cache-block large batches: the Newton solver materializes dozens of
    # full-length float64 temporaries; past ~L2 size that turns the solve
    # memory-bandwidth-bound, which is exactly what kills multi-worker
    # scaling on a shared memory bus.  Chunked, every temporary stays in
    # cache and per-core throughput holds flat at high concurrency.
    if lat1.size > _CHUNK:
        s12 = np.empty_like(lat1)
        az1 = np.empty_like(lat1)
        az2 = np.empty_like(lat1)
        for st in range(0, lat1.size, _CHUNK):
            sl = slice(st, st + _CHUNK)
            s12[sl], az1[sl], az2[sl] = geodesic_inverse(
                lat1[sl], lon1[sl], lat2[sl], lon2[sl], max_iter=max_iter
            )
        return s12.reshape(shape), az1.reshape(shape), az2.reshape(shape)

    # Special cases the Newton machinery cannot represent (Karney 2013
    # sec. 5 / geographiclib GenInverse): coincident endpoints (0/0 in the
    # starting-guess normalization) and purely equatorial geodesics
    # (sbet1 == sbet2 == 0 makes the azimuth equation degenerate).  Solve
    # them in closed form and run the main loop on a benign substitute.
    lon12s = _ang_normalize_deg(lon2 - lon1)
    coinc = (lat1 == lat2) & (lon12s == 0.0)
    equat = (
        (lat1 == 0.0)
        & (lat2 == 0.0)
        & (np.abs(np.radians(lon12s)) <= (1.0 - WGS84_F) * np.pi)
        & ~coinc
    )
    special = coinc | equat
    if special.any():
        eq_s12 = WGS84_A * np.abs(np.radians(lon12s))
        eq_azi = np.where(lon12s >= 0.0, 90.0, -90.0)
        lat1 = np.where(special, -30.0, lat1)
        lat2 = np.where(special, 20.0, lat2)
        lon1 = np.where(special, 0.0, lon1)
        lon2 = np.where(special, 40.0, lon2)

    lon12 = _ang_normalize_deg(lon2 - lon1)
    lonsign = np.where(lon12 >= 0.0, 1.0, -1.0)
    lon12 = lon12 * lonsign
    lam12 = np.radians(lon12)

    # canonical arrangement: point 1 is the one with larger |latitude|,
    # moved to the southern hemisphere.  Swapping the endpoints reverses
    # the sign of the longitude difference -- fold that into lonsign.
    swapp = np.where(np.abs(lat1) >= np.abs(lat2), 1.0, -1.0)
    lonsign = lonsign * swapp
    p1 = np.where(swapp > 0, lat1, lat2)
    p2 = np.where(swapp > 0, lat2, lat1)
    latsign = np.where(p1 < 0.0, 1.0, -1.0)
    p1 = p1 * latsign
    p2 = p2 * latsign

    sbet1 = _F1 * np.sin(np.radians(p1))
    cbet1 = np.cos(np.radians(p1))
    sbet1, cbet1 = _norm_pair(sbet1, cbet1)
    cbet1 = np.maximum(cbet1, _TINY)
    sbet2 = _F1 * np.sin(np.radians(p2))
    cbet2 = np.cos(np.radians(p2))
    sbet2, cbet2 = _norm_pair(sbet2, cbet2)
    cbet2 = np.maximum(cbet2, _TINY)

    # guard the |bet2| == |bet1| symmetric case against Newton singularity
    eqmask = np.abs(sbet2) == -sbet1
    cbet2 = np.where(eqmask & (cbet1 < -sbet1), cbet1, cbet2)
    sbet2 = np.where(eqmask & ~(cbet1 < -sbet1), np.where(sbet2 < 0, sbet1, -sbet1), sbet2)

    dn1 = np.sqrt(1.0 + _EP2 * sbet1 * sbet1)
    dn2 = np.sqrt(1.0 + _EP2 * sbet2 * sbet2)

    # starting guess (Karney 2013 sec. 5, non-antipodal branch)
    wbar = np.sqrt(1.0 - _E2 * (0.5 * (cbet1 + cbet2)) ** 2)
    omg12 = lam12 / wbar
    somg12 = np.sin(omg12)
    comg12 = np.cos(omg12)
    sbet12 = sbet2 * cbet1 - cbet2 * sbet1
    sbet12a = sbet2 * cbet1 + cbet2 * sbet1
    salp1 = cbet2 * somg12
    pos_br = sbet12 + cbet2 * sbet1 * somg12 * somg12 / (1.0 + comg12)
    with np.errstate(divide="ignore", invalid="ignore"):
        neg_br = sbet12a - cbet2 * sbet1 * somg12 * somg12 / np.maximum(1.0 - comg12, _TINY)
    calp1 = np.where(comg12 >= 0.0, pos_br, neg_br)
    salp1, calp1 = _norm_pair(salp1, calp1)
    salp1 = np.maximum(salp1, 0.0)

    n = len(lam12)
    sig12 = np.zeros(n)
    salp2 = np.zeros(n)
    calp2 = np.ones(n)
    eps = np.zeros(n)
    ssig1 = np.zeros(n)
    csig1 = np.ones(n)
    ssig2 = np.zeros(n)
    csig2 = np.ones(n)

    # Newton iteration with index-array compaction: each pass only touches
    # the still-unconverged subset (most points converge in 2-4 passes).
    idx = np.arange(n)
    sb1, cb1, sb2, cb2 = sbet1, cbet1, sbet2, cbet2
    d1, d2 = dn1, dn2
    lm = lam12
    sa1, ca1 = salp1, calp1
    for _ in range(max_iter):
        salp0 = sa1 * cb1
        calp0 = np.hypot(ca1, sa1 * sb1)

        c1_ = ca1 * cb1
        ssig1_, csig1_ = _norm_pair(sb1, c1_)
        # (somg, comg) pairs share one (unnormalized) scale per point;
        # omg12 uses only cross-point products, so the scale cancels.
        somg1 = salp0 * sb1
        comg1 = c1_

        salp2_ = np.where(cb2 != cb1, salp0 / cb2, sa1)
        calp2_sq = (ca1 * cb1) ** 2 + np.where(
            cb1 < -sb1,
            (cb2 - cb1) * (cb1 + cb2),
            (sb1 - sb2) * (sb1 + sb2),
        )
        calp2_ = np.where(
            (cb2 != cb1) | (np.abs(sb2) != -sb1),
            np.sqrt(np.maximum(calp2_sq, 0.0)) / cb2,
            np.abs(ca1),
        )
        c2_ = calp2_ * cb2
        ssig2_, csig2_ = _norm_pair(sb2, c2_)
        somg2 = salp0 * sb2
        comg2 = c2_

        sig12_ = np.arctan2(
            np.maximum(csig1_ * ssig2_ - ssig1_ * csig2_, 0.0),
            csig1_ * csig2_ + ssig1_ * ssig2_,
        )
        omg12_ = np.arctan2(
            np.maximum(comg1 * somg2 - somg1 * comg2, 0.0),
            comg1 * comg2 + somg1 * somg2,
        )

        eps_ = _eps_from_calp0(calp0)
        c3 = _c3(eps_)
        b31 = _sin_series(ssig1_, csig1_, c3)
        b32 = _sin_series(ssig2_, csig2_, c3)
        domg12 = -WGS84_F * salp0 * _a3(eps_) * (sig12_ + (b32 - b31))
        v = omg12_ + domg12 - lm

        # write current geometry into the full-size result arrays
        sig12[idx] = sig12_
        salp2[idx] = salp2_
        calp2[idx] = calp2_
        eps[idx] = eps_
        ssig1[idx] = ssig1_
        csig1[idx] = csig1_
        ssig2[idx] = ssig2_
        csig2[idx] = csig2_
        salp1[idx] = sa1
        calp1[idx] = ca1

        act = np.abs(v) >= _TOL
        if not act.any():
            break

        # Newton derivative via the reduced length m12
        a1 = 1.0 + _a1m1(eps_)
        a2 = 1.0 + _a2m1(eps_)
        b1d = _sin_series(ssig2_, csig2_, _c1(eps_)) - _sin_series(ssig1_, csig1_, _c1(eps_))
        b2d = _sin_series(ssig2_, csig2_, _c2(eps_)) - _sin_series(ssig1_, csig1_, _c2(eps_))
        j12 = (a1 - a2) * sig12_ + (a1 * b1d - a2 * b2d)
        m12b = d2 * (csig1_ * ssig2_) - d1 * (ssig1_ * csig2_) - csig1_ * csig2_ * j12
        # canonical arrangement keeps sbet1 <= 0, so the meridional-limit
        # derivative -2*f1*dn1/sbet1 is positive
        dv = np.where(
            calp2_ == 0.0,
            -2.0 * _F1 * d1 / np.minimum(sb1, -_TINY),
            m12b * _F1 / np.maximum(calp2_ * cb2, _TINY),
        )

        # compact to the active subset
        if not act.all():
            idx = idx[act]
            sb1, cb1, sb2, cb2 = sb1[act], cb1[act], sb2[act], cb2[act]
            d1, d2 = d1[act], d2[act]
            lm = lm[act]
            sa1, ca1 = sa1[act], ca1[act]
            v, dv = v[act], dv[act]

        dalp1 = np.where(dv != 0.0, -v / dv, 0.0)
        dalp1 = np.clip(dalp1, -np.pi / 2, np.pi / 2)
        sd = np.sin(dalp1)
        cd = np.cos(dalp1)
        nsalp1 = sa1 * cd + ca1 * sd
        ncalp1 = ca1 * cd - sa1 * sd
        sa1 = np.maximum(nsalp1, _TINY)
        ca1 = ncalp1
        sa1, ca1 = _norm_pair(sa1, ca1)

    a1 = 1.0 + _a1m1(eps)
    c1c = _c1(eps)
    b1d = _sin_series(ssig2, csig2, c1c) - _sin_series(ssig1, csig1, c1c)
    s12 = _B * a1 * (sig12 + b1d)

    # undo the canonical arrangement
    swap_mask = swapp < 0
    salp1f = np.where(swap_mask, salp2, salp1)
    calp1f = np.where(swap_mask, calp2, calp1)
    salp2f = np.where(swap_mask, salp1, salp2)
    calp2f = np.where(swap_mask, calp1, calp2)
    salp1f = salp1f * swapp * lonsign
    calp1f = calp1f * swapp * latsign
    salp2f = salp2f * swapp * lonsign
    calp2f = calp2f * swapp * latsign

    azi1 = np.degrees(np.arctan2(salp1f, calp1f))
    azi2 = np.degrees(np.arctan2(salp2f, calp2f))

    if special.any():
        s12 = np.where(coinc, 0.0, np.where(equat, eq_s12, s12))
        azi1 = np.where(coinc, 0.0, np.where(equat, eq_azi, azi1))
        azi2 = np.where(coinc, 0.0, np.where(equat, eq_azi, azi2))

    return s12.reshape(shape), azi1.reshape(shape), azi2.reshape(shape)


# ---------------------------------------------------------------------------
# Direct problem
# ---------------------------------------------------------------------------


def geodesic_direct(lat1, lon1, azi1, s12) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Solve the direct geodesic problem, vectorized (degrees / metres in,
    degrees out).  Returns (lat2, lon2, azi2)."""
    lat1, lon1, azi1, s12 = np.broadcast_arrays(
        *(np.asarray(v, dtype=np.float64) for v in (lat1, lon1, azi1, s12))
    )
    shape = lat1.shape
    lat1, lon1, azi1, s12 = (np.ravel(v) for v in (lat1, lon1, azi1, s12))

    if lat1.size > _CHUNK:  # cache-block (see geodesic_inverse)
        la = np.empty_like(lat1)
        lo = np.empty_like(lat1)
        az = np.empty_like(lat1)
        for st in range(0, lat1.size, _CHUNK):
            sl = slice(st, st + _CHUNK)
            la[sl], lo[sl], az[sl] = geodesic_direct(
                lat1[sl], lon1[sl], azi1[sl], s12[sl]
            )
        return la.reshape(shape), lo.reshape(shape), az.reshape(shape)

    salp1 = np.sin(np.radians(azi1))
    calp1 = np.cos(np.radians(azi1))
    sbet1 = _F1 * np.sin(np.radians(lat1))
    cbet1 = np.cos(np.radians(lat1))
    sbet1, cbet1 = _norm_pair(sbet1, cbet1)
    cbet1 = np.maximum(cbet1, _TINY)

    salp0 = salp1 * cbet1
    calp0 = np.hypot(calp1, salp1 * sbet1)

    s1 = sbet1
    c1_ = np.where((sbet1 == 0.0) & (calp1 == 0.0), 1.0, calp1 * cbet1)
    ssig1, csig1 = _norm_pair(s1, c1_)
    somg1 = salp0 * ssig1
    comg1 = csig1

    eps = _eps_from_calp0(calp0)
    a1 = 1.0 + _a1m1(eps)
    c1c = _c1(eps)
    b11 = _sin_series(ssig1, csig1, c1c)
    sig1 = np.arctan2(ssig1, csig1)

    tau12 = s12 / (_B * a1)
    tau2 = sig1 + b11 + tau12
    c1pc = _c1p(eps)
    sig2 = tau2 + _sin_series(np.sin(tau2), np.cos(tau2), c1pc)
    ssig2 = np.sin(sig2)
    csig2 = np.cos(sig2)

    sbet2 = calp0 * ssig2
    cbet2 = np.hypot(salp0, calp0 * csig2)
    lat2 = np.degrees(np.arctan2(sbet2, _F1 * cbet2))
    somg2 = salp0 * ssig2
    comg2 = csig2
    omg12 = np.arctan2(somg2 * comg1 - comg2 * somg1, comg2 * comg1 + somg2 * somg1)

    c3 = _c3(eps)
    b31 = _sin_series(ssig1, csig1, c3)
    b32 = _sin_series(ssig2, csig2, c3)
    lam12 = omg12 - WGS84_F * salp0 * _a3(eps) * ((sig2 - sig1) + (b32 - b31))
    lon2 = _ang_normalize_deg(lon1 + np.degrees(lam12))
    azi2 = np.degrees(np.arctan2(salp0, calp0 * csig2))
    return lat2.reshape(shape), lon2.reshape(shape), azi2.reshape(shape)


# ---------------------------------------------------------------------------
# Meridian arcs (used by the polar AEQD aspect for the AN continent)
# ---------------------------------------------------------------------------

_MERID_EPS = _EP2 / (2.0 * (1.0 + np.sqrt(1.0 + _EP2)) + _EP2)
_MERID_A1 = 1.0 + float(_a1m1(np.float64(_MERID_EPS)))
_MERID_C1 = [float(c) for c in _c1(np.float64(_MERID_EPS))]
_MERID_C1P = [float(c) for c in _c1p(np.float64(_MERID_EPS))]


def meridian_arc_from_equator(lat) -> np.ndarray:
    """Meridian arc length (m) from the equator to geographic latitude."""
    lat = np.asarray(lat, dtype=np.float64)
    beta = np.arctan(_F1 * np.tan(np.radians(lat)))
    beta = np.where(np.abs(lat) >= 90.0, np.sign(lat) * np.pi / 2.0, beta)
    coeffs = [np.full_like(beta, c) for c in _MERID_C1]
    return _B * _MERID_A1 * (beta + _sin_series(np.sin(beta), np.cos(beta), coeffs))


def meridian_arc_to_latitude(s) -> np.ndarray:
    """Inverse of :func:`meridian_arc_from_equator` (s in metres from the
    equator along a meridian, signed)."""
    s = np.asarray(s, dtype=np.float64)
    tau = s / (_B * _MERID_A1)
    coeffs = [np.full_like(tau, c) for c in _MERID_C1P]
    beta = tau + _sin_series(np.sin(tau), np.cos(tau), coeffs)
    return np.degrees(np.arctan(np.tan(beta) / _F1))
