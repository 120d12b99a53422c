"""Geodesic (ellipsoidal) length and area on WGS84 — the engine's
ST_GeodesicLength / ST_GeodesicArea kernels.

Reference: the SQLite dialect's ST_Length(geom, use_ellipsoid=1) /
ST_Area(geom, 1) (/root/reference/ogr/ogrsf_frmts/sqlite/
ogrsqlitesqlfunctions.cpp:630,675) which call OGRLineString::
get_GeodesicLength / get_GeodesicArea (/root/reference/ogr/
ogrlinestring.cpp:3228,3245) — thin wrappers over Karney's geodesic
library (geod_inverse / geod_polygonarea) on the SRS ellipsoid,
defaulting to WGS84.

This re-expression avoids a geodesy dependency with two published
closed-form methods, both fully NumPy-vectorized:

- LENGTH: Vincenty's inverse formula (Vincenty 1975, "Direct and
  inverse solutions of geodesics on the ellipsoid"), iterated to fixed
  point; agrees with the reference's autotest goldens to < 1e-11 rel
  (tests replay ogr_geom.py::test_ogr_geom_GeodesicLength values).

- AREA: map the ellipsoid to the AUTHALIC sphere (an exactly
  equal-area mapping; authalic latitude/radius series in e^2), walk
  each geodesic edge through `nsub` Vincenty-direct waypoints so the
  mapped boundary converges to the true edge image, and sum the
  spherical excess with the per-edge trapezoid formula
  tan(E/2) = tan(dl/2) * (tan(b1/2)+tan(b2/2)) / (1+tan(b1/2)tan(b2/2)).
  At nsub=32 this agrees with the reference's goldens
  (ogr_geom.py::test_ogr_geom_GeodesicArea) to ~1e-8 rel.

Transcendental-heavy by nature -> unit-golden tested (no duckdb twin;
CLAUDE.md transcendental rule).
"""

from __future__ import annotations

import numpy as np

#: WGS84 (the reference's default when the geometry has no SRS)
WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563
_B = WGS84_A * (1.0 - WGS84_F)
_E2 = WGS84_F * (2.0 - WGS84_F)
_E = float(np.sqrt(_E2))


def _vincenty_inverse(lat1, lon1, lat2, lon2, iters: int = 50):
    """Vectorized Vincenty inverse -> (s meters, alpha1 radians).
    Coincident points return (0, 0). Inputs in degrees."""
    lat1 = np.asarray(lat1, np.float64)
    lon1 = np.asarray(lon1, np.float64)
    lat2 = np.asarray(lat2, np.float64)
    lon2 = np.asarray(lon2, np.float64)
    L = np.radians(lon2 - lon1)
    U1 = np.arctan((1.0 - WGS84_F) * np.tan(np.radians(lat1)))
    U2 = np.arctan((1.0 - WGS84_F) * np.tan(np.radians(lat2)))
    sU1, cU1 = np.sin(U1), np.cos(U1)
    sU2, cU2 = np.sin(U2), np.cos(U2)
    lam = L.copy()
    s_sig = np.zeros_like(lam)
    c_sig = np.ones_like(lam)
    sig = np.zeros_like(lam)
    sin_alpha = np.zeros_like(lam)
    cos2_alpha = np.ones_like(lam)
    cos_2sigm = np.ones_like(lam)
    for _ in range(iters):
        sl, cl = np.sin(lam), np.cos(lam)
        s_sig = np.sqrt((cU2 * sl) ** 2 + (cU1 * sU2 - sU1 * cU2 * cl) ** 2)
        c_sig = sU1 * sU2 + cU1 * cU2 * cl
        sig = np.arctan2(s_sig, c_sig)
        nz = s_sig != 0.0
        sin_alpha = np.where(nz, cU1 * cU2 * sl / np.where(nz, s_sig, 1.0), 0.0)
        cos2_alpha = 1.0 - sin_alpha**2
        ca_nz = cos2_alpha != 0.0
        cos_2sigm = np.where(
            ca_nz, c_sig - 2.0 * sU1 * sU2 / np.where(ca_nz, cos2_alpha, 1.0),
            0.0)
        C = WGS84_F / 16.0 * cos2_alpha * (
            4.0 + WGS84_F * (4.0 - 3.0 * cos2_alpha))
        lam = L + (1.0 - C) * WGS84_F * sin_alpha * (
            sig + C * s_sig * (cos_2sigm
                               + C * c_sig * (-1.0 + 2.0 * cos_2sigm**2)))
    u2 = cos2_alpha * (WGS84_A**2 - _B**2) / _B**2
    k1 = (np.sqrt(1.0 + u2) - 1.0) / (np.sqrt(1.0 + u2) + 1.0)
    Aa = (1.0 + 0.25 * k1 * k1) / (1.0 - k1)
    Bb = k1 * (1.0 - 3.0 / 8.0 * k1 * k1)
    d_sig = Bb * s_sig * (cos_2sigm + Bb / 4.0 * (
        c_sig * (-1.0 + 2.0 * cos_2sigm**2)
        - Bb / 6.0 * cos_2sigm * (-3.0 + 4.0 * s_sig**2)
        * (-3.0 + 4.0 * cos_2sigm**2)))
    s = _B * Aa * (sig - d_sig)
    alpha1 = np.arctan2(cU2 * np.sin(lam), cU1 * sU2 - sU1 * cU2 * np.cos(lam))
    return np.where(s_sig == 0.0, 0.0, s), alpha1


def _vincenty_direct(lat1, lon1, alpha1, s, iters: int = 50):
    """Vectorized Vincenty direct -> (lat2, lon2) degrees."""
    lat1 = np.asarray(lat1, np.float64)
    lon1 = np.asarray(lon1, np.float64)
    alpha1 = np.asarray(alpha1, np.float64)
    s = np.asarray(s, np.float64)
    U1 = np.arctan((1.0 - WGS84_F) * np.tan(np.radians(lat1)))
    sU1, cU1 = np.sin(U1), np.cos(U1)
    sa1, ca1 = np.sin(alpha1), np.cos(alpha1)
    sig1 = np.arctan2(np.tan(U1), ca1)
    sin_alpha = cU1 * sa1
    cos2_alpha = 1.0 - sin_alpha**2
    u2 = cos2_alpha * (WGS84_A**2 - _B**2) / _B**2
    k1 = (np.sqrt(1.0 + u2) - 1.0) / (np.sqrt(1.0 + u2) + 1.0)
    Aa = (1.0 + 0.25 * k1 * k1) / (1.0 - k1)
    Bb = k1 * (1.0 - 3.0 / 8.0 * k1 * k1)
    sig0 = s / (_B * Aa)
    sig = sig0.copy()
    for _ in range(iters):
        cos_2sigm = np.cos(2.0 * sig1 + sig)
        s_sig, c_sig = np.sin(sig), np.cos(sig)
        d_sig = Bb * s_sig * (cos_2sigm + Bb / 4.0 * (
            c_sig * (-1.0 + 2.0 * cos_2sigm**2)
            - Bb / 6.0 * cos_2sigm * (-3.0 + 4.0 * s_sig**2)
            * (-3.0 + 4.0 * cos_2sigm**2)))
        sig = sig0 + d_sig
    s_sig, c_sig = np.sin(sig), np.cos(sig)
    cos_2sigm = np.cos(2.0 * sig1 + sig)
    lat2 = np.arctan2(
        sU1 * c_sig + cU1 * s_sig * ca1,
        (1.0 - WGS84_F) * np.sqrt(
            sin_alpha**2 + (sU1 * s_sig - cU1 * c_sig * ca1) ** 2))
    lam = np.arctan2(s_sig * sa1, cU1 * c_sig - sU1 * s_sig * ca1)
    C = WGS84_F / 16.0 * cos2_alpha * (
        4.0 + WGS84_F * (4.0 - 3.0 * cos2_alpha))
    Lw = lam - (1.0 - C) * WGS84_F * sin_alpha * (
        sig + C * s_sig * (cos_2sigm + C * c_sig * (-1.0 + 2.0 * cos_2sigm**2)))
    return np.degrees(lat2), lon1 + np.degrees(Lw)


def _authalic_lat(lat_deg):
    """Geodetic -> authalic latitude (radians); exact q-function form."""
    s = np.sin(np.radians(np.asarray(lat_deg, np.float64)))

    def q(x):
        return (1.0 - _E2) * (x / (1.0 - _E2 * x * x)
                              - (1.0 / (2.0 * _E))
                              * np.log((1.0 - _E * x) / (1.0 + _E * x)))

    return np.arcsin(np.clip(q(s) / q(1.0), -1.0, 1.0))


def authalic_radius() -> float:
    """Radius of the equal-area sphere for WGS84 (~6371007.181 m)."""
    qp = (1.0 - _E2) * (1.0 / (1.0 - _E2)
                        - (1.0 / (2.0 * _E)) * np.log((1.0 - _E) / (1.0 + _E)))
    return float(WGS84_A * np.sqrt(qp / 2.0))


_RA = authalic_radius()


def geodesic_length(lons, lats) -> float:
    """Sum of Vincenty segment distances along the polyline (meters) —
    get_GeodesicLength semantics (per-edge geod_inverse then sum,
    ogrlinestring.cpp:3245)."""
    lons = np.asarray(lons, np.float64)
    lats = np.asarray(lats, np.float64)
    if len(lons) < 2:
        return 0.0
    s, _ = _vincenty_inverse(lats[:-1], lons[:-1], lats[1:], lons[1:])
    return float(np.sum(s))


def _ring_area(lons, lats, nsub: int) -> float:
    """Signed authalic-sphere excess area of one closed ring (m^2)."""
    lons = np.asarray(lons, np.float64)
    lats = np.asarray(lats, np.float64)
    if len(lons) > 1 and lons[0] == lons[-1] and lats[0] == lats[-1]:
        lons, lats = lons[:-1], lats[:-1]
    n = len(lons)
    if n < 3:
        return 0.0
    la2 = np.roll(lats, -1)
    lo2 = np.roll(lons, -1)
    s, a1 = _vincenty_inverse(lats, lons, la2, lo2)
    # waypoints: fractions k/nsub of each edge, k = 0..nsub-1 (vertex
    # included once); shape (n, nsub)
    fr = (np.arange(nsub, dtype=np.float64) / nsub)[None, :]
    wl, wo = _vincenty_direct(
        np.repeat(lats, nsub), np.repeat(lons, nsub),
        np.repeat(a1, nsub), (s[:, None] * fr).reshape(-1))
    # k=0 waypoints are the vertices themselves — use exact inputs to
    # avoid direct-solver noise at s=0
    wl = wl.reshape(n, nsub)
    wo = wo.reshape(n, nsub)
    wl[:, 0] = lats
    wo[:, 0] = lons
    wl = wl.reshape(-1)
    wo = wo.reshape(-1)
    b1 = _authalic_lat(wl)
    b2 = np.roll(b1, -1)
    dl = np.radians(np.roll(wo, -1) - wo)
    t1 = np.tan(b1 / 2.0)
    t2 = np.tan(b2 / 2.0)
    exc = 2.0 * np.arctan(np.tan(dl / 2.0) * (t1 + t2) / (1.0 + t1 * t2))
    return float(np.sum(exc)) * _RA * _RA


def geodesic_area(rings, nsub: int = 32) -> float:
    """Ellipsoidal area (m^2) of a polygon given as [ring0, ring1, ...]
    where each ring is an (n, 2) array of (lon, lat) — outer ring first,
    holes after, matching the repo's WKB decode. Follows
    geod_polygonarea's hole handling: |outer| minus |holes|."""
    if not rings:
        return 0.0
    outer = np.asarray(rings[0], np.float64)
    total = abs(_ring_area(outer[:, 0], outer[:, 1], nsub))
    for hole in rings[1:]:
        h = np.asarray(hole, np.float64)
        total -= abs(_ring_area(h[:, 0], h[:, 1], nsub))
    return total
