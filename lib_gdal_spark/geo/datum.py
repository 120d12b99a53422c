"""Helmert 7-parameter datum shifts — the `+towgs84` leg of
coordinate transformation.

The reference reaches datum shifts through PROJ from
OGRCreateCoordinateTransformation (ogr/ogrct.cpp:1027): geographic ->
geocentric (cart) -> 7-parameter Helmert -> geocentric -> geographic,
with `push v_3 ... pop v_3` around the pipeline for 2D CRSs, so the
ellipsoidal height rides through UNTOUCHED and only lon/lat shift
(autotest/osr/osr_ct.py:325 test_osr_ct_towgs84_both_side asserts
z == 20 exactly). A CRS with no datum information on either side gets
a null datum transform (osr_ct.py:300 test_osr_ct_towgs84_only_one_side
— PROJ's "ballpark" path); this module reproduces both behaviors.

Rotation convention: position vector (EPSG method 1033) — the
convention PROJ assigns to `+towgs84` terms. Translations in meters,
rotations in arc-seconds, scale in ppm:

    [X']       [tx]              [  1  -rz   ry ] [X]
    [Y']   =   [ty]  + (1+s·1e-6)[ rz    1  -rx ] [Y]
    [Z']       [tz]              [-ry   rx    1 ] [Z]

The reverse leg (WGS84 -> target datum) applies the EXACT inverse of
this affine map — the 3x3 matrix inverse is precomputed per parameter
set (deterministic: closed-form adjugate over the same doubles), so a
forward/backward round trip is identity to float precision and every
coefficient can be injected verbatim into an oracle SQL twin.

Geocentric -> geodetic uses the standard fixed-point latitude
iteration with a FIXED count (GEODETIC_ITERS) so the oracle can unroll
the identical op sequence; 5 rounds converge to <1e-12 rad for
near-surface points (contraction factor ~e2/2 per round).

All math is NumPy over arrays — no per-row Python; the distributed
face is proj._Composed.transform_df (one Arrow pandas UDF).
"""

from __future__ import annotations

import numpy as np

__all__ = ["parse_towgs84", "geodetic_to_geocentric",
           "geocentric_to_geodetic", "helmert_coeffs", "helmert_apply",
           "datum_shift_lonlat", "GEODETIC_ITERS"]

_AS2RAD = np.pi / (180.0 * 3600.0)
GEODETIC_ITERS = 5


def parse_towgs84(s: str) -> tuple:
    """'+towgs84=dx,dy,dz[,rx,ry,rz,ds]' value -> 7-tuple of floats
    (3-parameter form zero-padded, matching osr SetTOWGS84 semantics:
    autotest/osr/osr_basic.py:211 GetTOWGS84() == (1,2,3,0,0,0,0))."""
    vals = [float(v) for v in s.split(",")]
    if len(vals) not in (3, 7):
        raise ValueError(f"+towgs84 needs 3 or 7 terms, got {len(vals)}")
    return tuple(vals + [0.0] * (7 - len(vals)))


def helmert_coeffs(params: tuple, inverse: bool = False) -> tuple:
    """(tx,ty,tz,rx'',ry'',rz'',s_ppm) -> the 12 affine coefficients
    (3x3 matrix rows + translation) of the position-vector map, or of
    its EXACT inverse. Every returned double is a deterministic
    function of the parameter doubles — safe to inject into SQL."""
    tx, ty, tz, rx, ry, rz, s = [float(v) for v in params]
    rx, ry, rz = rx * _AS2RAD, ry * _AS2RAD, rz * _AS2RAD
    m = 1.0 + s * 1e-6
    # position-vector rotation (EPSG 1033), scaled
    M = np.array([[m, -m * rz, m * ry],
                  [m * rz, m, -m * rx],
                  [-m * ry, m * rx, m]], dtype=np.float64)
    T = np.array([tx, ty, tz], dtype=np.float64)
    if inverse:
        # closed-form adjugate inverse of the 3x3 (deterministic)
        det = (M[0, 0] * (M[1, 1] * M[2, 2] - M[1, 2] * M[2, 1])
               - M[0, 1] * (M[1, 0] * M[2, 2] - M[1, 2] * M[2, 0])
               + M[0, 2] * (M[1, 0] * M[2, 1] - M[1, 1] * M[2, 0]))
        adj = np.array([
            [M[1, 1] * M[2, 2] - M[1, 2] * M[2, 1],
             M[0, 2] * M[2, 1] - M[0, 1] * M[2, 2],
             M[0, 1] * M[1, 2] - M[0, 2] * M[1, 1]],
            [M[1, 2] * M[2, 0] - M[1, 0] * M[2, 2],
             M[0, 0] * M[2, 2] - M[0, 2] * M[2, 0],
             M[0, 2] * M[1, 0] - M[0, 0] * M[1, 2]],
            [M[1, 0] * M[2, 1] - M[1, 1] * M[2, 0],
             M[0, 1] * M[2, 0] - M[0, 0] * M[2, 1],
             M[0, 0] * M[1, 1] - M[0, 1] * M[1, 0]]], dtype=np.float64)
        Minv = adj / det
        # x = Minv (x' - T)  ->  affine with translation -Minv T
        T = -Minv @ T
        M = Minv
    return (M[0, 0], M[0, 1], M[0, 2],
            M[1, 0], M[1, 1], M[1, 2],
            M[2, 0], M[2, 1], M[2, 2],
            T[0], T[1], T[2])


def helmert_apply(X, Y, Z, coeffs: tuple):
    """Apply 12 affine coefficients (from helmert_coeffs) to geocentric
    arrays. Op order is the SQL-twin order: t + (m00*X + m01*Y + m02*Z)."""
    (m00, m01, m02, m10, m11, m12, m20, m21, m22, tx, ty, tz) = coeffs
    X2 = tx + (m00 * X + m01 * Y + m02 * Z)
    Y2 = ty + (m10 * X + m11 * Y + m12 * Z)
    Z2 = tz + (m20 * X + m21 * Y + m22 * Z)
    return X2, Y2, Z2


def geodetic_to_geocentric(lon, lat, a: float, f: float):
    """2D geodetic (h=0, the pushed-v_3 convention) -> geocentric XYZ."""
    e2 = f * (2.0 - f)
    ome2 = 1.0 - e2
    lam = np.radians(np.asarray(lon, float))
    phi = np.radians(np.asarray(lat, float))
    s = np.sin(phi)
    N = a / np.sqrt(1.0 - e2 * s * s)
    nc = N * np.cos(phi)
    return nc * np.cos(lam), nc * np.sin(lam), N * ome2 * s


def geocentric_to_geodetic(X, Y, Z, a: float, f: float):
    """Geocentric XYZ -> 2D geodetic lon/lat (degrees), fixed-point
    latitude iteration with GEODETIC_ITERS rounds (oracle-unrollable)."""
    e2 = f * (2.0 - f)
    ome2 = 1.0 - e2
    lam = np.arctan2(Y, X)
    p = np.sqrt(X * X + Y * Y)
    phi = np.arctan2(Z, p * ome2)
    for _ in range(GEODETIC_ITERS):
        s = np.sin(phi)
        N = a / np.sqrt(1.0 - e2 * s * s)
        phi = np.arctan2(Z + e2 * N * s, p)
    return np.degrees(lam), np.degrees(phi)


def datum_shift_lonlat(lon, lat, src_ellps: tuple, src_towgs84,
                       dst_ellps: tuple, dst_towgs84):
    """Full 2D datum hop: src geographic -> geocentric -> [Helmert to
    WGS84] -> [exact inverse Helmert to dst datum] -> dst geographic.

    Returns (lon, lat) UNCHANGED (the reference's null/ballpark
    transform) when either side carries no datum information
    (towgs84 None), or when parameters AND ellipsoids agree."""
    if src_towgs84 is None or dst_towgs84 is None:
        return np.asarray(lon, float), np.asarray(lat, float)
    if tuple(src_towgs84) == tuple(dst_towgs84) and src_ellps == dst_ellps:
        return np.asarray(lon, float), np.asarray(lat, float)
    X, Y, Z = geodetic_to_geocentric(lon, lat, *src_ellps)
    if any(src_towgs84):
        X, Y, Z = helmert_apply(X, Y, Z, helmert_coeffs(src_towgs84))
    if any(dst_towgs84):
        X, Y, Z = helmert_apply(
            X, Y, Z, helmert_coeffs(dst_towgs84, inverse=True))
    return geocentric_to_geodetic(X, Y, Z, *dst_ellps)
