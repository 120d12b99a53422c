"""Transverse Mercator / UTM forward projection (WGS84).

Krueger n-series to 6th order (the published Karney 2011 "Transverse
Mercator with an accuracy of a few nanometers" arrangement, identical
coefficients to PROJ's etmerc) — agreement with PROJ is sub-micrometer
within UTM zones, far below the 1e-6 m the ogrlineref golden replay
needs. Used by operators/lineref.py to reproduce the reference's
geographic-CRS part lengths (ogrlineref.cpp:554-580 transforms each
part to the UTM zone of its midpoint to measure meters).

Pure NumPy, vectorized; no PROJ dependency anywhere in the engine.
"""

from __future__ import annotations

import numpy as np

_A = 6378137.0                  # WGS84 semi-major
_F = 1.0 / 298.257223563        # WGS84 flattening
_E = np.sqrt(_F * (2.0 - _F))   # first eccentricity
_N = _F / (2.0 - _F)            # third flattening
# rectifying radius
_ABAR = _A / (1.0 + _N) * (1.0 + _N ** 2 / 4.0 + _N ** 4 / 64.0
                           + _N ** 6 / 256.0)
# Krueger alpha (gauss->TM) coefficients, 6th order in n
_ALPHA = (
    _N / 2 - 2 * _N ** 2 / 3 + 5 * _N ** 3 / 16 + 41 * _N ** 4 / 180
    - 127 * _N ** 5 / 288 + 7891 * _N ** 6 / 37800,
    13 * _N ** 2 / 48 - 3 * _N ** 3 / 5 + 557 * _N ** 4 / 1440
    + 281 * _N ** 5 / 630 - 1983433 * _N ** 6 / 1935360,
    61 * _N ** 3 / 240 - 103 * _N ** 4 / 140 + 15061 * _N ** 5 / 26880
    + 167603 * _N ** 6 / 181440,
    49561 * _N ** 4 / 161280 - 179 * _N ** 5 / 168
    + 6601661 * _N ** 6 / 7257600,
    34729 * _N ** 5 / 80640 - 3418889 * _N ** 6 / 1995840,
    212378941 * _N ** 6 / 319334400,
)
_K0 = 0.9996  # UTM scale on the central meridian


def tmerc_forward(lon, lat, lon0: float, k0: float = _K0,
                  false_e: float = 500000.0, false_n: float = 0.0):
    """Geographic (degrees) -> transverse Mercator (meters)."""
    lam = np.radians(np.asarray(lon, float) - lon0)
    phi = np.radians(np.asarray(lat, float))
    s = np.sin(phi)
    # conformal latitude via its tangent
    t = np.sinh(np.arctanh(s) - _E * np.arctanh(_E * s))
    xi = np.arctan2(t, np.cos(lam))
    eta = np.arcsinh(np.sin(lam) / np.sqrt(t * t + np.cos(lam) ** 2))
    x = eta.copy()
    y = xi.copy()
    for j, a in enumerate(_ALPHA, start=1):
        x = x + a * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
        y = y + a * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
    return false_e + k0 * _ABAR * x, false_n + k0 * _ABAR * y


def utm_zone_epsg(lon: float, lat: float) -> int:
    """The reference's zone pick (ogrlineref.cpp:559-569):
    zone = int(30 + (lon + 3) / 6 + 0.5), EPSG 326xx north / 327xx
    south."""
    zone = int(30 + (lon + 3.0) / 6.0 + 0.5)
    return (32600 if lat > 0 else 32700) + zone


def utm_forward(lon, lat, epsg: int):
    """Forward UTM for an EPSG 326xx/327xx code."""
    zone = epsg % 100
    south = (epsg // 100) % 10 == 7
    lon0 = zone * 6.0 - 183.0
    return tmerc_forward(lon, lat, lon0,
                         false_n=10000000.0 if south else 0.0)
