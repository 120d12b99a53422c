"""Proj-string / EPSG dispatch: the OGRCreateCoordinateTransformation
analog over this engine's projection family.

The reference reaches every CRS through PROJ
(ogr/ogrct.cpp:1027 OGRCreateCoordinateTransformation); this module
gives the same two entry points — `from_proj4("+proj=lcc +lat_1=...")`
and `from_epsg(code)` — over the projections implemented here from the
published formulas:

- longlat (identity)                         EPSG 4326
- webmerc / merc (spherical, gdal2tiles math) EPSG 3857
- tmerc / utm (Krueger-Karney n-series, forward + inverse)
                                             EPSG 326xx / 327xx
- lcc  (Lambert Conformal Conic 2SP)          e.g. EPSG 2154
- aea  (Albers Equal Area 2SP)                e.g. EPSG 5070
- stere polar aspect, variant A (+k_0) and variant B (+lat_ts, k0
  derived via the EPSG 9829 formula)          e.g. EPSG 3031 / 3413

`transform(src, dst)` composes src.inverse -> dst.forward through
geographic coordinates, exactly PROJ's hub-and-spoke pipeline. Datum
shifts are out of scope: WGS84/GRS80/NAD83-family ellipsoids differ by
well under a millimeter in flattening and the reference itself applies
a null datum transform when no grids are configured — documented
approximation, not a silent one.

Series coefficients are the published Krueger-Karney alpha/beta
polynomials in the third flattening n (Karney 2011, arXiv:1002.1417);
conic/stereo formulas are Snyder 1987 / EPSG Guidance Note 7-2 via
geo/conic.py.
"""

from __future__ import annotations

import re

import numpy as np

from .conic import (AlbersEqualArea, LambertConformalConic,
                    PolarStereographic, _Projection)

__all__ = ["from_proj4", "from_epsg", "transform", "Geographic",
           "WebMercator", "TransverseMercator"]

_ELLPS = {
    "WGS84": (6378137.0, 1.0 / 298.257223563),
    "GRS80": (6378137.0, 1.0 / 298.257222101),
    "intl": (6378388.0, 1.0 / 297.0),
    "clrk66": (6378206.4, 1.0 / 294.9786982),
    "airy": (6377563.396, 1.0 / 299.3249646),
    "bessel": (6377397.155, 1.0 / 299.1528128),
    "krass": (6378245.0, 1.0 / 298.3),
    "sphere": (6370997.0, 0.0),
}


class Geographic(_Projection):
    """+proj=longlat — the identity hub."""

    def forward(self, lon, lat):
        return np.asarray(lon, float), np.asarray(lat, float)

    inverse = forward


class WebMercator(_Projection):
    """+proj=webmerc (EPSG 3857): the spherical Mercator this engine's
    tile math is built on (gdal2tiles.py:422-435 formulas)."""

    def forward(self, lon, lat):
        from .mercator import lonlat_to_meters_np
        return lonlat_to_meters_np(np.asarray(lon, float),
                                   np.asarray(lat, float))

    def inverse(self, x, y):
        from .mercator import meters_to_lonlat_np
        return meters_to_lonlat_np(np.asarray(x, float),
                                   np.asarray(y, float))


def _krueger_coeffs(n: float):
    """alpha/beta/A-bar series in the third flattening (Karney 2011,
    eqs. 35-36, through n^6)."""
    n2, n3, n4, n5, n6 = n**2, n**3, n**4, n**5, n**6
    abar = (1 + n2 / 4 + n4 / 64 + n6 / 256) / (1 + n)
    alpha = (
        n / 2 - 2 * n2 / 3 + 5 * n3 / 16 + 41 * n4 / 180 - 127 * n5 / 288
        + 7891 * n6 / 37800,
        13 * n2 / 48 - 3 * n3 / 5 + 557 * n4 / 1440 + 281 * n5 / 630
        - 1983433 * n6 / 1935360,
        61 * n3 / 240 - 103 * n4 / 140 + 15061 * n5 / 26880
        + 167603 * n6 / 181440,
        49561 * n4 / 161280 - 179 * n5 / 168 + 6601661 * n6 / 7257600,
        34729 * n5 / 80640 - 3418889 * n6 / 1995840,
        212378941 * n6 / 319334400,
    )
    beta = (
        n / 2 - 2 * n2 / 3 + 37 * n3 / 96 - n4 / 360 - 81 * n5 / 512
        + 96199 * n6 / 604800,
        n2 / 48 + n3 / 15 - 437 * n4 / 1440 + 46 * n5 / 105
        - 1118711 * n6 / 3870720,
        17 * n3 / 480 - 37 * n4 / 840 - 209 * n5 / 4480
        + 5569 * n6 / 90720,
        4397 * n4 / 161280 - 11 * n5 / 504 - 830251 * n6 / 7257600,
        4583 * n5 / 161280 - 108847 * n6 / 3991680,
        20648693 * n6 / 638668800,
    )
    return abar, alpha, beta


class TransverseMercator(_Projection):
    """+proj=tmerc / +proj=utm: Krueger-Karney series, forward AND
    inverse (geo/tmerc.py carries the forward-only WGS84 fast path the
    linear-referencing operator uses; this class generalizes the
    ellipsoid and adds the beta-series inverse)."""

    def __init__(self, lon0: float = 0.0, lat0: float = 0.0,
                 k0: float = 1.0, false_e: float = 0.0,
                 false_n: float = 0.0, a: float = 6378137.0,
                 f: float = 1.0 / 298.257223563):
        self.a, self.f = a, f
        self.e = np.sqrt(f * (2.0 - f))
        n = f / (2.0 - f)
        abar, self.alpha, self.beta = _krueger_coeffs(n)
        self.abar = abar * a
        self.lon0, self.k0 = lon0, k0
        self.fe, self.fn = false_e, false_n
        # meridian distance to lat0 (for a nonzero natural origin)
        self.m0 = 0.0
        if lat0 != 0.0:
            _x, y0 = self._forward_raw(np.array([lon0]),
                                       np.array([lat0]))
            self.m0 = float(y0[0])

    def _forward_raw(self, lon, lat):
        lam = np.radians(np.asarray(lon, float) - self.lon0)
        phi = np.radians(np.asarray(lat, float))
        s = np.sin(phi)
        t = np.sinh(np.arctanh(s) - self.e * np.arctanh(self.e * s))
        xi = np.arctan2(t, np.cos(lam))
        eta = np.arcsinh(np.sin(lam) / np.sqrt(t * t + np.cos(lam) ** 2))
        x, y = eta.copy(), xi.copy()
        for j, aj in enumerate(self.alpha, start=1):
            x = x + aj * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
            y = y + aj * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        return self.k0 * self.abar * x, self.k0 * self.abar * y

    def forward(self, lon, lat):
        x, y = self._forward_raw(lon, lat)
        return self.fe + x, self.fn + y - self.m0

    def inverse(self, x, y):
        etap = (np.asarray(x, float) - self.fe) / (self.k0 * self.abar)
        xip = (np.asarray(y, float) - self.fn + self.m0) \
            / (self.k0 * self.abar)
        xi, eta = xip.copy(), etap.copy()
        for j, bj in enumerate(self.beta, start=1):
            xi = xi - bj * np.sin(2 * j * xip) * np.cosh(2 * j * etap)
            eta = eta - bj * np.cos(2 * j * xip) * np.sinh(2 * j * etap)
        lam = np.arctan2(np.sinh(eta), np.cos(xi))
        taup = np.sin(xi) / np.sqrt(np.sinh(eta) ** 2 + np.cos(xi) ** 2)
        # conformal -> geodetic latitude: fixed point on
        # atanh(sin phi) = asinh(tau') + e atanh(e sin phi)
        base = np.arcsinh(taup)
        s = np.tanh(base)
        for _ in range(30):
            s = np.tanh(base + self.e * np.arctanh(self.e * s))
        phi = np.arcsin(np.clip(s, -1.0, 1.0))
        return (np.degrees(lam) + self.lon0, np.degrees(phi))


class ObliqueStereographic(_Projection):
    """+proj=sterea — Oblique (double) Stereographic, EPSG method 9809
    (the reference reaches it through PROJ from proj strings like
    autotest/osr/osr_esri.py:657's Stereo-70). Formulas from EPSG
    Guidance Note 7-2: conformal-sphere radius R = sqrt(rho0*nu0),
    sphere latitude chi via the (S1*S2^e)^n ladder, then the spherical
    oblique stereographic on the conformal sphere. Validated against
    the Guidance Note's own RD New worked example
    (tests/test_proj.py)."""

    def __init__(self, lat0: float, lon0: float, k0: float = 1.0,
                 false_e: float = 0.0, false_n: float = 0.0,
                 a: float = 6378137.0, f: float = 1.0 / 298.257223563):
        self.a, self.f = a, f
        e2 = f * (2.0 - f)
        self.e = e = np.sqrt(e2)
        p0 = np.radians(lat0)
        self.lam0 = np.radians(lon0)
        self.k0, self.fe, self.fn = k0, false_e, false_n
        s0 = np.sin(p0)
        rho0 = a * (1 - e2) / (1 - e2 * s0 * s0) ** 1.5
        nu0 = a / np.sqrt(1 - e2 * s0 * s0)
        self.R = np.sqrt(rho0 * nu0)
        self.n = np.sqrt(1 + e2 * np.cos(p0) ** 4 / (1 - e2))
        S1 = (1 + s0) / (1 - s0)
        S2 = (1 - e * s0) / (1 + e * s0)
        w1 = (S1 * S2 ** e) ** self.n
        sc0 = (w1 - 1) / (w1 + 1)
        self.c = ((self.n + s0) * (1 - sc0)) / ((self.n - s0) * (1 + sc0))
        w2 = self.c * w1
        self.chi0 = np.arcsin((w2 - 1) / (w2 + 1))

    def _conformal(self, lat):
        phi = np.radians(np.asarray(lat, float))
        s = np.sin(phi)
        Sa = (1 + s) / (1 - s)
        Sb = (1 - self.e * s) / (1 + self.e * s)
        w = self.c * (Sa * Sb ** self.e) ** self.n
        return np.arcsin((w - 1) / (w + 1))

    def forward(self, lon, lat):
        lam = self.n * (np.radians(np.asarray(lon, float))
                        - self.lam0) + self.lam0
        chi = self._conformal(lat)
        dl = lam - self.lam0
        B = (1 + np.sin(chi) * np.sin(self.chi0)
             + np.cos(chi) * np.cos(self.chi0) * np.cos(dl))
        x = self.fe + 2 * self.R * self.k0 * np.cos(chi) * np.sin(dl) / B
        y = self.fn + 2 * self.R * self.k0 * (
            np.sin(chi) * np.cos(self.chi0)
            - np.cos(chi) * np.sin(self.chi0) * np.cos(dl)) / B
        return x, y

    def inverse(self, x, y):
        e, e2 = self.e, self.e * self.e
        Ep = np.asarray(x, float) - self.fe
        Np = np.asarray(y, float) - self.fn
        g = 2 * self.R * self.k0 * np.tan(np.pi / 4 - self.chi0 / 2)
        h = 4 * self.R * self.k0 * np.tan(self.chi0) + g
        i = np.arctan2(Ep, h + Np)
        j = np.arctan2(Ep, g - Np) - i
        chi = self.chi0 + 2 * np.arctan(
            (Np - Ep * np.tan(j / 2)) / (2 * self.R * self.k0))
        lam = j + 2 * i + self.lam0
        lon = np.degrees((lam - self.lam0) / self.n + self.lam0)
        # isometric latitude of the conformal-sphere point, then the
        # Guidance Note's fixed-point recovery of the geodetic latitude
        psi = (np.log((1 + np.sin(chi)) / (self.c * (1 - np.sin(chi))))
               / (2 * self.n))
        phi = 2 * np.arctan(np.exp(psi)) - np.pi / 2
        for _ in range(8):
            s = e * np.sin(phi)
            psi_i = np.log(np.tan(phi / 2 + np.pi / 4)
                           * ((1 - s) / (1 + s)) ** (e / 2))
            phi = phi - (psi_i - psi) * np.cos(phi) \
                * (1 - e2 * np.sin(phi) ** 2) / (1 - e2)
        return lon, np.degrees(phi)


def _stere_k0_from_lat_ts(lat_ts: float, e: float) -> float:
    """Polar Stereographic variant B -> A: k0 implied by a standard
    parallel (EPSG Guidance Note 7-2, method 9829):
    k0 = m(lat_ts) * sqrt((1+e)^(1+e) (1-e)^(1-e)) / (2 t(lat_ts))."""
    from .conic import _msc, _tsc

    p = np.radians(abs(lat_ts))
    m1 = _msc(p, e)
    t1 = _tsc(p, e)
    return float(m1 * np.sqrt((1 + e) ** (1 + e) * (1 - e) ** (1 - e))
                 / (2.0 * t1))


def from_proj4(s: str) -> _Projection:
    """Parse a proj-string into a Projection instance, annotated with
    its ellipsoid (`.ellps = (a, f)`) and datum (`.towgs84` — a
    7-tuple, or None when the string carries no datum information;
    `+datum=WGS84` means the null shift (0,)*7). geo/datum.py applies
    the Helmert hop when a _Composed transform crosses datums."""
    kv = {}
    for tok in s.split():
        tok = tok.lstrip("+")
        if "=" in tok:
            k, v = tok.split("=", 1)
            kv[k] = v
        else:
            kv[tok] = True
    if kv.get("datum") == "WGS84":
        kv.setdefault("ellps", "WGS84")
    p = _from_proj4_core(kv)
    p.ellps = _ellps_from_kv(kv)
    if "towgs84" in kv:
        from .datum import parse_towgs84
        p.towgs84 = parse_towgs84(kv["towgs84"])
    elif kv.get("datum") == "WGS84":
        p.towgs84 = (0.0,) * 7
    else:
        p.towgs84 = None
    return p


def _ellps_from_kv(kv: dict) -> tuple:
    if "a" in kv:
        a = float(kv["a"])
        if "rf" in kv:
            f = 1.0 / float(kv["rf"])
        elif "b" in kv:
            f = (a - float(kv["b"])) / a
        elif "f" in kv:
            f = float(kv["f"])
        else:
            f = 0.0
    else:
        a, f = _ELLPS[kv.get("ellps", "WGS84")]
    if "R" in kv:
        a, f = float(kv["R"]), 0.0
    return a, f


def _from_proj4_core(kv: dict) -> _Projection:
    a, f = _ellps_from_kv(kv)

    proj = kv.get("proj")
    g = lambda k, d=0.0: float(kv.get(k, d))
    if proj in ("longlat", "latlong", "lonlat"):
        return Geographic()
    if proj == "webmerc" or (proj == "merc" and f == 0.0):
        return WebMercator()
    if proj == "merc":
        # spherical web-mercator convention is what the engine's whole
        # tile model is defined on; ellipsoidal Mercator is not needed
        # by any reference surface this repo re-expresses
        return WebMercator()
    if proj == "utm":
        zone = int(kv["zone"])
        south = "south" in kv
        return TransverseMercator(
            lon0=zone * 6.0 - 183.0, k0=0.9996, false_e=500000.0,
            false_n=10000000.0 if south else 0.0, a=a, f=f)
    if proj == "tmerc":
        return TransverseMercator(
            lon0=g("lon_0"), lat0=g("lat_0"), k0=g("k_0", 1.0),
            false_e=g("x_0"), false_n=g("y_0"), a=a, f=f)
    if proj == "lcc":
        lat1 = g("lat_1")
        return LambertConformalConic(
            lat1=lat1, lat2=g("lat_2", lat1), lat0=g("lat_0"),
            lon0=g("lon_0"), false_e=g("x_0"), false_n=g("y_0"),
            a=a, f=f)
    if proj == "aea":
        return AlbersEqualArea(
            lat1=g("lat_1"), lat2=g("lat_2"), lat0=g("lat_0"),
            lon0=g("lon_0"), false_e=g("x_0"), false_n=g("y_0"),
            a=a, f=f)
    if proj == "sterea":
        return ObliqueStereographic(
            lat0=g("lat_0"), lon0=g("lon_0"), k0=g("k_0", g("k", 1.0)),
            false_e=g("x_0"), false_n=g("y_0"), a=a, f=f)
    if proj == "stere":
        lat0 = g("lat_0")
        if abs(abs(lat0) - 90.0) > 1e-9:
            raise NotImplementedError(
                "oblique +proj=stere; polar aspect only (lat_0=+-90; "
                "the double stereographic +proj=sterea IS supported)")
        e = np.sqrt(f * (2.0 - f))
        if "lat_ts" in kv:
            k0 = _stere_k0_from_lat_ts(g("lat_ts"), e)
        else:
            k0 = g("k_0", 1.0)
        return PolarStereographic(
            k0=k0, lon0=g("lon_0"), north=lat0 > 0,
            false_e=g("x_0"), false_n=g("y_0"), a=a, f=f)
    raise NotImplementedError(f"+proj={proj}")


_EPSG = {
    4326: "+proj=longlat +ellps=WGS84",
    3857: "+proj=webmerc +ellps=WGS84",
    # RGF93 / Lambert-93 (France)
    2154: "+proj=lcc +lat_1=49 +lat_2=44 +lat_0=46.5 +lon_0=3 "
          "+x_0=700000 +y_0=6600000 +ellps=GRS80",
    # NAD83 / Conus Albers
    5070: "+proj=aea +lat_1=29.5 +lat_2=45.5 +lat_0=23 +lon_0=-96 "
          "+x_0=0 +y_0=0 +ellps=GRS80",
    # WGS84 / Antarctic Polar Stereographic
    3031: "+proj=stere +lat_0=-90 +lat_ts=-71 +lon_0=0 "
          "+x_0=0 +y_0=0 +ellps=WGS84",
    # WGS84 / NSIDC Sea Ice Polar Stereographic North
    3413: "+proj=stere +lat_0=90 +lat_ts=70 +lon_0=-45 "
          "+x_0=0 +y_0=0 +ellps=WGS84",
    # WGS84 / UPS North (variant A)
    5041: "+proj=stere +lat_0=90 +lat_ts=90 +k_0=0.994 +lon_0=0 "
          "+x_0=2000000 +y_0=2000000 +ellps=WGS84",
}


def from_epsg(code: int) -> _Projection:
    """EPSG code -> Projection. UTM zones 326xx/327xx computed; other
    supported codes tabled."""
    if 32601 <= code <= 32660:
        return from_proj4(f"+proj=utm +zone={code - 32600} +ellps=WGS84")
    if 32701 <= code <= 32760:
        return from_proj4(
            f"+proj=utm +zone={code - 32700} +south +ellps=WGS84")
    if code in _EPSG:
        s = _EPSG[code]
        if code == 5041:
            s = s.replace(" +lat_ts=90", "")  # variant A: k_0 given
        return from_proj4(s)
    raise NotImplementedError(f"EPSG:{code}")


class _Composed(_Projection):
    """src.inverse -> [Helmert datum hop, geo/datum.py] -> dst.forward.
    The hop is a no-op unless BOTH sides carry datum information and
    they differ (the reference's null-transform rule for unknown
    datums, autotest/osr/osr_ct.py:300)."""

    def __init__(self, src, dst):
        self.src, self.dst = src, dst

    def _hop(self, lon, lat, a, b):
        from .datum import datum_shift_lonlat
        atw = getattr(a, "towgs84", None)
        btw = getattr(b, "towgs84", None)
        if atw is None or btw is None:
            return lon, lat
        aell = getattr(a, "ellps", _ELLPS["WGS84"])
        bell = getattr(b, "ellps", _ELLPS["WGS84"])
        return datum_shift_lonlat(lon, lat, aell, atw, bell, btw)

    def forward(self, x, y):
        lon, lat = self.src.inverse(x, y)
        lon, lat = self._hop(lon, lat, self.src, self.dst)
        return self.dst.forward(lon, lat)

    def inverse(self, x, y):
        lon, lat = self.dst.inverse(x, y)
        lon, lat = self._hop(lon, lat, self.dst, self.src)
        return self.src.forward(lon, lat)


def transform(src, dst) -> _Projection:
    """src CRS -> dst CRS through the geographic hub (PROJ's pipeline
    shape). Accepts Projection instances, EPSG ints, or proj strings."""
    def _resolve(c):
        if isinstance(c, _Projection):
            return c
        if isinstance(c, int):
            return from_epsg(c)
        return from_proj4(c)
    return _Composed(_resolve(src), _resolve(dst))
