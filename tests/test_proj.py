"""proj-string / EPSG dispatch (geo/proj.py): parse equivalence,
forward/inverse roundtrips, scale-factor invariants, and agreement with
the engine's existing fast paths."""

import numpy as np
import pytest

from lib_gdal_spark.geo import proj as P
from lib_gdal_spark.geo import tmerc as T
from lib_gdal_spark.geo.mercator import lonlat_to_meters_np

RNG = np.random.RandomState(42)


class TestTransverseMercator:
    def test_utm_matches_tmerc_fast_path(self):
        lon = RNG.uniform(9, 21, 300)
        lat = RNG.uniform(-70, 70, 300)
        x1, y1 = T.utm_forward(lon, lat, 32633)
        p = P.from_epsg(32633)
        x2, y2 = p.forward(lon, lat)
        assert np.allclose(x1, x2, atol=1e-6)
        assert np.allclose(y1, y2, atol=1e-6)

    def test_inverse_roundtrip(self):
        lon = RNG.uniform(6, 18, 500)   # +-6 deg off the zone meridian
        lat = RNG.uniform(-80, 84, 500)
        p = P.from_proj4("+proj=utm +zone=32 +ellps=WGS84")
        x, y = p.forward(lon, lat)
        lo, la = p.inverse(x, y)
        assert np.allclose(lo, lon, atol=1e-9)
        assert np.allclose(la, lat, atol=1e-9)

    def test_south_zone_false_northing(self):
        p = P.from_epsg(32733)
        _x, y = p.forward(np.array([15.0]), np.array([-30.0]))
        assert 6.0e6 < y[0] < 1.0e7

    def test_lat0_origin_offset(self):
        p = P.from_proj4("+proj=tmerc +lon_0=9 +lat_0=50 +k_0=1 "
                         "+x_0=0 +y_0=0 +ellps=GRS80")
        _x, y = p.forward(np.array([9.0]), np.array([50.0]))
        assert abs(y[0]) < 1e-6      # natural origin maps to (0, 0)
        lo, la = p.inverse(np.array([0.0]), np.array([0.0]))
        assert abs(lo[0] - 9.0) < 1e-12 and abs(la[0] - 50.0) < 1e-9


class TestEpsgTable:
    @pytest.mark.parametrize("code,lon_rng,lat_rng", [
        (2154, (-4, 8), (42, 50)),       # Lambert-93
        (5070, (-120, -75), (25, 48)),   # Conus Albers
        (3031, (-180, 180), (-88, -62)), # Antarctic PS (variant B)
        (3413, (-180, 180), (62, 88)),   # Arctic PS (variant B)
        (5041, (-180, 180), (62, 88)),   # UPS North (variant A)
    ])
    def test_roundtrip(self, code, lon_rng, lat_rng):
        lon = RNG.uniform(*lon_rng, 300)
        lat = RNG.uniform(*lat_rng, 300)
        p = P.from_epsg(code)
        x, y = p.forward(lon, lat)
        lo, la = p.inverse(x, y)
        dlon = (lo - lon + 180.0) % 360.0 - 180.0
        assert np.allclose(dlon, 0.0, atol=1e-9)
        assert np.allclose(la, lat, atol=1e-9)

    def test_3857_is_engine_mercator(self):
        lon = RNG.uniform(-179, 179, 100)
        lat = RNG.uniform(-85, 85, 100)
        x1, y1 = P.from_epsg(3857).forward(lon, lat)
        x2, y2 = lonlat_to_meters_np(lon, lat)
        assert np.array_equal(x1, x2) and np.array_equal(y1, y2)

    def test_variant_b_unit_scale_on_standard_parallel(self):
        # EPSG 9829: k0 derived from lat_ts must give scale 1 there
        p = P.from_epsg(3031)
        eps = 1e-6
        lat = -71.0
        x1, y1 = p.forward(np.array([0.0]), np.array([lat]))
        x2, y2 = p.forward(np.array([eps]), np.array([lat]))
        # parallel-direction ground distance for eps deg of lon
        a, f = 6378137.0, 1 / 298.257223563
        e2 = f * (2 - f)
        nu = a / np.sqrt(1 - e2 * np.sin(np.radians(lat)) ** 2)
        ground = nu * np.cos(np.radians(lat)) * np.radians(eps)
        k = np.hypot(x2 - x1, y2 - y1) / ground
        assert abs(k - 1.0) < 1e-9

    def test_ups_k0(self):
        # variant A keeps the explicit k_0=0.994 and the 2000 km offsets
        p = P.from_epsg(5041)
        x, y = p.forward(np.array([0.0]), np.array([90.0]))
        assert abs(x[0] - 2000000.0) < 1e-6
        assert abs(y[0] - 2000000.0) < 1e-6


class TestCompose:
    def test_utm_to_lambert93_roundtrip(self):
        lon = RNG.uniform(0, 8, 200)
        lat = RNG.uniform(43, 49, 200)
        utm = P.from_epsg(32631)
        x, y = utm.forward(lon, lat)
        t = P.transform(32631, 2154)
        x93, y93 = t.forward(x, y)
        xb, yb = t.inverse(x93, y93)
        assert np.allclose(xb, x, atol=1e-6)
        assert np.allclose(yb, y, atol=1e-6)

    def test_accepts_strings_and_codes(self):
        t = P.transform("+proj=longlat +ellps=WGS84", 3857)
        x, y = t.forward(np.array([10.0]), np.array([20.0]))
        ex, ey = lonlat_to_meters_np(np.array([10.0]), np.array([20.0]))
        assert x[0] == ex[0] and y[0] == ey[0]

    def test_oblique_stereo_refuses(self):
        with pytest.raises(NotImplementedError):
            P.from_proj4("+proj=stere +lat_0=52 +lon_0=5 +ellps=WGS84")


class TestProj4Parse:
    def test_explicit_ellipsoid_numbers(self):
        p = P.from_proj4("+proj=tmerc +lon_0=0 +a=6378388 +rf=297")
        assert p.a == 6378388.0
        assert abs(p.f - 1 / 297.0) < 1e-15

    def test_sphere_radius(self):
        p = P.from_proj4("+proj=tmerc +lon_0=0 +R=6370997")
        assert p.a == 6370997.0 and p.f == 0.0


class TestDatumShift:
    """Helmert +towgs84 legs (geo/datum.py) — replays the reference's
    autotest/osr/osr_ct.py #1156 matrix plus exactness invariants."""

    def test_towgs84_only_one_side_is_null(self):
        # osr_ct.py:300 — unknown datum on one side -> null transform
        for a, b in (("+proj=longlat +ellps=GRS80 +towgs84=100,200,300",
                      "+proj=longlat +ellps=GRS80"),
                     ("+proj=longlat +ellps=GRS80",
                      "+proj=longlat +ellps=GRS80 +towgs84=100,200,300")):
            t = P.transform(a, b)
            x, y = t.forward(np.array([0.0]), np.array([0.0]))
            assert x[0] == 0.0 and y[0] == 0.0

    def test_towgs84_both_sides_applies(self):
        # osr_ct.py:325 — both sides carry datum info -> real shift;
        # hand value at (0,0): geocentric (a,0,0)+(100,200,300)
        t = P.transform("+proj=longlat +ellps=GRS80 +towgs84=100,200,300",
                        "+proj=longlat +ellps=GRS80 +towgs84=0,0,0")
        x, y = t.forward(np.array([0.0]), np.array([0.0]))
        assert x[0] != 0.0 and y[0] != 0.0
        exp_lon = np.degrees(np.arctan2(200.0, 6378137.0 + 100.0))
        assert abs(x[0] - exp_lon) < 1e-12
        # +datum=WGS84 counts as datum info too (same autotest)
        t2 = P.transform("+proj=longlat +ellps=GRS80 +towgs84=100,200,300",
                         "+proj=longlat +datum=WGS84")
        x2, y2 = t2.forward(np.array([0.0]), np.array([0.0]))
        assert x2[0] != 0.0 and y2[0] != 0.0

    def test_parse_towgs84_padding(self):
        # osr_basic.py:211 — 3-term form zero-pads to 7
        from lib_gdal_spark.geo.datum import parse_towgs84
        assert parse_towgs84("1,2,3") == (1.0, 2.0, 3.0, 0, 0, 0, 0)
        with pytest.raises(ValueError):
            parse_towgs84("1,2,3,4")

    def test_helmert_exact_inverse(self):
        from lib_gdal_spark.geo import datum as D
        tw = (446.448, -125.157, 542.06, 0.15, 0.247, 0.842, -20.489)
        X = np.array([4e6, -2e6]); Y = np.array([3e5, 1e6]); Z = np.array([5e6, -4e6])
        X2, Y2, Z2 = D.helmert_apply(X, Y, Z, D.helmert_coeffs(tw))
        X3, Y3, Z3 = D.helmert_apply(X2, Y2, Z2,
                                     D.helmert_coeffs(tw, inverse=True))
        assert np.max(np.abs(X3 - X)) < 1e-6
        assert np.max(np.abs(Y3 - Y)) < 1e-6
        assert np.max(np.abs(Z3 - Z)) < 1e-6

    def test_osgb36_roundtrip_2d(self):
        # 2D hop discards the height leg (push/pop v_3), so the round
        # trip is exact only to ~h*e2 ~ mm level — same as the reference
        src = ("+proj=longlat +ellps=airy "
               "+towgs84=446.448,-125.157,542.06,0.15,0.247,0.842,-20.489")
        t = P.transform(src, "+proj=longlat +datum=WGS84")
        lon0 = RNG.uniform(-5, 1, 200); lat0 = RNG.uniform(50, 58, 200)
        lon1, lat1 = t.forward(lon0, lat0)
        # the shift is real: ~100 m displacement over Britain
        assert np.all(np.abs(lon1 - lon0) * 111000 > 20)
        lon2, lat2 = t.inverse(lon1, lat1)
        assert np.max(np.abs(lon2 - lon0)) < 1e-6
        assert np.max(np.abs(lat2 - lat0)) < 1e-6

    def test_pure_translation_geocentric_hand_value(self):
        # translation-only ED50-style shift at the equator/prime
        # meridian moves geocentric coords by exactly the deltas
        from lib_gdal_spark.geo import datum as D
        X, Y, Z = D.geodetic_to_geocentric(
            np.array([0.0]), np.array([0.0]), 6378388.0, 1 / 297.0)
        assert X[0] == 6378388.0 and Y[0] == 0.0 and Z[0] == 0.0
        X2, Y2, Z2 = D.helmert_apply(
            X, Y, Z, D.helmert_coeffs((-87.0, -96.0, -120.0, 0, 0, 0, 0)))
        assert (X2[0], Y2[0], Z2[0]) == (6378388.0 - 87.0, -96.0, -120.0)

    def test_datum_hop_composes_with_projection(self):
        # ED50 UTM31 -> WGS84 UTM31: pure-datum displacement of ~130 m,
        # and inverse returns to start at mm level
        src = "+proj=utm +zone=31 +ellps=intl +towgs84=-87,-96,-120"
        dst = "+proj=utm +zone=31 +datum=WGS84"
        t = P.transform(src, dst)
        x0 = np.array([500000.0 + 1 / 997.0]); y0 = np.array([4649776.0])
        x1, y1 = t.forward(x0, y0)
        d = float(np.hypot(x1 - x0, y1 - y0))
        assert 50.0 < d < 300.0
        x2, y2 = t.inverse(x1, y1)
        assert abs(float(x2 - x0)) < 0.01 and abs(float(y2 - y0)) < 0.01


class TestObliqueStereographic:
    """+proj=sterea (EPSG 9809, double stereographic) — validated
    against EPSG Guidance Note 7-2's own RD New worked example."""

    def _rd_new(self):
        return P.ObliqueStereographic(
            lat0=52 + 9 / 60 + 22.178 / 3600,
            lon0=5 + 23 / 60 + 15.500 / 3600,
            k0=0.9999079, false_e=155000.0, false_n=463000.0,
            a=6377397.155, f=1 / 299.1528128)

    def test_guidance_note_worked_example(self):
        # GN7-2: lat 53N lon 6E -> E 196105.283, N 557057.739
        p = self._rd_new()
        x, y = p.forward(np.array([6.0]), np.array([53.0]))
        assert abs(x[0] - 196105.283) < 1e-3
        assert abs(y[0] - 557057.739) < 1e-3

    def test_inverse_roundtrip(self):
        p = self._rd_new()
        lon = RNG.uniform(3.5, 7.5, 300)
        lat = RNG.uniform(50.5, 53.8, 300)
        x, y = p.forward(lon, lat)
        lon2, lat2 = p.inverse(x, y)
        assert np.max(np.abs(lon2 - lon)) < 1e-10
        assert np.max(np.abs(lat2 - lat)) < 1e-10

    def test_scale_k0_at_origin_and_conformal(self):
        p = self._rd_new()
        a, f = 6377397.155, 1 / 299.1528128
        e2 = f * (2 - f)
        for lon0, lat0 in ((5.39, 52.16), (6.0, 53.0), (4.0, 51.0)):
            eps = 1e-7
            x0, y0 = p.forward(np.array([lon0]), np.array([lat0]))
            x1, y1 = p.forward(np.array([lon0 + eps]), np.array([lat0]))
            x2, y2 = p.forward(np.array([lon0]), np.array([lat0 + eps]))
            s = np.sin(np.radians(lat0))
            nu = a / np.sqrt(1 - e2 * s * s)
            rho = a * (1 - e2) / (1 - e2 * s * s) ** 1.5
            dlam = np.radians(eps)
            k_lon = float(np.hypot(x1 - x0, y1 - y0)) \
                / (nu * np.cos(np.radians(lat0)) * dlam)
            k_lat = float(np.hypot(x2 - x0, y2 - y0)) / (rho * dlam)
            assert abs(k_lon / k_lat - 1) < 1e-5      # conformal
            if (lon0, lat0) == (5.39, 52.16):          # near origin
                assert abs(k_lon - 0.9999079) < 1e-5

    def test_proj4_dispatch_stereo70(self):
        # the Stereo-70 string from osr_esri.py:657
        p = P.from_proj4("+proj=sterea +lat_0=46 +lon_0=25 +k=0.99975 "
                         "+x_0=500000 +y_0=500000 +ellps=krass")
        x, y = p.forward(np.array([25.0]), np.array([46.0]))
        assert abs(x[0] - 500000.0) < 1e-6
        assert abs(y[0] - 500000.0) < 1e-6
        x2, y2 = p.forward(np.array([26.0]), np.array([47.0]))
        lon, lat = p.inverse(x2, y2)
        assert abs(lon[0] - 26.0) < 1e-10 and abs(lat[0] - 47.0) < 1e-10

    def test_oblique_plain_stere_still_refuses(self):
        with pytest.raises(NotImplementedError, match="sterea"):
            P.from_proj4("+proj=stere +lat_0=52 +lon_0=5 +ellps=WGS84")
