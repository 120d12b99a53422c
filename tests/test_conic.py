"""Conic/azimuthal projection tests (geo/conic.py — VERDICT r3 missing
item 2). Verification strategy: every projection is pinned by its
DEFINING differential property (measured by finite differences against
the exact ellipsoidal meridian/parallel radii), by forward/inverse
round-trips, and by the one EPSG Guidance Note 7-2 worked example with
published coordinates (Polar Stereographic variant A / UPS North)."""

import numpy as np
import pytest

from lib_gdal_spark.geo.conic import (AlbersEqualArea,
                                      LambertConformalConic,
                                      PolarStereographic)

_A = 6378137.0
_F = 1.0 / 298.257223563
_E2 = _F * (2.0 - _F)


def _scales(proj, lon, lat):
    """(h, k) meridian/parallel scale factors via finite differences."""
    phi = np.radians(lat)
    d = 1e-7
    x0, y0 = proj.forward(lon, lat)
    x1, y1 = proj.forward(lon, lat + d)
    x2, y2 = proj.forward(lon + d, lat)
    m = _A * (1 - _E2) / (1 - _E2 * np.sin(phi) ** 2) ** 1.5
    n = _A / np.sqrt(1 - _E2 * np.sin(phi) ** 2)
    h = np.hypot(x1 - x0, y1 - y0) / (m * np.radians(d))
    k = np.hypot(x2 - x0, y2 - y0) / (n * np.cos(phi) * np.radians(d))
    return float(h), float(k)


GRID_LON = np.array([-120.0, -96.0, -75.0, 10.0, 44.0])
GRID_LAT = np.array([22.0, 33.0, 40.0, 45.0, 60.0])


class TestLambertConformalConic:
    P = LambertConformalConic(33.0, 45.0, 23.0, -96.0,
                              false_e=100000.0, false_n=50000.0)

    def test_roundtrip(self):
        x, y = self.P.forward(GRID_LON, GRID_LAT)
        lon, lat = self.P.inverse(x, y)
        np.testing.assert_allclose(lon, GRID_LON, atol=1e-9)
        np.testing.assert_allclose(lat, GRID_LAT, atol=1e-9)

    def test_conformal_everywhere(self):
        for lon, lat in [(-120.0, 25.0), (-80.0, 40.0), (-96.0, 50.0)]:
            h, k = _scales(self.P, lon, lat)
            assert abs(h / k - 1.0) < 1e-5

    def test_unit_scale_on_standard_parallels(self):
        for lat in (33.0, 45.0):
            _, k = _scales(self.P, -90.0, lat)
            assert abs(k - 1.0) < 1e-6
        # between the parallels the cone is inside the ellipsoid: k < 1
        _, k = _scales(self.P, -90.0, 39.0)
        assert k < 1.0
        _, k = _scales(self.P, -90.0, 50.0)
        assert k > 1.0

    def test_central_meridian_maps_to_x_false_easting(self):
        x, _ = self.P.forward(np.array([-96.0]), np.array([40.0]))
        assert abs(x[0] - 100000.0) < 1e-6

    def test_tangent_1sp_limit(self):
        # both standard parallels equal -> n = sin(phi1) (the 1SP cone)
        p = LambertConformalConic(40.0, 40.0, 40.0, -96.0)
        assert abs(p.n - np.sin(np.radians(40.0))) < 1e-15
        _, k = _scales(p, -96.0, 40.0)
        assert abs(k - 1.0) < 1e-6


class TestAlbersEqualArea:
    P = AlbersEqualArea(29.5, 45.5, 23.0, -96.0)

    def test_roundtrip(self):
        x, y = self.P.forward(GRID_LON, GRID_LAT)
        lon, lat = self.P.inverse(x, y)
        np.testing.assert_allclose(lon, GRID_LON, atol=1e-9)
        np.testing.assert_allclose(lat, GRID_LAT, atol=1e-9)

    def test_equal_area_everywhere(self):
        for lon, lat in [(-120.0, 25.0), (-80.0, 40.0), (-96.0, 55.0)]:
            h, k = _scales(self.P, lon, lat)
            assert abs(h * k - 1.0) < 1e-5

    def test_unit_scale_on_standard_parallels(self):
        for lat in (29.5, 45.5):
            _, k = _scales(self.P, -90.0, lat)
            assert abs(k - 1.0) < 1e-6


class TestPolarStereographic:
    def test_epsg_gn7_2_ups_north_example(self):
        # EPSG Guidance Note 7-2, Polar Stereographic variant A worked
        # example (UPS North, WGS84, k0 = 0.994, FE = FN = 2000000):
        # 73 N, 44 E -> E 3320416.75, N 632668.43
        ps = PolarStereographic(k0=0.994, lon0=0.0, north=True)
        x, y = ps.forward(44.0, 73.0)
        assert abs(float(x) - 3320416.75) < 0.01
        assert abs(float(y) - 632668.43) < 0.01
        lon, lat = ps.inverse(x, y)
        assert abs(float(lon) - 44.0) < 1e-9
        assert abs(float(lat) - 73.0) < 1e-9

    def test_conformal_and_k0_at_pole(self):
        ps = PolarStereographic(k0=0.994)
        h, k = _scales(ps, 30.0, 75.0)
        assert abs(h / k - 1.0) < 1e-5
        # scale tends to k0 at the natural origin (the pole)
        h, _ = _scales(ps, 0.0, 89.999)
        assert abs(h - 0.994) < 1e-5

    def test_south_aspect_mirrors_north(self):
        n = PolarStereographic(k0=0.994, north=True)
        s = PolarStereographic(k0=0.994, north=False)
        xn, yn = n.forward(44.0, 73.0)
        xs, ys = s.forward(-44.0, -73.0)
        # UPS South of the antipodal-mirrored point negates both
        # offsets: E = FE + rho*sin(lam), N = FN + rho*cos(lam) with
        # lam = -44 vs the north case's (+rho*sin44, -rho*cos44)
        assert abs((xs - 2000000.0) + (xn - 2000000.0)) < 1e-6
        assert abs((ys - 2000000.0) + (yn - 2000000.0)) < 1e-6
        lon, lat = s.inverse(xs, ys)
        assert abs(float(lon) + 44.0) < 1e-9
        assert abs(float(lat) + 73.0) < 1e-9


class TestTransformDf:
    def test_distributed_matches_local(self, spark):
        p = LambertConformalConic(33.0, 45.0, 23.0, -96.0)
        rows = [(float(-120 + i * 997 % 50), float(20 + (i * 31) % 40))
                for i in range(64)]
        df = spark.createDataFrame(rows, "lon double, lat double")
        out = p.transform_df(df, "lon", "lat").collect()
        lons = np.array([r.lon for r in out])
        lats = np.array([r.lat for r in out])
        ex, ey = p.forward(lons, lats)
        np.testing.assert_array_equal(np.array([r.x for r in out]), ex)
        np.testing.assert_array_equal(np.array([r.y for r in out]), ey)
        # inverse face round-trips through the distributed path
        back = p.transform_df(
            p.transform_df(df, "lon", "lat"), "x", "y",
            inverse=True, out_cols=("lon2", "lat2")).collect()
        for r in back:
            assert abs(r.lon2 - r.lon) < 1e-9
            assert abs(r.lat2 - r.lat) < 1e-9
