"""Property-based tests (hypothesis) over the pure NumPy kernels — the
closest analog of the reference's generic driver-invariant checker
(apps/test_ogrsf.cpp exercises every driver against invariants rather
than fixed fixtures). No Spark session needed: these are the kernels the
Arrow UDFs wrap, so kernel invariants are engine invariants."""

import math

import numpy as np
from hypothesis import given, settings, strategies as st

from lib_gdal_spark.geo import cells, mercator, wkb
from lib_gdal_spark.geo.pip import (
    point_in_polygon_np, polygon_area_np, ring_area_np,
)
from lib_gdal_spark.geo.simplify import douglas_peucker_np, segmentize_np

lons = st.floats(min_value=-179.999, max_value=179.999, allow_nan=False)
lats = st.floats(min_value=-85.0, max_value=85.0, allow_nan=False)
zooms = st.integers(min_value=0, max_value=14)


class TestTileMathProperties:
    @given(lons, lats, zooms)
    @settings(max_examples=200, deadline=None)
    def test_tile_in_range(self, lon, lat, z):
        tx, ty = mercator.lonlat_to_tile_np([lon], [lat], z)
        n = 2 ** z
        assert 0 <= tx[0] < n and 0 <= ty[0] < n

    @given(lons, lats, zooms)
    @settings(max_examples=200, deadline=None)
    def test_point_within_its_tile_bounds(self, lon, lat, z):
        tx, ty = mercator.lonlat_to_tile_np([lon], [lat], z)
        ln0, lt0, ln1, lt1 = mercator.tile_bounds_lonlat_np(tx, ty, z)
        # tile bounds contain the point (closed with float slack at edges)
        assert ln0[0] - 1e-9 <= lon <= ln1[0] + 1e-9
        assert lt0[0] - 1e-9 <= lat <= lt1[0] + 1e-9

    @given(lons, lats, zooms.filter(lambda z: z >= 1))
    @settings(max_examples=200, deadline=None)
    def test_parent_tile_consistency(self, lon, lat, z):
        # tile at z-1 is the >>1 parent of the tile at z (XYZ pyramid law)
        tx, ty = mercator.lonlat_to_tile_np([lon], [lat], z)
        px, py = mercator.lonlat_to_tile_np([lon], [lat], z - 1)
        assert px[0] == tx[0] >> 1 and py[0] == ty[0] >> 1


class TestCellProperties:
    coords = st.integers(min_value=0, max_value=2**14 - 1)

    @given(coords, coords, zooms)
    @settings(max_examples=200, deadline=None)
    def test_encode_decode_roundtrip(self, x, y, z):
        n = 2 ** z
        x, y = x % n, y % n
        c = cells.cell_encode_np(np.array([x], np.uint64),
                                 np.array([y], np.uint64), z)
        dx, dy, dz = cells.cell_decode_np(c)
        assert (dx[0], dy[0], dz[0]) == (x, y, z)

    @given(coords, coords, zooms.filter(lambda z: z >= 1))
    @settings(max_examples=200, deadline=None)
    def test_parent_halves_coords(self, x, y, z):
        n = 2 ** z
        x, y = x % n, y % n
        c = cells.cell_encode_np(np.array([x], np.uint64),
                                 np.array([y], np.uint64), z)
        p = cells.cell_parent_np(c, 1)
        px, py, pz = cells.cell_decode_np(p)
        assert (px[0], py[0], pz[0]) == (x >> 1, y >> 1, z - 1)


_pts = st.lists(
    st.tuples(st.floats(-100, 100, allow_nan=False),
              st.floats(-100, 100, allow_nan=False)),
    min_size=3, max_size=12,
)


class TestGeometryProperties:
    @given(_pts)
    @settings(max_examples=150, deadline=None)
    def test_ring_area_winding_invariant(self, pts):
        # reversal flips the fold order -> drift up to ~n ulps of the
        # LARGEST cross term, not of the (possibly near-cancelled) sum:
        # a fixed 1e-12 abs_tol is wrong for degenerate rings with
        # coords ~100 where terms reach 1e4 (hypothesis found one)
        ring = np.array(pts + [pts[0]])
        a, b = ring_area_np(ring), ring_area_np(ring[::-1])
        term_ulp = (np.abs(ring).max() ** 2) * np.finfo(float).eps
        tol = 4.0 * len(ring) * term_ulp
        assert math.isclose(a, b, rel_tol=1e-12, abs_tol=max(tol, 1e-12))

    @given(st.lists(st.tuples(st.integers(-50, 50), st.integers(-50, 50)),
                    min_size=3, max_size=10),
           st.integers(-50, 50), st.integers(-50, 50))
    @settings(max_examples=150, deadline=None)
    def test_pip_winding_invariant(self, pts, qx, qy):
        # integer ring coords + off-lattice query point: the point never
        # lies ON an edge, where reversal legitimately flips the float
        # rounding of the crossing test (inherent boundary behavior, also
        # present in the reference's ray cast)
        ring = np.array(pts + [pts[0]], dtype=np.float64)
        px, py = qx + 1.0 / 3.0, qy + 1.0 / 7.0
        a = point_in_polygon_np([px], [py], [ring])[0]
        b = point_in_polygon_np([px], [py], [ring[::-1].copy()])[0]
        assert a == b

    @given(_pts)
    @settings(max_examples=150, deadline=None)
    def test_wkb_roundtrip(self, pts):
        ring = pts + [pts[0]]
        buf = wkb.encode_polygon([ring])
        kind, rings = wkb.decode(buf)
        assert kind == "polygon"
        np.testing.assert_array_equal(rings[0], np.array(ring))

    @given(_pts, st.floats(0.01, 50, allow_nan=False))
    @settings(max_examples=100, deadline=None)
    def test_simplify_subset_and_idempotent(self, pts, tol):
        line = np.array(pts)
        out = douglas_peucker_np(line, tol)
        # output points are a subsequence of the input
        as_set = {tuple(p) for p in line}
        assert all(tuple(p) in as_set for p in out)
        # endpoints survive
        assert tuple(out[0]) == tuple(line[0])
        assert tuple(out[-1]) == tuple(line[-1])
        # idempotent
        again = douglas_peucker_np(out, tol)
        np.testing.assert_array_equal(out, again)

    @given(_pts, st.floats(0.5, 20, allow_nan=False))
    @settings(max_examples=100, deadline=None)
    def test_segmentize_bounds_segment_length(self, pts, max_len):
        line = np.array(pts)
        out = segmentize_np(line, max_len)
        seg = np.hypot(*(np.diff(out, axis=0).T))
        assert (seg <= max_len + 1e-9).all()
        # every original vertex appears in the output
        as_set = {tuple(p) for p in out}
        assert all(tuple(p) in as_set for p in line)

    @given(_pts)
    @settings(max_examples=100, deadline=None)
    def test_area_hole_subtraction(self, pts):
        ring = np.array(pts + [pts[0]])
        a = ring_area_np(ring)
        # polygon with itself as a "hole" has zero area
        assert abs(polygon_area_np([ring, ring.copy()])) < 1e-9 * max(1.0, a)


class TestHullWktDelaunayProperties:
    _coords = st.floats(-1000, 1000, allow_nan=False, allow_infinity=False)
    _pointset = st.lists(st.tuples(_coords, _coords), min_size=3, max_size=40)

    @given(_pointset)
    @settings(max_examples=100, deadline=None)
    def test_hull_contains_all_points_and_is_convex(self, pts):
        from lib_gdal_spark.geo.hull import convex_hull_np

        P = np.array(pts)
        ring = convex_hull_np(P)
        assert (ring[0] == ring[-1]).all()
        v = ring[:-1]
        if len(v) >= 3:
            # convex CCW: every consecutive cross product >= 0
            for i in range(len(v)):
                a, b, c = v[i - 1], v[i], v[(i + 1) % len(v)]
                cross = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
                assert cross >= -1e-6 * max(1.0, abs(cross))
            # all input points inside or on the hull: signed distance to
            # every edge >= -eps
            for p in P:
                for i in range(len(v)):
                    a, b = v[i], v[(i + 1) % len(v)]
                    cross = (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0])
                    assert cross >= -1e-6 * (abs(a[0]) + abs(b[0]) + abs(p[0]) + 1) * 1000

    @given(_pointset)
    @settings(max_examples=50, deadline=None)
    def test_wkt_polygon_roundtrip_random(self, pts):
        from lib_gdal_spark.geo import wkt as wktmod

        ring = np.array(pts + [pts[0]], dtype=np.float64)
        kind, data = wktmod.from_wkt(wktmod.to_wkt("polygon", [ring]))
        assert kind == "polygon"
        assert np.array_equal(data[0], ring)

    @given(st.integers(0, 10_000))
    @settings(max_examples=30, deadline=None)
    def test_delaunay_reproduces_planes(self, seed):
        from lib_gdal_spark.geo.delaunay import delaunay, tin_interpolate

        rng = np.random.default_rng(seed)
        P = np.unique(rng.uniform(0, 100, (60, 2)).round(4), axis=0)
        if len(P) < 3:
            return
        a, b, c = rng.uniform(-2, 2, 3)
        vals = a + b * P[:, 0] + c * P[:, 1]
        tris = delaunay(P)
        q = rng.uniform(20, 80, (40, 2))
        got = tin_interpolate(P, vals, tris, q[:, 0], q[:, 1])
        exp = a + b * q[:, 0] + c * q[:, 1]
        ok = ~np.isnan(got)
        if ok.any():
            np.testing.assert_allclose(got[ok], exp[ok], atol=1e-6)

    @given(_coords, _coords, _coords, _coords)
    @settings(max_examples=100, deadline=None)
    def test_distance_point_point_is_hypot(self, x0, y0, x1, y1):
        from lib_gdal_spark.geo.distance import geometry_distance

        d = geometry_distance("point", (x0, y0), "point", (x1, y1))
        assert d == np.hypot(x0 - x1, y0 - y1)


class TestRpcProperties:
    """geo/rpc.py kernel invariants over the reference's rpc.vrt model
    (the same fixture its autotest goldens use)."""

    from lib_gdal_spark.geo import rpc as _rpcmod
    _M = _rpcmod.RpcModel.from_metadata(_rpcmod.RPC_VRT_DEMO)

    _pixels = st.floats(min_value=0.0, max_value=2220.0,
                        allow_nan=False, allow_infinity=False)
    _lines = st.floats(min_value=0.0, max_value=2920.0,
                       allow_nan=False, allow_infinity=False)
    _heights = st.floats(min_value=-100.0, max_value=400.0,
                         allow_nan=False, allow_infinity=False)

    @given(_pixels, _lines, _heights)
    @settings(max_examples=150, deadline=None)
    def test_converged_inverse_roundtrips_within_threshold(self, px, ln, h):
        from lib_gdal_spark.geo import rpc as rpcmod
        X, Y, ok = rpcmod.lonlat(self._M, [px], [ln], h)
        if ok[0]:  # the reference errors out non-converged points too
            bp, bl = rpcmod.pixel_line(self._M, X[0], Y[0], h)
            # the iteration froze the moment its error dropped below the
            # default 0.1 threshold — the roundtrip must honor it
            assert abs(bp - px) < 0.1 and abs(bl - ln) < 0.1

    @given(st.lists(st.tuples(_pixels, _lines), min_size=1, max_size=6))
    @settings(max_examples=100, deadline=None)
    def test_vectorized_inverse_equals_per_element(self, pts):
        from lib_gdal_spark.geo import rpc as rpcmod
        px = np.array([p for p, _ in pts])
        ln = np.array([l for _, l in pts])
        X, Y, ok = rpcmod.lonlat(self._M, px, ln, 0.0)
        for i in range(len(pts)):
            xi, yi, oki = rpcmod.lonlat(self._M, [px[i]], [ln[i]], 0.0)
            # per-point convergence masking must make batching invisible
            assert ok[i] == oki[0] and X[i] == xi[0] and Y[i] == yi[0]

    def test_full_image_grid_converges(self):
        # deterministic sweep: every point of an in-image 15x15 grid
        # converges at the default threshold (the reference's memo says
        # its no-DEM path converges across whole images)
        from lib_gdal_spark.geo import rpc as rpcmod
        gx, gy = np.meshgrid(np.linspace(0.5, 2219.5, 15),
                             np.linspace(0.5, 2919.5, 15))
        _, _, ok = rpcmod.lonlat(self._M, gx.ravel(), gy.ravel(), 0.0)
        assert ok.all()
