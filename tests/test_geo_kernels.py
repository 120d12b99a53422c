"""Unit tests for the pure NumPy geo kernels (no Spark)."""

import math

import numpy as np
import pytest

from lib_gdal_spark.geo import cells, mercator, pip, rtree, wkb


class TestMercator:
    def test_constants_match_reference(self):
        # gdal2tiles.py:417-420 published constants
        assert mercator.ORIGIN_SHIFT == pytest.approx(20037508.342789244, abs=1e-6)
        assert mercator.INITIAL_RESOLUTION == pytest.approx(156543.03392804062, abs=1e-8)

    def test_roundtrip_lonlat_meters(self):
        lon = np.array([-180.0, -77.0365, 0.0, 2.3522, 139.6917])
        lat = np.array([-85.0, 38.8977, 0.0, 48.8566, 35.6895])
        mx, my = mercator.lonlat_to_meters_np(lon, lat)
        lon2, lat2 = mercator.meters_to_lonlat_np(mx, my)
        np.testing.assert_allclose(lon2, lon, atol=1e-9)
        np.testing.assert_allclose(lat2, lat, atol=1e-9)

    def test_known_points(self):
        # (0,0) -> meters (0,0) -> at z=1, XYZ tile (0,0) via ceil-1 rule:
        # px = origin_shift/res = 256 exactly -> ceil(256/256)-1 = 0
        mx, my = mercator.lonlat_to_meters_np(np.array([0.0]), np.array([0.0]))
        assert mx[0] == 0.0 and abs(my[0]) < 1e-9
        tx, ty = mercator.lonlat_to_tile_np([0.0], [0.0], 1)
        assert (tx[0], ty[0]) == (0, 1)  # ceil-1: lands on LEFT/BOTTOM tile; XYZ flip

    def test_ceil_minus_one_rule(self):
        # A point strictly inside the right half at z=1 is tile x=1
        tx, _ = mercator.lonlat_to_tile_np([1e-9], [0.0], 1)
        assert tx[0] == 1
        tx, _ = mercator.lonlat_to_tile_np([-1e-9], [0.0], 1)
        assert tx[0] == 0

    def test_zoom0_single_tile(self):
        rng = np.random.default_rng(42)
        lon = rng.uniform(-179.9, 179.9, 100)
        lat = rng.uniform(-84.9, 84.9, 100)
        tx, ty = mercator.lonlat_to_tile_np(lon, lat, 0)
        assert (tx == 0).all() and (ty == 0).all()

    def test_resolution_halving(self):
        for z in range(14):
            assert mercator.resolution(z + 1) == pytest.approx(mercator.resolution(z) / 2)

    def test_tile_bounds(self):
        minx, miny, maxx, maxy = mercator.tile_bounds_meters_np([0], [0], 0)
        assert minx[0] == pytest.approx(-mercator.ORIGIN_SHIFT)
        assert maxx[0] == pytest.approx(mercator.ORIGIN_SHIFT)

    def test_slippy_consistency(self):
        # away from tile edges, ceil-1 agrees with the floor-based slippy formula
        rng = np.random.default_rng(7)
        lon = rng.uniform(-179.9, 179.9, 500)
        lat = rng.uniform(-84.9, 84.9, 500)
        z = 12
        tx, ty = mercator.lonlat_to_tile_np(lon, lat, z)
        n = 2 ** z
        sx = np.floor((lon + 180.0) / 360.0 * n).astype(np.int64)
        lat_r = np.radians(lat)
        sy = np.floor((1.0 - np.log(np.tan(lat_r) + 1 / np.cos(lat_r)) / math.pi) / 2.0 * n).astype(np.int64)
        np.testing.assert_array_equal(tx, sx)
        np.testing.assert_array_equal(ty, sy)


class TestCells:
    def test_roundtrip(self):
        rng = np.random.default_rng(42)
        z = 14
        x = rng.integers(0, 2 ** z, 1000)
        y = rng.integers(0, 2 ** z, 1000)
        c = cells.cell_encode_np(x, y, z)
        x2, y2, z2 = cells.cell_decode_np(c)
        np.testing.assert_array_equal(x2, x)
        np.testing.assert_array_equal(y2, y)
        assert (z2 == z).all()
        assert (c >= 0).all()

    def test_parent(self):
        c = cells.cell_encode_np(np.array([10]), np.array([13]), 4)
        p = cells.cell_parent_np(c, 1)
        x, y, z = cells.cell_decode_np(p)
        assert (x[0], y[0], z[0]) == (5, 6, 3)

    def test_morton_locality(self):
        # adjacent cells' ids differ less on average than random pairs
        a = cells.cell_encode_np(np.array([100]), np.array([100]), 14)[0]
        b = cells.cell_encode_np(np.array([101]), np.array([100]), 14)[0]
        far = cells.cell_encode_np(np.array([8000]), np.array([8000]), 14)[0]
        assert abs(a - b) < abs(a - far)

    def test_k_ring(self):
        c = int(cells.cell_encode_np(np.array([5]), np.array([5]), 4)[0])
        ring1 = cells.k_ring_np(c, 1)
        assert len(ring1) == 9
        assert c in set(ring1.tolist())
        shell = cells.ring_shell_np(c, 1)
        assert len(shell) == 8
        assert c not in set(shell.tolist())

    def test_k_ring_wraps_x_clamps_y(self):
        c = int(cells.cell_encode_np(np.array([0]), np.array([0]), 4)[0])
        ring1 = cells.k_ring_np(c, 1)
        # y=-1 clipped: 2 rows x 3 cols = 6
        assert len(ring1) == 6
        xs = {int(x) for x in cells.cell_decode_np(ring1)[0]}
        assert 15 in xs  # x wrapped around the antimeridian


class TestPIP:
    UNIT = np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]], dtype=float)

    def test_basic(self):
        inside = pip.point_in_ring_np([0.5, 1.5, -0.5], [0.5, 0.5, 0.5], self.UNIT)
        np.testing.assert_array_equal(inside, [True, False, False])

    def test_concave(self):
        # L-shape: notch cut out of unit square's top right
        ring = np.array([[0, 0], [2, 0], [2, 1], [1, 1], [1, 2], [0, 2], [0, 0]], float)
        inside = pip.point_in_ring_np([1.5, 1.5, 0.5], [0.5, 1.5, 1.5], ring)
        np.testing.assert_array_equal(inside, [True, False, True])

    def test_hole(self):
        outer = self.UNIT * 4
        hole = np.array([[1, 1], [3, 1], [3, 3], [1, 3], [1, 1]], float)
        inside = pip.point_in_polygon_np([0.5, 2.0, 3.5], [0.5, 2.0, 3.5], [outer, hole])
        np.testing.assert_array_equal(inside, [True, False, True])

    def test_outside_bbox_shortcut(self):
        inside = pip.point_in_polygon_np([100.0], [100.0], [self.UNIT])
        assert not inside[0]

    def test_parity_reference_cases(self):
        # point exactly on a horizontal upper edge: (y1 > y) != (y0 > y) with
        # strict > means top edge excluded, bottom edge included (half-open) —
        # matches the reference comparator's strict-> semantics.
        on_bottom = pip.point_in_ring_np([0.5], [0.0], self.UNIT)[0]
        on_top = pip.point_in_ring_np([0.5], [1.0], self.UNIT)[0]
        assert bool(on_bottom) is True
        assert bool(on_top) is False

    def test_area(self):
        assert pip.ring_area_np(self.UNIT) == pytest.approx(1.0)
        hole = self.UNIT * 0.5
        assert pip.polygon_area_np([self.UNIT, hole]) == pytest.approx(0.75)

    def test_polygons_intersect(self):
        a = [self.UNIT]
        b = [self.UNIT + 0.5]
        c = [self.UNIT + 5.0]
        d = [self.UNIT * 10 - 2.0]  # contains a entirely
        assert pip.polygons_intersect_np(a, b)
        assert not pip.polygons_intersect_np(a, c)
        assert pip.polygons_intersect_np(a, d)


class TestWKB:
    def test_point_roundtrip(self):
        kind, (x, y) = wkb.decode(wkb.encode_point(2.5, -3.5))
        assert kind == "point" and (x, y) == (2.5, -3.5)

    def test_polygon_roundtrip(self):
        rings = [TestPIP.UNIT, TestPIP.UNIT * 0.5]
        kind, out = wkb.decode(wkb.encode_polygon(rings))
        assert kind == "polygon" and len(out) == 2
        np.testing.assert_allclose(out[0], TestPIP.UNIT)

    def test_multipolygon_roundtrip(self):
        polys = [[TestPIP.UNIT], [TestPIP.UNIT + 10]]
        kind, out = wkb.decode(wkb.encode_multipolygon(polys))
        assert kind == "multipolygon" and len(out) == 2


class TestWKBZ:
    """Z (2.5-D) WKB — VERDICT r3 item 8. Decode accepts both the
    old-style 0x80000000 flag and the ISO +1000 ladder
    (OGRReadWKBGeometryType, ogr/ogrutils.cpp:2050-2215); encoders emit
    the reference's default wkbVariantOldOgc flag form. The reference's
    own 3d_* fixtures (autotest/ogr/data/wkb_wkt/) replay directly,
    including the legacy 'Z flag in the 2nd byte' broken forms."""

    REF = "/root/reference/autotest/ogr/data/wkb_wkt"

    def test_point_z_roundtrip(self):
        buf = wkb.encode_point(2.5, -3.5, 7.25)
        import struct
        assert struct.unpack_from("<I", buf, 1)[0] == 0x80000001
        kind, data, has_z = wkb.decode_z(buf)
        assert kind == "point" and has_z and data == (2.5, -3.5, 7.25)
        # planar consumers see the xy projection
        assert wkb.decode(buf) == ("point", (2.5, -3.5))

    def test_linestring_polygon_z_roundtrip(self):
        pts = np.array([[0.0, 0.0, 1.0], [2.0, 0.0, 2.0], [2.0, 2.0, 3.0]])
        kind, out, has_z = wkb.decode_z(wkb.encode_linestring(pts))
        assert kind == "linestring" and has_z
        np.testing.assert_array_equal(out, pts)
        ring = np.array([[0, 0, 1], [4, 0, 1], [4, 4, 1], [0, 4, 1],
                         [0, 0, 1]], dtype=np.float64)
        kind, rings, has_z = wkb.decode_z(wkb.encode_polygon([ring]))
        assert kind == "polygon" and has_z
        np.testing.assert_array_equal(rings[0], ring)
        # 2-D decode of the same buffer keeps the 2-column contract
        kind, rings2 = wkb.decode(wkb.encode_polygon([ring]))
        assert rings2[0].shape[1] == 2

    def test_iso_z_codes_decode(self):
        # ISO +1000 encoding of POINT Z (1001) — same decoded value as
        # the flag form
        import struct
        iso = struct.pack("<BIddd", 1, 1001, 1.0, 2.0, 3.0)
        assert wkb.decode_z(iso) == ("point", (1.0, 2.0, 3.0), True)

    def test_reference_3d_fixtures(self):
        # 3d_broken_point/line/polygon carry the legacy 2nd-byte Z flag
        # (0x8001/0x8002/0x8003); 3d_1 is a 0x80000007 collection
        k, d, z = wkb.decode_z(open(f"{self.REF}/3d_broken_point.wkb",
                                    "rb").read())
        assert (k, z) == ("point", True)
        assert d[2] == 5.1
        k, d, z = wkb.decode_z(open(f"{self.REF}/3d_broken_line.wkb",
                                    "rb").read())
        assert (k, z) == ("linestring", True)
        np.testing.assert_array_equal(d, [[1, 2, 3], [2, 3, 4]])
        k, d, z = wkb.decode_z(open(f"{self.REF}/3d_broken_polygon.wkb",
                                    "rb").read())
        assert (k, z) == ("polygon", True)
        assert len(d) == 2 and d[0].shape[1] == 3
        k, d, z = wkb.decode_z(open(f"{self.REF}/3d_1.wkb", "rb").read())
        assert (k, z) == ("collection", True)
        kinds = [sk for sk, _ in d]
        assert kinds == ["point", "point", "linestring", "polygon"]
        assert d[0][1] == (5.00121349, 9.99853131, 1.0)
        assert d[2][1].shape == (4, 3) and d[3][1][0].shape[1] == 3
        # re-encoding the collection reproduces the flagged layout
        enc = {"point": lambda s: wkb.encode_point(*s),
               "linestring": wkb.encode_linestring,
               "polygon": wkb.encode_polygon}
        buf = wkb.encode_collection([enc[sk](sd) for sk, sd in d])
        import struct
        assert struct.unpack_from("<I", buf, 1)[0] == 0x80000007
        k2, d2, z2 = wkb.decode_z(buf)
        assert (k2, z2) == (k, True)
        for (ska, sda), (skb, sdb) in zip(d, d2):
            assert ska == skb
            if ska == "point":
                assert sda == sdb
            elif ska == "linestring":
                np.testing.assert_array_equal(sda, sdb)
            else:
                # the fixture ring arrives open; the encoder closes it
                for ra, rb in zip(sda, sdb):
                    np.testing.assert_array_equal(rb[:len(ra)], ra)
                    np.testing.assert_array_equal(rb[-1], rb[0])

    def test_distance3d_kernel(self):
        from lib_gdal_spark.geo.distance import geometry_distance3d

        # skew interior-interior closest points (endpoint sweep would
        # miss this — the 3-D-specific case)
        a = np.array([[0, 0, 0], [10, 0, 0]], dtype=np.float64)
        b = np.array([[5, -5, 3], [5, 5, 3]], dtype=np.float64)
        d = geometry_distance3d("linestring", a, True, "linestring", b, True)
        assert abs(d - 3.0) < 1e-12
        assert geometry_distance3d("point", (0, 0, 0), True,
                                   "point", (1, 2, 2), True) == 3.0
        # reference rule: -1.0 unless both operands are 3-D
        # (ogrgeometry.cpp:3678); areal kinds = the no-SFCGAL build
        assert geometry_distance3d("point", (0, 0), False,
                                   "point", (1, 2, 2), True) == -1.0
        assert geometry_distance3d("polygon", [a], True,
                                   "point", (1, 2, 2), True) == -1.0
        # multipoint parts stay independent (no phantom segments)
        mp = np.array([[0, 0, 5], [100, 100, 5]], dtype=np.float64)
        d = geometry_distance3d("multipoint", mp, True,
                                "point", (100, 100, 0), True)
        assert d == 5.0


class TestRTree:
    def test_query_matches_bruteforce(self):
        rng = np.random.default_rng(42)
        lo = rng.uniform(0, 100, (500, 2))
        hi = lo + rng.uniform(0.1, 5, (500, 2))
        boxes = np.hstack([lo, hi])
        t = rtree.PackedRTree(boxes)
        for _ in range(50):
            q = rng.uniform(0, 100, 2)
            qbox = (q[0], q[1], q[0] + rng.uniform(0.5, 10), q[1] + rng.uniform(0.5, 10))
            got = t.query(*qbox)
            exp = np.where(
                ~(
                    (boxes[:, 2] < qbox[0])
                    | (qbox[2] < boxes[:, 0])
                    | (boxes[:, 3] < qbox[1])
                    | (qbox[3] < boxes[:, 1])
                )
            )[0]
            np.testing.assert_array_equal(got, exp)

    def test_empty(self):
        t = rtree.PackedRTree(np.empty((0, 4)))
        assert len(t.query(0, 0, 1, 1)) == 0


class TestSimplifySegmentize:
    def test_segmentize_inserts_points(self):
        import numpy as np
        from lib_gdal_spark.geo.simplify import segmentize_np

        line = np.array([[0.0, 0.0], [10.0, 0.0]])
        out = segmentize_np(line, 2.5)
        assert len(out) == 5  # 4 segments of 2.5
        assert (out[:, 1] == 0).all()
        assert out[1][0] == 2.5 and out[-1][0] == 10.0

    def test_segmentize_keeps_short_segments(self):
        import numpy as np
        from lib_gdal_spark.geo.simplify import segmentize_np

        line = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0]])
        out = segmentize_np(line, 5.0)
        assert np.array_equal(out, line)

    def test_douglas_peucker_collinear(self):
        import numpy as np
        from lib_gdal_spark.geo.simplify import douglas_peucker_np

        line = np.array([[0.0, 0.0], [1.0, 0.001], [2.0, -0.001], [3.0, 0.0]])
        out = douglas_peucker_np(line, 0.01)
        assert np.array_equal(out, line[[0, 3]])

    def test_douglas_peucker_keeps_spike(self):
        import numpy as np
        from lib_gdal_spark.geo.simplify import douglas_peucker_np

        line = np.array([[0.0, 0.0], [1.0, 5.0], [2.0, 0.0]])
        out = douglas_peucker_np(line, 0.5)
        assert len(out) == 3  # the spike survives

    def test_sql_roundtrip(self, spark):
        from lib_gdal_spark import functions as fns
        from lib_gdal_spark.geo import wkb

        fns.register_all(spark)
        poly = wkb.encode_polygon(
            [[(0, 0), (5, 0.001), (10, 0), (10, 10), (0, 10), (0, 0)]])
        df = spark.createDataFrame([(bytearray(poly),)], "geom binary")
        df.createOrReplaceTempView("g1")
        r = spark.sql(
            "SELECT st_simplify(geom, 0.01d) AS s, "
            "st_segmentize(geom, 2.5d) AS d FROM g1").collect()[0]
        _, simp = wkb.decode(bytes(r.s))
        assert len(simp[0]) == 5  # near-collinear midpoint dropped
        _, dense = wkb.decode(bytes(r.d))
        assert len(dense[0]) > 6  # points inserted


class TestClip:
    """Boolean-op kernel (geo/clip.py) — the GEOS-backed slice of the
    reference's geometry API (Intersection/Union/Difference/
    SymDifference ogrgeometry.cpp:4560+, Buffer :4498, MakeValid
    ogr_geometry.h:430). Verified three independent ways: hand goldens,
    a Sutherland-Hodgman convex-clip oracle, and randomized region-
    membership sampling (a point is in A op B iff its memberships
    combine under the op)."""

    @staticmethod
    def _area(kind, data):
        from lib_gdal_spark.geo import clip
        if not data:
            return 0.0
        tot = 0.0
        for rings in clip.as_polys(kind, data):
            tot += pip.ring_area_np(rings[0]) - sum(
                pip.ring_area_np(r) for r in rings[1:])
        return tot

    @staticmethod
    def _sq(x0, y0, s):
        return [np.array([[x0, y0], [x0 + s, y0], [x0 + s, y0 + s],
                          [x0, y0 + s], [x0, y0]], float)]

    def test_overlap_squares_all_ops(self):
        from lib_gdal_spark.geo import clip
        a, b = self._sq(0, 0, 4), self._sq(2, 2, 4)
        for op, want in [("intersection", 4.0), ("union", 28.0),
                         ("difference", 12.0), ("symdifference", 24.0)]:
            k, d = clip.overlay("polygon", a, "polygon", b, op)
            assert self._area(k, d) == pytest.approx(want, abs=1e-9), op

    def test_disjoint_nested_identical(self):
        from lib_gdal_spark.geo import clip
        a = self._sq(0, 0, 4)
        far, inner = self._sq(10, 10, 1), self._sq(1, 1, 1)
        k, d = clip.overlay("polygon", a, "polygon", far, "intersection")
        assert d == []
        k, d = clip.overlay("polygon", a, "polygon", far, "union")
        assert k == "multipolygon" and len(d) == 2
        assert self._area(k, d) == pytest.approx(17.0)
        # nested difference -> polygon with hole
        k, d = clip.overlay("polygon", a, "polygon", inner, "difference")
        assert k == "polygon" and len(d) == 2
        assert self._area(k, d) == pytest.approx(15.0)
        # identical: union = A, difference = empty (shared-edge
        # degeneracy exercised on every edge)
        k, d = clip.overlay("polygon", a, "polygon", a, "union")
        assert self._area(k, d) == pytest.approx(16.0)
        k, d = clip.overlay("polygon", a, "polygon", a, "difference")
        assert d == []

    def test_plus_shape_crossing(self):
        # ADVICE r02 distance case: two rects crossing in a plus —
        # neither contains a vertex of the other
        from lib_gdal_spark.geo import clip
        h = [np.array([[0, 2], [6, 2], [6, 4], [0, 4], [0, 2]], float)]
        v = [np.array([[2, 0], [4, 0], [4, 6], [2, 6], [2, 0]], float)]
        k, d = clip.overlay("polygon", h, "polygon", v, "intersection")
        assert self._area(k, d) == pytest.approx(4.0)
        k, d = clip.overlay("polygon", h, "polygon", v, "union")
        assert self._area(k, d) == pytest.approx(20.0)
        k, d = clip.overlay("polygon", h, "polygon", v, "symdifference")
        assert k == "multipolygon" and len(d) == 4

    def test_hole_interaction(self):
        from lib_gdal_spark.geo import clip
        holed = [np.array([[0, 0], [6, 0], [6, 6], [0, 6], [0, 0]], float),
                 np.array([[2, 2], [4, 2], [4, 4], [2, 4], [2, 2]], float)]
        probe = self._sq(1, 1, 4)   # overlaps ring and hole
        k, d = clip.overlay("polygon", holed, "polygon", probe,
                            "intersection")
        assert self._area(k, d) == pytest.approx(16.0 - 4.0)
        # union fills the hole partially: 32 + (25 - 21)
        k, d = clip.overlay("polygon", holed, "polygon", probe, "union")
        assert self._area(k, d) == pytest.approx(32.0 + 4.0 + 12.0 - 12.0)

    @staticmethod
    def _sutherland_hodgman(subject, clipper):
        """Independent convex-clip oracle (textbook half-plane clip)."""
        out = list(map(tuple, subject))
        n = len(clipper)
        for i in range(n):
            if not out:
                break
            a, b = clipper[i], clipper[(i + 1) % n]
            ex, ey = b[0] - a[0], b[1] - a[1]
            inp, out = out, []
            for j in range(len(inp)):
                p, q = inp[j], inp[(j + 1) % len(inp)]
                sp = ex * (p[1] - a[1]) - ey * (p[0] - a[0])
                sq = ex * (q[1] - a[1]) - ey * (q[0] - a[0])
                if sp >= 0:
                    out.append(p)
                if (sp < 0) != (sq < 0) and sp != sq:
                    t = sp / (sp - sq)
                    out.append((p[0] + t * (q[0] - p[0]),
                                p[1] + t * (q[1] - p[1])))
        if len(out) < 3:
            return 0.0
        arr = np.array(out)
        return pip.ring_area_np(arr)

    def test_random_convex_pairs_vs_sutherland_hodgman(self):
        from lib_gdal_spark.geo import clip, hull
        rng = np.random.default_rng(42)
        for trial in range(40):
            pa = hull.convex_hull_np(rng.random((8, 2)) * 10)
            pb = hull.convex_hull_np(rng.random((8, 2)) * 10 + 3)
            # convex_hull_np returns CCW; SH clips CCW subject to CCW clip
            want = self._sutherland_hodgman(pa, pb)
            k, d = clip.overlay("polygon", [pa], "polygon", [pb],
                                "intersection")
            assert self._area(k, d) == pytest.approx(want, abs=1e-9), trial
            # inclusion-exclusion across ops
            ku, du = clip.overlay("polygon", [pa], "polygon", [pb], "union")
            assert self._area(ku, du) == pytest.approx(
                pip.ring_area_np(pa) + pip.ring_area_np(pb) - want, abs=1e-9)

    def test_random_membership_sampling(self):
        from lib_gdal_spark.geo import clip
        rng = np.random.default_rng(7)
        ops = {"intersection": lambda a, b: a & b,
               "union": lambda a, b: a | b,
               "difference": lambda a, b: a & ~b,
               "symdifference": lambda a, b: a ^ b}
        for trial in range(10):
            ra = [(np.array([[0, 0], [5, 0], [5, 5], [0, 5], [0, 0]])
                   + rng.random(2) * 3).astype(float)]
            rb = [(np.array([[0, 0], [4, 0], [4, 6], [0, 6], [0, 0]])
                   + rng.random(2) * 3).astype(float)]
            px = rng.random(400) * 10 - 1
            py = rng.random(400) * 10 - 1
            in_a = pip.point_in_polygon_np(px, py, ra)
            in_b = pip.point_in_polygon_np(px, py, rb)
            for op, fn in ops.items():
                k, d = clip.overlay("polygon", ra, "polygon", rb, op)
                want = fn(in_a, in_b)
                if not d:
                    assert not want.any()
                    continue
                polys = clip.as_polys(k, d)
                got = np.zeros_like(want)
                for rings in polys:
                    got |= pip.point_in_polygon_np(px, py, rings)
                # exclude points within eps of any boundary
                assert (got == want).mean() > 0.99, (op, trial)

    def test_makevalid_bowtie(self):
        from lib_gdal_spark.geo import clip
        bow = [np.array([[0, 0], [4, 4], [4, 0], [0, 4], [0, 0]], float)]
        k, d = clip.make_valid("polygon", bow)
        assert k == "multipolygon" and len(d) == 2
        assert self._area(k, d) == pytest.approx(8.0)

    def test_buffer_line_and_polygon(self):
        from lib_gdal_spark.geo import clip
        k, d = clip.buffer_geometry("linestring", [[0, 0], [10, 0]], 1.0, 30)
        assert self._area(k, d) == pytest.approx(20 + math.pi, abs=2e-3)
        sq = self._sq(0, 0, 4)
        k, d = clip.buffer_geometry("polygon", sq, 1.0, 30)
        assert self._area(k, d) == pytest.approx(16 + 16 + math.pi, abs=2e-3)
        k, d = clip.buffer_geometry("polygon", sq, -1.0, 8)
        assert self._area(k, d) == pytest.approx(4.0, abs=1e-9)
        k, d = clip.buffer_geometry("polygon", sq, -3.0, 8)
        assert d == []

    def test_union_all_chain(self):
        from lib_gdal_spark.geo import clip
        geoms = [("polygon", self._sq(i * 2, 0, 3)) for i in range(5)]
        k, d = clip.union_all(geoms)
        # overlapping strip: total span x in [0, 11], y in [0, 3]
        assert self._area(k, d) == pytest.approx(33.0)

    def test_makevalid_reference_autotest_replay(self):
        """autotest/ogr/ogr_geom.py test_ogr_geom_makevalid (:4181) and
        test_ogr_geom_makevalid_structure (:4203): exact vertex sets up
        to ring rotation."""
        from lib_gdal_spark.geo import clip, wkt

        def ring_set(kind, data):
            polys = clip.as_polys(kind, data)
            return {frozenset(map(tuple, r)) for rings in polys
                    for r in rings}

        k, d = clip.make_valid(*wkt.from_wkt(
            "POLYGON ((0 0,10 10,0 10,10 0,0 0))"))
        assert k == "multipolygon"
        assert ring_set(k, d) == {
            frozenset({(0.0, 0.0), (5.0, 5.0), (10.0, 0.0)}),
            frozenset({(5.0, 5.0), (0.0, 10.0), (10.0, 10.0)})}

        k, d = clip.make_valid(*wkt.from_wkt(
            "POLYGON ((0 0,0 10,10 10,10 0,0 0),(5 5,15 10,15 0,5 5))"))
        assert k == "polygon"
        assert ring_set(k, d) == {frozenset({
            (0.0, 10.0), (10.0, 10.0), (10.0, 7.5), (5.0, 5.0),
            (10.0, 2.5), (10.0, 0.0), (0.0, 0.0)})}

        # valid multipolygon passes through, multi-ness kept
        k, d = clip.make_valid(*wkt.from_wkt(
            "MULTIPOLYGON (((0 0,1 0,1 1,0 1,0 0)))"))
        assert k == "multipolygon" and len(d) == 1

    def test_relate_predicates(self):
        """OGRGeometry predicate set via clip.relate, incl. the
        reference's own test_ogr_geom_polygon_intersects_point case
        (autotest/ogr/ogr_geom.py:3919: vertex point intersects but is
        not contained)."""
        from lib_gdal_spark.geo import clip

        sq = lambda x0, y0, s: ("polygon", self._sq(x0, y0, s))
        a, b = sq(0, 0, 4), sq(2, 2, 4)
        far, inner = sq(10, 10, 1), sq(1, 1, 1)
        R = clip.relate
        assert R(*a, *b, "intersects") and R(*a, *b, "overlaps")
        assert not R(*a, *b, "within") and not R(*a, *b, "touches")
        assert R(*a, *far, "disjoint") and not R(*a, *far, "intersects")
        assert R(*inner, *a, "within") and R(*a, *inner, "contains")
        assert not R(*inner, *a, "overlaps")
        # edge-adjacent squares: touch, don't overlap
        c = sq(4, 0, 4)
        assert R(*a, *c, "touches") and R(*a, *c, "intersects")
        assert not R(*a, *c, "overlaps")
        # reference autotest: vertex point intersects, is not contained
        tri = ("polygon",
               [np.array([[0, 0], [5, 5], [10, 0], [0, 0]], float)])
        pt = ("point", (10.0, 0.0))
        assert R(*tri, *pt, "intersects")
        assert not R(*tri, *pt, "contains")
        # line predicates
        ln = ("linestring", np.array([[-1, 2], [5, 2]], float))
        assert R(*ln, *a, "crosses") and R(*ln, *a, "intersects")
        ln_in = ("linestring", np.array([[1, 1], [3, 3]], float))
        assert R(*ln_in, *a, "within") and not R(*ln_in, *a, "crosses")
        l2 = ("linestring", np.array([[0, 0], [4, 4]], float))
        l3 = ("linestring", np.array([[0, 4], [4, 0]], float))
        assert R(*l2, *l3, "crosses")

    def test_distance_open_ring_closing_edge(self):
        """Regression: an OPEN polygon ring (no repeated closing vertex)
        must still expose its closing edge to the distance sweep —
        overlapping quads that cross only through closing edges were
        reporting positive distance."""
        from lib_gdal_spark.geo.distance import geometry_distance

        a = [np.array([[0, 0], [4, 0], [4, 4], [0, 4]], float)]   # open
        b = [np.array([[3, 3], [7, 3], [7, 7], [3, 7]], float)]   # open
        assert geometry_distance("polygon", a, "polygon", b) == 0.0


class TestIsValid:
    """OGRGeometry::IsValid rule subset (geo/clip.is_valid docstring)."""

    def _p(self, *rings):
        return "polygon", [list(map(list, r)) for r in rings]

    SQUARE = [(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)]
    BOWTIE = [(0, 0), (10, 10), (10, 0), (0, 10), (0, 0)]

    def test_simple_square_valid(self):
        from lib_gdal_spark.geo.clip import is_valid
        ok, why = is_valid(*self._p(self.SQUARE))
        assert ok and why == ""

    def test_bowtie_invalid(self):
        from lib_gdal_spark.geo.clip import is_valid
        ok, why = is_valid(*self._p(self.BOWTIE))
        assert not ok and "self-intersection" in why

    def test_donut_valid_and_hole_outside_invalid(self):
        from lib_gdal_spark.geo.clip import is_valid
        hole = [(2, 2), (4, 2), (4, 4), (2, 4), (2, 2)]
        ok, _ = is_valid(*self._p(self.SQUARE, hole))
        assert ok
        far = [(20, 20), (22, 20), (22, 22), (20, 22), (20, 20)]
        ok, why = is_valid(*self._p(self.SQUARE, far))
        assert not ok and "outside" in why

    def test_hole_crossing_shell_invalid(self):
        from lib_gdal_spark.geo.clip import is_valid
        leak = [(5, 5), (15, 5), (15, 8), (5, 8), (5, 5)]
        ok, why = is_valid(*self._p(self.SQUARE, leak))
        assert not ok and "cross" in why

    def test_nested_holes_invalid(self):
        from lib_gdal_spark.geo.clip import is_valid
        outer = [(1, 1), (8, 1), (8, 8), (1, 8), (1, 1)]
        inner = [(3, 3), (5, 3), (5, 5), (3, 5), (3, 3)]
        ok, why = is_valid(*self._p(self.SQUARE, outer, inner))
        assert not ok and "nested" in why

    def test_hole_touching_shell_at_point_valid(self):
        from lib_gdal_spark.geo.clip import is_valid
        # GEOS: a hole may touch the shell at a finite point set
        touch = [(0, 0), (3, 1), (1, 3), (0, 0)]
        ok, why = is_valid(*self._p(self.SQUARE, touch))
        assert ok, why

    def test_repeated_interior_vertex_invalid(self):
        from lib_gdal_spark.geo.clip import is_valid
        # figure-8 through a repeated vertex
        fig8 = [(0, 0), (4, 0), (2, 2), (4, 4), (0, 4), (2, 2), (0, 0)]
        ok, why = is_valid(*self._p(fig8))
        assert not ok and "self-intersection" in why

    def test_sql_function(self, spark):
        from lib_gdal_spark.functions import register_all
        register_all(spark)
        rows = spark.sql(
            "SELECT st_isvalid(st_geomfromtext("
            "'POLYGON((0 0,10 0,10 10,0 10,0 0))')) AS ok, "
            "st_isvalidreason(st_geomfromtext("
            "'POLYGON((0 0,10 10,10 0,0 10,0 0))')) AS why").collect()
        assert rows[0].ok is True
        assert "self-intersection" in rows[0].why


class TestStitchQuantizationStraddle:
    """Regression: the same crossing point computed from the two split
    directions can differ by 1 ulp AND straddle a stitch-quantization
    boundary; the chain then dead-ended and a real result ring was
    silently dropped (found by the sf1.0 volume probe — geom_overlay
    pairs 30177 / 130809). The stitcher now scans neighboring quanta."""

    CASES = {
        30177: (
            [3.602920645342242, 6.882487114446482, 9.357904978369596,
             0.7102869262225395],
            [3.663917138138597, 3.4580732843935573, 9.43130969781059,
             8.8199027086526],
            [4.618186443744159, 9.166717317065569, 9.91912666049517,
             3.2422284533635155],
            [0.9939815755618691, -0.048192177594093444,
             7.476468134604435, 7.404952345813099],
            {"intersection": 15.825384, "union": 56.359036,
             "difference": 17.401989}),
        130809: (
            [3.1053876581291666, 9.038427479995459, 6.878428194504276,
             3.9656266869836987],
            [3.1017720057126015, 0.7654427093374556, 9.078969211621667,
             9.139724095847507],
            [4.316218126169325, 12.934890901331462, 9.901457217227305,
             3.7755987052010296],
            [5.587071510790879, 5.583393626163353, 10.929169252439774,
             8.771954918822235],
            {"intersection": 11.441776, "union": 52.886396,
             "difference": 19.517041}),
    }

    @staticmethod
    def _area(polys):
        s = 0.0
        for rings in polys:
            for ring in rings:
                rr = np.vstack([ring, ring[:1]])
                s += 0.5 * np.sum(rr[:-1, 0] * rr[1:, 1]
                                  - rr[1:, 0] * rr[:-1, 1])
        return s

    def test_straddle_pairs_no_dropped_rings(self):
        from lib_gdal_spark.geo import clip
        for pid, (xa, ya, xb, yb, exp) in self.CASES.items():
            A = np.vstack([np.stack([xa, ya], 1), [[xa[0], ya[0]]]])
            B = np.vstack([np.stack([xb, yb], 1), [[xb[0], yb[0]]]])
            for op, want in exp.items():
                k, d = clip.overlay("polygon", [A], "polygon", [B], op)
                polys = clip.as_polys(k, d)
                assert polys, (pid, op)
                assert self._area(polys) == pytest.approx(want, abs=1e-6), \
                    (pid, op)
