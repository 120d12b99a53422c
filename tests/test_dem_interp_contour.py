"""Golden-value unit tests for the stencil operators (dem / interp /
contour / proximity) — hand-computed expectations in the reference's
autotest style (SURVEY §5)."""

import math

import pytest
from pyspark.sql import functions as F

from lib_gdal_spark.operators import contour, dem, interp, proximity


def _grid(spark, rows):
    return spark.createDataFrame(rows, schema="bx long, by long, value double")


# a 3x3 tilted plane z = 2*x + 3*y  ->  dzdx = 2, dzdy = 3 exactly
PLANE = [(x, y, float(2 * x + 3 * y)) for x in range(3) for y in range(3)]


class TestDem:
    def test_slope_plane(self, spark):
        out = dem.slope(_grid(spark, PLANE), percent=True).collect()
        assert len(out) == 1  # only (1,1) has a complete window
        r = out[0]
        assert (r.bx, r.by) == (1, 1)
        assert r.dzdx == pytest.approx(2.0, abs=0)
        assert r.dzdy == pytest.approx(3.0, abs=0)
        assert r.slope_pct == pytest.approx(100 * math.sqrt(13), rel=1e-12)

    def test_aspect_sector_plane(self, spark):
        # dzdx=2, dzdy=3 -> downhill is -x,-y; |dzdy| < 2|dzdx| and
        # |dzdx| < 2|dzdy| -> diagonal; east=False, south=False -> NW (7)
        out = dem.aspect(_grid(spark, PLANE), sector=True).collect()
        assert out[0].aspect_sector == 7

    def test_hillshade_flat_is_uniform(self, spark):
        flat = [(x, y, 5.0) for x in range(3) for y in range(3)]
        out = dem.hillshade(_grid(spark, flat)).collect()
        # flat terrain: shade = 255*cos(zenith) = 255*cos(45 deg)
        assert out[0].hillshade == pytest.approx(
            round(255 * math.cos(math.radians(45)), 4), abs=1e-4)

    def test_window_requires_completeness(self, spark):
        out = dem.slope(_grid(spark, PLANE[:-1]), percent=True).collect()
        assert out == []  # removing one corner breaks the only window


class TestInterp:
    def test_bilinear_exact_on_plane(self, spark):
        # values at centers (x+0.5, y+0.5): plane v = x + 10*y in grid
        # coords -> bilinear reproduces the plane exactly
        cells = _grid(spark, [(x, y, float((x + 0.5) + 10 * (y + 0.5)))
                              for x in range(2) for y in range(2)])
        pts = spark.createDataFrame([(1, 1.0, 1.0), (2, 0.75, 1.25)],
                                    schema="pt_id long, px double, py double")
        got = {r.pt_id: r.value for r in interp.interpolate_at_points(
            pts, cells).collect()}
        assert got[1] == pytest.approx(1.0 + 10 * 1.0, rel=1e-12)
        assert got[2] == pytest.approx(0.75 + 10 * 1.25, rel=1e-12)

    def test_bilinear_incomplete_window_drops(self, spark):
        cells = _grid(spark, [(0, 0, 1.0), (1, 0, 2.0), (0, 1, 3.0)])
        pts = spark.createDataFrame([(1, 1.0, 1.0)],
                                    schema="pt_id long, px double, py double")
        assert interp.interpolate_at_points(pts, cells).collect() == []

    def test_nearest(self, spark):
        cells = _grid(spark, [(0, 0, 7.0), (1, 0, 9.0)])
        pts = spark.createDataFrame([(1, 0.2, 0.9), (2, 1.9, 0.1)],
                                    schema="pt_id long, px double, py double")
        got = {r.pt_id: r.value for r in interp.interpolate_at_points(
            pts, cells, method="nearest").collect()}
        assert got == {1: 7.0, 2: 9.0}


class TestContour:
    def test_vertical_isoline(self, spark):
        # one square: left corners 0, right corners 1; level 0.5 ->
        # vertical segment x=0.5 spanning the square
        cells = _grid(spark, [(0, 0, 0.0), (1, 0, 1.0), (0, 1, 0.0), (1, 1, 1.0)])
        segs = contour.contour_segments(cells, level=0.5).collect()
        assert len(segs) == 1
        s = segs[0]
        assert (s.x0, s.y0, s.x1, s.y1) == (0.5, 0.0, 0.5, 1.0)

    def test_saddle_emits_two_segments(self, spark):
        # opposite corners high: case 5 (TL, BR inside)
        cells = _grid(spark, [(0, 0, 1.0), (1, 0, 0.0), (0, 1, 0.0), (1, 1, 1.0)])
        segs = contour.contour_segments(cells, level=0.5).collect()
        assert len(segs) == 2

    def test_no_crossing_no_segments(self, spark):
        cells = _grid(spark, [(0, 0, 1.0), (1, 0, 1.0), (0, 1, 1.0), (1, 1, 1.0)])
        assert contour.contour_segments(cells, level=0.5).collect() == []

    def test_partition_independence(self, spark):
        # same grid, different partitioning -> identical segment multiset
        rows = [(x, y, float((x * 7 + y * 13) % 5)) for x in range(8) for y in range(8)]
        a = contour.contour_segments(
            _grid(spark, rows).repartition(1), level=2.0)
        b = contour.contour_segments(
            _grid(spark, rows).repartition(16), level=2.0)
        ka = sorted(map(tuple, a.collect()))
        kb = sorted(map(tuple, b.collect()))
        assert ka == kb and len(ka) > 0


class TestProximity:
    def test_single_target_disk(self, spark):
        cells = _grid(spark, [(0, 0, 0.0), (5, 5, 1.0)])
        out = {(r.bx, r.by): r.dist
               for r in proximity.proximity(cells, [0.0], maxdist=1.5).collect()}
        assert out[(0, 0)] == 0.0
        assert out[(1, 0)] == 1.0
        assert out[(1, 1)] == pytest.approx(math.sqrt(2), rel=1e-12)
        assert len(out) == 9  # 3x3 disk at maxdist 1.5
        assert (5, 5) not in out

    def test_min_over_targets(self, spark):
        cells = _grid(spark, [(0, 0, 0.0), (2, 0, 0.0)])
        out = {(r.bx, r.by): r.dist
               for r in proximity.proximity(cells, [0.0], maxdist=2.0).collect()}
        assert out[(1, 0)] == 1.0  # equidistant -> min is still 1

    def test_fillnodata_mean_of_equidistant(self, spark):
        # hole at (1,0) between values 2 and 4 at distance 1 -> IDW = 3
        cells = _grid(spark, [(0, 0, 2.0), (2, 0, 4.0)])
        out = {(r.bx, r.by): (r.value, r.filled)
               for r in proximity.fillnodata(cells, radius=1.5).collect()}
        assert out[(1, 0)] == (pytest.approx(3.0, rel=1e-12), 1)
        assert out[(0, 0)] == (2.0, 0)


class TestPolylineAssembly:
    def test_open_chain(self):
        segs = [(0, 0, 1, 0), (1, 0, 2, 1), (2, 1, 3, 1)]
        out = contour.assemble_polylines(segs)
        assert out == [[(0.0, 0.0), (1.0, 0.0), (2.0, 1.0), (3.0, 1.0)]]

    def test_ring_closes(self):
        segs = [(0, 0, 1, 0), (1, 0, 1, 1), (0, 1, 1, 1), (0, 0, 0, 1)]
        out = contour.assemble_polylines(segs)
        assert len(out) == 1
        ring = out[0]
        assert ring[0] == ring[-1] and len(ring) == 5

    def test_input_order_independent(self):
        import itertools
        segs = [(0, 0, 1, 0), (1, 0, 2, 1), (5, 5, 6, 5)]
        ref = contour.assemble_polylines(segs)
        for perm in itertools.permutations(segs):
            assert contour.assemble_polylines(list(perm)) == ref

    def test_two_components(self):
        segs = [(0, 0, 1, 1), (10, 0, 11, 1)]
        out = contour.assemble_polylines(segs)
        assert len(out) == 2


class TestContourMulti:
    def test_matches_per_level_runs(self, spark):
        rows = [(x, y, float((x * 7 + y * 13) % 9))
                for x in range(8) for y in range(8)]
        cells = spark.createDataFrame(rows, "bx long, by long, value double")
        levels = [2.0, 4.5, 7.0]
        multi = contour.contour_segments_multi(cells, levels)
        got = sorted(map(tuple, multi.collect()))
        want = []
        for lv in levels:
            for r in contour.contour_segments(cells, lv).collect():
                want.append((lv, r.x0, r.y0, r.x1, r.y1))
        assert got == sorted(want) and len(got) > 0

    def test_single_shuffle(self, spark):
        rows = [(x, y, float(x + y)) for x in range(6) for y in range(6)]
        cells = spark.createDataFrame(rows, "bx long, by long, value double")
        plan = contour.contour_segments_multi(cells, [2.0, 5.0])._jdf \
            .queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1, plan


class TestInterpCubic:
    def test_reproduces_linear_ramp(self, spark):
        # cubic convolution is exact on linear functions
        cells = _grid(spark, [(x, y, float(2 * (x + 0.5) + 3 * (y + 0.5)))
                              for x in range(-2, 5) for y in range(-2, 5)])
        pts = spark.createDataFrame(
            [(1, 1.25, 1.75), (2, 0.9, 2.1)],
            "pt_id long, px double, py double")
        got = {r.pt_id: r.value for r in
               interp.interpolate_cubic(pts, cells).collect()}
        assert got[1] == pytest.approx(2 * 1.25 + 3 * 1.75, rel=1e-12)
        assert got[2] == pytest.approx(2 * 0.9 + 3 * 2.1, rel=1e-12)

    def test_matches_bilinear_at_cell_centers(self, spark):
        # at an exact cell center all kernels agree with the cell value
        cells = _grid(spark, [(x, y, float(x * 10 + y))
                              for x in range(-2, 5) for y in range(-2, 5)])
        pts = spark.createDataFrame([(1, 1.5, 1.5)],
                                    "pt_id long, px double, py double")
        c = interp.interpolate_cubic(pts, cells).collect()[0].value
        # center of cell (1,1): all off-center taps get weight 0
        assert c == pytest.approx(float(1 * 10 + 1), rel=1e-12)

    def test_incomplete_window_drops(self, spark):
        cells = _grid(spark, [(x, y, 1.0) for x in range(3) for y in range(3)])
        pts = spark.createDataFrame([(1, 1.5, 1.5)],
                                    "pt_id long, px double, py double")
        assert interp.interpolate_cubic(pts, cells).collect() == []


class TestContourReferenceGolden:
    """Replay of the reference's contour autotest fixture
    (autotest/alg/contour.py test_contour_1): 160x160 raster, background
    1, nested squares of 10/20/25; ContourGenerate interval 10 must yield
    exactly the two rings whose envelopes the reference asserts (within
    its own precision/2 tolerance)."""

    def test_contour_1_envelopes(self, spark):
        from pyspark.sql import functions as F
        from lib_gdal_spark.operators import contour

        size = 160
        precision = 1.0 / size

        def value(col, row):
            if 70 <= col < 90 and 70 <= row < 90:
                return 25.0
            if 60 <= col < 100 and 60 <= row < 100:
                return 20.0
            if 40 <= col < 120 and 40 <= row < 120:
                return 10.0
            return 1.0

        rows = [(c, size - 1 - r, value(c, r))
                for r in range(size) for c in range(size)]
        df = spark.createDataFrame(rows, "bx long, by long, value double")
        segs = contour.contour_segments_multi(df, [10.0, 20.0]).collect()
        assert len(segs) > 0

        # per level, envelope over segment endpoints, mapped through the
        # fixture's geotransform [1, 1/160, 0, 50, 0, -1/160] with my
        # bottom-up by = 159 - raster row
        import collections
        env = collections.defaultdict(lambda: [1e9, -1e9, 1e9, -1e9])
        for s in segs:
            for (x, y) in ((s.x0, s.y0), (s.x1, s.y1)):
                gx = 1.0 + (x + 0.5) * precision
                gy = 50.0 - (size - 1 - y + 0.5) * precision
                e = env[s.level]
                e[0] = min(e[0], gx); e[1] = max(e[1], gx)
                e[2] = min(e[2], gy); e[3] = max(e[3], gy)
        assert sorted(env) == [10.0, 20.0]
        # reference expectations (autotest/alg/contour.py:101-104) with
        # the reference's own tolerance (:116)
        expected = {10.0: [1.25, 1.75, 49.25, 49.75],
                    20.0: [1.375, 1.625, 49.375, 49.625]}
        tol = precision / 2 * 1.001
        for lvl, exp in expected.items():
            got = env[lvl]
            for a, b in zip(got, exp):
                assert abs(a - b) <= tol, (lvl, got, exp)

    def test_contour_1_rings_close(self, spark):
        from lib_gdal_spark.operators import contour

        size = 40  # smaller replica of the same nested-square shape

        def value(col, row):
            if 10 <= col < 30 and 10 <= row < 30:
                return 10.0
            return 1.0

        rows = [(c, size - 1 - r, value(c, r))
                for r in range(size) for c in range(size)]
        df = spark.createDataFrame(rows, "bx long, by long, value double")
        segs = [(s.x0, s.y0, s.x1, s.y1)
                for s in contour.contour_segments(df, 10.0).collect()]
        lines = contour.assemble_polylines(segs)
        # one closed ring around the square (the reference emits one
        # feature per contour line)
        assert len(lines) == 1
        assert lines[0][0] == lines[0][-1]


class TestContourPolygonizeReferenceGolden:
    """Replay of the reference's POLYGONIZE=TRUE autotests
    (autotest/alg/contour.py test_contour_polygonize band min/max cases
    and test_contour_3 band envelopes) over the same 160x160
    nested-squares fixture, geotransform [1, 1/160, 0, 50, 0, -1/160]."""

    SIZE = 160
    PRECISION = 1.0 / 160

    def _fixture(self, spark):
        size = self.SIZE

        def value(col, row):
            if 70 <= col < 90 and 70 <= row < 90:
                return 25.0
            if 60 <= col < 100 and 60 <= row < 100:
                return 20.0
            if 40 <= col < 120 and 40 <= row < 120:
                return 10.0
            return 1.0

        rows = [(c, size - 1 - r, value(c, r))
                for r in range(size) for c in range(size)]
        return spark.createDataFrame(rows, "bx long, by long, value double")

    def _bands(self, spark, levels):
        from lib_gdal_spark.operators import contour

        # geo mapping: x = 1 + bx/160; y = 50 - (raster row)/160 with our
        # bottom-up by -> y = 50 - (160 - by)/160 = 49 + by/160
        out = contour.contour_polygon_bands(
            self._fixture(spark), levels,
            cell_size=self.PRECISION, origin=(1.0, 49.0))
        return sorted(out.collect(), key=lambda r: r.elev_min)

    @pytest.mark.parametrize("levels,exp_min,exp_max", [
        ([10.0, 20.0], [10], [20]),
        ([0.0, 20.0], [0], [20]),
        ([20.0, 1000.0], [20], [1000]),
        ([20.0], [], []),                       # nothing to do
        ([1.0, 20.0], [1], [20]),               # "min,20"
        ([1.0, 25.0], [1], [25]),               # "min,max"
        ([1.0, 10.0, 25.0], [1, 10], [10, 25]), # "min,10,max"
    ])
    def test_polygonize_band_minmax(self, spark, levels, exp_min, exp_max):
        got = self._bands(spark, levels)
        assert [r.elev_min for r in got] == exp_min
        assert [r.elev_max for r in got] == exp_max

    @pytest.mark.parametrize("levels,exp_min,exp_max", [
        ([-10.0, 0.0, 10.0, 20.0, 25.0, 30.0, 40.0],
         [0, 10, 20, 25], [10, 20, 25, 30]),
        ([0.0, 10.0, 20.0, 25.0, 30.0], [0, 10, 20, 25], [10, 20, 25, 30]),
        ([0.0, 10.0, 20.0, 24.0, 25.0], [0, 10, 20, 24], [10, 20, 24, 25]),
        ([0.0, 10.0, 20.0, 25.0], [0, 10, 20], [10, 20, 25]),
    ])
    def test_contour_3_bands_and_envelopes(self, spark, levels,
                                           exp_min, exp_max):
        exp_env = [
            [1.0, 2.0, 49.0, 50.0],
            [1.25, 1.75, 49.25, 49.75],
            [1.375, 1.625, 49.375, 49.625],
            [1.4375, 1.5625, 49.4375, 49.5625],
        ][: len(exp_min)]
        got = self._bands(spark, levels)
        assert [r.elev_min for r in got] == exp_min
        assert [r.elev_max for r in got] == exp_max
        tol = self.PRECISION / 2 * 1.001  # the reference's own tolerance
        for r, env in zip(got, exp_env):
            for a, b in zip((r.xmin, r.xmax, r.ymin, r.ymax), env):
                assert abs(a - b) <= tol, (r.elev_min, env, r)

    def test_region_geometry_closes(self, spark):
        # each band region's traced multipolygon area equals its cell
        # count (the ring-tracer invariant) and every band here is one
        # connected region
        from lib_gdal_spark.operators import contour

        rows = contour.contour_polygons(
            self._fixture(spark), [0.0, 10.0, 20.0, 25.0, 30.0]).collect()
        assert len(rows) == 4
        for r in rows:
            assert r.area == float(r.n_cells)
            assert r.n_rings >= 1


class TestColorRelief:
    def test_interpolation_and_clamps(self, spark):
        from lib_gdal_spark.operators import dem

        cells = spark.createDataFrame(
            [(0, 0, -5.0), (1, 0, 0.0), (2, 0, 50.0), (3, 0, 100.0),
             (4, 0, 150.0), (5, 0, 200.0), (6, 0, 999.0)],
            "bx long, by long, value double")
        ramp = [(0.0, 0, 0, 255), (100.0, 0, 255, 0), (200.0, 255, 0, 0)]
        got = {r.bx: (r.r, r.g, r.b)
               for r in dem.color_relief(cells, ramp).collect()}
        import pytest as _pt
        assert got[0] == (0.0, 0.0, 255.0)       # clamp below
        assert got[1] == (0.0, 0.0, 255.0)       # first stop
        assert got[2] == _pt.approx((0.0, 127.5, 127.5))   # seg-1 midpoint
        assert got[3] == (0.0, 255.0, 0.0)       # second stop
        assert got[4] == _pt.approx((127.5, 127.5, 0.0))   # seg-2 midpoint
        assert got[5] == (255.0, 0.0, 0.0)       # last stop (clamp edge)
        assert got[6] == (255.0, 0.0, 0.0)       # clamp above
