"""Focal window ops + gridding/interpolation vs pandas oracles."""

import numpy as np
import pandas as pd
import pytest

from lib_gdal_spark.operators import focal, grid


@pytest.fixture(scope="module")
def cells(spark):
    # 10x10 grid, value = bx + 10*by (deterministic, asymmetric)
    rows = [(bx, by, float(bx + 10 * by)) for bx in range(10) for by in range(10)]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["bx", "by", "value"])
    ).cache()


def _oracle_focal(stat, k=1, include_center=True):
    g = np.add.outer(np.arange(10) * 10.0, np.arange(10))  # [by, bx]
    out = {}
    for by in range(10):
        for bx in range(10):
            vals = []
            for dy in range(-k, k + 1):
                for dx in range(-k, k + 1):
                    if not include_center and (dx, dy) == (0, 0):
                        continue
                    xx, yy = bx + dx, by + dy
                    if 0 <= xx < 10 and 0 <= yy < 10:
                        vals.append(g[yy, xx])
            out[(bx, by)] = {
                "mean": np.mean(vals), "min": np.min(vals), "max": np.max(vals),
                "sum": np.sum(vals), "count": len(vals),
                "range": np.max(vals) - np.min(vals),
            }[stat]
    return out


class TestFocal:
    @pytest.mark.parametrize("stat", ["mean", "min", "max", "sum", "count", "range"])
    def test_focal_matches_oracle(self, cells, stat):
        got = focal.focal(cells, stat, k=1).toPandas()
        exp = _oracle_focal(stat)
        for r in got.itertuples():
            assert getattr(r, f"focal_{stat}") == pytest.approx(exp[(r.bx, r.by)]), (
                r.bx, r.by)

    def test_tpi_center_vs_neighbors(self, cells):
        got = focal.tpi(cells).toPandas().set_index(["bx", "by"])
        exp = _oracle_focal("mean", include_center=False)
        # interior cell: symmetric neighborhood -> tpi == 0
        assert got.loc[(5, 5), "tpi"] == pytest.approx(55.0 - exp[(5, 5)])
        # corner cell is asymmetric -> nonzero
        assert abs(got.loc[(0, 0), "tpi"]) > 0

    def test_roughness(self, cells):
        got = focal.roughness(cells).toPandas().set_index(["bx", "by"])
        assert got.loc[(5, 5), "roughness"] == pytest.approx(22.0)  # (±1,±10)
        assert got.loc[(0, 0), "roughness"] == pytest.approx(11.0)


class TestGrid:
    @pytest.fixture(scope="class")
    def points(self, spark):
        rng = np.random.default_rng(42)
        pdf = pd.DataFrame({
            "x": rng.uniform(0, 10, 200),
            "y": rng.uniform(0, 10, 200),
            "z": rng.uniform(0, 100, 200),
        })
        return spark.createDataFrame(pdf).cache(), pdf

    def test_idw_matches_oracle(self, points):
        df, pdf = points
        got = grid.grid_idw(df, cell_size=1.0, radius=2.0).toPandas()
        assert len(got) > 50
        for r in got.sample(10, random_state=1).itertuples():
            cx, cy = r.bx + 0.5, r.by + 0.5
            d = np.hypot(pdf.x - cx, pdf.y - cy)
            m = d <= 2.0
            w = 1.0 / np.maximum(d[m], 1e-12) ** 2
            exp = float((w * pdf.z[m]).sum() / w.sum())
            assert r.value == pytest.approx(exp, rel=1e-9)

    def test_metrics_count(self, points):
        df, pdf = points
        got = grid.grid_metrics(df, cell_size=1.0, radius=1.5).toPandas()
        r = got.iloc[0]
        cx, cy = r.bx + 0.5, r.by + 0.5
        d = np.hypot(pdf.x - cx, pdf.y - cy)
        m = d <= 1.5
        assert r["count"] == m.sum()
        assert r["minimum"] == pytest.approx(pdf.z[m].min())
        assert r["average_distance"] == pytest.approx(d[m].mean(), rel=1e-9)


    def test_metrics_pts_pairwise(self, points):
        """average_distance_pts (gdalgrid.cpp:2283 strict i<j pairs):
        NumPy all-pairs oracle per sampled cell + the single-point cell
        yields NULL (reference nodata when no pair exists)."""
        df, pdf = points
        got = grid.grid_metrics(df, cell_size=1.0, radius=1.5,
                                include_pts_distance=True).toPandas()
        for r in got.sample(8, random_state=3).itertuples():
            cx, cy = r.bx + 0.5, r.by + 0.5
            d = np.hypot(pdf.x - cx, pdf.y - cy)
            m = (d <= 1.5).to_numpy()
            xs, ys = pdf.x[m].to_numpy(), pdf.y[m].to_numpy()
            n = len(xs)
            if n < 2:
                assert np.isnan(r.average_distance_pts)
                continue
            acc = [np.hypot(xs[j] - xs[i], ys[j] - ys[i])
                   for i in range(n - 1) for j in range(i + 1, n)]
            assert r.average_distance_pts == pytest.approx(
                float(np.mean(acc)), rel=1e-9)

    def test_metrics_pts_single_point_null(self, spark):
        import pandas as _pd
        df = spark.createDataFrame(_pd.DataFrame(
            {"x": [5.35], "y": [5.35], "z": [7.0]}))
        got = grid.grid_metrics(df, cell_size=10.0, radius=1.0,
                                include_pts_distance=True).toPandas()
        assert len(got) == 1 and got["count"][0] == 1
        assert np.isnan(got.average_distance_pts[0])

    def test_metrics_pts_two_point_golden(self, spark):
        import pandas as _pd
        # two points 3-4-5 apart in one cell window: avg pair dist = 5
        df = spark.createDataFrame(_pd.DataFrame(
            {"x": [4.0, 7.0], "y": [5.0, 9.0], "z": [1.0, 2.0]}))
        got = grid.grid_metrics(df, cell_size=10.0, radius=8.0,
                                include_pts_distance=True).toPandas()
        row = got[(got.bx == 0) & (got.by == 0)].iloc[0]
        assert row.average_distance_pts == pytest.approx(5.0)

    def test_nearest(self, points):
        df, pdf = points
        got = grid.grid_nearest(df, cell_size=1.0, radius=2.0).toPandas()
        r = got.iloc[0]
        cx, cy = r.bx + 0.5, r.by + 0.5
        d = np.hypot(pdf.x - cx, pdf.y - cy)
        assert r.value == pytest.approx(pdf.z[d.idxmin()])

    def test_invdistnn_matches_numpy_oracle(self, points):
        # gdalgrid.cpp:191 semantics: nearest max_points by smoothed d^2,
        # weight 1/d^2, min_points gating — checked per cell vs numpy
        df, pdf = points
        got = grid.grid_invdistnn(df, cell_size=1.0, radius=2.0,
                                  max_points=5, min_points=2).toPandas()
        assert len(got) > 50
        for r in got.sample(10, random_state=1).itertuples():
            cx, cy = r.bx + 0.5, r.by + 0.5
            d2 = np.maximum((pdf.x - cx) ** 2 + (pdf.y - cy) ** 2, 1e-13)
            m = np.hypot(pdf.x - cx, pdf.y - cy) <= 2.0
            order = sorted(zip(d2[m], pdf.z[m]))[:5]
            assert len(order) >= 2
            w = np.array([1.0 / a for a, _ in order])
            z = np.array([b for _, b in order])
            assert r.value == pytest.approx(float((w * z).sum() / w.sum()),
                                            rel=1e-9)

    def test_invdistnn_min_points_gates(self, spark):
        # a lone point yields exactly one candidate per nearby cell ->
        # min_points=2 drops every cell; min_points=1 keeps them
        df = spark.createDataFrame([(5.0, 5.0, 42.0)], "x double, y double, z double")
        assert grid.grid_invdistnn(df, 1.0, 2.0, max_points=4,
                                   min_points=2).count() == 0
        kept = grid.grid_invdistnn(df, 1.0, 2.0, max_points=4, min_points=1)
        vals = {r.value for r in kept.collect()}
        assert vals == {42.0}  # single-neighbor IDW is the value itself


class TestSieve:
    def test_small_region_merges_into_largest_neighbor(self, spark):
        from lib_gdal_spark.operators import polygonize as pz

        # strip: [1,1] [2] [1,1,1] -> the size-1 region of value 2 merges
        # into the size-3 neighbor (largest), taking value 1
        rows = [(0, 0, 1.0), (1, 0, 1.0), (2, 0, 2.0),
                (3, 0, 1.0), (4, 0, 1.0), (5, 0, 1.0)]
        cells = spark.createDataFrame(rows, "bx long, by long, value double")
        out = pz.sieve(cells, threshold=2).orderBy("bx").collect()
        assert [r.value for r in out] == [1.0] * 6
        # the merged cell joins the right-hand region's id
        assert out[2].region_id == out[3].region_id

    def test_large_regions_untouched(self, spark):
        from lib_gdal_spark.operators import polygonize as pz

        rows = [(x, y, float(1 if x < 2 else 2))
                for x in range(4) for y in range(2)]
        cells = spark.createDataFrame(rows, "bx long, by long, value double")
        out = pz.sieve(cells, threshold=2).collect()
        vals = {(r.bx, r.by): r.value for r in out}
        assert vals[(0, 0)] == 1.0 and vals[(3, 1)] == 2.0

    def test_isolated_small_region_keeps_value(self, spark):
        from lib_gdal_spark.operators import polygonize as pz

        cells = spark.createDataFrame([(0, 0, 9.0)], "bx long, by long, value double")
        out = pz.sieve(cells, threshold=5).collect()
        assert out[0].value == 9.0


class TestOverviewGauss:
    def test_full_window_weights(self, spark):
        from lib_gdal_spark.operators import raster

        # 3x3 block of known values around anchor (2,2) -> parent (1,1)
        rows = [(x, y, float(10 * x + y)) for x in range(1, 4) for y in range(1, 4)]
        cells = spark.createDataFrame(rows, "bx long, by long, value double")
        out = {(r.bx, r.by): r.value for r in raster.overview_gauss(cells).collect()}
        # parent (1,1): anchor (2,2), weights [1,2,1]x[1,2,1] over 11..33
        w = {(dx, dy): (2 - abs(dx)) * (2 - abs(dy))
             for dx in (-1, 0, 1) for dy in (-1, 0, 1)}
        num = sum(w[(x - 2, y - 2)] * (10 * x + y)
                  for x in range(1, 4) for y in range(1, 4))
        assert out[(1, 1)] == num / 16.0

    def test_partial_window_normalizes(self, spark):
        from lib_gdal_spark.operators import raster

        # single cell at the anchor -> weight 4/4 = its own value
        cells = spark.createDataFrame([(2, 2, 7.0)], "bx long, by long, value double")
        out = raster.overview_gauss(cells).collect()
        assert len(out) == 1 and out[0].value == 7.0 and (out[0].bx, out[0].by) == (1, 1)


class TestOverviewCubic:
    def test_constant_grid_preserved(self, spark):
        from lib_gdal_spark.operators import raster

        rows = [(x, y, 5.0) for x in range(-2, 6) for y in range(-2, 6)]
        cells = spark.createDataFrame(rows, "bx long, by long, value double")
        out = {(r.bx, r.by): r.value for r in raster.overview_cubic(cells).collect()}
        # weights sum to 1 -> constants pass through exactly
        assert out[(1, 1)] == 5.0

    def test_linear_ramp_preserved(self, spark):
        from lib_gdal_spark.operators import raster

        # cubic interpolation reproduces linear functions exactly:
        # parent value = ramp at the parent center (2px + 1)
        rows = [(x, y, float(x)) for x in range(-2, 8) for y in range(-2, 8)]
        cells = spark.createDataFrame(rows, "bx long, by long, value double")
        out = {(r.bx, r.by): r.value for r in raster.overview_cubic(cells).collect()}
        assert out[(1, 1)] == pytest.approx(2.5, abs=1e-12)  # centers 2,3
        assert out[(2, 2)] == pytest.approx(4.5, abs=1e-12)

    def test_incomplete_window_drops(self, spark):
        from lib_gdal_spark.operators import raster

        rows = [(x, y, 1.0) for x in range(4) for y in range(4)]
        cells = spark.createDataFrame(rows, "bx long, by long, value double")
        out = raster.overview_cubic(cells).collect()
        # only parent (1,1) has the full 4x4 source window [0..3]^2... its
        # window is sx in {1,2,3,4} -> incomplete; parent (0,0)+... none
        # complete except where sx in {-1..2} subset of 0..3 fails at -1
        assert out == []


class TestFootprintAsFeatures:
    def test_footprint_of_solid_block(self, spark):
        from lib_gdal_spark.operators import raster

        rows = [(x, y, 1.0) for x in range(4) for y in range(4)]
        cells = spark.createDataFrame(rows, "bx long, by long, value double")
        fp = {(r.bx, r.by) for r in raster.footprint_cells(cells).collect()}
        border = {(x, y) for x in range(4) for y in range(4)
                  if x in (0, 3) or y in (0, 3)}
        assert fp == border  # interior 2x2 excluded

    def test_footprint_isolated_cell(self, spark):
        from lib_gdal_spark.operators import raster

        cells = spark.createDataFrame([(5, 5, 1.0)], "bx long, by long, value double")
        assert len(raster.footprint_cells(cells).collect()) == 1

    def test_as_features_geometry(self, spark):
        from lib_gdal_spark.operators import raster

        cells = spark.createDataFrame([(2, 3, 7.0)], "bx long, by long, value double")
        r = raster.as_features(cells, cell_size=10.0, origin=(100.0, 200.0)).collect()[0]
        assert (r.x0, r.y0, r.x1, r.y1) == (120.0, 230.0, 130.0, 240.0)
        assert (r.cx, r.cy) == (125.0, 235.0)


class TestTriLanczos:
    def test_tri_riley_hand_golden(self, spark):
        from pyspark.sql import functions as F
        from lib_gdal_spark.operators import focal
        import numpy as np

        # 3x3 grid with a known center: TRI(center) = sqrt(sum of squared
        # diffs to all 8 neighbors)
        vals = {(x, y): float(x * 3 + y) for x in range(3) for y in range(3)}
        df = spark.createDataFrame([(x, y, v) for (x, y), v in vals.items()],
                                   "bx long, by long, value double")
        out = {(r.bx, r.by): r.tri for r in focal.tri(df).collect()}
        c = vals[(1, 1)]
        exp = float(np.sqrt(sum((c - vals[(1 + dx, 1 + dy)]) ** 2
                                for dx in (-1, 0, 1) for dy in (-1, 0, 1)
                                if (dx, dy) != (0, 0))))
        assert out[(1, 1)] == exp

    def test_tri_wilson_mean_abs(self, spark):
        from lib_gdal_spark.operators import focal

        vals = {(x, y): float((x + 2 * y) % 4) for x in range(3) for y in range(3)}
        df = spark.createDataFrame([(x, y, v) for (x, y), v in vals.items()],
                                   "bx long, by long, value double")
        out = {(r.bx, r.by): r.tri
               for r in focal.tri(df, alg="wilson").collect()}
        c = vals[(1, 1)]
        diffs = [abs(c - vals[(1 + dx, 1 + dy)])
                 for dx in (-1, 0, 1) for dy in (-1, 0, 1) if (dx, dy) != (0, 0)]
        assert out[(1, 1)] == sum(diffs) / len(diffs)

    def test_lanczos_preserves_constant_and_ramp(self, spark):
        from pyspark.sql import functions as F
        from lib_gdal_spark.operators import raster
        import pytest as _pt

        # 12x12 constant grid -> every complete parent is exactly that
        # constant (weights normalized); a linear ramp in bx is preserved
        # at the parent center (symmetric taps cancel the odd moments)
        g = spark.range(144).select(
            (F.col("id") % 12).alias("bx"),
            (F.col("id") / 12).cast("long").alias("by"),
            F.lit(7.5).alias("value"),
        )
        out = raster.overview_lanczos(g).collect()
        assert len(out) > 0
        for r in out:
            assert r.value == _pt.approx(7.5, abs=1e-12)

        ramp = spark.range(144).select(
            (F.col("id") % 12).alias("bx"),
            (F.col("id") / 12).cast("long").alias("by"),
            (F.col("id") % 12).cast("double").alias("value"),
        )
        out = raster.overview_lanczos(ramp).collect()
        for r in out:
            # parent center sits at source coordinate 2*bx + 1, whose ramp
            # value is (2*bx + 0.5) in child units
            assert r.value == _pt.approx(2 * r.bx + 0.5, abs=1e-9)


class TestGridLinear:
    def test_planar_reproduction(self, spark):
        from pyspark.sql import functions as F
        from lib_gdal_spark.operators import grid
        import numpy as np
        import pandas as pd

        # TIN-linear reproduces ANY plane exactly, regardless of which
        # Delaunay triangulation the kernel picks — a triangulation-
        # independent oracle
        rng = np.random.default_rng(11)
        pts = rng.uniform(0, 160, (600, 2))
        pdf = pd.DataFrame({
            "x": pts[:, 0], "y": pts[:, 1],
            "z": 5.0 + 0.25 * pts[:, 0] - 0.5 * pts[:, 1],
        })
        df = spark.createDataFrame(pdf)
        out = grid.grid_linear(df, cell_size=10.0, block_cells=4).toPandas()
        assert len(out) > 100
        exp = 5.0 + 0.25 * (out.bx + 0.5) * 10.0 - 0.5 * (out.by + 0.5) * 10.0
        np.testing.assert_allclose(out.value.to_numpy(), exp.to_numpy(),
                                   atol=1e-8)

    def test_partition_invariance(self, spark):
        from lib_gdal_spark.operators import grid
        import numpy as np
        import pandas as pd

        rng = np.random.default_rng(5)
        pts = rng.uniform(0, 80, (300, 2))
        pdf = pd.DataFrame({"x": pts[:, 0], "y": pts[:, 1],
                            "z": rng.uniform(0, 10, 300)})
        a = grid.grid_linear(spark.createDataFrame(pdf),
                             cell_size=10.0, block_cells=4).toPandas()
        b = grid.grid_linear(spark.createDataFrame(pdf).repartition(13),
                             cell_size=10.0, block_cells=4).toPandas()
        ka = sorted(map(tuple, a.to_numpy().tolist()))
        kb = sorted(map(tuple, b.to_numpy().tolist()))
        assert ka == kb


class TestViewshed:
    def test_wall_shadows_cells_behind_it(self, spark):
        from lib_gdal_spark.operators import viewshed as vs

        # flat 11x3 plain (z=0) with a z=10 wall at bx=5; observer at
        # (0, 1) eye height 1: everything up to the wall is visible, the
        # wall itself is visible, cells behind it are not
        rows = [(x, y, 10.0 if x == 5 else 0.0)
                for x in range(11) for y in range(3)]
        df = spark.createDataFrame(rows, "bx long, by long, value double")
        out = {(r.bx, r.by): r.visible
               for r in vs.viewshed(df, observer=(0, 1), maxdist=12.0,
                                    observer_height=1.0).collect()}
        assert out[(0, 1)] == 1            # observer
        assert out[(4, 1)] == 1            # before the wall
        assert out[(5, 1)] == 1            # the wall face
        assert out[(6, 1)] == 0            # shadowed
        assert out[(10, 1)] == 0           # deep shadow
        # rising ground stays visible on the unobstructed row? the wall
        # spans all y, so the whole bx>5 half-plane is shadowed
        assert out[(8, 0)] == 0 and out[(8, 2)] == 0

    def test_open_plain_fully_visible(self, spark):
        from lib_gdal_spark.operators import viewshed as vs

        rows = [(x, y, 0.0) for x in range(9) for y in range(9)]
        df = spark.createDataFrame(rows, "bx long, by long, value double")
        out = vs.viewshed(df, observer=(4, 4), maxdist=6.0,
                          observer_height=2.0)
        assert out.filter("visible = 0").count() == 0

    def test_curvature_hides_the_horizon(self, spark):
        # flat 1-D plain z=100, observer (0,0) eye 2: flat-earth fully
        # visible; with the reference's correction (viewshed_executor.cpp
        # :295, [Height] -= c*R^2/ED) samples drop LESS than the target
        # (R_j < R_t), so the near terrain becomes the horizon. Blocked
        # iff exists j: (-2 - CH*d2*j^2/n^2)*n/j >= -2 - CH*d2 — first
        # true when CH*d2*(1 - j/n)*(j/n... hand case: d2=n^2, worst j
        # near n: cond ~ CH*n^2 >= ... verified against an independent
        # python mirror below
        from lib_gdal_spark.operators import viewshed as vs

        rows = [(x, 0, 100.0) for x in range(31)]
        df = spark.createDataFrame(rows, "bx long, by long, value double")
        flat = vs.viewshed(df, observer=(0, 0), maxdist=30.0,
                           observer_height=2.0)
        assert flat.filter("visible = 0").count() == 0

        cell, ed, cc = 10000.0, vs.EARTH_DIAMETER, vs.CURVE_COEFF_DEFAULT
        out = {r.bx: r.visible for r in vs.viewshed(
            df, observer=(0, 0), maxdist=30.0, observer_height=2.0,
            curve_coeff=cc, cell_size=cell, earth_diameter=ed).collect()}
        ch = cc * cell * cell / ed
        # independent mirror: target n blocked iff any sample j in 1..n-1
        # satisfies the adjusted angle inequality
        exp = {}
        for n in range(31):
            d2 = n * n
            zt = 100.0 + 0.0 - 102.0 - ch * d2
            blocked = any(
                (100.0 - 102.0 - ch * d2 * j * j / (n * n)) * n / j >= zt
                for j in range(1, n))
            exp[n] = 0 if blocked else 1
        assert out == exp
        # and curvature genuinely flipped something (horizon exists)
        assert 0 in out.values() and 1 in out.values()

    def test_min_height_mode_hand_golden(self, spark):
        # wall z=5 at bx=1; observer (0,0) z=0: target (2,0) z=0 needs
        # (5-0)*2/1 = 10 above the observer eye -> min height 10 exactly;
        # unobstructed (1,0) itself needs 0
        from lib_gdal_spark.operators import viewshed as vs

        rows = [(0, 0, 0.0), (1, 0, 5.0), (2, 0, 0.0), (3, 0, 0.0)]
        df = spark.createDataFrame(rows, "bx long, by long, value double")
        out = {r.bx: r.min_height_from_dem for r in vs.viewshed(
            df, observer=(0, 0), maxdist=4.0, mode="min_height").collect()}
        assert out[0] == 0.0          # observer cell
        assert out[1] == 0.0          # the wall face is visible
        assert out[2] == 10.0         # (5)*n/j - z_t = 5*2 - 0
        assert out[3] == 15.0         # 5*3/1 = 15 dominates 0*3/2

    def test_target_height_unblocks(self, spark):
        from lib_gdal_spark.operators import viewshed as vs

        rows = [(0, 0, 0.0), (1, 0, 4.0), (2, 0, 0.0)]
        df = spark.createDataFrame(rows, "bx long, by long, value double")

        def vis(th):
            out = {r.bx: r.visible for r in vs.viewshed(
                df, observer=(0, 0), maxdist=3.0,
                target_height=th).collect()}
            return out[2]

        assert vis(0.0) == 0     # blocked: need 8 above DEM
        assert vis(7.0) == 0     # 7 < 8 still blocked
        assert vis(9.0) == 1     # clears the wall angle


class TestLineOfSightReferenceGolden:
    """Replay of the reference's LOS autotest basic cases
    (autotest/alg/los.py test_los_basic: a 2x1 all-zero raster)."""

    def _zero(self, spark):
        return spark.createDataFrame([(0, 0, 0.0), (1, 0, 0.0)],
                                     "bx long, by long, value double")

    def test_basic_cases(self, spark):
        from lib_gdal_spark.operators.viewshed import line_of_sight

        z = self._zero(spark)
        # (0,0,z=1) -> (1,0,z=1): above the flat terrain -> visible
        assert line_of_sight(z, (0, 0, 1), (1, 0, 1))
        # (0,0,z=0) -> (1,0,z=0): ON the terrain -> visible (>= rule)
        assert line_of_sight(z, (0, 0, 0), (1, 0, 0))
        # observer below terrain -> not visible
        assert not line_of_sight(z, (0, 0, -1), (1, 0, 1))
        # target below terrain -> not visible
        assert not line_of_sight(z, (0, 0, 1), (1, 0, -1))

    def test_wall_blocks_midpoint(self, spark):
        from lib_gdal_spark.operators.viewshed import line_of_sight

        wall = spark.createDataFrame(
            [(0, 0, 0.0), (1, 0, 10.0), (2, 0, 0.0)],
            "bx long, by long, value double")
        assert not line_of_sight(wall, (0, 0, 1), (2, 0, 1))
        assert line_of_sight(wall, (0, 0, 11), (2, 0, 11))


class TestNeighbors:
    """gdal raster neighbors (vrtfilters.cpp kernel-filter semantics)."""

    def _grid3(self, spark):
        # by=2: 1 2 3 / by=1: 4 5 6 / by=0: 7 8 9
        rows = [(bx, by, float((2 - by) * 3 + bx + 1))
                for by in range(3) for bx in range(3)]
        return spark.createDataFrame(rows, "bx long, by long, value double")

    def test_gaussian_mean_center(self, spark):
        from lib_gdal_spark.operators.focal import neighbors
        out = neighbors(self._grid3(spark), "gaussian-3x3", "mean").collect()
        assert [(r.bx, r.by, r.neighbors_mean) for r in out] == [(1, 1, 5.0)]

    def test_u_v_derivative_kernels(self, spark):
        from lib_gdal_spark.operators.focal import neighbors
        g = self._grid3(spark)
        # u's 2 nonzero taps are horizontal: every middle-column cell
        # qualifies under complete=True; d/dx = +1 step everywhere = 2
        u = neighbors(g, "u", "sum").collect()
        assert sorted((r.bx, r.by, r.neighbors_sum) for r in u) == \
            [(1, 0, 2.0), (1, 1, 2.0), (1, 2, 2.0)]
        # v's taps are vertical: middle-row cells; d/d(raster row) = 6
        v = neighbors(g, "v", "sum").collect()
        assert sorted((r.bx, r.by, r.neighbors_sum) for r in v) == \
            [(0, 1, 6.0), (1, 1, 6.0), (2, 1, 6.0)]

    def test_min_max_stddev_median(self, spark):
        import math

        from lib_gdal_spark.operators.focal import neighbors
        g = self._grid3(spark)
        assert neighbors(g, "equal-3x3", "min").collect()[0] \
            .neighbors_min == 1.0
        assert neighbors(g, "equal-3x3", "max").collect()[0] \
            .neighbors_max == 9.0
        sd = neighbors(g, "equal-3x3", "stddev").collect()[0] \
            .neighbors_stddev
        assert abs(sd - math.sqrt(60.0 / 9.0)) < 1e-12
        assert neighbors(g, "equal-3x3", "median").collect()[0] \
            .neighbors_median == 5.0
        # even count -> average of the two middles (vrtfilters.cpp:658-671)
        assert neighbors(g, "u", "median").collect()[0] \
            .neighbors_median == 1.0  # {-4, 6} -> (-4+6)/2

    def test_mode_first_to_reach_count_wins(self, spark):
        from lib_gdal_spark.operators.focal import neighbors
        # window rows (north->south): [2,1,1] [2,5,2] [1,1,2]
        # counts: 1 -> 4 (last tap 7), 2 -> 4 (last tap 8); value 1
        # reaches its final count FIRST -> the reference's `>`-only
        # maxCount update keeps 1
        vals = {(0, 2): 2, (1, 2): 1, (2, 2): 1,
                (0, 1): 2, (1, 1): 5, (2, 1): 2,
                (0, 0): 1, (1, 0): 1, (2, 0): 2}
        g = spark.createDataFrame(
            [(bx, by, float(v)) for (bx, by), v in vals.items()],
            "bx long, by long, value double")
        out = neighbors(g, "equal-3x3", "mode").collect()
        assert [(r.bx, r.by, r.neighbors_mode) for r in out] == [(1, 1, 1.0)]

    def test_zero_coef_taps_skipped_and_complete(self, spark):
        from lib_gdal_spark.operators.focal import neighbors
        # "u" has only 2 nonzero taps: a cell with both horizontal
        # neighbors qualifies even at the top/bottom edge
        g = self._grid3(spark)
        out = neighbors(g, "u", "sum", complete=True).collect()
        assert sorted((r.bx, r.by) for r in out) == [(1, 0), (1, 1), (1, 2)]
        # zero kern-sum mean (sum(coef)==0) -> 0.0, vrtfilters.cpp:681
        m = neighbors(g, "u", "mean").collect()
        assert all(r.neighbors_mean == 0.0 for r in m)

    def test_partition_invariance(self, spark):
        from lib_gdal_spark.operators.focal import neighbors
        rows = [(bx, by, float((bx * 7 + by * 13) % 5))
                for by in range(8) for bx in range(8)]
        g = spark.createDataFrame(rows, "bx long, by long, value double")
        for method in ("mode", "median", "stddev"):
            a = neighbors(g.repartition(1), "gaussian-3x3", method).collect()
            b = neighbors(g.repartition(16), "gaussian-3x3", method).collect()
            assert sorted(map(tuple, a)) == sorted(map(tuple, b)), method


class TestViewshedCumulative:
    def test_flat_plain_saturates_everywhere(self, spark):
        from lib_gdal_spark.operators import viewshed as vs

        # flat 9x9, spacing 4 -> 9 observers; every LOS is unobstructed,
        # so nvis = 9 everywhere and the 8-bit spread is 255 everywhere
        rows = [(x, y, 0.0) for x in range(9) for y in range(9)]
        df = spark.createDataFrame(rows, "bx long, by long, value double")
        out = vs.viewshed_cumulative(df, spacing=4,
                                     observer_height=2.0).collect()
        assert len(out) == 81
        assert all(r.nvis == 9 and r.scaled == 255 for r in out)

    def test_wall_splits_the_two_observers(self, spark):
        from lib_gdal_spark.operators import viewshed as vs

        # 11x3 plain with a z=10 wall at bx=5, spacing 10 -> observers at
        # (0,0) and (10,0), eye height 1. Each half-plane sees exactly
        # one observer; the wall face is seen by both. max=2 ->
        # factor=127.5, so scaled is 127 / 255.
        rows = [(x, y, 10.0 if x == 5 else 0.0)
                for x in range(11) for y in range(3)]
        df = spark.createDataFrame(rows, "bx long, by long, value double")
        out = {(r.bx, r.by): (r.nvis, r.scaled)
               for r in vs.viewshed_cumulative(
                   df, spacing=10, observer_height=1.0).collect()}
        for y in range(3):
            for x in range(11):
                want = 2 if x == 5 else 1
                assert out[(x, y)][0] == want, (x, y, out[(x, y)])
                assert out[(x, y)][1] == (255 if want == 2 else 127)

    def test_bruteforce_twin_on_bumpy_grid(self, spark):
        import math

        from lib_gdal_spark.operators import viewshed as vs

        # deterministic bumpy 12x9 grid; independent per-observer
        # brute-force twin of the sampled-LOS semantics + the
        # reference's rollup/scale (cumulative.cpp:182-213)
        W, H, SP, OH = 12, 9, 4, 1.5
        z = {(x, y): float((x * 31 + y * 17) % 23)
             for x in range(W) for y in range(H)}
        rows = [(x, y, z[(x, y)]) for x in range(W) for y in range(H)]
        df = spark.createDataFrame(rows, "bx long, by long, value double")

        def visible(ox, oy, tx, ty):
            oz = z[(ox, oy)] + OH
            n = max(abs(tx - ox), abs(ty - oy))
            for j in range(1, n):
                sx = math.floor(ox + (tx - ox) * j / n + 0.5)
                sy = math.floor(oy + (ty - oy) * j / n + 0.5)
                if (z[(sx, sy)] - oz) * n / j >= z[(tx, ty)] - oz:
                    return 0
            return 1

        obs = [(x, y) for x in range(0, W, SP) for y in range(0, H, SP)]
        nvis = {(tx, ty): sum(visible(ox, oy, tx, ty) for ox, oy in obs)
                for tx in range(W) for ty in range(H)}
        m = max(nvis.values())
        want = {k: (v, math.floor(255.0 / m * v)) for k, v in nvis.items()}

        got = {(r.bx, r.by): (r.nvis, r.scaled)
               for r in vs.viewshed_cumulative(
                   df, spacing=SP, observer_height=OH).collect()}
        assert got == want
