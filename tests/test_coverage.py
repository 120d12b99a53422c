"""Coverage-validation tests (operators/coverage.py).

Replays the reference's own autotest case
(autotest/utilities/test_gdalalg_vector_check_coverage.py:31
three_rectangles: POLYGON((0 0,10 0,10 10,0 10,0 0)) /
((9.9 0,20 0,20 10,9.9 10,9.9 0)) / ((20 0,30 0,30 10,20 10,20 0)) —
the two overlapping features are invalid, the cleanly-abutting third is
valid; --include-valid emits it with an empty geometry) plus kernel
unit cases for each invalidity rule.
"""

import numpy as np
import pytest

from lib_gdal_spark.operators import coverage as C


def _rect(x0, y0, x1, y1):
    x0, y0, x1, y1 = float(x0), float(y0), float(x1), float(y1)
    return ([x0, x1, x1, x0, x0], [y0, y0, y1, y1, y0])


def _df(spark, polys):
    rows = [(i, xs, ys) for i, (xs, ys) in enumerate(polys)]
    return spark.createDataFrame(
        rows, "poly_id long, xs array<double>, ys array<double>")


def test_three_rectangles_autotest(spark):
    # the reference autotest's exact geometry (0.1 overlap)
    polys = [_rect(0, 0, 10, 10), _rect(9.9, 0, 20, 10),
             _rect(20, 0, 30, 10)]
    out = (C.check_coverage(_df(spark, polys), cell_size=10.0)
           .orderBy("poly_id").toPandas())
    assert list(out["poly_id"]) == [0, 1, 2]
    # feature-level parity: 2 invalid, abutting third valid
    assert (out["n_invalid"] > 0).tolist() == [True, True, False]
    # include_valid=False drops the valid feature (2 rows, the
    # reference's default feature count)
    out2 = C.check_coverage(_df(spark, polys), cell_size=10.0,
                            include_valid=False).toPandas()
    assert len(out2) == 2


def test_valid_coverage_all_clean(spark):
    # 2x2 exactly-abutting grid: a valid coverage -> zero invalid
    polys = [_rect(0, 0, 10, 10), _rect(10, 0, 20, 10),
             _rect(0, 10, 10, 20), _rect(10, 10, 20, 20)]
    out = C.check_coverage(_df(spark, polys), cell_size=10.0).toPandas()
    assert (out["n_invalid"] == 0).all()


def test_tjoin_vertex_mismatch_invalid(spark):
    # T-join: b+c tile a's right edge with an intermediate vertex a
    # lacks -> boundaries are not vertex-matched -> a's long edge and
    # both short edges are invalid (GEOS coverage rule), even though
    # areas don't overlap.
    a = _rect(0, 0, 10, 20)
    b = _rect(10, 0, 20, 10)
    c = _rect(10, 10, 20, 20)
    out = (C.check_coverage(_df(spark, [a, b, c]), cell_size=10.0)
           .orderBy("poly_id").toPandas())
    assert (out["n_invalid"] > 0).tolist() == [True, True, True]


def test_crossing_boundaries_invalid(spark):
    # two squares rotated 45deg against each other cross transversally
    sq = _rect(0, 0, 10, 10)
    diamond = ([5.0, 12.0, 5.0, -2.0, 5.0], [-2.0, 5.0, 12.0, 5.0, -2.0])
    out = (C.check_coverage(_df(spark, [sq, diamond]), cell_size=10.0)
           .orderBy("poly_id").toPandas())
    assert (out["n_invalid"] > 0).all()


def test_disjoint_polys_valid(spark):
    polys = [_rect(0, 0, 10, 10), _rect(50, 50, 60, 60)]
    out = C.check_coverage(_df(spark, polys), cell_size=10.0).toPandas()
    assert (out["n_invalid"] == 0).all()


def test_invalid_edges_locations(spark):
    # the overlapping pair flags exactly left/bottom/top of the shifted
    # rect and right/bottom/top of its neighbor
    polys = [_rect(0, 0, 10, 10), _rect(9.875, 0, 19.875, 10)]
    edges = (C.invalid_edges(_df(spark, polys), cell_size=10.0)
             .orderBy("poly_id", "seg_id").toPandas())
    by_poly = {p: g for p, g in edges.groupby("poly_id")}
    # poly 0 ring segs: 0=bottom 1=right 2=top 3=left
    assert sorted(by_poly[0]["seg_id"]) == [0, 1, 2]
    assert sorted(by_poly[1]["seg_id"]) == [0, 2, 3]


def test_kernel_rules_direct():
    # unit-level: exact-match shared edge is valid; midpoint-inside,
    # collinear-mismatch and crossing are invalid
    a_xs, a_ys = _rect(0, 0, 10, 10)
    b_xs, b_ys = _rect(10, 0, 20, 10)
    sa = C._segments(np.array(a_xs, float), np.array(a_ys, float))
    sb = C._segments(np.array(b_xs, float), np.array(b_ys, float))
    bad = C._classify_pair(sa, sb, np.array(b_xs, float),
                           np.array(b_ys, float))
    assert not bad.any()          # exact shared edge + point touches

    b_xs2, b_ys2 = _rect(9.5, 0, 20, 10)
    sb2 = C._segments(np.array(b_xs2, float), np.array(b_ys2, float))
    bad2 = C._classify_pair(sa, sb2, np.array(b_xs2, float),
                            np.array(b_ys2, float))
    # right edge midpoint-inside, bottom/top collinear-mismatch
    assert bad2.tolist() == [True, True, True, False]


def test_strictly_inside_boundary_excluded():
    xs = np.array([0.0, 10, 10, 0, 0])
    ys = np.array([0.0, 0, 10, 10, 0])
    px = np.array([5.0, 0.0, 10.0, 5.0, -1.0])
    py = np.array([5.0, 5.0, 5.0, 0.0, 5.0])
    got = C._strictly_inside(px, py, xs, ys)
    assert got.tolist() == [True, False, False, False, False]
