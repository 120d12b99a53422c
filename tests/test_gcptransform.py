"""GCP polynomial + TPS transformer replays.

Goldens lifted from the reference's own autotests:
- autotest/gcore/transformer.py test_transformer_2 (GCP_POLYNOMIAL on
  gcps.vrt: forward (20,10) -> (441920, 3750720) +-1e-3, reverse
  roundtrip) and test_transformer_3 (GCP_TPS, same expectations);
- autotest/utilities/test_gdaltransform.py test_gdaltransform_4
  (-order 1 with the 4 utm corners maps corners exactly) and
  test_gdaltransform_7 (2-GCP rectangle synthesis);
- autotest/gcore/transformer.py test_transformer_tps_precision:
  gcps_2115.vrt (2115 GCPs), per-GCP forward-then-reverse roundtrip at
  rel 1e-5 (same two index exclusions the reference applies).
"""

import re

import numpy as np
import pytest

from lib_gdal_spark.geo.gcptransform import (
    GCPPolynomialTransform, TPSTransform,
)

# autotest/gcore/data/gcps.vrt
GCPS_VRT = [(0.0, 0.0, 440720.0, 3751320.0),
            (100.0, 0.0, 446720.0, 3751320.0),
            (0.0, 100.0, 440720.0, 3745320.0),
            (100.0, 100.0, 446720.0, 3745320.0)]

# test_gdaltransform_4's -gcp list (20x20 box)
GCPS_BOX = [(0, 0, 440720.0, 3751320.0), (20, 0, 441920.0, 3751320.0),
            (20, 20, 441920.0, 3750120.0), (0, 20, 440720.0, 3750120.0)]

GCPS_2115 = "/root/reference/autotest/gcore/data/gcps_2115.vrt"


def _load_2115():
    pat = re.compile(r'Pixel="([0-9.+-Ee]+)" Line="([0-9.+-Ee]+)" '
                     r'X="([0-9.+-Ee]+)" Y="([0-9.+-Ee]+)"')
    out = []
    for line in open(GCPS_2115):
        m = pat.search(line)
        if m:
            out.append(tuple(float(v) for v in m.groups()))
    assert len(out) == 2115
    return out


class TestPolynomial:
    def test_transformer_2_forward_and_reverse(self):
        tr = GCPPolynomialTransform(GCPS_VRT)  # auto order -> 1
        assert tr.order == 1
        x, y = tr.to_geo([20.0], [10.0])
        assert x[0] == pytest.approx(441920, abs=1e-3)
        assert y[0] == pytest.approx(3750720, abs=1e-3)
        px, py = tr.to_pixel(x, y)
        assert px[0] == pytest.approx(20, abs=1e-3)
        assert py[0] == pytest.approx(10, abs=1e-3)

    def test_gdaltransform_4_corners(self):
        tr = GCPPolynomialTransform(GCPS_BOX, order=1)
        xs, ys = tr.to_geo([0, 20, 20, 0], [0, 0, 20, 20])
        exp = [(440720, 3751320), (441920, 3751320),
               (441920, 3750120), (440720, 3750120)]
        for (ex, ey), gx, gy in zip(exp, xs, ys):
            assert gx == pytest.approx(ex, abs=1e-6)
            assert gy == pytest.approx(ey, abs=1e-6)

    def test_two_gcp_rectangle_synthesis(self):
        # test_gdaltransform_7: opposite corners only
        tr = GCPPolynomialTransform(
            [(0, 0, 440720.0, 3751320.0), (20, 20, 441920.0, 3750120.0)],
            order=1)
        px, py = tr.to_pixel([440720.0], [3751320.0])
        assert px[0] == pytest.approx(0, abs=1e-4)
        assert py[0] == pytest.approx(0, abs=1e-4)

    def test_order2_exact_on_quadratic_surface(self):
        # 6 GCPs == term count -> exactdet path; a true quadratic is
        # reproduced exactly at the GCPs AND at held-out points
        def f(e, n):
            return 3.0 + 2.0 * e - n + 0.25 * e * e - 0.5 * e * n
        def g(e, n):
            return -1.0 + e + 4.0 * n + 0.125 * n * n
        pts = [(0, 0), (10, 0), (0, 10), (10, 10), (5, 2), (2, 7)]
        gcps = [(e, n, f(e, n), g(e, n)) for e, n in pts]
        tr = GCPPolynomialTransform(gcps, order=2)
        xs, ys = tr.to_geo([3.0, 8.5], [4.0, 1.5])
        assert xs[0] == pytest.approx(f(3, 4), rel=1e-12)
        assert ys[1] == pytest.approx(g(8.5, 1.5), rel=1e-12)

    def test_order3_least_squares(self):
        rng = np.random.RandomState(7)
        pts = rng.uniform(0, 100, (15, 2))
        def f(e, n):
            return 1 + e + 0.01 * e * n + 1e-4 * e * e * n
        gcps = [(e, n, f(e, n), e - n) for e, n in pts]
        tr = GCPPolynomialTransform(gcps, order=3)
        xs, _ = tr.to_geo(pts[:, 0], pts[:, 1])
        exp = np.array([f(e, n) for e, n in pts])
        assert np.allclose(xs, exp, rtol=1e-9)

    def test_columns_match_numpy(self, spark):
        tr = GCPPolynomialTransform(GCPS_VRT, order=1)
        from pyspark.sql import functions as F
        df = spark.createDataFrame(
            [(float(i), float(i * 2 % 90)) for i in range(50)],
            "px double, py double")
        cx, cy = tr.columns(F.col("px"), F.col("py"))
        rows = df.select("px", "py", cx.alias("gx"),
                         cy.alias("gy")).collect()
        ex, ey = tr.to_geo([r["px"] for r in rows], [r["py"] for r in rows])
        for r, x, y in zip(rows, ex, ey):
            assert r["gx"] == x and r["gy"] == y  # bit-identical op order

    def test_sql_text_matches_numpy(self):
        import duckdb
        gcps = GCPS_BOX + [(10, 5, 441320.0, 3751020.0),
                           (5, 15, 441020.0, 3750420.0)]
        tr = GCPPolynomialTransform(gcps, order=2)
        sx, sy = tr.sql("p.e", "p.n")
        con = duckdb.connect()
        got = con.sql(
            f"SELECT {sx} AS x, {sy} AS y FROM (SELECT 7.0 e, 3.0 n) p"
        ).fetchone()
        ex, ey = tr.to_geo([7.0], [3.0])
        assert got[0] == ex[0] and got[1] == ey[0]


class TestTPS:
    def test_transformer_3_forward_and_reverse(self):
        tr = TPSTransform(GCPS_VRT)
        x, y = tr.to_geo([20.0], [10.0])
        assert x[0] == pytest.approx(441920, abs=1e-3)
        assert y[0] == pytest.approx(3750720, abs=1e-3)
        px, py = tr.to_pixel(x, y)
        assert px[0] == pytest.approx(20, abs=1e-3)
        assert py[0] == pytest.approx(10, abs=1e-3)

    def test_interpolates_gcps_exactly(self):
        rng = np.random.RandomState(3)
        pts = rng.uniform(0, 50, (12, 2))
        gcps = [(e, n, e * 2 + np.sin(n), n - e * 0.1) for e, n in pts]
        tr = TPSTransform(gcps)
        xs, ys = tr.to_geo(pts[:, 0], pts[:, 1])
        assert np.allclose(xs, [g[2] for g in gcps], atol=1e-8)
        assert np.allclose(ys, [g[3] for g in gcps], atol=1e-8)

    def test_tps_precision_2115(self):
        # test_transformer_tps_precision: every GCP roundtrips through
        # forward-then-reverse at rel 1e-5 (same exclusions as the ref)
        gcps = _load_2115()
        tr = TPSTransform(gcps)
        px = np.array([g[0] for g in gcps])
        ln = np.array([g[1] for g in gcps])
        fx, fy = tr.to_geo(px, ln)
        rx, ry = tr.to_pixel(fx, fy)
        skip = {172, 1639}
        for i in range(len(gcps)):
            if i in skip:
                continue
            assert rx[i] == pytest.approx(px[i], rel=1e-5), i
            assert ry[i] == pytest.approx(ln[i], rel=1e-5), i

    def test_redundant_gcps_skipped(self):
        tr = TPSTransform(GCPS_VRT + [GCPS_VRT[0]])
        assert len(tr._fwd["cx"]) == 4

    def test_transform_df_matches_numpy(self, spark):
        tr = TPSTransform(GCPS_VRT)
        df = spark.createDataFrame(
            [(float(i % 90), float(i * 3 % 80)) for i in range(40)],
            "px double, py double")
        rows = tr.transform_df(df, "px", "py").collect()
        ex, ey = tr.to_geo([r["px"] for r in rows], [r["py"] for r in rows])
        for r, x, y in zip(rows, ex, ey):
            assert r["tx"] == pytest.approx(x, rel=1e-14)
            assert r["ty"] == pytest.approx(y, rel=1e-14)
