"""Replay of the reference's GCPsToHomography autotest
(autotest/alg/gcps2homography.py tests 1-8 + the hour-glass case) through
the from-scratch normalized DLT fit, plus the distributed Column face."""

import numpy as np
import pytest

from lib_gdal_spark.geo.homography import (apply_homography,
                                           apply_homography_cols,
                                           gcps_to_homography)

AFFINE_H = (400000.0, 100.0, 0.0, 370000.0, 0.0, -10.0, 1.0, 0.0, 0.0)
IDENT_H = (0.0, 1.0, 0.0, 0.0, 0.0, 1.0, 1.0, 0.0, 0.0)


class TestHomographyReferenceGolden:
    def test_1_exact_affine(self):
        h = gcps_to_homography([(0, 0, 400000, 370000),
                                (100, 0, 410000, 370000),
                                (100, 200, 410000, 368000)])
        assert np.allclose(h, AFFINE_H, atol=1e-6)

    def test_2_and_3_four_points_fit_exactly(self):
        for last in [(0, 200, 400000, 368000.01),   # near-affine
                     (0, 200, 400000, 360000)]:     # strongly projective
            gcps = [(0, 0, 400000, 370000), (100, 0, 410000, 370000),
                    (100, 200, 410000, 368000), last]
            h = gcps_to_homography(gcps)
            assert h is not None
            x, y = apply_homography(h, [g[0] for g in gcps],
                                    [g[1] for g in gcps])
            assert np.allclose(x, [g[2] for g in gcps], atol=1e-6)
            assert np.allclose(y, [g[3] for g in gcps], atol=1e-6)

    def test_4_single_point_none(self):
        assert gcps_to_homography([(0, 0, 400000, 370000)]) is None

    def test_5_two_points_offset_scale(self):
        h = gcps_to_homography([(0, 0, 400000, 370000),
                                (100, 200, 410000, 368000)])
        assert np.allclose(h, AFFINE_H, atol=1e-6)

    def test_6_and_7_identity_needs_normalization(self):
        quad = [(400000, 370000, 400000, 370000),
                (410000, 370000, 410000, 370000),
                (410000, 368000, 410000, 368000),
                (400000, 368000, 400000, 368000)]
        assert np.allclose(gcps_to_homography(quad), IDENT_H, atol=1e-6)
        reorder = [quad[0], quad[2], quad[1], quad[3]]
        assert np.allclose(gcps_to_homography(reorder), IDENT_H, atol=1e-6)

    def test_8_messy_fit_at_least_as_tight(self):
        # overdetermined LSQ depends on the normalization, so coefficients
        # differ from the reference's expected tuple; the honest check:
        # OUR fit's GCP residuals are no worse than the reference's
        # expected homography evaluated on ITS OWN fixture
        gcps = [(0.01, 0.04, -87.05528672907, 39.22759504228),
                (0.01, 2688.02, -86.97079900719, 39.27075713986),
                (4031.99, 2688.04, -87.05960736744, 39.37569137000),
                (1988.16, 1540.80, -87.055069186699924, 39.304963106777514),
                (1477.41, 2400.83, -87.013419295885001, 39.304705030894979),
                (1466.02, 2376.92, -87.013906298363295, 39.304056190007913)]
        ref_h = (-86.9154734797766, -0.000822802708802448,
                 0.0016903358388202546, 39.16439874542655,
                 0.00038733423466157704, -0.0007330693484379306,
                 0.9983801902671235, 9.207539714141043e-06,
                 -1.9069099634950863e-05)
        p = np.array([g[0] for g in gcps]); l = np.array([g[1] for g in gcps])
        X = np.array([g[2] for g in gcps]); Y = np.array([g[3] for g in gcps])

        def maxres(h):
            x, y = apply_homography(h, p, l)
            return float(np.hypot(x - X, y - Y).max())

        mine = gcps_to_homography(gcps)
        assert maxres(mine) <= maxres(ref_h) + 1e-12

    def test_hour_glass_rejected(self):
        # the reference raises "cross12 * cross23 <= 0.0"; we return None
        assert gcps_to_homography([(0, 0, 0, 0), (0, 10, 0, 10),
                                   (10, 0, 10, 10), (10, 10, 10, 0)]) is None

    def test_hour_glass_rejected_overdetermined(self):
        # n > 4 fold: the reference checks the FITTED homography's
        # unit-square image for every n >= 4 (gdal_homography.cpp:288-318),
        # not just quads. Sample 8 GCPs exactly from a projective map whose
        # denominator (1 - 0.3 p) flips sign inside the pixel bbox — the
        # DLT recovers it exactly and the bbox image is folded, not convex.
        ht = (0, 1, 0, 0, 0, 1, 1, -0.3, 0)
        gcps = []
        for p, l in [(0, 0), (1, 0), (0, 5), (1, 5), (2, 3),
                     (8, 2), (9, 6), (10, 10)]:
            x, y = apply_homography(ht, np.array([float(p)]),
                                    np.array([float(l)]))
            gcps.append((p, l, float(x[0]), float(y[0])))
        assert gcps_to_homography(gcps) is None

    def test_degenerate_dimension_rejected(self):
        # gdal_homography.cpp:180 — GCPs degenerate in one dimension
        assert gcps_to_homography([(0, 0, 0, 0), (0, 1, 0, 1),
                                   (0, 2, 0, 2), (0, 3, 0, 3)]) is None

    def test_column_face_matches_numpy(self, spark):
        from pyspark.sql import functions as F

        h = gcps_to_homography([(0, 0, 400000, 370000),
                                (100, 0, 410000, 370000),
                                (100, 200, 410000, 368000),
                                (0, 200, 400000, 360000)])
        df = spark.range(50).select(
            (F.col("id") % 10).cast("double").alias("p"),
            (F.col("id") / 10).cast("double").alias("l"))
        xc, yc = apply_homography_cols(h, F.col("p"), F.col("l"))
        got = df.select("p", "l", xc.alias("x"), yc.alias("y")).toPandas()
        ex, ey = apply_homography(h, got.p.to_numpy(), got.l.to_numpy())
        np.testing.assert_allclose(got.x.to_numpy(), ex, rtol=1e-12)
        np.testing.assert_allclose(got.y.to_numpy(), ey, rtol=1e-12)
