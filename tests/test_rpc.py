"""RPC transformer — replays the reference's own autotest goldens
(autotest/gcore/transformer.py test_transformer_5 on data/rpc.vrt) and
pins the NumPy/Column twin identity (geo/rpc.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lib_gdal_spark.geo import rpc

# the rpc.vrt fixture's RPC-domain metadata lives in geo/rpc.py
RPC_VRT_MD = rpc.RPC_VRT_DEMO


@pytest.fixture(scope="module")
def model():
    return rpc.RpcModel.from_metadata(RPC_VRT_MD)


class TestReferenceGoldens:
    # autotest/gcore/transformer.py:193 — TransformPoint(0, 20.5, 10.5)
    # with RPC_PIXEL_ERROR_THRESHOLD=0.05, tolerance 1e-6
    def test_inverse_z0(self, model):
        X, Y, ok = rpc.lonlat(model, [20.5], [10.5], 0.0,
                              pix_err_threshold=0.05)
        assert ok[0]
        assert X[0] == pytest.approx(125.64830100509131, abs=1e-6)
        assert Y[0] == pytest.approx(39.869433991997553, abs=1e-6)

    def test_inverse_z30(self, model):
        X, Y, ok = rpc.lonlat(model, [20.5], [10.5], 30.0,
                              pix_err_threshold=0.05)
        assert ok[0]
        assert X[0] == pytest.approx(125.64828521533849, abs=1e-6)
        assert Y[0] == pytest.approx(39.869345204440144, abs=1e-6)

    def test_rpc_height_option_equals_z30(self, model):
        # RPC_HEIGHT=30 with z=0 == z=30 (autotest case 3, tol 1e-6 on
        # the same expected point)
        m30 = rpc.RpcModel.from_metadata(RPC_VRT_MD, height_offset=30.0)
        X, Y, ok = rpc.lonlat(m30, [20.5], [10.5], 0.0,
                              pix_err_threshold=0.05)
        assert ok[0]
        assert X[0] == pytest.approx(125.64828521533849, abs=1e-6)
        assert Y[0] == pytest.approx(39.869345204440144, abs=1e-6)

    def test_forward_roundtrip_within_threshold(self, model):
        # the autotest's reverse check: forward(inverse(p)) within 0.05
        X, Y, ok = rpc.lonlat(model, [20.5], [10.5], 0.0,
                              pix_err_threshold=0.05)
        p, l = rpc.pixel_line(model, X[0], Y[0], 0.0)
        assert abs(p - 20.5) < 0.05 and abs(l - 10.5) < 0.05


class TestVectorizedInverse:
    def test_batch_matches_scalar_and_converges(self, model):
        px = np.array([20.5, 100.25, 2219.5, 1000.0])
        ln = np.array([10.5, 200.75, 2919.5, 1500.0])
        X, Y, ok = rpc.lonlat(model, px, ln, 0.0)
        assert ok.all()
        for i in range(len(px)):
            xi, yi, oki = rpc.lonlat(model, [px[i]], [ln[i]], 0.0)
            assert oki[0] and X[i] == xi[0] and Y[i] == yi[0]
        # every converged point back-projects within the 0.1 default
        bp, bl = rpc.pixel_line(model, X, Y, 0.0)
        assert np.all(np.maximum(np.abs(bp - px), np.abs(bl - ln)) < 0.1)

    def test_nonconverged_points_flagged(self, model):
        # a pixel absurdly outside the model domain with 1 iteration
        # cannot converge; it must be flagged, not silently returned
        _, _, ok = rpc.lonlat(model, [1e9], [1e9], 0.0, max_iterations=1)
        assert not ok[0]


class TestColumnTwin:
    def test_forward_column_equals_numpy_bitexact(self, spark, model):
        # the SAME generic expression tree runs as a Column plan and as
        # NumPy — results must be bit-identical (the twin-exactness
        # contract the oracle relies on)
        lon = np.array([125.64, 125.7510, 125.86, 125.70123456789])
        lat = np.array([39.87, 39.7792, 39.69, 39.8012345678])
        z = np.array([0.0, 97.0, 30.0, -5.25])
        np_p, np_l = rpc.pixel_line(model, lon, lat, z)
        df = spark.createDataFrame(
            [(float(a), float(b), float(c)) for a, b, c in zip(lon, lat, z)],
            "lon double, lat double, z double")
        p_col, l_col = rpc.pixel_line(
            model, F.col("lon"), F.col("lat"), F.col("z"))
        got = df.select(p_col.alias("p"), l_col.alias("l")).collect()
        for i, r in enumerate(got):
            assert r.p == np_p[i] and r.l == np_l[i]
