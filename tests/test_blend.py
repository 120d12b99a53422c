"""gdal raster blend replays (apps/gdalalg_raster_blend.cpp,
autotest/utilities/test_gdalalg_raster_blend.py)."""

import numpy as np
from pyspark.sql import functions as F

from lib_gdal_spark.operators import blend


def _cube(n=64):
    """The autotest's sampled color cube (test_gdalalg_raster_blend.py:
    24-80): channel value = 255 at the top step else k * (256 // n)."""
    step = 256 // n
    vals = np.array([255 if k == n - 1 else k * step for k in range(n)],
                    dtype=np.uint8)
    r = np.repeat(vals, n * n)
    g = np.tile(np.repeat(vals, n), n)
    b = np.tile(vals, n * n)
    return r, g, b


class TestHsvValue:
    def test_colorcube_identity_replay(self):
        # blend(hsv-value, overlay = max(r,g,b)) must return the input
        # bit-exactly for every cube color — the reference's own
        # full-cube assertion (test_gdalalg_raster_blend.py:116-117)
        r, g, b = _cube(64)
        gray = np.maximum(np.maximum(r, g), b)
        rr, gg, bb = blend.blend_hsv_np(r, g, b, gray)
        np.testing.assert_array_equal(rr, r)
        np.testing.assert_array_equal(gg, g)
        np.testing.assert_array_equal(bb, b)

    def test_value_darkens(self):
        # halving V must not brighten any channel and must set the max
        # channel to the new value
        r = np.array([200], np.uint8)
        g = np.array([100], np.uint8)
        b = np.array([40], np.uint8)
        rr, gg, bb = blend.blend_hsv_np(r, g, b, np.array([100], np.uint8))
        assert rr[0] == 100 and gg[0] <= 100 and bb[0] <= 40

    def test_distributed_matches_kernel(self, spark):
        r, g, b = _cube(8)
        n = len(r)
        color = spark.createDataFrame(
            [(i, int(r[i]), int(g[i]), int(b[i]), int(i % 256))
             for i in range(n)], "pid long, r long, g long, b long, a long")
        gray = np.maximum(np.maximum(r, g), b)
        ov = spark.createDataFrame(
            [(i, int(gray[i])) for i in range(n)], "pid long, v long")
        out = blend.blend_hsv(color, ov).orderBy("pid").collect()
        for i, row in enumerate(out):
            assert (row.r, row.g, row.b) == (r[i], g[i], b[i])
            assert row.a == i % 256  # alpha passthrough (blend.cpp:1052)


class TestSrcOver:
    def _np_srcover(self, c, o, opacity):
        # driver-side twin of the reference's general scalar path
        op255 = blend.opacity_255(opacity)
        oa = (o[3] * op255 + 255) // 256
        samul = (c[3] * (255 - oa) + 255) // 256
        dsta = oa + samul
        outs = []
        for k in range(3):
            v = (o[k] * oa + c[k] * samul + 255) // 256
            if dsta not in (0, 255):
                v = (v * 255 + dsta // 2) // dsta
            outs.append(min(v, 255))
        return (*outs, dsta)

    def test_hand_cases(self, spark):
        cases = [((200, 100, 40, 255), (10, 250, 90, 128), 100),
                 ((0, 0, 0, 0), (255, 255, 255, 255), 50),
                 ((13, 200, 7, 77), (91, 3, 250, 33), 60),
                 ((255, 255, 255, 255), (0, 0, 0, 0), 100)]
        color = spark.createDataFrame(
            [(i, *c) for i, (c, _, _) in enumerate(cases)],
            "pid long, r long, g long, b long, a long")
        over = spark.createDataFrame(
            [(i, *o) for i, (_, o, _) in enumerate(cases)],
            "pid long, r long, g long, b long, a long")
        for i, (c, o, op) in enumerate(cases):
            got = blend.blend_srcover(
                color.filter(F.col("pid") == i),
                over.filter(F.col("pid") == i), op).collect()[0]
            exp = self._np_srcover(c, o, op)
            assert (got.r, got.g, got.b, got.a) == exp, (i, exp)

    def test_rgb_no_alpha_fast_path_equivalence(self, spark):
        # for 3-band color + 3-band overlay the reference short-circuits
        # to dst = (o*op + s*(255-op) + 255)/256 (SrcOverRGB,
        # blend.cpp:1100-1110); the general path must collapse to it
        # (samul == 255-op255 exactly), incl. identity at opacity 0
        rng = np.random.RandomState(3)
        rows = [(i, *(int(x) for x in rng.randint(0, 256, 3)))
                for i in range(100)]
        over_rows = [(i, *(int(x) for x in rng.randint(0, 256, 3)))
                     for i in range(100)]
        color = spark.createDataFrame(rows, "pid long, r long, g long, b long")
        over = spark.createDataFrame(over_rows,
                                     "pid long, r long, g long, b long")
        for op in (0, 37, 100):
            op255 = blend.opacity_255(op)
            out = {r.pid: (r.r, r.g, r.b)
                   for r in blend.blend_srcover(color, over, op).collect()}
            for (pid, *c), (_, *o) in zip(rows, over_rows):
                exp = tuple((o[k] * op255 + c[k] * (255 - op255) + 255)
                            // 256 for k in range(3))
                assert out[pid] == exp, (pid, op)
                if op == 0:
                    assert out[pid] == tuple(c)

    def test_full_opacity_opaque_overlay_wins(self, spark):
        color = spark.createDataFrame(
            [(0, 11, 22, 33, 255)], "pid long, r long, g long, b long, a long")
        over = spark.createDataFrame(
            [(0, 240, 120, 60, 255)], "pid long, r long, g long, b long, a long")
        got = blend.blend_srcover(color, over, 100).collect()[0]
        assert (got.r, got.g, got.b, got.a) == (240, 120, 60, 255)

    def test_hsv_opacity_identity_replays(self, spark):
        # test_gdalalg_raster_blend.py:226-251: hsv-value with opacity=0
        # is a no-op, and opacity=50 with gray == max(r,g,b) is too
        r, g, b = _cube(8)
        n = len(r)
        color = spark.createDataFrame(
            [(i, int(r[i]), int(g[i]), int(b[i])) for i in range(n)],
            "pid long, r long, g long, b long")
        gray = np.maximum(np.maximum(r, g), b)
        ov = spark.createDataFrame(
            [(i, int(gray[i])) for i in range(n)], "pid long, v long")
        junk = spark.createDataFrame(
            [(i, int((i * 31) % 256)) for i in range(n)], "pid long, v long")
        for out in (blend.blend_hsv(color, junk, opacity=0),
                    blend.blend_hsv(color, ov, opacity=50)):
            for row in out.orderBy("pid").collect():
                i = row.pid
                assert (row.r, row.g, row.b) == (r[i], g[i], b[i])
