"""gdalenhance histogram equalization (apps/gdalenhance.cpp) units.

The LUT fold is replayed against hand-computed integer expectations of
the reference's formulas (cum[i] = sum(h[:i]) + h[i]/2;
LUT[i] = clamp(cum[i]*nLUT/total); extremes zeroed)."""

import numpy as np
from pyspark.sql import functions as F

from lib_gdal_spark.operators.enhance import (
    band_histogram, equalization_lut, equalize,
)


class TestLutFold:
    def test_hand_computed(self):
        h = np.zeros(256, np.int64)
        h[1], h[2], h[3] = 4, 4, 8  # total 16
        lut = equalization_lut(h)
        # cum[1]=0+2, cum[2]=4+2, cum[3]=8+4 -> *256//16
        assert lut[1] == 32 and lut[2] == 96 and lut[3] == 192
        assert lut[0] == 0          # cum[0] = 0
        assert lut[255] == 255      # cum[255] = total -> clamp 255

    def test_extreme_bins_zeroed(self):
        h = np.zeros(256, np.int64)
        h[0], h[128], h[255] = 100, 10, 100  # extremes dropped: total 10
        lut = equalization_lut(h)
        assert lut[0] == 0
        # cum[128] = 0 + 10//2 = 5 -> 5*256//10 = 128
        assert lut[128] == 128

    def test_uniform_ramp_is_identityish(self):
        # a flat histogram over interior bins equalizes to ~identity
        h = np.full(256, 7, np.int64)
        lut = equalization_lut(h)
        interior = np.arange(2, 254)
        assert np.all(np.abs(lut[interior] - interior) <= 2)

    def test_zero_total_guard(self):
        h = np.zeros(256, np.int64)
        h[0] = 5  # only an extreme bin -> total 0 after zeroing
        lut = equalization_lut(h)
        assert np.all(lut == 0)


class TestDistributed:
    def test_histogram_and_mapping(self, spark):
        vals = [1.0] * 4 + [2.0] * 4 + [3.0] * 8
        df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                                   "id long, value double")
        h = band_histogram(df)
        assert h[1] == 4 and h[2] == 4 and h[3] == 8 and h.sum() == 16
        got = {r["value"]: r["equalized"]
               for r in equalize(df).collect()}
        assert got == {1.0: 32, 2.0: 96, 3.0: 192}

    def test_out_of_range_clamps(self, spark):
        df = spark.createDataFrame(
            [(0, -5.0), (1, 300.0), (2, 100.0), (3, 100.0)],
            "id long, value double")
        h = band_histogram(df)
        assert h[0] == 1 and h[255] == 1 and h[100] == 2
        out = {r["id"]: r["equalized"] for r in equalize(df).collect()}
        # -5 -> bin 0 -> LUT[0]=0; 300 -> bin 255 -> LUT[255]
        assert out[0] == 0
        # extremes zeroed: total 2; cum[100]=0+1 -> 1*256//2 = 128
        assert out[2] == 128 and out[3] == 128

    def test_single_shuffle_plan(self, spark):
        # the mapping stage adds NO exchange beyond the histogram's own
        # (already-collected) agg: the equalize output plan is scan+project
        df = spark.range(100).select(
            F.col("id"), (F.col("id") % 200).cast("double").alias("value"))
        plan = equalize(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
