"""rgb2pct / pct2rgb (alg/gdalmediancut.cpp + alg/gdaldither.cpp) replays.

Goldens lifted from the reference's own autotests:
- autotest/alg/dither.py test_dither_1: rgbsmall.tif, 8-color median-cut
  palette (exact table) + dithered checksum 8803;
- autotest/utilities/test_gdalalg_raster_rgb_to_palette.py: small_world
  256-color entry 0 == (188, 168, 100), dithered checksum 14890.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lib_gdal_spark.operators.pct import (
    _dither_kernel, median_cut_palette, median_cut_pct, nearest_lut,
    pct2rgb, rgb2pct,
)
from lib_gdal_spark.operators.raster import CHECKSUM_PRIMES, checksum
from lib_gdal_spark.sources import decode_tiff

RGBSMALL = "/root/reference/autotest/gdrivers/data/rgbsmall.tif"
SMALL_WORLD = "/root/reference/autotest/gdrivers/data/small_world.tif"

# autotest/alg/dither.py ref_ct
RGBSMALL_PCT = [(36, 48, 32), (92, 120, 20), (88, 96, 20), (92, 132, 56),
                (0, 0, 0), (96, 152, 24), (60, 112, 32), (164, 164, 108)]


def _np_checksum(a):
    h, w = a.shape
    pr = np.asarray(CHECKSUM_PRIMES)[np.arange(h * w) % 11].reshape(h, w)
    return int((a % pr).sum()) & 0xFFFF


def _cells(spark, arr):
    nb, h, w = arr.shape
    rows = [(x, h - 1 - y, [float(arr[b, y, x]) for b in range(nb)])
            for y in range(h) for x in range(w)]
    return spark.createDataFrame(rows, "bx long, by long, vals array<double>")


class TestRgbsmallReplay:
    def test_median_cut_palette_and_dither_checksum(self, spark):
        arr = decode_tiff(open(RGBSMALL, "rb").read())[0].astype(np.int64)
        cells = _cells(spark, arr)
        pal = median_cut_pct(cells, 8)
        assert pal == RGBSMALL_PCT  # bit-exact color table
        out = rgb2pct(cells, pal, dither=True)
        cs = checksum(out.select("bx", "by",
                                 F.col("pct_idx").alias("value")),
                      0, 0, 50, 50).head()[0]
        assert cs == 8803  # test_dither_1 expectation


class TestSmallWorldReplay:
    def test_256_color_palette_and_dither(self):
        # kernel-level (80k px through createDataFrame is just slow);
        # the Spark path is covered by the rgbsmall replay above
        arr = decode_tiff(open(SMALL_WORLD, "rb").read())[0].astype(np.int64)
        H = np.zeros((32, 32, 32), np.int64)
        np.add.at(H, (arr[0] >> 3, arr[1] >> 3, arr[2] >> 3), 1)
        pal = median_cut_palette(H, 256)
        assert len(pal) == 256
        assert pal[0] == (188, 168, 100)
        out = _dither_kernel(arr.transpose(1, 2, 0), nearest_lut(pal), pal)
        assert _np_checksum(out) == 14890


class TestNearestMapping:
    def test_lut_first_wins_tie_break(self):
        # (0,0,0) and (2,0,0) are equidistant from rep (1,0,0)... use an
        # exact tie: palette entries at L1 distance 8 on different axes
        pal = [(8, 0, 0), (0, 8, 0)]
        lut = nearest_lut(pal)
        assert lut[0, 0, 0] == 0  # tie -> first palette entry

    def test_undithered_matches_numpy(self, spark):
        arr = decode_tiff(open(RGBSMALL, "rb").read())[0].astype(np.int64)
        cells = _cells(spark, arr)
        lut = nearest_lut(RGBSMALL_PCT)
        got = {(r["bx"], r["by"]): r["pct_idx"]
               for r in rgb2pct(cells, RGBSMALL_PCT).collect()}
        h = arr.shape[1]
        exp = lut[arr[0] >> 3, arr[1] >> 3, arr[2] >> 3]
        for y in range(h):
            for x in range(arr.shape[2]):
                assert got[(x, h - 1 - y)] == exp[y, x]

    def test_pct2rgb_roundtrip(self, spark):
        df = spark.createDataFrame([(i,) for i in range(8)],
                                   "pct_idx long")
        rows = pct2rgb(df, RGBSMALL_PCT).orderBy("pct_idx").collect()
        for r in rows:
            assert (r["red"], r["green"], r["blue"]) == \
                RGBSMALL_PCT[r["pct_idx"]]


class TestMultiImageDither:
    def test_per_image_grouping_matches_single(self, spark):
        arr = decode_tiff(open(RGBSMALL, "rb").read())[0].astype(np.int64)
        a = arr[:, :16, :16]
        b = 255 - arr[:, 10:26, 5:21]
        pal = RGBSMALL_PCT
        rows = []
        for img_id, im in ((0, a), (1, b)):
            nb, h, w = im.shape
            rows += [(img_id, x, h - 1 - y,
                      [float(im[c, y, x]) for c in range(nb)])
                     for y in range(h) for x in range(w)]
        df = spark.createDataFrame(
            rows, "img long, bx long, by long, vals array<double>")
        got = rgb2pct(df, pal, dither=True, image_col="img").collect()
        lut = nearest_lut(pal)
        exp = {0: _dither_kernel(a.transpose(1, 2, 0), lut, pal),
               1: _dither_kernel(b.transpose(1, 2, 0), lut, pal)}
        assert len(got) == 2 * 16 * 16
        for r in got:
            assert r["pct_idx"] == exp[r["img"]][16 - 1 - r["by"], r["bx"]], \
                (r["img"], r["bx"], r["by"])
