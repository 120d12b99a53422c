"""nearblack (apps/nearblack_lib.cpp twopasses) replays.

Every expectation below is lifted from the reference's own autotest
(autotest/utilities/test_nearblack_lib.py): the rgbsmall.tif checksum
quartet of lib_1/lib_2, the white-mode lib_4 checksum, and the full
twopasses 5x5/7x7 mask-erosion matrix. The floodfill-only cases are out
of scope (we implement the twopasses algorithm).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lib_gdal_spark.operators.nearblack import nearblack
from lib_gdal_spark.operators.raster import checksum
from lib_gdal_spark.sources import decode_tiff

RGBSMALL = "/root/reference/autotest/gdrivers/data/rgbsmall.tif"


def _cells_from_bands(spark, arr):
    """(bands, h, w) float array -> (bx, by, vals) frame, by upward."""
    nb, h, w = arr.shape
    rows = [(x, h - 1 - y, [float(arr[b, y, x]) for b in range(nb)])
            for y in range(h) for x in range(w)]
    return spark.createDataFrame(rows, "bx long, by long, vals array<double>")


def _mask_grid(out_rows, h, w):
    m = np.zeros((h, w), int)
    for r in out_rows:
        m[h - 1 - r["by"], r["bx"]] = r["mask"]
    return m.tolist()


class TestRgbsmallReplay:
    def test_lib_1_and_2_checksums(self, spark):
        # test_nearblack_lib_1 (band checksums 21106/20736/21309) and
        # lib_2 (the alpha band our mask column models, checksum 22002)
        # in one run: maxNonBlack=0, nearDist=15.
        arr, meta = decode_tiff(open(RGBSMALL, "rb").read())
        assert meta["bands"] == 3 and arr.shape == (3, 50, 50)
        cells = _cells_from_bands(spark, arr.astype(float))
        out = nearblack(cells, 50, 50, near_dist=15, max_non_black=0).cache()
        expected = {1: 21106, 2: 20736, 3: 21309}
        for b, cs in expected.items():
            got = checksum(
                out.select("bx", "by", F.col("vals")[b - 1].alias("value")),
                0, 0, 50, 50).head()[0]
            assert got == cs, f"band {b}"
        mask_cs = checksum(
            out.select("bx", "by", F.col("mask").alias("value")),
            0, 0, 50, 50).head()[0]
        assert mask_cs == 22002  # lib_2 / lib_3 / lib_5 alpha-mask value
        out.unpersist()

    def test_lib_4_white(self, spark):
        # lib_4 builds the white-collar source by warping rgbsmall with
        # INIT_DEST=255 / unified srcNodata=0: pixels whose three bands
        # are ALL zero become 255; expected twopasses alpha cs 24151.
        arr, _ = decode_tiff(open(RGBSMALL, "rb").read())
        arr = arr.astype(float)
        arr[:, (arr == 0).all(axis=0)] = 255.0
        cells = _cells_from_bands(spark, arr)
        out = nearblack(cells, 50, 50, near_dist=15, max_non_black=0,
                        white=True)
        mask_cs = checksum(
            out.select("bx", "by", F.col("mask").alias("value")),
            0, 0, 50, 50).head()[0]
        assert mask_cs == 24151


# (name, input grid, expected mask, maxNonBlack) — verbatim from the
# reference autotest's twopasses parametrization.
C5 = [[255] * 5] * 5
CONTOUR = [[255] * 5, [255, 0, 0, 0, 255], [255, 0, 0, 0, 255],
           [255, 0, 0, 0, 255], [255] * 5]
MASK_CASES = [
    ("all_valid", C5, C5, 1),
    ("all_invalid", [[0] * 5] * 5, [[0] * 5] * 5, 1),
    ("single_pixel_valid",
     [[0] * 5, [0] * 5, [0, 0, 255, 0, 0], [0] * 5, [0] * 5],
     [[0] * 5] * 5, 1),
    ("all_contour_valid_mnb0", CONTOUR, C5, 0),
    ("all_contour_valid_mnb1", CONTOUR, C5, 1),
    ("all_contour_valid_mnb5", CONTOUR, C5, 5),
    ("erosion_from_left",
     [[255] * 5, [255] * 5, [0, 0, 255, 255, 255], [255] * 5, [255] * 5],
     [[255] * 5, [255] * 5, [0, 0, 0, 255, 255], [255] * 5, [255] * 5], 1),
    ("erosion_from_right",
     [[255] * 5, [255] * 5, [255, 255, 255, 0, 0], [255] * 5, [255] * 5],
     [[255] * 5, [255] * 5, [255, 255, 0, 0, 0], [255] * 5, [255] * 5], 1),
    ("erosion_from_top",
     [[255, 0, 0, 0, 255], [255, 255, 0, 255, 255],
      [255] * 5, [255] * 5, [255] * 5],
     [[255, 0, 0, 0, 255], [255, 0, 0, 0, 255],
      [255, 255, 0, 255, 255], [255] * 5, [255] * 5], 1),
    ("erosion_from_bottom",
     [[255] * 5, [255] * 5, [255] * 5,
      [255, 255, 0, 255, 255], [255, 0, 0, 0, 255]],
     [[255] * 5, [255] * 5, [255, 255, 0, 255, 255],
      [255, 0, 0, 0, 255], [255, 0, 0, 0, 255]], 1),
    ("top_and_bottom_7x7",
     [[0] * 7, [0, 0, 255, 255, 255, 0, 0], [0, 0, 255, 255, 255, 0, 0],
      [0, 255, 255, 255, 255, 255, 0], [0, 0, 255, 255, 255, 0, 0],
      [0, 0, 255, 255, 255, 0, 0], [0] * 7],
     [[0] * 7, [0] * 7, [0, 0, 0, 255, 0, 0, 0], [0, 0, 0, 255, 0, 0, 0],
      [0, 0, 0, 255, 0, 0, 0], [0] * 7, [0] * 7], 1),
    ("top_and_bottom_5x5",
     [[0, 0, 0, 0, 255], [0, 255, 255, 0, 0], [255, 255, 255, 255, 255],
      [255, 0, 255, 255, 0], [0, 0, 0, 255, 0]],
     [[0, 0, 0, 0, 255], [0, 0, 0, 0, 0], [0, 0, 255, 0, 0],
      [0, 0, 0, 0, 0], [0, 0, 0, 0, 0]], 1),
]


class TestMaskMatrix:
    @pytest.mark.parametrize(
        "name,inp,exp,mnb", MASK_CASES, ids=[c[0] for c in MASK_CASES])
    def test_reference_mask(self, spark, name, inp, exp, mnb):
        arr = np.array(inp, float)[None, :, :]
        h, w = arr.shape[1:]
        cells = _cells_from_bands(spark, arr)
        out = nearblack(cells, w, h, max_non_black=mnb).collect()
        assert _mask_grid(out, h, w) == exp
