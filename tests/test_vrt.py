"""VRT composition source: the reference's own vrt_read.py + pixfun.py
autotest expectations replayed through read_vrt."""

import numpy as np
import pytest

from lib_gdal_spark.operators import raster
from lib_gdal_spark.sources.vrt import parse_vrt, read_vrt

DATA = "/root/reference/autotest/gcore/data"


def _cs(spark, path, band=1):
    cells, meta = read_vrt(spark, path, band=band)
    return raster.checksum(
        cells, 0, 0, meta["xsize"], meta["ysize"]).collect()[0].checksum


class TestVrtOpenReplay:
    # autotest/gcore/vrt_read.py:44-62 init_list
    def test_byte_vrt(self, spark):
        assert _cs(spark, f"{DATA}/byte.vrt") == 4672

    def test_int32_vrt(self, spark):
        assert _cs(spark, f"{DATA}/int32.vrt") == 4672

    def test_float32_vrt(self, spark):
        assert _cs(spark, f"{DATA}/float32.vrt") == 4672

    def test_msubwinbyte(self, spark):
        # two sub-window SimpleSources per band, zero fill elsewhere
        for band in (1, 2, 3):
            assert _cs(spark, f"{DATA}/msubwinbyte.vrt", band=band) == 2699

    def test_utmsmall(self, spark):
        assert _cs(spark, f"{DATA}/utmsmall.vrt") == 50054

    def test_nearest_50pct(self, spark):
        assert _cs(spark, f"{DATA}/byte_nearest_50pct.vrt") == 1192

    def test_nearest_200pct(self, spark):
        assert _cs(spark, f"{DATA}/byte_nearest_200pct.vrt") == 18784

    def test_averaged_50pct(self, spark):
        assert _cs(spark, f"{DATA}/byte_averaged_50pct.vrt") == 1152

    def test_averaged_200pct(self, spark):
        assert _cs(spark, f"{DATA}/byte_averaged_200pct.vrt") == 18784


def _grid(cells_df, w, h):
    a = np.full((h, w), np.nan)
    for r in cells_df.collect():
        a[h - 1 - r.by, r.bx] = r.value
    return a


def _ref_band(path):
    from lib_gdal_spark.sources.tiff import read_tiff
    return path


class TestPixelFunctions:
    # autotest/gcore/pixfun.py sum/diff/mul expectations, recomputed
    # with the engine's own tiff reader as the reference side
    def _tif_grid(self, spark, name):
        from lib_gdal_spark.sources.tiff import read_tiff
        cells, meta = read_tiff(spark, f"{DATA}/{name}")
        return _grid(cells, meta["width"], meta["height"])

    def test_sum_r(self, spark):
        cells, meta = read_vrt(spark, f"{DATA}/vrt/pixfun_sum_r.vrt")
        got = _grid(cells, meta["xsize"], meta["ysize"])
        ref = sum(self._tif_grid(spark, n)
                  for n in ("uint16.tif", "int32.tif", "float32.tif"))
        assert np.array_equal(got, ref.astype(np.float32).astype(float))

    def test_sum_k(self, spark):
        cells, meta = read_vrt(spark, f"{DATA}/vrt/pixfun_sum_k.vrt")
        got = _grid(cells, meta["xsize"], meta["ysize"])
        ref = 2.0 + sum(self._tif_grid(spark, n)
                        for n in ("uint16.tif", "int32.tif", "float32.tif"))
        assert np.array_equal(got, ref.astype(np.float32).astype(float))

    def test_mul_k(self, spark):
        cells, meta = read_vrt(spark, f"{DATA}/vrt/pixfun_mul_k.vrt")
        got = _grid(cells, meta["xsize"], meta["ysize"])
        ref = 2.0
        for n in ("uint16.tif", "int32.tif", "float32.tif"):
            ref = ref * self._tif_grid(spark, n)
        assert np.array_equal(got, ref.astype(np.float32).astype(float))

    def test_sqrt(self, spark):
        cells, meta = read_vrt(spark, f"{DATA}/vrt/pixfun_sqrt.vrt")
        got = _grid(cells, meta["xsize"], meta["ysize"])
        ref = np.sqrt(self._tif_grid(spark, "float32.tif"))
        assert np.allclose(got, ref.astype(np.float32).astype(float),
                           rtol=1e-7, equal_nan=True)


class TestParseGuards:
    def test_fractional_rect_refuses(self):
        with pytest.raises(NotImplementedError):
            parse_vrt(f"{DATA}/dstsize_larger_than_source.vrt")

    def test_meta(self):
        m = parse_vrt(f"{DATA}/byte.vrt")
        assert (m["xsize"], m["ysize"]) == (20, 20)
        assert m["bands"][0]["nodata"] == 107.0
        assert m["geotransform"][0] == 440720.0
