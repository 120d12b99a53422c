"""ERS / PDS3 / ISIS2 label-raster sources: the reference's own
autotest checksums and geotransforms replayed."""

import numpy as np

from lib_gdal_spark.operators import raster
from lib_gdal_spark.sources import labelraster as lr

ERS = "/root/reference/autotest/gdrivers/data/ers"
PDS = "/root/reference/autotest/gdrivers/data/pds"
ISIS2 = "/root/reference/autotest/gdrivers/data/isis2"


def _cells(spark, band):
    ny, nx = band.shape
    rows = [(x, ny - 1 - y, float(band[y, x]))
            for y in range(ny) for x in range(nx)]
    return spark.createDataFrame(rows, "bx long, by long, value double")


def _cs(spark, band, x0=0, y0=0, w=None, h=None):
    ny, nx = band.shape
    w = w or nx
    h = h or ny
    return raster.checksum(_cells(spark, band), x0, ny - y0 - h, w, h) \
        .collect()[0].checksum


class TestErs:
    def test_srtm(self, spark):
        # test_ers_1: checksum 64074, stats metadata, DMS registration
        bands, meta = lr.open_ers(f"{ERS}/srtm.ers")
        assert _cs(spark, bands[0]) == 64074
        assert meta["nodata"] == 9999.0
        assert meta["header"]["rasterinfo.regioninfo.stats.meanvalue"] \
            == "-4020.25"
        gt = meta["geotransform"]
        np.testing.assert_allclose(gt, (-180.00833333, 0.00833333, 0,
                                        -59.99166667, 0, -0.00833333))

    def test_ers_dem_headeroffset(self, spark):
        # test_ers_4: checksum 56588 (float32 data at HeaderOffset 512)
        bands, meta = lr.open_ers(f"{ERS}/ers_dem.ers")
        assert _cs(spark, bands[0]) == 56588
        assert meta["nodata"] == -9999.0
        # DMS registration: 143:35:46.5 E, -39:22:52.5 S
        np.testing.assert_allclose(
            meta["geotransform"][0], 143 + 35 / 60 + 46.5 / 3600)

    def test_case_insensitive_header(self):
        bands, _ = lr.open_ers(f"{ERS}/caseinsensitive.ers")
        assert bands.shape[1] > 0


class TestPds:
    def test_fl73n003(self, spark):
        # test_pds_2: checksum 34962; nodata 7, scale 0.2, offset -20.2
        bands, meta = lr.open_pds(f"{PDS}/fl73n003_truncated.img")
        assert _cs(spark, bands[0]) == 34962
        assert meta["nodata"] == 7
        assert meta["scale"] == 0.2
        assert meta["offset"] == -20.2
        # GT with the default 0.5 shifts (test uses -0.5 overrides; the
        # default-shift values differ by exactly one pixel)
        gt = meta["geotransform"]
        np.testing.assert_allclose(gt[1], 75.0, rtol=1e-6)

    def test_en_messenger_16bit(self, spark):
        # test_pds_3: checksum 1367 (MSB 16-bit, no projection)
        bands, meta = lr.open_pds(f"{PDS}/EN0001426030M_truncated.IMG")
        assert _cs(spark, bands[0]) == 1367
        assert meta["geotransform"] is None

    def test_ldem4_detached_label(self, spark):
        # test_pds_7: LDEM_4.LBL -> LDEM_4.IMG (LSB_INTEGER, detached,
        # IMAGE nested under UNCOMPRESSED_FILE); window checksum 50938
        bands, meta = lr.open_pds(f"{PDS}/LDEM_4.LBL",
                                  sample_shift=-0.5, line_shift=-0.5)
        assert bands.shape == (1, 720, 1440)
        assert _cs(spark, bands[0], 0, 0, 1440, 2) == 50938
        assert meta["scale"] == 0.5
        # the autotest runs with PDS_*ProjOffset_Shift=-0.5 and its GT
        # literal carries the MAP_RESOLUTION-derived cell size; the
        # label MAP_SCALE agrees to ~1.6e-8 relative
        np.testing.assert_allclose(
            meta["geotransform"],
            (-5450622.3254203796, 7580.8377265930176, 0,
             2721520.7438468933, 0, -7580.8377265930176), rtol=1e-7)


class TestIsis2:
    def test_arvidson(self, spark):
        # isis2 autotest: checksum 382 over the truncated SUN_REAL cube.
        # The ISIS special values (-3.40282e38) convert to Int32 through
        # GDAL's clamp at -2147483647 (GDALCopyWord float->int), which
        # the checksum twin must reproduce.
        bands, meta = lr.open_isis2(
            f"{ISIS2}/arvidson_original_truncated.cub")
        assert bands.shape == (1, 1, 43)
        clamped = np.clip(np.floor(bands[0].astype(np.float64) + 0.5),
                          -2147483647, 2147483647)
        assert _cs(spark, clamped) == 382
        assert meta["multiplier"] == 1.0
