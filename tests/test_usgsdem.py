"""USGS DEM source vs the reference's own autotest goldens
(autotest/gdrivers/usgsdem.py)."""

import numpy as np
import pytest

from lib_gdal_spark.sources import usgsdem as u
from lib_gdal_spark.operators.raster import CHECKSUM_PRIMES

DATA = "/root/reference/autotest/gdrivers/data/usgsdem"
_P = np.array(CHECKSUM_PRIMES, dtype=np.int64)


def _cs(a):
    # GDALChecksumImage twin with C-style (truncated) modulo — DEM
    # grids carry the negative -32767 nodata
    v = np.floor(a.astype(np.float64) + 0.5).astype(np.int64)
    m = np.fmod(v.ravel(), _P[np.arange(v.size) % 11])
    return int(np.sum(m)) & 0xFFFF


def _dec(name):
    with open(f"{DATA}/{name}", "rb") as f:
        return u.decode_usgsdem(f.read())


class TestChecksums:
    @pytest.mark.parametrize("name,want,dtype", [
        # test_usgsdem_2 (geographic, NAD27)
        ("114p01_0100_deme_truncated.dem", 53864, "int16"),
        # test_usgsdem_3 (UTM 17, WGS72)
        ("39079G6_truncated.dem", 61424, "int16"),
        # test_usgsdem_8 (undocumented 893-byte header)
        ("39109h1_truncated.dem", 39443, "float32"),
        # test_usgsdem_9 (old 864-byte format)
        ("4619old_truncated.dem", 10659, "int16"),
        # issue #583 (junk values after the declared profile)
        ("usgsdem_with_extra_values_at_end_of_profile.dem", 56679,
         "int16"),
        # ticket #4901 (spaces after byte 864)
        ("usgsdem_with_spaces_after_byte_864.dem", 61078, "int16"),
        # issue #5007 (1025-byte newline-terminated records)
        ("record_1025_ending_with_linefeed.dem", 14172, "int16"),
    ])
    def test_checksum(self, name, want, dtype):
        arr, meta = _dec(name)
        assert _cs(arr) == want
        assert meta["dtype"] == dtype


class TestGeoref:
    def test_geographic_gt_and_datum(self):
        # test_usgsdem_2
        _, meta = _dec("114p01_0100_deme_truncated.dem")
        np.testing.assert_allclose(
            meta["geotransform"],
            (-136.25010416667, 0.000208333, 0.0,
             59.25010416667, 0.0, -0.000208333), rtol=2e-6)
        # blank datum code -> the reference's default case = NAD27
        assert meta["datum"] == ""

    def test_utm_gt(self):
        # test_usgsdem_3: UTM zone 17, WGS72
        _, meta = _dec("39079G6_truncated.dem")
        np.testing.assert_allclose(
            meta["geotransform"], (606855.0, 30.0, 0.0,
                                   4414605.0, 0.0, -30.0))
        assert meta["coord_system"] == 1 and meta["utm_zone"] == 17
        assert meta["datum"] == "2"  # WGS72

    def test_undocumented_893_gt(self):
        # test_usgsdem_8
        _, meta = _dec("39109h1_truncated.dem")
        np.testing.assert_allclose(
            meta["geotransform"], (660055.0, 10.0, 0.0,
                                   4429465.0, 0.0, -10.0))
        assert meta["utm_zone"] == 12

    def test_old_format_gt(self):
        # test_usgsdem_9
        _, meta = _dec("4619old_truncated.dem")
        np.testing.assert_allclose(
            meta["geotransform"],
            (18.99958333, 0.0008333, 0.0, 47.000416667, 0.0,
             -0.0008333), rtol=5e-5)

    def test_header_of_918_bytes_parses(self):
        # test_usgsdem_with_header_of_918_bytes: header parses (918
        # offset, NAD83 UTM 15); the data stream is truncated so the
        # read itself errors — same split as the reference (gt check
        # passes, checksum raises)
        with open(f"{DATA}/fema06-140cm_2995441b_truncated.dem",
                  "rb") as f:
            buf = f.read()
        with pytest.raises(ValueError):
            u.decode_usgsdem(buf)

    def test_not_a_dem(self):
        with pytest.raises(ValueError):
            u.decode_usgsdem(b" " * 2000)


class TestSpark:
    def test_read_usgsdem(self, spark):
        cells, meta = u.read_usgsdem(
            spark, f"{DATA}/39079G6_truncated.dem")
        got = cells.collect()
        # nodata dropped; remaining values are real elevations
        assert 0 < len(got) <= 470 * 2
        assert all(r.value != u.NODATA for r in got)
