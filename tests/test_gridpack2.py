"""ZMap + KRO + ACE2 codecs (sources/gridpack2.py) vs the reference's
own autotest expectations:
- zmap.py: CreateCopy of byte.tif checksums 4672 (encode/decode loop
  through the column-major fixed-width stream).
- kro.py: rgbsmall.tif band 2 cs 21053, uint16.tif cs 4672,
  float32.tif cs 4672 — all through the encode/decode loop.
- ace2.py: the synthetic 45N015E_5M.ACE2 (all zeros) checksums 0 with
  geotransform (15, 1/12, 0, 60, 0, -1/12).
"""

import numpy as np
import pytest

from lib_gdal_spark.operators import raster
from lib_gdal_spark.sources import gridpack2 as gp2
from lib_gdal_spark.sources.tiff import decode_tiff

GC = "/root/reference/autotest/gcore/data"
GD = "/root/reference/autotest/gdrivers/data"


def _cs(vals):
    primes = np.array(raster.CHECKSUM_PRIMES, np.int64)
    h, w = vals.shape
    iv = np.clip(np.floor(np.nan_to_num(vals, nan=0.0) + 0.5),
                 -2147483647, 2147483647).astype(np.int64)
    return int(np.fmod(iv.ravel(),
                       primes[np.arange(h * w) % 11]).sum()) & 0xFFFF


def _byte_tif():
    arr, meta = decode_tiff(open(f"{GC}/byte.tif", "rb").read())
    return arr.astype(np.float64), meta


class TestZMap:
    def test_byte_createcopy(self):
        vals, meta = _byte_tif()
        gt = (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
        text = gp2.encode_zmap(vals, gt)
        back, m2 = gp2.decode_zmap(text)
        assert _cs(back) == 4672
        assert np.array_equal(np.nan_to_num(back), vals)
        assert m2["gt"] == gt
        assert (m2["width"], m2["height"]) == (20, 20)

    def test_nodata_and_wrap(self):
        # nodata round-trips as NaN; 5x3 exercises the 4-per-line wrap
        vals = np.arange(15, dtype=np.float64).reshape(5, 3)
        vals[2, 1] = np.nan
        text = gp2.encode_zmap(vals, (0.0, 1.0, 0.0, 5.0, 0.0, -1.0),
                               nodata=-99.0)
        back, meta = gp2.decode_zmap(text)
        assert meta["nodata"] == -99.0
        assert np.isnan(back[2, 1])
        mask = ~np.isnan(vals)
        assert np.array_equal(back[mask], vals[mask])

    def test_integer_field_scaling(self):
        # a field without '.' is an int scaled by 10^decimals
        # (zmapdataset.cpp:183)
        text = ("@t, GRID, 2\n"
                "   10,   1E+30,          ,    2,    1\n"
                "    2,    2,  0.0,  2.0,  0.0,  2.0\n"
                "0.0, 0.0, 0.0\n@\n"
                "      1.25         3\n"
                "      2.50      4.75\n")
        back, _ = gp2.decode_zmap(text)
        # column-major: col0 = [1.25, 3*100], col1 = [2.5, 4.75]
        assert back[0, 0] == 1.25 and back[1, 0] == 300.0
        assert back[0, 1] == 2.5 and back[1, 1] == 4.75

    def test_bad_header_refused(self):
        with pytest.raises(ValueError, match="ZMap"):
            gp2.decode_zmap("not a zmap\n")


class TestKro:
    def test_rgbsmall(self):
        arr, _ = decode_tiff(open(f"{GC}/rgbsmall.tif", "rb").read())
        bands = [arr[k].astype(np.uint8) for k in range(3)]
        data = gp2.encode_kro(bands)
        back, meta = gp2.decode_kro(data)
        assert (meta["width"], meta["height"], meta["bands"]) == (50, 50, 3)
        assert _cs(back[1].astype(np.float64)) == 21053
        for a, b in zip(bands, back):
            assert np.array_equal(a, b)

    def test_uint16(self):
        arr, _ = decode_tiff(open(f"{GC}/uint16.tif", "rb").read())
        data = gp2.encode_kro([arr.astype(np.uint16)])
        back, meta = gp2.decode_kro(data)
        assert meta["depth"] == 16
        assert _cs(back[0].astype(np.float64)) == 4672

    def test_float32(self):
        arr, _ = decode_tiff(open(f"{GC}/float32.tif", "rb").read())
        data = gp2.encode_kro([arr.astype(np.float32)])
        back, meta = gp2.decode_kro(data)
        assert meta["depth"] == 32
        assert _cs(back[0].astype(np.float64)) == 4672

    def test_magic_refused(self):
        with pytest.raises(ValueError, match="KRO"):
            gp2.decode_kro(b"NOT\x01" + b"\x00" * 32)


class TestAce2:
    def test_fake_5m_tile(self):
        data = b"\x00" * (180 * 180 * 4)
        vals, meta = gp2.decode_ace2(data, "45N015E_5M.ACE2")
        assert (meta["width"], meta["height"]) == (180, 180)
        assert meta["dtype"] == "float32"
        assert _cs(vals) == 0
        gt = meta["gt"]
        assert gt[0] == 15.0 and gt[3] == 60.0
        assert abs(gt[1] - 5.0 / 60) < 1e-15 and gt[5] == -gt[1]

    def test_south_west_int16(self):
        data = np.full(180 * 180, 7, "<i2").tobytes()
        vals, meta = gp2.decode_ace2(data, "30S120W_CONF_5M.ACE2")
        assert meta["dtype"] == "int16"
        assert meta["sw_lat"] == -30 and meta["sw_lon"] == -120
        assert vals[0, 0] == 7.0

    def test_bad_name_refused(self):
        with pytest.raises(ValueError, match="ACE2"):
            gp2.decode_ace2(b"", "whatever.bin")
