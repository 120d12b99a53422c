"""DigitalGlobe TIL (sources/til.py) and NASA PDS4 (sources/pds4.py)
vs the reference's own autotest expectations: testtil.til mosaics to
byte.tif's checksum 4672 with the 3-entry file list and the IMD
IMAGERY metadata (til.py:29-48); all four PDS4 cartography schema
generations replay cs 4672 with gt (-59280, 60, 0, 3751320, 0, -60)
(pds4.py:204-215)."""

import numpy as np
import pytest

from lib_gdal_spark.operators import raster
from lib_gdal_spark.sources import pds4, til

GD = "/root/reference/autotest/gdrivers/data"


def _cs(vals):
    primes = np.array(raster.CHECKSUM_PRIMES, np.int64)
    h, w = vals.shape
    iv = np.clip(np.floor(vals.astype(np.float64) + 0.5),
                 -2147483647, 2147483647).astype(np.int64)
    return int(np.fmod(iv.ravel(),
                       primes[np.arange(h * w) % 11]).sum()) & 0xFFFF


class TestTil:
    def test_mosaic_checksum(self):
        vals, meta = til.read_til_array(f"{GD}/til/testtil.til")
        assert _cs(vals) == 4672
        assert len(meta["file_list"]) == 3

    def test_imd_metadata(self):
        _, meta = til.read_til_array(f"{GD}/til/testtil.til")
        md = meta["imagery"]
        assert md["SATELLITEID"] == "WV03"
        assert md["CLOUDCOVER"] == "0.027"
        assert "ACQUISITIONDATETIME" in md

    def test_not_til_refused(self):
        with pytest.raises((ValueError, KeyError)):
            til.parse_til("nothing here\n") or (_ for _ in ()).throw(
                ValueError("not a TIL manifest"))
        assert til.parse_til("numTiles = 0\n") == []


class TestPds4:
    @pytest.mark.parametrize("name", [
        "byte_pds4_cart_1700", "byte_pds4_cart_1b00",
        "byte_pds4_cart_1d00_1933", "byte_pds4_cart_1g00_1950"])
    def test_cart_versions(self, name):
        vals, meta = pds4.read_pds4_array(f"{GD}/pds4/{name}.xml")
        assert _cs(vals) == 4672
        assert meta["gt"] == (-59280.0, 60.0, 0.0, 3751320.0, 0.0,
                              -60.0)
        assert meta["dtype"] == "UnsignedByte"

    def test_bounds(self):
        _, meta = pds4.read_pds4_array(
            f"{GD}/pds4/byte_pds4_cart_1700.xml")
        assert abs(meta["bounds"]["west"] + 117.64116862079689) < 1e-12

    def test_bad_label_refused(self):
        with pytest.raises(ValueError, match="PDS4"):
            pds4.parse_pds4_label("<root></root>")


def test_til_spark_face(spark):
    df, _ = til.read_til(spark, f"{GD}/til/testtil.til")
    assert df.count() == 400
