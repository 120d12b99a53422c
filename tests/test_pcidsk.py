"""PCIDSK source (sources/pcidsk.py) vs the reference's own autotest
expectation (autotest/gdrivers/pcidsk.py): utm.pix band 1 checksums
39576 through the BAND-interleaved tight-packing layout."""

import numpy as np
import pytest

from lib_gdal_spark.operators import raster
from lib_gdal_spark.sources import pcidsk

PD = "/root/reference/autotest/gdrivers/data/pcidsk"


def _cs(vals):
    primes = np.array(raster.CHECKSUM_PRIMES, np.int64)
    h, w = vals.shape
    iv = np.clip(np.floor(vals.astype(np.float64) + 0.5),
                 -2147483647, 2147483647).astype(np.int64)
    return int(np.fmod(iv.ravel(),
                       primes[np.arange(h * w) % 11]).sum()) & 0xFFFF


def test_utm_pix():
    vals, meta = pcidsk.read_pcidsk_array(f"{PD}/utm.pix")
    assert (meta["width"], meta["height"]) == (500, 7)
    assert meta["interleave"] == "BAND"
    assert _cs(vals) == 39576  # autotest pcidsk.py:38


def test_not_pcidsk_refused(tmp_path):
    t = tmp_path / "junk.pix"
    t.write_bytes(b"NOT A PIX FILE" * 40)
    with pytest.raises(ValueError, match="PCIDSK"):
        pcidsk.read_pcidsk_array(str(t))


def test_spark_face(spark):
    df, meta = pcidsk.read_pcidsk(spark, f"{PD}/utm.pix")
    assert df.count() == 3500
