"""CEOS (LGSOWG) imagery source (sources/ceos.py) vs the reference's
own autotest expectation (autotest/gdrivers/ceos.py): band 4 of the
truncated little-endian IRS scene (#1862) checksums 9956 over its
three complete 5932-pixel scanlines."""

import numpy as np
import pytest

from lib_gdal_spark.operators import raster
from lib_gdal_spark.sources import ceos

FIX = "/root/reference/autotest/gdrivers/data/ceos/IMAGERY-75K.L-3"


def _cs(vals):
    primes = np.array(raster.CHECKSUM_PRIMES, np.int64)
    h, w = vals.shape
    iv = np.clip(np.floor(vals.astype(np.float64) + 0.5),
                 -2147483647, 2147483647).astype(np.int64)
    return int(np.fmod(iv.ravel(),
                       primes[np.arange(h * w) % 11]).sum()) & 0xFFFF


def test_irs_scene():
    bands, meta = ceos.read_ceos_array(FIX)
    assert meta["little_endian"] is True
    assert (meta["pixels"], meta["bands"]) == (5932, 4)
    assert meta["lines_available"] == 3  # truncated 75K fixture
    assert _cs(bands[3]) == 9956  # autotest ceos.py:24


def test_not_ceos_refused():
    with pytest.raises(ValueError):
        ceos.read_ceos_array("/root/reference/autotest/gdrivers/data/"
                             "byte.tif")


def test_spark_face(spark):
    df, meta = ceos.read_ceos(spark, FIX, band=4)
    assert df.count() == 5932 * 3
