"""IRIS weather-radar codec (sources/iris.py) vs the reference's own
autotest expectations (autotest/gdrivers/iris.py): fakeiris cs 65532,
iristest cs 52872 with the Vincenty+Mercator geotransform inside the
test's own 1e-5 relative tolerance, and the full 27-key metadata
ladder."""

import numpy as np
import pytest

from lib_gdal_spark.operators import raster
from lib_gdal_spark.sources import iris

ID = "/root/reference/autotest/gdrivers/data/iris"

EXPECTED_GT = [16435.721785269096, 1370.4263720754534, 0.0,
               5289830.4584420761, 0.0, -1357.6498705837876]

EXPECTED_MD = {
    "AZIMUTH_SMOOTHING_FOR_SHEAR": "0.0",
    "CAPPI_BOTTOM_HEIGHT": "1000.0 m",
    "COMPOSITED_PRODUCT": "YES",
    "COMPOSITED_PRODUCT_MASK": "0x0000080c",
    "DATA_TYPE": "Clutter Corrected H reflectivity (1 byte)",
    "DATA_TYPE_CODE": "dBZ",
    "DATA_TYPE_INPUT": "Clutter Corrected H reflectivity (1 byte)",
    "DATA_TYPE_INPUT_CODE": "dBZ",
    "DATA_TYPE_UNITS": "dBZ",
    "GROUND_HEIGHT": "523 m",
    "INGEST_HARDWARE_NAME": "composada       ",
    "INGEST_SITE_IRIS_VERSION": "8.12",
    "INGEST_SITE_NAME": "composada       ",
    "MAX_AGE_FOR_SHEAR_VVP_CORRECTION": "600 s",
    "NYQUIST_VELOCITY": "6.00 m/s",
    "PRF": "450 Hz",
    "PRODUCT": "CAPPI",
    "PRODUCT_CONFIGURATION_NAME": "CAPPI250CAT ",
    "PRODUCT_ID": "3",
    "PRODUCT_SITE_IRIS_VERSION": "8.12",
    "PRODUCT_SITE_NAME": "SMCXRADSRV01    ",
    "RADAR_HEIGHT": "542 m",
    "TASK_NAME": "PPIVOL_A    ",
    "TIME_INPUT_INGEST_SWEEP": "2012-04-19 14:48:05",
    "TIME_PRODUCT_GENERATED": "2012-04-19 14:48:30",
    "WAVELENGTH": "5.33 cm",
}


def _cs(vals):
    primes = np.array(raster.CHECKSUM_PRIMES, np.int64)
    h, w = vals.shape
    iv = np.clip(np.floor(vals.astype(np.float64) + 0.5),
                 -2147483647, 2147483647).astype(np.int64)
    return int(np.fmod(iv.ravel(),
                       primes[np.arange(h * w) % 11]).sum()) & 0xFFFF


def test_fakeiris():
    vals, _ = iris.decode_iris(open(f"{ID}/fakeiris.dat", "rb").read())
    assert _cs(vals) == 65532  # autotest iris.py:28


def test_iristest_checksum_and_gt():
    vals, meta = iris.decode_iris(
        open(f"{ID}/iristest.dat", "rb").read())
    assert _cs(vals) == 52872  # autotest iris.py:39
    gt = meta["gt"]
    for g, e in zip(gt, EXPECTED_GT):
        if e == 0.0:
            assert g == 0.0
        else:
            assert abs(g - e) / abs(e) <= 1e-5  # the test's own band
    assert meta["PROJECTION"] == "Mercator"


def test_iristest_metadata():
    _, meta = iris.decode_iris(open(f"{ID}/iristest.dat", "rb").read())
    for k, v in EXPECTED_MD.items():
        assert meta[k] == v, k


def test_not_iris_refused():
    with pytest.raises(ValueError, match="IRIS"):
        iris.decode_iris(b"\x00" * 700)


def test_spark_face(spark):
    df, meta = iris.read_iris(spark, f"{ID}/iristest.dat")
    n = df.count()
    assert 0 < n <= meta["width"] * meta["height"]
