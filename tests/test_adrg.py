"""ADRG source (sources/adrg.py over sources/iso8211.py) vs the
reference's own autotest expectations (autotest/gdrivers/adrg.py):
SMALL_ADRG band-1 checksum 62833, and the ZNA 9 / ZNA 18 polar
geotransforms of #6560 inside the test's own 1e-5 tolerance."""

import numpy as np
import pytest

from lib_gdal_spark.operators import raster
from lib_gdal_spark.sources import adrg

AD = "/root/reference/autotest/gdrivers/data/adrg"


def _cs(vals):
    primes = np.array(raster.CHECKSUM_PRIMES, np.int64)
    h, w = vals.shape
    iv = np.clip(np.floor(vals.astype(np.float64) + 0.5),
                 -2147483647, 2147483647).astype(np.int64)
    return int(np.fmod(iv.ravel(),
                       primes[np.arange(h * w) % 11]).sum()) & 0xFFFF


def test_small_adrg():
    bands, meta = adrg.read_adrg_array(f"{AD}/SMALL_ADRG/ABCDEF01.GEN")
    assert (meta["width"], meta["height"]) == (128, 128)
    assert len(bands) == 3
    assert _cs(bands[0]) == 62833  # autotest adrg.py:28


@pytest.mark.parametrize("zone,exp_gt", [
    ("ZNA9", (-307675.73602473765, 100.09145391818853, 0.0,
              -179477.5051066006, 0.0, -100.09145391818853)),
    ("ZNA18", (-307675.73602473765, 100.09145391818853, 0.0,
               179477.5051066006, 0.0, -100.09145391818853)),
])
def test_polar_geotransforms(zone, exp_gt):
    _, meta = adrg.read_adrg_array(
        f"{AD}/SMALL_ADRG_{zone}/ABCDEF01.GEN")
    assert max(abs(g - e) for g, e in zip(meta["gt"], exp_gt)) <= 1e-5
    assert meta["zna"] == (9 if zone == "ZNA9" else 18)


def test_no_gin_refused():
    with pytest.raises(ValueError):
        adrg.parse_gen(b"not iso8211 at all" * 4)


def test_spark_face(spark):
    df, meta = adrg.read_adrg(spark, f"{AD}/SMALL_ADRG/ABCDEF01.GEN")
    assert df.count() == 128 * 128
