"""BSB/KAP nautical chart reader (sources/bsb.py).

Fixture replays from autotest/gdrivers/bsb.py: checksum 30321 on
rgbsmall.kap AND its index-table (#2782) and mid-line-break variants,
both truncated files rejected, the australia4c BSB_CUTLINE polygon
byte-for-byte, and the transverse_mercator chart's GCP reprojection
(through geo/tmerc at k0=1/FE=0) + least-squares geotransform within
the autotest's own tolerances.
"""

import numpy as np
import pandas as pd
import pytest

from lib_gdal_spark.operators import raster
from lib_gdal_spark.sources.bsb import read_bsb, read_bsb_grid

D = "/root/reference/autotest/gdrivers/data/bsb"


def _cs(vals):
    primes = np.array(raster.CHECKSUM_PRIMES, np.int64)
    h, w = vals.shape
    iv = np.floor(vals.ravel() + 0.5).astype(np.int64)
    return int(np.fmod(iv, primes[np.arange(h * w) % 11]).sum()) & 0xFFFF


@pytest.mark.parametrize("fn", ["rgbsmall.kap", "rgbsmall_index.kap",
                                "rgbsmall_with_line_break.kap"])
def test_rgbsmall_variants(fn):
    g = read_bsb_grid(f"{D}/{fn}")
    assert (g["width"], g["height"]) == (50, 50)
    assert _cs(g["values"]) == 30321


@pytest.mark.parametrize("fn", ["rgbsmall_truncated.kap",
                                "rgbsmall_truncated2.kap"])
def test_truncated_rejected(fn):
    with pytest.raises(ValueError):
        read_bsb_grid(f"{D}/{fn}")


def test_cutline():
    g = read_bsb_grid(f"{D}/australia4c.kap")
    assert g["cutline"] == (
        "POLYGON ((112.72859333333334 -8.25404666666667,"
        "156.57827333333333 -7.66159166666667,"
        "164.28394166666666 -40.89653000000000,"
        "106.53042166666667 -41.14970000000000))")


def test_transverse_mercator_georef():
    g = read_bsb_grid(f"{D}/transverse_mercator.kap")
    want = (28487.6637325402, 1.2711141208521637, 0.009061669923111566,
            6539651.728646593, 0.015209115944776083, -1.267821834560455)
    for a, b in zip(g["gt"], want):
        assert abs(a - b) <= 1e-8 * abs(b)
    assert len(g["gcps"]) == 3
    p, l, x, y = g["gcps"][0]
    assert (p, l) == (25.0, 577.0)
    assert abs(x - 28524.670169107143) < 1e-5
    assert abs(y - 6538920.57567595) < 1e-5


def test_dataframe_view(spark):
    df, meta = read_bsb(spark, f"{D}/rgbsmall.kap")
    assert df.count() == 2500
    cs = raster.checksum(df, 0, 0, 50, 50)
    assert cs.collect()[0]["checksum"] == 30321
    assert meta["color_table"].shape[1] == 3
