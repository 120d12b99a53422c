"""ISG geoid grids + NOAA LOS/LAS datum grids (sources/isg.py,
sources/miscgrids.read_loslas_grid).

Fixture replays: all six autotest/gdrivers/isg.py cases — test.isg
checksum 159 with its exact gt, the three approximate-georeferencing
variants (auto-corrected via the TryRoundTo ladder / warning-path
recompute / rejected-unless-skip), the >1024-byte header, and the DMS
coordinate units — plus autotest/gdrivers/loslas.py's wyhpgn.los gt
and all four statistics to full double precision.
"""

import numpy as np
import pytest

from lib_gdal_spark.operators import raster
from lib_gdal_spark.sources.isg import read_isg, read_isg_grid
from lib_gdal_spark.sources.miscgrids import read_loslas_grid

D = "/root/reference/autotest/gdrivers/data/isg"


def _cs(vals):
    primes = np.array(raster.CHECKSUM_PRIMES, np.int64)
    iv = np.clip(np.floor(vals.ravel() + 0.5), -2147483647,
                 2147483647).astype(np.int64)
    return int(np.fmod(iv, primes[np.arange(iv.size) % 11]).sum()) & 0xFFFF


def test_isg_basic():
    g = read_isg_grid(f"{D}/test.isg")
    assert (g["width"], g["height"]) == (6, 4)
    assert _cs(g["values"]) == 159
    assert g["gt"] == (120.0, 0.25, 0.0, 41.0, 0.0, -0.25)
    assert g["nodata"] == -9999.0
    assert g["model_name"] == "EXAMPLE"


def test_isg_auto_corrected():
    g = read_isg_grid(f"{D}/approx_georeferencing_auto_corrected.isg")
    want = (-76.0098535, 0.016667, 0.0, -20.0087335, 0.0, -0.016667)
    for a, b in zip(g["gt"], want):
        assert abs(a - b) <= 1e-8 * abs(b)
    assert not g["approx_georef"]


def test_isg_warning_path():
    g = read_isg_grid(f"{D}/approx_georeferencing_warning.isg")
    want = (-76.0083, 0.01666694444444445, 0.0, -20.0083, 0.0,
            -0.016667027027027027)
    for a, b in zip(g["gt"], want):
        assert abs(a - b) <= 1e-8 * abs(b)
    assert g["approx_georef"]


def test_isg_rejected_unless_skipped():
    p = f"{D}/approx_georeferencing_rejected_by_default.isg"
    with pytest.raises(ValueError):
        read_isg_grid(p)
    g = read_isg_grid(p, skip_georef_check=True)
    assert g["approx_georef"]
    assert abs(g["gt"][0] + 76.0083) < 1e-8


def test_isg_large_header():
    g = read_isg_grid(f"{D}/header_larger_than_1024bytes.isg")
    want = (12.99375, 0.0125, 0.0, 47.00416666666666, 0.0,
            -0.008333333333333333)
    for a, b in zip(g["gt"], want):
        assert abs(a - b) <= 1e-8 * abs(b)


def test_isg_dms():
    g = read_isg_grid(f"{D}/header_dms.isg")
    want = (119.9875, 0.025, 0.0, 50.0083333333, 0.0, -0.01666666666)
    for a, b in zip(g["gt"], want):
        assert abs(a - b) <= 1e-8 * abs(b)


def test_isg_dataframe(spark):
    df, meta = read_isg(spark, f"{D}/test.isg")
    # 4 nodata cells drop
    assert df.count() == 24 - 4
    assert meta["units"] == "meters"


def test_loslas():
    g = read_loslas_grid(
        "/root/reference/autotest/gdrivers/data/loslas/wyhpgn.los")
    assert (g["width"], g["height"]) == (33, 21)
    assert g["gt"] == (-111.625, 0.25, 0.0, 45.625, 0.0, -0.25)
    v = g["values"]
    assert v.min() == pytest.approx(-0.027868999168276787, abs=1e-15)
    assert v.max() == pytest.approx(0.033906999975442886, abs=1e-15)
    assert v.mean() == pytest.approx(0.009716129862575248, rel=1e-12)
    assert v.std() == pytest.approx(0.008260044951413324, rel=1e-12)
    assert g["description"].startswith("Longitude Offset")
