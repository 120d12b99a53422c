"""Racurs PHOTOMOD PRF / x-dem reader (sources/prf.py).

Fixture replays from autotest/gdrivers/prf.py: ph.prf tile mosaic
checksum 43190 with the PH_GEOREF_SHIFT_Y geotransform (1,2,3,-7,5,6);
dem.x-dem dims 4330x4663 + checksum 0 (source-less VRT tiles), the
XR/YR pixel-center gt (1.5,1,0,9329,0,-2), meters units, BadZ nodata
and the 1082x1165 Pyramid overview.
"""

import numpy as np
import pytest

from lib_gdal_spark.operators import raster
from lib_gdal_spark.sources.prf import read_prf_grid

D = "/root/reference/autotest/gdrivers/data/PRF"


def _cs(vals):
    primes = np.array(raster.CHECKSUM_PRIMES, np.int64)
    iv = np.clip(np.floor(vals.ravel() + 0.5), -2147483647,
                 2147483647).astype(np.int64)
    return int(np.fmod(iv, primes[np.arange(iv.size) % 11]).sum()) & 0xFFFF


def test_prf_photo():
    g = read_prf_grid(f"{D}/ph.prf")
    assert (g["width"], g["height"]) == (201, 268)
    assert _cs(g["values"][0]) == 43190
    assert g["gt"] == (1.0, 2.0, 3.0, -7.0, 5.0, 6.0)
    assert g["overview"] is None


def test_prf_dem():
    g = read_prf_grid(f"{D}/dem.x-dem")
    assert (g["width"], g["height"]) == (4330, 4663)
    assert _cs(g["values"][0]) == 0
    assert g["gt"] == (1.5, 1.0, 0.0, 9329.0, 0.0, -2.0)
    assert g["units"] == "m"
    assert g["nodata"] == -1111111.0
    assert g["overview"].shape == (1165, 1082)


def test_rejects_non_phini(tmp_path):
    p = tmp_path / "x.prf"
    p.write_text("<?xml version='1.0'?><other/>")
    with pytest.raises(ValueError):
        read_prf_grid(str(p))
