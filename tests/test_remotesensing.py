"""ROI_PAC + ISCE + NLAPS NDF readers (sources/remotesensing.py).

Fixture replays: autotest/gdrivers/roipac.py (srtm.dem checksum 64074
with the verbatim .rsc geotransform and Z_SCALE/Z_OFFSET), isce.py
(isce.slc CFLOAT BIP checksum 350 — complex re/im pairs fold into the
checksum like the reference's nValsPerIter=2 walk — with the
Coordinate1/2 geotransform), ndf.py (first-row window checksum 6510
and the half-pixel-shifted corner affine (320325.75, 14.25, 0,
1383062.25, 0, -14.25)).
"""

import numpy as np
import pytest

from lib_gdal_spark.operators import raster
from lib_gdal_spark.sources.remotesensing import (
    read_isce_grid, read_ndf_grid, read_roipac_grid)

D = "/root/reference/autotest/gdrivers/data"


def _cs(vals):
    primes = np.array(raster.CHECKSUM_PRIMES, np.int64)
    iv = np.clip(np.floor(vals.ravel() + 0.5), -2147483647,
                 2147483647).astype(np.int64)
    return int(np.fmod(iv, primes[np.arange(iv.size) % 11]).sum()) & 0xFFFF


def test_roipac():
    g = read_roipac_grid(f"{D}/roipac/srtm.dem")
    assert (g["width"], g["height"]) == (12, 10)
    assert _cs(g["values"][0]) == 64074
    assert g["gt"] == (-180.0083333, 0.0083333333, 0.0,
                       -59.9916667, 0.0, -0.0083333333)
    assert g["scale"] == 2.0 and g["offset"] == 1.0
    assert g["projection"] == "LL"


def test_isce():
    g = read_isce_grid(f"{D}/isce/isce.slc")
    assert (g["width"], g["height"]) == (12, 10)
    assert g["complex"] and g["data_type"] == "CFLOAT"
    assert g["scheme"] == "BIP"
    assert _cs(g["values"][0]) == 350
    assert abs(g["gt"][0] - 14.259166666666667) < 1e-12
    assert abs(g["gt"][1] - 0.0008333333333333334) < 1e-15
    assert abs(g["gt"][3] - 38.22083333333333) < 1e-12


def test_ndf():
    g = read_ndf_grid(f"{D}/ndf/LE7134052000500350.H3")
    assert (g["width"], g["height"], g["bands"]) == (15620, 14680, 1)
    assert _cs(g["values"][0][:1, :]) == 6510
    assert g["gt"] == (320325.75, 14.25, 0.0, 1383062.25, 0.0, -14.25)
    assert g["band_names"] == ["ETM+_BAND_8"]
    assert g["zone"] == 46 and g["projection"] == "UTM"


def test_roipac_missing_sidecar(tmp_path):
    p = tmp_path / "x.dem"
    p.write_bytes(b"\x00" * 8)
    with pytest.raises(ValueError):
        read_roipac_grid(str(p))
