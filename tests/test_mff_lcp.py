"""Vexcel MFF + FARSITE LCP readers (sources/mff.py, sources/lcp.py).

Fixture replays: autotest/gdrivers/mff.py tests 1-3 (1x1 untiled and
tiled fakes cs 1, bytemff cs 4672) and autotest/gdrivers/lcp.py tests
1-2 — ALL EIGHT band checksums of both landscapes, the geotransforms,
dataset metadata (latitude/linear unit/description) and the
elevation/slope/fuel-model band metadata incl. the [min,max]-filtered
FUEL_MODEL_VALUES list.
"""

import numpy as np
import pytest

from lib_gdal_spark.operators import raster
from lib_gdal_spark.sources.lcp import read_lcp_grid
from lib_gdal_spark.sources.mff import read_mff_grid

GD = "/root/reference/autotest/gdrivers/data"


def _cs(vals):
    primes = np.array(raster.CHECKSUM_PRIMES, np.int64)
    h, w = vals.shape
    iv = np.clip(np.floor(vals.ravel() + 0.5), -2147483647,
                 2147483647).astype(np.int64)
    return int(np.fmod(iv, primes[np.arange(h * w) % 11]).sum()) & 0xFFFF


@pytest.mark.parametrize("fn,want,tiled", [
    ("fakemff.hdr", 1, False), ("fakemfftiled.hdr", 1, True),
    ("bytemff.hdr", 4672, False)])
def test_mff(fn, want, tiled):
    g = read_mff_grid(f"{GD}/mff/{fn}")
    assert g["tiled"] == tiled
    assert _cs(g["values"][0]) == want


def test_mff_corners_georef():
    g = read_mff_grid(f"{GD}/mff/bytemff.hdr")
    # pixel-center corner GCP affine: top-left corner recovers within
    # half a pixel of the stated corner
    assert abs(g["gt"][0] + 117.6408421363) < abs(g["gt"][1])
    assert g["projection"] == "UTM"


LCP1_CS = [18645, 16431, 18851, 26182, 30038, 22077, 30388, 23249]
LCP2_CS = [28381, 25824, 28413, 19052, 30164, 22316, 30575, 23304]


def test_lcp_farsite_utm12():
    g = read_lcp_grid(f"{GD}/lcp/test_FARSITE_UTM12.LCP")
    assert g["bands"] == 8 and g["crown_fuels"] and not g["ground_fuels"]
    assert [_cs(g["values"][i]) for i in range(8)] == LCP1_CS
    assert g["latitude"] == 49 and g["linear_unit"] == "Meters"
    assert g["description"].startswith(
        "This is a test LCP file created with FARSITE 4.1.054")
    for a, b in zip(g["gt"], (285807.932887174887583, 30.0, 0.0,
                              5379230.386217921040952, 0.0, -30.0)):
        assert abs(a - b) < 1e-5
    bm = g["band_meta"]
    assert (bm[0]["min"], bm[0]["max"], bm[0]["num_classes"]) \
        == (1064, 1492, -1)
    assert bm[0]["unit_name"] == "Meters" and bm[0]["file"] == ""
    assert bm[1]["unit_name"] == "Degrees" and bm[1]["file"] == "slope.asc"
    assert bm[2]["unit_name"] == "Azimuth degrees"
    assert bm[3]["values"] == [1, 2, 5, 8, 10, 99]
    assert bm[4]["unit_name"] == "Categories (0-4)"


def test_lcp_usgs_alb83():
    g = read_lcp_grid(f"{GD}/lcp/test_USGS_LFNM_Alb83.lcp")
    assert g["bands"] == 8
    assert [_cs(g["values"][i]) for i in range(8)] == LCP2_CS
    for a, b in zip(g["gt"], (-1328145.0, 30.0, 0.0, 2961735.0, 0.0,
                              -30.0)):
        assert abs(a - b) < 1e-5
