"""EOSAT FAST reader (sources/fast.py).

Fixture replays from autotest/gdrivers/fast.py (read-only driver, like
the reference): window checksums 60323 (HPN) / 19110 (HTM band 2),
the ACQUISITION_DATE/SATELLITE/SENSOR/GAIN1/BIAS1 metadata of
test_fast_3, the straight geotransforms of tests 4/5/7 and the
ROTATED Euromap corner-GCP affines of tests 6/8, the Euromap
PAN/LISS3/WIFS sibling-filename conventions, and the RevB HEADER.DAT
7-band BAND%d.DAT discovery with D-exponent USGS parameters (test 9).
"""

import numpy as np
import pytest

from lib_gdal_spark.operators import raster
from lib_gdal_spark.sources.fast import read_fast

D = "/root/reference/autotest/gdrivers/data/fast"


def _cs_window(vals, w, h):
    primes = np.array(raster.CHECKSUM_PRIMES, np.int64)
    iv = np.floor(vals[:h, :w] + 0.5).astype(np.int64).ravel()
    return int(np.fmod(iv, primes[np.arange(w * h) % 11]).sum()) & 0xFFFF


def test_hpn_landsat():
    g = read_fast(f"{D}/L71118038_03820020111_HPN.FST")
    assert (g["width"], g["height"], g["bands"]) == (15971, 14351, 1)
    assert _cs_window(g["values"][0], 5000, 1) == 60323
    m = g["meta"]
    assert m["ACQUISITION_DATE"] == "20020111"
    assert m["SATELLITE"] == "LANDSAT7" and m["SENSOR"] == "ETM+"
    assert abs(m["GAIN1"] - (-6.199999809265137)) < 1e-4
    assert abs(m["BIAS1"] - 0.775686297697179) < 1e-4
    for a, b in zip(g["gt"], (280342.5, 15.0, 0.0, 3621457.5, 0.0, -15.0)):
        assert abs(a - b) < 0.01


def test_htm_two_bands():
    g = read_fast(f"{D}/L71230079_07920021111_HTM.FST")
    assert g["bands"] == 2
    assert _cs_window(g["values"][1], 7000, 1) == 19110
    for a, b in zip(g["gt"], (528417.25, 30.0, 0.0, 7071187.0, 0.0, -30.0)):
        assert abs(a - b) < 0.01


def test_euromap_liss3_rotated():
    g = read_fast(f"{D}/n0o0y867.0fl")
    assert g["bands"] == 4
    want = (14640936.89174916, 1.008817518246492, 24.9876841746236,
            664274.3912497687, 24.98828832116786, -0.9907878581173808)
    for a, b in zip(g["gt"], want):
        assert abs(a - b) < 1e-6 * max(1.0, abs(b))


def test_euromap_pan():
    g = read_fast(f"{D}/h0o0y867.1ah")
    assert g["bands"] == 1
    for a, b in zip(g["gt"], (676565.09, 5.0, 0.0, 5348341.5, 0.0, -5.0)):
        assert abs(a - b) < 0.01


def test_euromap_wifs_rotated():
    g = read_fast(f"{D}/w0y13a4t.010")
    assert g["bands"] == 2
    want = (-336965.0150603952, 176.0817495260164, -37.35662873563219,
            484122.7765089957, -37.35622603749736, -176.081791954023)
    for a, b in zip(g["gt"], want):
        assert abs(a - b) < 1e-6 * max(1.0, abs(b))


def test_revb_band_discovery():
    g = read_fast(f"{D}/HEADER.DAT")
    assert g["meta"]["SENSOR"] == ""
    assert g["bands"] == 7
    # D-exponent USGS projection parameters parse
    assert g["proj_params"][0] == 6378137.0
    assert g["proj_params"][1] == 6356752.31414
    assert g["zone"] == 40


def test_rejects_non_fast(tmp_path):
    p = tmp_path / "x.fst"
    p.write_text("not a fast header")
    with pytest.raises(ValueError):
        read_fast(str(p))
