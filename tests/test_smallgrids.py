"""GXF + JDEM + GSC + PAux readers (sources/gxf.py,
sources/miscgrids.py).

Fixture replays: autotest/gdrivers/gxf.py (small.gxf cs 90 ASCII path,
small2.gxf cs 65042 through the GTYPE-3 base-90 compression with '!'
dummies and '"' repeat escapes — the cs pins GDAL's INT_MIN+1 clamp on
the -1e12 default dummy), jdem.py (fakejdem.mem cs 15 with the packed
DMS corner geotransform), gsc.py (fakegsc.gsc cs 0, Fortran record
framing), paux.py (small16 band 2 cs 12816, Swapped=little-endian
16U channel definitions, extension-replaced .aux sibling).
"""

import numpy as np
import pytest

from lib_gdal_spark.operators import raster
from lib_gdal_spark.sources.gxf import read_gxf, read_gxf_grid
from lib_gdal_spark.sources.miscgrids import (
    read_gsc_grid, read_jdem_grid, read_paux_grid)

GD = "/root/reference/autotest/gdrivers/data"


def _cs(vals):
    primes = np.array(raster.CHECKSUM_PRIMES, np.int64)
    h, w = vals.shape
    iv = np.clip(np.floor(vals.ravel() + 0.5), -2147483647,
                 2147483647).astype(np.int64)
    return int(np.fmod(iv, primes[np.arange(h * w) % 11]).sum()) & 0xFFFF


def test_gxf_ascii():
    g = read_gxf_grid(f"{GD}/gxf/small.gxf")
    assert (g["width"], g["height"]) == (4, 3)
    assert _cs(g["values"]) == 90
    # LL_RIGHT sense: the file's last row is the raster's TOP row
    assert list(g["values"][0]) == [5.0, 6.0, 4.0, 3.0]


def test_gxf_compressed():
    g = read_gxf_grid(f"{GD}/gxf/small2.gxf")
    assert (g["width"], g["height"]) == (10, 8)
    assert g["gtype"] == 3
    assert _cs(g["values"]) == 65042
    assert g["scale"] == 5.0e-03 and g["offset"] == -118.835
    # georef: LL origin hoisted to the top row, half-cell offset
    assert g["gt"][1] == 12.5 and g["gt"][5] == -12.5
    assert g["gt"][0] == 1750000.0 - 6.25
    assert g["gt"][3] == 4250.0 + 7 * 12.5 + 6.25


def test_jdem():
    g = read_jdem_grid(f"{GD}/jdem/fakejdem.mem")
    assert _cs(g["values"]) == 15


def test_gsc():
    g = read_gsc_grid(f"{GD}/gsc/fakegsc.gsc")
    assert _cs(g["values"]) == 0


def test_paux():
    g = read_paux_grid(f"{GD}/paux/small16.raw")
    assert g["bands"] == 2
    assert _cs(g["values"][1]) == 12816
    assert g["gt"][0] == 440720.0 and g["gt"][1] == 60.0
    assert g["band_meta"][0]["type"] == "16U"


def test_gxf_dataframe(spark):
    df, meta = read_gxf(spark, f"{GD}/gxf/small.gxf")
    # the -9999999 value is a real sample (no #DUMMY record), so all
    # 12 cells survive
    assert df.count() == 12
    assert meta["sense"] == 1
