"""ILWIS codec (sources/ilwis.py).

Fixture replay: autotest/gdrivers/ilwis.py test_ilwis_1 —
LanduseSmall.mpr checksum 2351 with the GeoRefCorners geotransform
(795480, 20, 0, 8090520, 0, -20).
"""

import numpy as np
import pandas as pd
import pytest

from lib_gdal_spark.operators import raster
from lib_gdal_spark.sources.ilwis import (
    _parse_range, read_ilwis, read_ilwis_grid, write_ilwis)

FIX = "/root/reference/autotest/gdrivers/data/ilwis/LanduseSmall.mpr"


def test_fixture(spark):
    g = read_ilwis_grid(FIX)
    assert (g["width"], g["height"]) == (75, 75)
    assert g["store"] == "Byte"
    assert g["gt"] == (795480.0, 20.0, 0.0, 8090520.0, 0.0, -20.0)
    h, w = 75, 75
    by, bx = np.mgrid[0:h, 0:w]
    cells = spark.createDataFrame(pd.DataFrame({
        "bx": bx.ravel().astype(np.int64),
        "by": (h - 1 - by).ravel().astype(np.int64),
        "value": g["values"][0].ravel()}))
    assert raster.checksum(cells, 0, 0, w, h).collect()[0]["checksum"] \
        == 2351


def test_roundtrips(tmp_path):
    g = read_ilwis_grid(FIX)
    p = write_ilwis(str(tmp_path / "rt.mpr"),
                    g["values"][0].astype(np.uint8), gt=g["gt"])
    b = read_ilwis_grid(p)
    assert (b["values"] == g["values"]).all() and b["gt"] == g["gt"]
    for store, arr in [
            ("Int", np.arange(-300, 300, 10, np.int16).reshape(6, 10)),
            ("Long", np.arange(-70000, 50000, 2000, np.int32)
             .reshape(6, 10)),
            ("Real", np.linspace(-5.25, 7.75, 60).reshape(6, 10))]:
        p = write_ilwis(str(tmp_path / f"{store}.mpr"), arr, store=store,
                        gt=(10.0, 2.0, 0.0, 50.0, 0.0, -2.0))
        b = read_ilwis_grid(p)
        assert (b["values"][0] == arr).all(), store
        assert b["gt"] == (10.0, 2.0, 0.0, 50.0, 0.0, -2.0)


def test_centers_vs_corners(tmp_path):
    p = write_ilwis(str(tmp_path / "c.mpr"),
                    np.zeros((4, 5), np.uint8),
                    gt=(100.0, 10.0, 0.0, 200.0, 0.0, -10.0))
    grf = (tmp_path / "c.grf").read_text() \
        .replace("CornersOfCorners=Yes", "CornersOfCorners=No")
    (tmp_path / "c.grf").write_text(grf)
    g = read_ilwis_grid(str(p))
    # corners now read as CELL CENTERS: half-pixel padding
    assert g["gt"] == (95.0, 10.0, 0.0, 205.0, 0.0, -10.0)


def test_value_range_semantics():
    # ValueRange("0:100:0.5:offset=0"): value = (raw + 0)*0.5
    step, r0, lo, hi, undef = _parse_range("0:100:0.5:offset=0", "Int")
    assert (step, r0, lo, hi) == (0.5, 0.0, 0.0, 100.0)
    assert undef == _undef_for(step, lo, hi)
    # byte-classed range defaults r0 to -1 (init :2113-2116)
    step, r0, lo, hi, undef = _parse_range("1:200:1", "Byte")
    assert r0 == -1.0 and undef == 0


def _undef_for(step, lo, hi):
    span = (hi - lo) / step + 2
    return 0 if span <= 256.5 else -32767


def test_dataframe_view(spark):
    df, meta = read_ilwis(spark, FIX)
    assert df.count() == 75 * 75
    assert meta["domain"] == "landusesmall"
