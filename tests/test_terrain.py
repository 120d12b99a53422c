"""Terragen + Leveller heightfield codecs (sources/terragen.py,
sources/leveller.py).

Fixture replays: autotest/gdrivers/terragen.py test_terragen_1
(float32.ter checksum 1128) and test_terragen_2 (the reference's own
MINUSERPIXELVALUE=74/MAXUSERPIXELVALUE=255 write of float32.tif,
unscaled back to checksum 4672 — this exercises the heightscale/
baseheight convergence search bit-for-bit); autotest/gdrivers/
leveller.py test_leveller_1 (ter6test.ter checksum 33441 + the legacy
worldspacing georef).
"""

import numpy as np
import pandas as pd

from lib_gdal_spark.operators import raster
from lib_gdal_spark.sources.leveller import (
    read_leveller, read_leveller_grid, write_leveller)
from lib_gdal_spark.sources.terragen import (
    read_terragen, read_terragen_grid, write_terragen)
from lib_gdal_spark.sources.tiff import decode_tiff

TER = "/root/reference/autotest/gdrivers/data/terragen/float32.ter"
TIF = "/root/reference/autotest/gdrivers/data/float32.tif"
LEV = "/root/reference/autotest/gdrivers/data/leveller/ter6test.ter"


def _cells(spark, arr):
    h, w = arr.shape
    by, bx = np.mgrid[0:h, 0:w]
    return spark.createDataFrame(pd.DataFrame({
        "bx": bx.ravel().astype(np.int64),
        "by": (h - 1 - by).ravel().astype(np.int64),
        "value": arr.ravel().astype(np.float64)}))


def test_terragen_fixture(spark):
    g = read_terragen_grid(TER)
    assert (g["width"], g["height"]) == (20, 20)
    assert g["scal"] == 60.0
    cs = raster.checksum(_cells(spark, g["values"].astype(float)),
                         0, 0, 20, 20)
    assert cs.collect()[0]["checksum"] == 1128


def test_terragen_write_unscale_replay(spark, tmp_path):
    arr, meta = decode_tiff(open(TIF, "rb").read())
    gt = meta["geotransform"]
    p = write_terragen(str(tmp_path / "t2.ter"), arr.astype(np.float64),
                       (74.0, 255.0),
                       ground_scale=(abs(gt[1]) + abs(gt[5])) / 2.0)
    g = read_terragen_grid(p)
    unscaled = g["values"].astype(np.float64) * g["scale"] + g["offset"]
    cs = raster.checksum(_cells(spark, unscaled), 0, 0, 20, 20)
    assert cs.collect()[0]["checksum"] == 4672


def test_terragen_rect_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    arr = rng.uniform(0.0, 500.0, (7, 12))
    p = write_terragen(str(tmp_path / "r.ter"), arr, (0.0, 500.0),
                       ground_scale=30.0)
    g = read_terragen_grid(p)
    assert (g["width"], g["height"]) == (12, 7)
    assert g["scal"] == 30.0  # SCAL chunk omitted at the default
    back = g["values"] * g["scale"] + g["offset"]
    assert np.abs(back - arr).max() <= g["scale"] + 1e-9


def test_leveller_fixture(spark):
    g = read_leveller_grid(LEV)
    assert (g["width"], g["height"], g["version"]) == (64, 96, 6)
    assert g["units"] == "ft" and g["scale"] == 10.0
    assert g["gt"] == (-315.0, 10.0, 0.0, -475.0, 0.0, 10.0)
    cs = raster.checksum(_cells(spark, g["values"]), 0, 0, 64, 96)
    assert cs.collect()[0]["checksum"] == 33441


def test_leveller_v7_roundtrip(spark, tmp_path):
    g = read_leveller_grid(LEV)
    p = write_leveller(str(tmp_path / "v7.ter"), g["values"], g["gt"],
                       elev_scale=g["scale"], elev_base=2.5)
    df, meta = read_leveller(spark, p)
    assert meta["version"] == 7
    assert meta["gt"] == g["gt"]
    assert meta["scale"] == 10.0 and meta["base"] == 2.5
    got = df.toPandas().sort_values(["by", "bx"])
    assert (got["value"].to_numpy()
            == g["values"][::-1, :].ravel()).all()
