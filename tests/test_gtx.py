"""GTX vertical datum shift grid codec (sources/gtx.py).

Fixture replay: autotest/gdrivers/gtx.py test_gtx_1 — hydroc1.gtx
checksum 64183 and gt (276.725, 0.05, 0, 42.775, 0, -0.05). The
checksum runs through operators/raster.checksum with the nodata cells
PRESENT (GDALChecksumImage reads raw pixels; -88.8888 folds in as
floor(v+0.5) % prime with C truncated modulo — Spark's % matches).
"""

import numpy as np
import pandas as pd
import pytest

from lib_gdal_spark.operators import raster
from lib_gdal_spark.sources.gtx import (
    NODATA, read_gtx, read_gtx_grid, write_gtx)

FIX = "/root/reference/autotest/gdrivers/data/gtx/hydroc1.gtx"


def test_fixture_header():
    g = read_gtx_grid(FIX)
    assert (g["width"], g["height"]) == (21, 11)
    assert g["dtype"] == "Float32"
    assert g["gt"] == (276.725, 0.05, 0.0, 42.775, 0.0, -0.05)


def test_fixture_checksum(spark):
    g = read_gtx_grid(FIX)
    h, w = g["height"], g["width"]
    by, bx = np.mgrid[0:h, 0:w]
    cells = spark.createDataFrame(pd.DataFrame({
        "bx": bx.ravel().astype(np.int64),
        "by": (h - 1 - by).ravel().astype(np.int64),
        "value": g["values"].ravel()}))
    cs = raster.checksum(cells, 0, 0, w, h)
    assert cs.collect()[0]["checksum"] == 64183


def test_roundtrip_exact(tmp_path):
    g = read_gtx_grid(FIX)
    for dt in ("Float32", "Float64"):
        p = write_gtx(str(tmp_path / f"rt_{dt}.gtx"), g["values"],
                      g["gt"], dt)
        back = read_gtx_grid(p)
        assert back["gt"] == g["gt"]
        assert back["dtype"] == dt
        assert (back["values"] == g["values"]).all()


def test_nodata_absent_and_nan_write(spark, tmp_path):
    vals = np.array([[1.0, np.nan], [NODATA, 4.0]])
    p = write_gtx(str(tmp_path / "nd.gtx"), vals,
                  (0.0, 1.0, 0.0, 2.0, 0.0, -1.0), "Float64")
    df, meta = read_gtx(spark, p)
    rows = {(r["bx"], r["by"]): r["value"] for r in df.collect()}
    # NaN wrote as nodata; both nodata cells absent; by=1 is the TOP row
    assert rows == {(0, 1): 1.0, (1, 0): 4.0}
    assert meta["width"] == 2 and meta["height"] == 2
    # Float32 regression: the stored nodata is float32(-88.8888) =
    # -88.88880157..., which a float64 equality test misses (caught by
    # the gtx_roundtrip oracle) — nodata must compare in STORAGE
    # precision
    p32 = write_gtx(str(tmp_path / "nd32.gtx"), vals,
                    (0.0, 1.0, 0.0, 2.0, 0.0, -1.0), "Float32")
    df32, _ = read_gtx(spark, p32)
    rows32 = {(r["bx"], r["by"]): r["value"] for r in df32.collect()}
    assert rows32 == {(0, 1): 1.0, (1, 0): 4.0}


def test_bad_header():
    import tempfile, os
    fd, p = tempfile.mkstemp()
    os.write(fd, b"\x00" * 30)
    os.close(fd)
    with pytest.raises(ValueError):
        read_gtx_grid(p)
    os.unlink(p)
