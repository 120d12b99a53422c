"""NRCan BYN geoid grid codec (sources/byn.py).

Fixture replays: autotest/gdrivers/byn.py — checksum 64764 on
cgg2013ai08_reduced.byn AND on test_invalid_header_bytes.byn (the
latter carries garbage in the never-validated Wo..Epoch fields, which
must be tolerated exactly like the reference's disabled check block).
"""

import numpy as np
import pandas as pd
import pytest

from lib_gdal_spark.operators import raster
from lib_gdal_spark.sources.byn import read_byn, read_byn_grid, write_byn

FIX = "/root/reference/autotest/gdrivers/data/byn/cgg2013ai08_reduced.byn"
FIX_BAD = ("/root/reference/autotest/gdrivers/data/byn/"
           "test_invalid_header_bytes.byn")


@pytest.mark.parametrize("path", [FIX, FIX_BAD])
def test_fixture_checksum(spark, path):
    g = read_byn_grid(path)
    assert (g["width"], g["height"]) == (48, 24)
    assert g["dtype"] == "Int32" and g["factor"] == 1000.0
    assert abs(g["gt"][0] + 170.0) < 1e-12
    assert abs(g["gt"][3] - 90.0) < 1e-12
    h, w = g["height"], g["width"]
    by, bx = np.mgrid[0:h, 0:w]
    cells = spark.createDataFrame(pd.DataFrame({
        "bx": bx.ravel().astype(np.int64),
        "by": (h - 1 - by).ravel().astype(np.int64),
        "value": g["values"].ravel().astype(np.float64)}))
    cs = raster.checksum(cells, 0, 0, w, h)
    assert cs.collect()[0]["checksum"] == 64764


def test_roundtrip_variants(tmp_path):
    g = read_byn_grid(FIX)
    arr16 = np.clip(g["values"], -30000, 30000).astype(np.int64) % 1000
    for sizeof, bo, scale in [(4, 1, 0), (2, 0, 0), (2, 1, 1)]:
        kw = dict(south=g["south"], north=g["north"], west=g["west"],
                  east=g["east"], dlat=g["dlat"], dlon=g["dlon"])
        if scale == 1:
            # scaled headers carry boundaries/1000 (integral here)
            kw = {k: v // 1000 for k, v in kw.items()}
        p = write_byn(str(tmp_path / f"rt{sizeof}{bo}{scale}.byn"),
                      arr16 if sizeof == 2 else g["values"],
                      sizeof=sizeof, byteorder=bo, scale=scale, **kw)
        back = read_byn_grid(p)
        want = arr16 if sizeof == 2 else g["values"]
        assert (back["values"] == want).all()
        assert back["gt"] == g["gt"]
        assert back["dtype"] == ("Int16" if sizeof == 2 else "Int32")


def test_nodata_absent(spark, tmp_path):
    vals = np.array([[1, 32767], [-5, 7]], np.int64)
    p = write_byn(str(tmp_path / "nd.byn"), vals, south=0, north=3600,
                  west=0, east=3600, dlat=3600, dlon=3600, sizeof=2)
    df, meta = read_byn(spark, p)
    rows = {(r["bx"], r["by"]): r["value"] for r in df.collect()}
    assert rows == {(0, 1): 1.0, (0, 0): -5.0, (1, 0): 7.0}
    assert meta["nodata"] == 32767.0


def test_rejects_out_of_range():
    import tempfile, os
    g = read_byn_grid(FIX)
    fd, p = tempfile.mkstemp(suffix=".byn")
    os.close(fd)
    write_byn(p, g["values"], south=g["south"], north=g["north"],
              west=g["west"], east=g["east"], dlat=g["dlat"],
              dlon=g["dlon"], sizeof=4, vdatum=9)
    with pytest.raises(ValueError):
        read_byn_grid(p)
    os.unlink(p)
