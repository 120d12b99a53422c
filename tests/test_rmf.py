"""Raster Matrix Format codec (sources/rmf.py).

Fixture replays from autotest/gdrivers/rmf.py: all 13 published
checksums — byte.rsw 4672 (+gt), byte-lzw 40503, float64.mtw 4672
(+gt), rgbsmall bands 21212/21053/21349, rgbsmall-lzw
40503/41429/40238, big-endian 7782/8480/4195, the DEM-compressed
t100.mtw 6388 — plus the four header-robustness variants (cucled-1/2,
invalid-/corrupted-subheader, tests 12a-d) all reading the main
raster to 4672 with the expected geotransform.
"""

import numpy as np
import pandas as pd
import pytest

from lib_gdal_spark.operators import raster
from lib_gdal_spark.sources.rmf import read_rmf, read_rmf_grid, write_rmf

D = "/root/reference/autotest/gdrivers/data/rmf"

CHECKSUMS = [
    ("byte.rsw", 1, 4672), ("byte-lzw.rsw", 1, 40503),
    ("float64.mtw", 1, 4672),
    ("rgbsmall.rsw", 1, 21212), ("rgbsmall.rsw", 2, 21053),
    ("rgbsmall.rsw", 3, 21349),
    ("rgbsmall-lzw.rsw", 1, 40503), ("rgbsmall-lzw.rsw", 2, 41429),
    ("rgbsmall-lzw.rsw", 3, 40238),
    ("big-endian.rsw", 1, 7782), ("big-endian.rsw", 2, 8480),
    ("big-endian.rsw", 3, 4195),
    ("t100.mtw", 1, 6388),
    ("cucled-1.rsw", 1, 4672), ("cucled-2.rsw", 1, 4672),
    ("invalid-subheader.rsw", 1, 4672),
    ("corrupted-subheader.rsw", 1, 4672),
]


def _checksum_np(vals):
    primes = np.array(raster.CHECKSUM_PRIMES, np.int64)
    h, w = vals.shape
    iv = np.floor(vals.ravel() + 0.5).astype(np.int64)
    return int(np.fmod(iv, primes[np.arange(h * w) % 11]).sum()) & 0xFFFF


@pytest.mark.parametrize("fn,band,want", CHECKSUMS,
                         ids=[f"{c[0]}-b{c[1]}" for c in CHECKSUMS])
def test_fixture_checksums(fn, band, want):
    g = read_rmf_grid(f"{D}/{fn}")
    assert _checksum_np(g["values"][band - 1]) == want


def test_geotransforms():
    for fn in ("byte.rsw", "float64.mtw", "cucled-1.rsw",
               "corrupted-subheader.rsw"):
        g = read_rmf_grid(f"{D}/{fn}")
        assert g["gt"] == (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0), fn
    g = read_rmf_grid(f"{D}/rgbsmall.rsw")
    for a, b in zip(g["gt"], (-44.840320, 0.003432, 0.0, -22.932584,
                              0.0, -0.003432)):
        assert abs(a - b) < 1e-9


def test_palette_formats_consistent():
    # 4bit vs its LZW twin must decode identically; 1bit is binary
    a = read_rmf_grid(f"{D}/4bit.rsw")
    b = read_rmf_grid(f"{D}/4bit-lzw.rsw")
    assert (a["values"] == b["values"]).all()
    assert a["values"].max() <= 15
    assert a["color_table"] is not None
    c = read_rmf_grid(f"{D}/1bit.rsw")
    assert set(np.unique(c["values"])) <= {0.0, 1.0}


def test_writer_roundtrips(tmp_path):
    g = read_rmf_grid(f"{D}/byte.rsw")
    p = write_rmf(str(tmp_path / "rt8.rsw"),
                  g["values"][0].astype(np.uint8), gt=g["gt"],
                  color_table=g["color_table"])
    b = read_rmf_grid(p)
    assert (b["values"][0] == g["values"][0]).all()
    assert b["gt"] == g["gt"]
    assert (b["color_table"] == g["color_table"]).all()

    rgb = read_rmf_grid(f"{D}/rgbsmall.rsw")
    p = write_rmf(str(tmp_path / "rt24.rsw"),
                  rgb["values"].astype(np.uint8), gt=rgb["gt"])
    assert (read_rmf_grid(p)["values"] == rgb["values"]).all()

    mtw = read_rmf_grid(f"{D}/float64.mtw")
    p = write_rmf(str(tmp_path / "rt.mtw"),
                  mtw["values"][0].astype(np.float64), mtw=True,
                  gt=mtw["gt"])
    b = read_rmf_grid(p)
    assert b["type"] == "MTW" and b["bitdepth"] == 64
    assert (b["values"][0] == mtw["values"][0]).all()

    # Int32 MTW with a multi-tile grid (exercises edge tiles)
    rng = np.random.default_rng(4)
    arr = rng.integers(-5000, 5000, (300, 515)).astype(np.int32)
    p = write_rmf(str(tmp_path / "big.mtw"), arr, mtw=True, tile=256)
    b = read_rmf_grid(p)
    assert (b["values"][0] == arr).all()


def test_dataframe_view(spark):
    df, meta = read_rmf(spark, f"{D}/byte.rsw")
    assert df.count() == meta["width"] * meta["height"]
    cs = raster.checksum(df, 0, 0, meta["width"], meta["height"])
    assert cs.collect()[0]["checksum"] == 4672
