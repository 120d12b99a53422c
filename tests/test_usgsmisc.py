"""CTG + DOQ2 + GRASS ASCII readers (sources/usgsmisc.py).

Fixture replays: autotest/gdrivers/ctg.py (fake_grid_cell band-1
checksum 21 with the corner-adjusted UTM geotransform, nodata 0, band
descriptions), doq2.py (all three 500x1-window checksums
4201/4010/5820 through the BIP layout, the exact gt, and the
tokenized QUADRANGLE_NAME metadata), grassasciigrid.py (checksum 212
with the extent-derived gt).
"""

import numpy as np
import pytest

from lib_gdal_spark.operators import raster
from lib_gdal_spark.sources.usgsmisc import (
    read_ctg_grid, read_doq2_grid, read_grass_ascii_grid)

D = "/root/reference/autotest/gdrivers/data"


def _cs(vals):
    primes = np.array(raster.CHECKSUM_PRIMES, np.int64)
    iv = np.clip(np.floor(vals.ravel() + 0.5), -2147483647,
                 2147483647).astype(np.int64)
    return int(np.fmod(iv, primes[np.arange(iv.size) % 11]).sum()) & 0xFFFF


def test_ctg():
    g = read_ctg_grid(f"{D}/ctg/fake_grid_cell")
    assert (g["width"], g["height"], g["bands"]) == (789, 558, 6)
    assert _cs(g["values"][0]) == 21
    assert g["gt"] == (421000.0, 200.0, 0.0, 5094400.0, 0.0, -200.0)
    assert g["utm_zone"] == 14 and g["nodata"] == 0.0
    assert g["band_descriptions"][0] == "Land Use and Land Cover Code"
    assert g["title"].startswith("FAKE CITY")


def test_doq2():
    g = read_doq2_grid(f"{D}/doq2/C3607614_truncated.NWS")
    assert (g["width"], g["height"], g["bands"]) == (500, 7631, 3)
    assert g["gt"] == (377054.0, 1.0, 0.0, 4082205.0, 0.0, -1.0)
    for b, want in [(0, 4201), (1, 4010), (2, 5820)]:
        assert _cs(g["values"][b][:1, :500]) == want
    assert g["metadata"]["QUADRANGLE_NAME"] \
        == "NORFOLK SOUTH 3.45 or 7.5-min. name*"


def test_grass_ascii():
    g = read_grass_ascii_grid(f"{D}/grassasciigrid/grassascii.txt")
    assert (g["width"], g["height"]) == (4, 6)
    assert _cs(g["values"]) == 212
    assert g["gt"] == (-100.0, 62.5, 0.0, 250.0, 0.0,
                       -41.666666666666664)


def test_rejections(tmp_path):
    p = tmp_path / "x"
    p.write_text("nothing")
    for fn in (read_ctg_grid, read_doq2_grid, read_grass_ascii_grid):
        with pytest.raises(ValueError):
            fn(str(p))
