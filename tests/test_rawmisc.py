"""GenBin + EIR + MFF2/HKV readers (sources/rawmisc.py).

Fixture replays: autotest/gdrivers/genbin.py (band-1 500x1 window
checksum 5738 and the (LR-UL)/(n-1) half-pixel geotransform), eir.py
(fakeeir checksum 1), mff2.py (bytemff2 directory checksum 4672 with
the starred-choice attrib parsing).
"""

import numpy as np
import pytest

from lib_gdal_spark.operators import raster
from lib_gdal_spark.sources.rawmisc import (
    read_eir_grid, read_genbin_grid, read_mff2_grid)

D = "/root/reference/autotest/gdrivers/data"


def _cs(vals):
    primes = np.array(raster.CHECKSUM_PRIMES, np.int64)
    iv = np.clip(np.floor(vals.ravel() + 0.5), -2147483647,
                 2147483647).astype(np.int64)
    return int(np.fmod(iv, primes[np.arange(iv.size) % 11]).sum()) & 0xFFFF


def test_genbin():
    g = read_genbin_grid(f"{D}/genbin/tm4628_96.bil")
    assert g["bands"] == 7
    assert _cs(g["values"][0][:1, :500]) == 5738
    want = (1181700.9894981384, 82.021003723042099, 0.0,
            596254.01050186157, 0.0, -82.021003723045894)
    for a, b in zip(g["gt"], want):
        assert abs(a - b) < 1e-6


def test_eir():
    g = read_eir_grid(f"{D}/eir/fakeeir.hdr")
    assert (g["width"], g["height"]) == (1, 1)
    assert _cs(g["values"][0]) == 1


def test_mff2():
    g = read_mff2_grid(f"{D}/mff2/bytemff2")
    assert (g["width"], g["height"], g["bands"]) == (20, 20, 1)
    assert _cs(g["values"][0]) == 4672
    assert g["georef"]["projection.name"] == "utm"


def test_rejections(tmp_path):
    with pytest.raises(ValueError):
        read_genbin_grid(str(tmp_path / "x.bil"))
    p = tmp_path / "x.hdr"
    p.write_text("nope")
    with pytest.raises(ValueError):
        read_eir_grid(str(p))
    with pytest.raises(ValueError):
        read_mff2_grid(str(tmp_path))
