"""NTv2 datum-shift grid codec + forward shift (sources/ntv2.py).

Fixture replays: autotest/gdrivers/ntv2.py test_ntv2_1/2 — band-2
checksum 10 on both endiannesses and the geotransform formula of
ntv2dataset.cpp:513-518 (the autotest's recorded gt (-5.52, 7.8, ...)
is compared at pixel/100 epsilon = 0.078 there; we pin the EXACT
formula values (-5.55, 7.8, 0, 52.05, 0, -5.55) instead).
"""

import struct

import numpy as np
import pytest

from lib_gdal_spark.operators import raster
from lib_gdal_spark.sources.ntv2 import (
    ntv2_shift_np, read_ntv2, read_ntv2_grids, write_ntv2)

LE = "/root/reference/autotest/gdrivers/data/ntv2/test_ntv2_le.gsb"
BE = "/root/reference/autotest/gdrivers/data/ntv2/test_ntv2_be.gsb"


@pytest.mark.parametrize("path", [LE, BE])
def test_fixture_header(path):
    g = read_ntv2_grids(path)[0]
    assert (g["width"], g["height"]) == (2, 2)
    assert g["name"] == "TEST" and g["parent"] == "NONE"
    gt = g["gt"]
    assert gt[0] == (g["w_long"] - g["long_inc"] * 0.5) / 3600.0
    assert abs(gt[1] - 7.8) < 1e-12
    assert abs(gt[3] - 52.05) < 1e-12
    assert abs(gt[5] + 5.55) < 1e-12


@pytest.mark.parametrize("path", [LE, BE])
def test_fixture_checksum(spark, path):
    cells, meta = read_ntv2(spark, path, band=2)
    cs = raster.checksum(cells, 0, 0, meta["width"], meta["height"])
    assert cs.collect()[0]["checksum"] == 10


def test_roundtrip_both_orders(tmp_path):
    src = read_ntv2_grids(LE)
    for en in ("<", ">"):
        p = write_ntv2(str(tmp_path / f"rt{en == '<'}.gsb"), src, en)
        back = read_ntv2_grids(p)[0]
        for k, v in src[0].items():
            if isinstance(v, np.ndarray):
                assert (back[k] == v).all()
            else:
                assert back[k] == v, k


def test_refuses_velocity_records():
    hdr = b"NUM_OREC" + struct.pack("<i", 11) + b"\x00" * 4
    hdr += b"\x00" * 8  # pad to 24-byte record
    hdr += b"NUM_SREC" + struct.pack("<i", 11) + b"\x00" * 12
    import tempfile, os
    fd, p = tempfile.mkstemp()
    os.write(fd, hdr + b"\x00" * 400)
    os.close(fd)
    with pytest.raises(NotImplementedError):
        read_ntv2_grids(p)
    os.unlink(p)


def _toy_grid():
    W, H = 5, 4
    x = np.arange(W)
    y = np.arange(H)[:, None]
    latoff = ((x * 7 + y * 13) % 33 - 16) / 64.0
    lonoff = ((x * 11 + y * 5) % 29 - 14) / 64.0
    bands = np.zeros((4, H, W), np.float32)
    bands[0] = latoff
    bands[1] = lonoff
    return {
        "name": "TOY", "parent": "NONE", "created": "", "updated": "",
        "s_lat": 10 * 3600.0, "n_lat": 40 * 3600.0,
        "w_long": -20 * 3600.0, "e_long": 20 * 3600.0,
        "lat_inc": 36000.0, "long_inc": 36000.0,
        "width": W, "height": H, "bands": bands,
    }


def test_shift_hand_computed(tmp_path):
    g = _toy_grid()
    p = write_ntv2(str(tmp_path / "toy.gsb"), [g])
    g2 = read_ntv2_grids(p)[0]
    assert (g2["width"], g2["height"]) == (5, 4)
    # point at exact node (x=1, y=1): fy counts from NORTH (row 0 = n_lat)
    # raster row 1 -> lat = 40 - 10 = 30, col 1 -> lon = -10
    lon2, lat2, ok = ntv2_shift_np([-10.0], [30.0], g2)
    la = float(g2["bands"][0][1, 1])
    lo = float(g2["bands"][1][1, 1])
    assert ok[0]
    assert lat2[0] == 30.0 + la / 3600.0
    assert lon2[0] == -10.0 - lo / 3600.0
    # mid-cell point (10-degree node spacing): lon=-5, lat=25 sits at
    # fx=fy=1.5 -> equal 0.25 weights on the 4 surrounding nodes
    lon2, lat2, ok = ntv2_shift_np([-5.0], [25.0], g2)
    b0, b1 = g2["bands"][0].astype(float), g2["bands"][1].astype(float)
    wla = (b0[1, 1] * 0.5 * 0.5 + b0[1, 2] * 0.5 * 0.5
           + b0[2, 1] * 0.5 * 0.5 + b0[2, 2] * 0.5 * 0.5)
    wlo = (b1[1, 1] * 0.5 * 0.5 + b1[1, 2] * 0.5 * 0.5
           + b1[2, 1] * 0.5 * 0.5 + b1[2, 2] * 0.5 * 0.5)
    assert ok[0]
    assert abs(lat2[0] - (25.0 + wla / 3600.0)) < 1e-15
    assert abs(lon2[0] - (-5.0 - wlo / 3600.0)) < 1e-15
    # outside: pass through
    lon2, lat2, ok = ntv2_shift_np([100.0, -10.0], [30.0, 80.0], g2)
    assert not ok.any()
    assert lon2[0] == 100.0 and lat2[1] == 80.0
    # grid edge (fx = W-1): x1 clamps, weight 0 on the phantom column
    lon2, lat2, ok = ntv2_shift_np([20.0], [40.0], g2)
    assert ok[0]
    assert lat2[0] == 40.0 + float(b0[0, 4]) / 3600.0
