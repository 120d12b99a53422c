"""STACTA (sources/stacta.py) and SPOT DIMAP (sources/dimap.py) vs
the reference's own autotest expectations: test.json mosaics to
2048x1024x3 equal to the direct two-tile mosaic with the
WorldCRS84Quad geotransform (stacta.py:29-44); METADATA.DIM replays
checksum 21586 on the (0,0,100,100) window, the PROCESSING_LEVEL /
SPECTRAL_PHYSICAL_BIAS metadata and the four half-pixel-shifted GCPs
(dimap.py:36-65)."""

import numpy as np
import pytest

from lib_gdal_spark.operators import raster
from lib_gdal_spark.sources import dimap, stacta
from lib_gdal_spark.sources.tiff import decode_tiff

GD = "/root/reference/autotest/gdrivers/data"


def _cs(vals):
    primes = np.array(raster.CHECKSUM_PRIMES, np.int64)
    h, w = vals.shape
    iv = np.clip(np.floor(vals.astype(np.float64) + 0.5),
                 -2147483647, 2147483647).astype(np.int64)
    return int(np.fmod(iv.ravel(),
                       primes[np.arange(h * w) % 11]).sum()) & 0xFFFF


class TestStacta:
    def test_basic_mosaic(self):
        arr, meta = stacta.read_stacta_array(f"{GD}/stacta/test.json")
        assert arr.shape == (3, 1024, 2048)
        assert meta["n_levels"] == 3
        exp = [-180.0, 0.17578125, 0.0, 90.0, 0.0, -0.17578125]
        for g, e in zip(meta["gt"], exp):
            assert abs(g - e) <= 1e-8 * max(1.0, abs(e))
        # the autotest's reference: BuildVRT of the two level-2 tiles
        t0, _ = decode_tiff(
            open(f"{GD}/stacta/WorldCRS84Quad/2/0/0.tif", "rb").read())
        t1, _ = decode_tiff(
            open(f"{GD}/stacta/WorldCRS84Quad/2/0/1.tif", "rb").read())
        assert np.array_equal(arr, np.concatenate([t0, t1], axis=2))

    def test_overview_level(self):
        arr, meta = stacta.read_stacta_array(f"{GD}/stacta/test.json",
                                             level="1")
        assert arr.shape[1:] == (512, 1024)

    def test_not_stacta_refused(self):
        with pytest.raises(ValueError, match="STACTA"):
            stacta.parse_stacta("{}")


class TestDimap:
    def test_metadata_dim(self):
        win, meta = dimap.read_dimap_window(
            f"{GD}/dimap/METADATA.DIM", 100, 100)
        assert (meta["width"], meta["height"]) == (6000, 6000)
        assert _cs(win) == 21586  # autotest dimap.py:44
        md = meta["metadata"]
        assert md["PROCESSING_LEVEL"] == "1A"
        assert md["SPECTRAL_PHYSICAL_BIAS"] == "0.000000"

    def test_gcps(self):
        _, meta = dimap.read_dimap_window(
            f"{GD}/dimap/METADATA.DIM", 10, 10)
        gcps = meta["gcps"]
        assert len(gcps) == 4
        g = gcps[0]
        assert g["pixel"] == 0.5 and g["line"] == 0.5
        assert abs(g["x"] - 4.3641728) < 2e-7
        assert abs(g["y"] - 44.2082255) < 2e-7
        assert abs(g["z"]) < 2e-7
