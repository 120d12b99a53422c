"""GIF + Surfer grid codecs vs the reference's own autotest goldens
(autotest/gdrivers/gif.py, gsg.py)."""

import numpy as np
import pytest

from lib_gdal_spark.sources import gif as gifmod
from lib_gdal_spark.sources import surfer as sfm
from lib_gdal_spark.operators.raster import CHECKSUM_PRIMES

GIF_DATA = "/root/reference/autotest/gdrivers/data/gif"
GSG_DATA = "/root/reference/autotest/gdrivers/data/gsg"
BYTE_TIF = "/root/reference/autotest/gcore/data/byte.tif"

_P = np.array(CHECKSUM_PRIMES)


def _cs(a):
    """NumPy twin of GDALChecksumImage (alg/gdalchecksum.cpp:48)."""
    v = np.floor(a.astype(np.float64) + 0.5).astype(np.int64)
    idx = np.arange(v.size) % 11
    return int(np.sum(v.ravel() % _P[idx]) & 0xFFFF)


class TestGif:
    def test_bug407_checksum(self):
        # gif.py::test_gif_2 — checksum 57921 (interlaced, 16-color)
        with open(f"{GIF_DATA}/bug407.gif", "rb") as f:
            arr, meta = gifmod.decode_gif(f.read())
        assert arr.shape == (400, 400)
        assert meta["interlaced"]
        assert _cs(arr) == 57921

    def test_bug407_colormap_and_background(self):
        # gif.py::test_gif_4
        with open(f"{GIF_DATA}/bug407.gif", "rb") as f:
            _, meta = gifmod.decode_gif(f.read())
        pal = meta["palette"]
        assert len(pal) == 16
        assert tuple(pal[0]) == (255, 255, 255, 255)
        assert tuple(pal[1]) == (255, 255, 208, 255)
        assert meta["background"] == 0
        assert meta["transparent"] is None

    def test_createcopy_byte(self):
        # gif.py::test_gif_5 — byte.tif through the writer, cs 4672
        from lib_gdal_spark.sources.tiff import decode_tiff
        with open(BYTE_TIF, "rb") as f:
            src, _ = decode_tiff(f.read())
        back, _ = gifmod.decode_gif(gifmod.encode_gif(
            src.astype(np.uint8)))
        assert np.array_equal(back, src)
        assert _cs(back) == 4672

    def test_transparency_nodata(self):
        # gif.py::test_gif_6 semantics: transparent index 0 -> nodata 0
        a = np.arange(16, dtype=np.uint8).reshape(4, 4)
        back, meta = gifmod.decode_gif(
            gifmod.encode_gif(a, transparent=0))
        assert np.array_equal(back, a)
        assert meta["transparent"] == 0
        assert meta["palette"][0, 3] == 0

    def test_lzw_dictionary_reset(self):
        # >4096 dictionary entries forces mid-stream clear codes
        rng = np.arange(200 * 200, dtype=np.int64)
        a = ((rng * 7919) % 251).astype(np.uint8).reshape(200, 200)
        back, _ = gifmod.decode_gif(gifmod.encode_gif(a))
        assert np.array_equal(back, a)

    def test_not_a_gif(self):
        with pytest.raises(ValueError):
            gifmod.decode_gif(b"NOTAGIF!")

    def test_read_gif_spark(self, spark, tmp_path):
        a = np.arange(64, dtype=np.uint8).reshape(8, 8)
        p = tmp_path / "t.gif"
        p.write_bytes(gifmod.encode_gif(a))
        cells, meta = gifmod.read_gif(spark, str(p))
        got = {(r.bx, r.by): r.value for r in cells.collect()}
        assert got[(0, 7)] == 0.0    # top-left -> by max
        assert got[(7, 0)] == 63.0   # bottom-right -> by 0


class TestSurfer:
    @pytest.mark.parametrize("fname,dec", [
        ("gsg_ascii.grd", sfm.decode_gsag),
        ("gsg_binary.grd", sfm.decode_gsbg),
        ("gsg_7binary.grd", sfm.decode_gs7bg)])
    def test_fixture_checksum_and_gt(self, fname, dec):
        # gsg.py::test_gsg_1..3 — checksum 4672, gt (440720,60,0,
        # 3751320,0,-60)
        with open(f"{GSG_DATA}/{fname}", "rb") as f:
            arr, meta = dec(f.read())
        assert arr.shape == (20, 20)
        assert _cs(arr) == 4672
        np.testing.assert_allclose(
            meta["geotransform"], (440720, 60, 0, 3751320, 0, -60))

    @pytest.mark.parametrize("enc,dec", [
        (sfm.encode_gsag, sfm.decode_gsag),
        (sfm.encode_gsbg, sfm.decode_gsbg),
        (sfm.encode_gs7bg, sfm.decode_gs7bg)])
    def test_createcopy(self, enc, dec):
        # gsg.py::test_gsg_4/5/8 — lossless copy of the fixture
        with open(f"{GSG_DATA}/gsg_ascii.grd", "rb") as f:
            arr, meta = sfm.decode_gsag(f.read())
        a2, m2 = dec(enc(arr, meta))
        assert np.array_equal(a2, arr)
        np.testing.assert_allclose(m2["geotransform"],
                                   meta["geotransform"])
        assert _cs(a2) == 4672

    def test_magic_dispatch(self):
        with open(f"{GSG_DATA}/gsg_7binary.grd", "rb") as f:
            arr, _ = sfm.decode_surfer(f.read())
        assert _cs(arr) == 4672
        with pytest.raises(ValueError):
            sfm.decode_surfer(b"XXXX....")

    def test_read_surfer_spark(self, spark):
        cells, meta = sfm.read_surfer(
            spark, f"{GSG_DATA}/gsg_binary.grd")
        assert cells.count() == 400
        assert meta["dx"] == 60.0
