"""Baseline JPEG decoder vs the reference's own autotest goldens
(autotest/gdrivers/jpeg.py) — bit parity with the vendored libjpeg."""

import numpy as np
import pytest

from lib_gdal_spark.sources import jpeg as J
from lib_gdal_spark.operators.raster import CHECKSUM_PRIMES

DATA = "/root/reference/autotest/gdrivers/data/jpeg"
_P = np.array(CHECKSUM_PRIMES, dtype=np.int64)


def _cs(a):
    v = np.floor(a.astype(np.float64) + 0.5).astype(np.int64)
    return int(np.sum(np.fmod(v.ravel(), _P[np.arange(v.size) % 11]))) \
        & 0xFFFF


def _read(name):
    with open(f"{DATA}/{name}", "rb") as f:
        return f.read()


class TestAlbania:
    def test_band2_checksum_matches_an_accepted_libjpeg(self):
        # jpeg.py::test_jpeg_1 accepts 34296 (9b) / 34298 (8) / 17016
        # (any other libjpeg generation) — exact bit parity required
        arr, meta = J.decode_jpeg(_read("albania.jpg"))
        assert (meta["width"], meta["height"]) == (361, 260)
        assert arr.shape == (260, 361, 3)
        assert _cs(arr[:, :, 1]) in (34296, 34298, 17016)

    def test_h2v2_sampling_decoded(self):
        # 4:2:0 chroma: the fancy upsample + ycc paths both exercised
        arr, _ = J.decode_jpeg(_read("albania.jpg"))
        # all three bands differ (real color image)
        assert _cs(arr[:, :, 0]) != _cs(arr[:, :, 1])
        assert _cs(arr[:, :, 1]) != _cs(arr[:, :, 2])


class TestMask:
    def test_masked_jpg_mask_checksum_770(self):
        # jpeg.py::test_jpeg_4: appended zlib validity bitmask
        m = J.decode_jpeg_mask(_read("masked.jpg"))
        assert m is not None and m.shape == (512, 512)
        assert set(np.unique(m)) <= {0, 255}
        assert _cs(m) == 770

    def test_no_mask_returns_none(self):
        assert J.decode_jpeg_mask(_read("albania.jpg")) is None


class TestGuards:
    def test_not_a_jpeg(self):
        with pytest.raises(ValueError):
            J.decode_jpeg(b"NOTAJPEG")

    def test_12bit_raises(self):
        # 12-bit precision is the dedicated libjpeg-12 build's job
        with pytest.raises(NotImplementedError):
            J.decode_jpeg(_read("12bit_rose_extract.jpg"))


class TestIdct:
    def test_dc_only_block(self):
        q = np.ones(64, np.int64)
        blocks = np.zeros((1, 64), np.int32)
        blocks[0, 0] = 64  # DC 64 -> flat value 64/8 = 8 -> 136
        out = J.idct_islow(blocks, q)
        assert np.all(out == 136)

    def test_range_limit_clamps(self):
        q = np.ones(64, np.int64)
        blocks = np.zeros((2, 64), np.int32)
        blocks[0, 0] = 32767   # far above white
        blocks[1, 0] = -32767  # far below black
        out = J.idct_islow(blocks, q)
        assert np.all(out[0] == 255) and np.all(out[1] == 0)


class TestMultimodal:
    def test_decode_real_dispatch(self):
        from lib_gdal_spark.operators.multimodal import decode_real
        arr, meta = decode_real(_read("albania.jpg"))
        assert meta["codec"] == "jpeg"
        assert arr.shape == (260, 361, 3)


class TestSpark:
    def test_read_jpeg_cells(self, spark, tmp_path):
        import shutil
        shutil.copy(f"{DATA}/albania.jpg", tmp_path / "a.jpg")
        cells, meta = J.read_jpeg(spark, str(tmp_path / "a.jpg"),
                                  band=2)
        assert meta["bands"] == 3
        assert cells.count() == 361 * 260
