"""TGA codec (sources/tga.py) vs the reference's own autotest
expectations (autotest/gdrivers/tga.py) — the full ref_test_suite
checksum ladder, the ffmpeg cross-scanline RLE pair, and the stefan
RGBA quartet shared with the PNG/TIFF fixtures."""

import numpy as np

from lib_gdal_spark.operators import raster
from lib_gdal_spark.sources.tga import decode_tga

TD = "/root/reference/autotest/gdrivers/data/tga"


def _cs(vals):
    primes = np.array(raster.CHECKSUM_PRIMES, np.int64)
    h, w = vals.shape
    iv = vals.astype(np.int64)
    return int(np.fmod(iv.ravel(),
                       primes[np.arange(h * w) % 11]).sum()) & 0xFFFF


def _open(name):
    return decode_tga(open(f"{TD}/{name}", "rb").read())


def test_rle_grey():
    bands, meta = _open("ref_test_suite/cbw8.tga")
    assert (meta["width"], meta["height"]) == (128, 128)
    assert len(bands) == 1 and meta["color_table"] is None
    assert meta["author_name"] == "Ricky True"
    assert meta["comments"] == \
        "Sample 8 bit run length compressed black and white image"
    assert meta["image_id"] == "Truevision(R) Sample Image"
    assert _cs(bands[0]) == 43089


def test_rle_color_table():
    bands, meta = _open("ref_test_suite/ccm8.tga")
    ct = meta["color_table"]
    assert ct is not None and len(ct) == 256
    assert tuple(ct[0]) == (0, 0, 0, 255)
    assert tuple(ct[1]) == (8, 8, 8, 255)
    assert tuple(ct[64]) == (248, 0, 0, 255)
    assert _cs(bands[0]) == 38151


def test_rle_24bit():
    bands, _ = _open("ref_test_suite/ctc24.tga")
    assert [_cs(b) for b in bands] == [9797, 9952, 9848]


def test_uncompressed_grey():
    bands, _ = _open("ref_test_suite/ubw8.tga")
    assert _cs(bands[0]) == 43089


def test_uncompressed_color_table():
    bands, meta = _open("ref_test_suite/ucm8.tga")
    assert tuple(meta["color_table"][64]) == (248, 0, 0, 255)
    assert _cs(bands[0]) == 38151


def test_uncompressed_16bit():
    bands, _ = _open("ref_test_suite/utc16.tga")
    assert [_cs(b) for b in bands] == [64747, 64839, 64796]


def test_uncompressed_24bit():
    bands, _ = _open("ref_test_suite/utc24.tga")
    assert [_cs(b) for b in bands] == [9797, 9952, 9848]


def test_uncompressed_32bit():
    bands, meta = _open("ref_test_suite/utc32.tga")
    assert len(bands) == 4
    assert meta["fourth_is_alpha"] is False  # ext attribute type 2
    assert [_cs(b) for b in bands] == [9797, 9952, 9848, 0]


def test_stefan_rgba():
    bands, meta = _open("stefan_full_rgba.tga")
    assert (meta["width"], meta["height"]) == (162, 150)
    assert len(bands) == 4 and meta["fourth_is_alpha"] is True
    assert [_cs(b) for b in bands] == [12603, 58561, 36064, 10807]


def test_rle_runs_cross_scanlines_gray():
    bands, _ = _open("from_ffmpeg_samples/test1g.tga")
    assert _cs(bands[0]) == 13077


def test_rle_runs_cross_scanlines_rgb():
    bands, _ = _open("from_ffmpeg_samples/TEST24rle.tga")
    assert [_cs(b) for b in bands] == [39607, 6458, 44534]
