"""HF2/HFZ codec (sources/hf2.py) vs the reference's own autotest
expectations (autotest/gdrivers/hf2.py): byte.tif survives the
CreateCopy loop at checksum 4672 (plain and gzipped), n43.dt0 through
the Int16 exact path at 49187, and the georef-extents block carries
the geotransform."""

import numpy as np
import pytest

from lib_gdal_spark.operators import raster
from lib_gdal_spark.sources import hf2
from lib_gdal_spark.sources.rawgrids import decode_dted
from lib_gdal_spark.sources.tiff import decode_tiff

GC = "/root/reference/autotest/gcore/data"
GD = "/root/reference/autotest/gdrivers/data"


def _cs(vals):
    primes = np.array(raster.CHECKSUM_PRIMES, np.int64)
    h, w = vals.shape
    iv = np.clip(np.floor(vals.astype(np.float64) + 0.5), -2147483647,
                 2147483647).astype(np.int64)
    return int(np.fmod(iv.ravel(),
                       primes[np.arange(h * w) % 11]).sum()) & 0xFFFF


def test_byte_createcopy():
    arr, _ = decode_tiff(open(f"{GC}/byte.tif", "rb").read())
    gt = (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
    data = hf2.encode_hf2(arr.astype(np.float64), gt=gt)
    back, meta = hf2.decode_hf2(data)
    assert (meta["width"], meta["height"]) == (20, 20)
    assert _cs(back) == 4672  # autotest hf2.py:24
    assert meta["gt"] == gt
    assert meta["vert_precision"] == np.float32(0.01)


def test_byte_compressed():
    arr, _ = decode_tiff(open(f"{GC}/byte.tif", "rb").read())
    data = hf2.encode_hf2(arr.astype(np.float64), compress=True)
    assert data[:2] == b"\x1f\x8b"
    back, _ = hf2.decode_hf2(data)
    assert _cs(back) == 4672  # autotest hf2.py:35 (COMPRESS=YES)


def test_n43_dted_int16_path():
    arr, _ = decode_dted(open(f"{GD}/n43.dt0", "rb").read())
    data = hf2.encode_hf2(arr.astype(np.float64), source_int16=True)
    back, _ = hf2.decode_hf2(data)
    assert _cs(back) == 49187  # autotest hf2.py:63
    assert np.array_equal(back.astype(np.int64), arr.astype(np.int64))


def test_small_tile_multiblock():
    # 3x3 tiling with word-size escalation (large jumps force i2/i4)
    rng = np.random.RandomState(5)
    vals = rng.randint(-40000, 40000, (50, 37)).astype(np.float64)
    data = hf2.encode_hf2(vals, tile_size=16, source_int16=True)
    back, meta = hf2.decode_hf2(data)
    assert meta["tile_size"] == 16
    assert np.array_equal(back.astype(np.int64), vals.astype(np.int64))


def test_float_quantization_precision():
    rng = np.random.RandomState(9)
    vals = rng.uniform(-100, 100, (30, 30))
    back, _ = hf2.decode_hf2(hf2.encode_hf2(vals))
    # vertical precision 0.01: reconstruction within ~2 quanta
    assert np.max(np.abs(back - vals.astype(np.float32))) < 0.03


def test_magic_refused():
    with pytest.raises(ValueError, match="HF2"):
        hf2.decode_hf2(b"NOTHF2" + b"\x00" * 64)
