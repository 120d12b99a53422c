"""Esri compact cache V2 source (sources/esric.py) vs the reference's
own autotest expectations (autotest/gdrivers/esric.py on Layers.tar):
the full-res geotransform and overview count, checksum 0 for the
missing finest level, and the four-PNG-tile level's band-2 checksum
46857 at 512x512 (one tile grayscale)."""

import os
import tarfile

import numpy as np
import pytest

from lib_gdal_spark.operators import raster
from lib_gdal_spark.sources import esric

TAR = "/root/reference/autotest/gdrivers/data/esric/Layers.tar"


@pytest.fixture(scope="module")
def cache_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("esric")
    with tarfile.open(TAR) as t:
        t.extractall(d)
    return str(d / "Layers")


def _cs(vals):
    primes = np.array(raster.CHECKSUM_PRIMES, np.int64)
    h, w = vals.shape
    iv = np.clip(np.floor(vals.astype(np.float64) + 0.5),
                 -2147483647, 2147483647).astype(np.int64)
    return int(np.fmod(iv.ravel(),
                       primes[np.arange(h * w) % 11]).sum()) & 0xFFFF


def test_conf_and_geotransform(cache_dir):
    bands, meta = esric.read_esric_level(cache_dir, overview=-1)
    # autotest esric.py:52-56
    assert abs(meta["gt"][0] + 20037508) < 1
    assert abs(meta["gt"][1] - 20037508 / 1024) < 1
    assert meta["gt"][2] == 0 and meta["gt"][4] == 0
    assert abs(meta["gt"][3] - 20037508) < 1
    assert len(meta["resolutions"]) == 4  # full + 3 overviews
    assert len(bands) == 4


def test_missing_level_is_black(cache_dir):
    bands, _ = esric.read_esric_level(cache_dir, overview=-1)
    assert _cs(bands[0]) == 0  # autotest esric.py:69


def test_png_tiles_level(cache_dir):
    bands, meta = esric.read_esric_level(cache_dir, overview=1)
    assert (meta["level_width"], meta["level_height"]) == (512, 512)
    assert _cs(bands[1]) == 46857  # autotest esric.py:89-91


def test_not_v2_refused():
    with pytest.raises(ValueError, match="V2"):
        esric.parse_conf("<CacheInfo><StorageFormat>exploded"
                         "</StorageFormat></CacheInfo>")


def test_spark_face(spark, cache_dir):
    df, meta = esric.read_esric(spark, cache_dir, band=2, overview=1)
    n = df.count()
    assert 0 < n <= 512 * 512
