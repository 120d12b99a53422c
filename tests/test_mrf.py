"""Meta Raster Format source (sources/mrf.py) vs the reference's own
autotest fixtures (autotest/gdrivers/data/mrf): the byte fixture
replays checksum 4672 with byte.tif's geotransform through all four
page codecs (NONE/.til, DEFLATE/.pzp, PNG/.ppg, TIF/.ptf)."""

import numpy as np
import pytest

from lib_gdal_spark.operators import raster
from lib_gdal_spark.sources import mrf

MD = "/root/reference/autotest/gdrivers/data/mrf"


def _cs(vals):
    primes = np.array(raster.CHECKSUM_PRIMES, np.int64)
    h, w = vals.shape
    iv = np.clip(np.floor(vals + 0.5), -2147483647,
                 2147483647).astype(np.int64)
    return int(np.fmod(iv.ravel(),
                       primes[np.arange(h * w) % 11]).sum()) & 0xFFFF


@pytest.mark.parametrize("codec", ["none", "deflate", "png", "tif"])
def test_byte_all_codecs(codec):
    vals, meta = mrf.read_mrf_array(f"{MD}/{codec}/byte.mrf")
    assert (meta["width"], meta["height"]) == (20, 20)
    assert _cs(vals) == 4672
    assert meta["gt"] == (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)


def test_unavailable_codec_refused(tmp_path):
    p = tmp_path / "x.mrf"
    p.write_text("<MRF_META><Raster><Size x='1' y='1' c='1'/>"
                 "<PageSize x='1' y='1' c='1'/>"
                 "<Compression>LERC</Compression></Raster></MRF_META>")
    (tmp_path / "x.idx").write_bytes(
        b"\x00" * 8 + b"\x00" * 7 + b"\x08")  # one 8-byte page
    (tmp_path / "x.lrc").write_bytes(b"\x00" * 8)
    with pytest.raises(ValueError, match="not available"):
        mrf.read_mrf_array(str(p))


def test_spark_face(spark):
    df, meta = mrf.read_mrf(spark, f"{MD}/none/byte.mrf")
    assert df.count() == 400


class TestPnmFixtures:
    """The PNM autotest fixtures through the engine's existing PPM/PGM
    codec (operators/multimodal.py): byte.pgm cs 4672 and
    rgbsmall.ppm band 2 cs 21053 (autotest pnm.py:27,49)."""

    def test_byte_pgm(self):
        from lib_gdal_spark.operators.multimodal import _decode_ppm

        img, meta = _decode_ppm(open(
            "/root/reference/autotest/gdrivers/data/pnm/byte.pgm",
            "rb").read())
        assert (meta["width"], meta["height"]) == (20, 20)
        assert _cs(img.astype(np.float64)) == 4672

    def test_rgbsmall_ppm(self):
        from lib_gdal_spark.operators.multimodal import _decode_ppm

        img, meta = _decode_ppm(open(
            "/root/reference/autotest/gdrivers/data/pnm/rgbsmall.ppm",
            "rb").read())
        assert meta["channels"] == 3
        assert _cs(img[:, :, 1].astype(np.float64)) == 21053
