"""RRASTER + SAGA + Idrisi RST + SIGDEM + NSIDC codecs
(sources/gridpack.py).

Fixture replays against the reference's own autotest expectations:
- rraster.py: byte_rraster(.grd/.gri) cs 4672 with byte.tif's exact
  geotransform and min 74 / max 255; rgba_rraster per-band checksums
  19/27/22/7 (2x2 BIL INT1U x4).
- saga.py: 4byteFloat.sdat cs 108 (bottom-up float32 body).
- idrisi.py: byte.rst cs 5044, real.rst cs 5275.
- sigdem.py: the nonsquare_nad27_utm11.vrt source (raw 31x35 bytes of
  ../small.raw) checksums 12481 and survives the SIGDEM encode/decode
  round trip with the 60x50 non-square geotransform.
- nsidcbin.py: nt_20220409_f18_nrt_s.bin is 316 wide, pixel (60,44) =
  27, southern grid geotransform/EPSG.
"""

import numpy as np
import pytest

from lib_gdal_spark.operators import raster
from lib_gdal_spark.sources import gridpack as gp

GD = "/root/reference/autotest/gdrivers/data"


def _cs(vals):
    primes = np.array(raster.CHECKSUM_PRIMES, np.int64)
    h, w = vals.shape
    iv = np.clip(np.floor(np.nan_to_num(vals, nan=0.0) + 0.5),
                 -2147483647, 2147483647).astype(np.int64)
    return int(np.fmod(iv.ravel(),
                       primes[np.arange(h * w) % 11]).sum()) & 0xFFFF


BYTE_GT = (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)


class TestRRaster:
    def test_byte(self):
        arr, meta = gp.decode_rraster(
            open(f"{GD}/rraster/byte_rraster.grd").read(),
            open(f"{GD}/rraster/byte_rraster.gri", "rb").read())
        assert (meta["width"], meta["height"], meta["bands"]) == (20, 20, 1)
        assert meta["gt"] == BYTE_GT
        assert meta["layername"] == "byte"
        assert _cs(arr[0]) == 4672
        assert arr.min() == 74 and arr.max() == 255

    def test_byte_wkt_variant(self):
        arr, meta = gp.decode_rraster(
            open(f"{GD}/rraster/byte_rraster1.grd").read(),
            open(f"{GD}/rraster/byte_rraster1.gri", "rb").read())
        assert _cs(arr[0]) == 4672
        assert meta["gt"] == BYTE_GT

    def test_rgba(self):
        arr, meta = gp.decode_rraster(
            open(f"{GD}/rraster/rgba_rraster.grd").read(),
            open(f"{GD}/rraster/rgba_rraster.gri", "rb").read())
        assert meta["bands"] == 4 and arr.shape == (4, 2, 2)
        assert [_cs(arr[b]) for b in range(4)] == [19, 27, 22, 7]

    def test_roundtrip(self):
        rng = np.random.RandomState(7)
        vals = rng.randint(0, 255, (5, 9)).astype(np.float64)
        grd, body = gp.encode_rraster(vals, BYTE_GT, nodata=-1.0,
                                      datatype="FLT4S")
        back, meta = gp.decode_rraster(grd, body)
        assert np.array_equal(back[0], vals)
        assert meta["gt"][:2] == BYTE_GT[:2]
        assert meta["nodata"] == -1.0


class TestSaga:
    def test_4byte_float(self):
        vals, meta = gp.decode_saga(
            open(f"{GD}/saga/4byteFloat.sgrd").read(),
            open(f"{GD}/saga/4byteFloat.sdat", "rb").read())
        assert (meta["width"], meta["height"]) == (10, 10)
        assert _cs(vals) == 108
        assert meta["nodata"] == -99999.0
        # cell-center positions -> half-cell-shifted edges
        assert meta["gt"] == (333.3 - 5.0, 10.0, 0.0,
                              555.5 + 9 * 10.0 + 5.0, 0.0, -10.0)

    def test_roundtrip(self):
        rng = np.random.RandomState(3)
        vals = rng.uniform(-50, 50, (7, 4)).astype(np.float32) \
            .astype(np.float64)
        sgrd, body = gp.encode_saga(vals, (100.0, 2.5, 0.0, 400.0,
                                           0.0, -2.5))
        back, meta = gp.decode_saga(sgrd, body)
        assert np.array_equal(back, vals)
        assert meta["gt"] == (100.0, 2.5, 0.0, 400.0, 0.0, -2.5)

    def test_toptobottom_refused(self):
        with pytest.raises(ValueError, match="TOPTOBOTTOM"):
            gp.decode_saga("CELLCOUNT_X\t= 1\nCELLCOUNT_Y\t= 1\n"
                           "CELLSIZE\t= 1\nPOSITION_XMIN\t= 0\n"
                           "POSITION_YMIN\t= 0\nTOPTOBOTTOM\t= TRUE\n",
                           b"\x00" * 8)


class TestIdrisiRst:
    def test_byte(self):
        vals, meta = gp.decode_rst(
            open(f"{GD}/rst/byte.rdc").read(),
            open(f"{GD}/rst/byte.rst", "rb").read())
        assert (meta["width"], meta["height"]) == (21, 21)
        assert _cs(vals) == 5044
        assert meta["nodata"] is None
        assert meta["gt"] == (50.0, 20.0 / 21, 0.0, 70.0, 0.0, -20.0 / 21)

    def test_real(self):
        vals, meta = gp.decode_rst(
            open(f"{GD}/rst/real.rdc").read(),
            open(f"{GD}/rst/real.rst", "rb").read())
        assert meta["data_type"] == "real"
        assert _cs(vals) == 5275

    def test_roundtrip(self):
        rng = np.random.RandomState(11)
        vals = rng.randint(-300, 300, (6, 8)).astype(np.float64)
        rdc, body = gp.encode_rst(vals, (0.0, 1.0, 0.0, 6.0, 0.0, -1.0),
                                  data_type="integer")
        back, meta = gp.decode_rst(rdc, body)
        assert np.array_equal(back, vals)
        assert meta["nodata"] is None


class TestSigdem:
    def test_small_raw_createcopy(self):
        # the autotest source: ../small.raw, 31x35 bytes LSB, cs 12481,
        # non-square 60x50 pixels (nonsquare_nad27_utm11.vrt)
        raw = open(f"{GD}/small.raw", "rb").read()
        vals = np.frombuffer(raw, np.uint8, count=31 * 35) \
            .astype(np.float64).reshape(35, 31)
        assert _cs(vals) == 12481
        gt = (440720.0, 60.0, 0.0, 3751320.0, 0.0, -50.0)
        data = gp.encode_sigdem(vals, gt)
        back, meta = gp.decode_sigdem(data)
        assert _cs(back) == 12481
        assert np.array_equal(back, vals)  # ints are exact at /1000
        assert meta["gt"] == gt
        assert (meta["width"], meta["height"]) == (31, 35)
        assert meta["min_z"] == vals.min() and meta["max_z"] == vals.max()

    def test_nodata(self):
        vals = np.array([[1.25, np.nan], [-2.5, 0.0]])
        back, _ = gp.decode_sigdem(
            gp.encode_sigdem(vals, (0.0, 1.0, 0.0, 2.0, 0.0, -1.0)))
        assert np.isnan(back[0, 1])
        assert back[0, 0] == 1.25 and back[1, 1] == 0.0
        assert back[1, 0] == -2.5

    def test_magic_refused(self):
        with pytest.raises(ValueError, match="SIGDEM"):
            gp.decode_sigdem(b"NOTDEM" + b"\x00" * 200)


class TestNsidcBin:
    def test_antarctic_daily(self):
        vals, meta = gp.decode_nsidcbin(
            open(f"{GD}/nsidcbin/nt_20220409_f18_nrt_s.bin", "rb").read())
        assert meta["width"] == 316 and meta["height"] == 332
        assert meta["south"] is True and meta["epsg"] == 3976
        assert meta["gt"] == gp.NSIDC_SOUTH_GT
        # autotest nsidcbin.py:34 — ReadRaster(60, 44, 1, 1) == 27
        assert vals[44, 60] == 27

    def test_bad_width_refused(self):
        with pytest.raises(ValueError, match="width"):
            gp.decode_nsidcbin(b" " * 6 + b"  999" + b" " * 289)


class TestSparkFaces:
    def test_rraster_spark_roundtrip(self, spark):
        df, _ = gp.read_rraster(spark, f"{GD}/rraster/byte_rraster.grd")
        assert df.count() == 400
        import tempfile
        out = tempfile.mktemp(suffix=".grd")
        gp.write_rraster(df, out, 20, 20, BYTE_GT, datatype="FLT4S")
        back, meta = gp.read_rraster(spark, out)
        assert back.count() == 400
        a = {(r.bx, r.by): r.value for r in df.collect()}
        b = {(r.bx, r.by): r.value for r in back.collect()}
        assert a == b

    def test_sigdem_spark_roundtrip(self, spark):
        df, _ = gp.read_rst(spark, f"{GD}/rst/byte.rst")
        import tempfile
        out = tempfile.mktemp(suffix=".sigdem")
        gp.write_sigdem(df, out, 21, 21,
                        (50.0, 20.0 / 21, 0.0, 70.0, 0.0, -20.0 / 21))
        back, meta = gp.read_sigdem(spark, out)
        a = {(r.bx, r.by): r.value for r in df.collect()}
        b = {(r.bx, r.by): r.value for r in back.collect()}
        assert a == b


class TestPCRaster:
    def test_ldd_map(self):
        vals, meta = gp.decode_csf(
            open(f"{GD}/pcraster/ldd.map", "rb").read())
        assert (meta["width"], meta["height"]) == (80, 100)
        assert meta["value_scale"] == "ldd"
        assert meta["nodata"] == 255
        assert meta["gt"][1] == 10.0 and meta["gt"][5] == -10.0
        # GDAL checksums the RAW band incl. the 255 MV cells (cs 4528,
        # autotest pcraster.py:27)
        raw = np.where(np.isnan(vals), 255.0, vals)
        assert _cs(raw) == 4528
        # ldd values are drain directions 1..9
        assert np.nanmin(vals) >= 1 and np.nanmax(vals) <= 9

    def test_signature_refused(self):
        with pytest.raises(ValueError, match="CSF"):
            gp.decode_csf(b"NOT A MAP" + b"\x00" * 300)
