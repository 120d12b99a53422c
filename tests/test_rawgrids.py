"""Raw grid codecs (SRTM HGT / DTED / EHdr / ENVI) — byte-level goldens
hand-derived from the reference's decode rules, plus roundtrips."""

import numpy as np
import pytest

from lib_gdal_spark.sources import rawgrids as rg


class TestHgt:
    def test_name_parse(self):
        assert rg.parse_hgt_name("N51E013.hgt") == (51, 13)
        assert rg.parse_hgt_name("/a/b/s33w070.hgt") == (-33, -70)
        with pytest.raises(ValueError):
            rg.parse_hgt_name("X51E013.hgt")

    def test_roundtrip_and_geotransform(self):
        # 1201x1201 3-arcsec tile; values include nodata and negatives
        rs = np.random.RandomState(7)
        arr = rs.randint(-500, 8000, (1201, 1201)).astype(np.int16)
        arr[0, 0] = -32768
        data = rg.encode_hgt(arr)
        assert len(data) == 1201 * 1201 * 2
        # big-endian check: first sample of row 1
        v = arr[1, 0]
        assert data[1201 * 2] == (v >> 8) & 0xFF and \
            data[1201 * 2 + 1] == v & 0xFF
        back, meta = rg.decode_hgt(data, "N51E013.hgt")
        assert (back == arr).all()
        # srtmhgtdataset.cpp:483-488
        gt = meta["geotransform"]
        assert gt[0] == 13 - 0.5 / 1200
        assert gt[1] == 1.0 / 1200
        assert gt[3] == 52 + 0.5 / 1200
        assert gt[5] == -1.0 / 1200
        assert meta["nodata"] == -32768.0

    def test_byte_and_float_variants(self):
        swbd = np.zeros((3601, 3601), dtype=np.uint8)
        swbd[5, 7] = 255
        back, meta = rg.decode_hgt(rg.encode_hgt(swbd), "S01W001.raw")
        assert back[5, 7] == 255 and meta["nodata"] is None
        flt = np.linspace(0, 100, 3601 * 3601,
                          dtype=np.float32).reshape(3601, 3601)
        back, _ = rg.decode_hgt(rg.encode_hgt(flt), "N00E000.hgts")
        assert np.array_equal(back, flt)

    def test_illegal_size_refused(self):
        with pytest.raises(ValueError):
            rg.decode_hgt(b"\0" * 100, "N00E000.hgt")
        with pytest.raises(ValueError):
            rg.encode_hgt(np.zeros((10, 10), dtype=np.int16))


class TestDted:
    def test_sign_magnitude_golden(self):
        # dted_api.c:643-648: -100 encodes as high byte 0x80, low 0x64
        arr = np.full((121, 121), 0, dtype=np.int16)
        arr[-1, 0] = -100  # bottom row = first sample of column 0
        data = rg.encode_dted(arr, 51, 13)
        off = 80 + 648 + 2700  # UHL + DSI + ACC
        assert data[off] == 0xAA
        assert data[off + 8] == 0x80 and data[off + 9] == 0x64
        back, _ = rg.decode_dted(data, verify_checksum=True)
        assert back[-1, 0] == -100

    def test_twos_complement_fixup(self):
        # craft bytes (0xC1, 0x00): sign-magnitude reads -16640 < -16000,
        # so the reference re-decodes as two's complement = -16128
        # (dted_api.c:651-660)
        arr = np.zeros((121, 121), dtype=np.int16)
        data = bytearray(rg.encode_dted(arr, 51, 13))
        off = 80 + 648 + 2700
        data[off + 8], data[off + 9] = 0xC1, 0x00
        # fix the column checksum (bytes 0..8+2*ny-1 summed)
        ny = 121
        csum = sum(data[off:off + 8 + ny * 2])
        data[off + 8 + ny * 2:off + 12 + ny * 2] = csum.to_bytes(4, "big")
        back, _ = rg.decode_dted(bytes(data), verify_checksum=True)
        assert back[-1, 0] == -16128

    def test_checksum_detects_corruption(self):
        arr = np.zeros((121, 121), dtype=np.int16)
        data = bytearray(rg.encode_dted(arr, 51, 13))
        data[80 + 648 + 2700 + 9] ^= 0x01
        with pytest.raises(ValueError, match="checksum"):
            rg.decode_dted(bytes(data), verify_checksum=True)

    def test_geotransform_and_headers(self):
        arr = np.arange(121 * 121, dtype=np.int16).reshape(121, 121) % 997
        data = rg.encode_dted(arr, -34, -59)  # S34 W059
        back, meta = rg.decode_dted(data, verify_checksum=True)
        assert (back == arr).all()
        psx = 300 / 36000.0  # level 0 = 30 arcsec
        gt = meta["geotransform"]
        assert gt[0] == pytest.approx(-59 - 0.5 * psx)
        assert gt[3] == pytest.approx(-34 - 0.5 * psx + 121 * psx)
        assert gt[5] == pytest.approx(-psx)
        assert meta["nodata"] == -32767.0

    def test_level_zone_thinning(self):
        # dted_create.c:121-130 longitude thinning by reference latitude
        assert rg.dted_level_size(1, 30) == (1201, 1201)
        assert rg.dted_level_size(1, 50) == (601, 1201)
        assert rg.dted_level_size(1, -51) == (601, 1201)
        assert rg.dted_level_size(1, 72) == (401, 1201)
        assert rg.dted_level_size(1, 76) == (301, 1201)
        assert rg.dted_level_size(1, 80) == (201, 1201)

    def test_weird_variant_refused(self):
        data = bytearray(rg.encode_dted(np.zeros((121, 121), np.int16),
                                        51, 13))
        data[4] = ord(" ")
        with pytest.raises(NotImplementedError):
            rg.decode_dted(bytes(data))


class TestEhdr:
    def test_corner_registration(self):
        # xllcorner/yllcorner: gt is the corner VERBATIM and ULY derives
        # from yll + nrows*ydim (ehdrdataset.cpp:1321-1351)
        hdr = ("NCOLS 4\nNROWS 3\nNBITS 16\nPIXELTYPE SIGNEDINT\n"
               "XLLCORNER 100\nYLLCORNER 200\nCELLSIZE 10\nNODATA -9999\n")
        arr = np.arange(12, dtype="<i2").reshape(3, 4)
        back, meta = rg.decode_ehdr(hdr, arr.tobytes())
        assert (back == arr).all()
        assert meta["geotransform"] == (100.0, 10.0, 0.0, 230.0, 0.0, -10.0)

    def test_center_registration(self):
        hdr = ("NCOLS 2\nNROWS 2\nNBITS 32\nPIXELTYPE FLOAT\n"
               "ULXMAP 1000\nULYMAP 2000\nXDIM 30\nYDIM 30\n")
        arr = np.array([[1.5, 2.5], [3.5, 4.5]], dtype="<f4")
        back, meta = rg.decode_ehdr(hdr, arr.tobytes())
        assert (back == arr).all()
        assert meta["geotransform"] == (985.0, 30.0, 0.0, 2015.0, 0.0, -30.0)

    def test_inference_ladder(self):
        # no NBITS + 4 bytes/pixel -> float32 (ehdrdataset.cpp:1143-1165)
        hdr = "NCOLS 3\nNROWS 2\n"
        arr = np.array([[1, 2, 3], [4, 5, 6]], dtype="<f4")
        back, _ = rg.decode_ehdr(hdr, arr.tobytes())
        assert back.dtype.kind == "f" and (back == arr).all()
        # negative nodata -> signed (worldclim rule)
        hdr = "NCOLS 2\nNROWS 1\nNBITS 16\nNODATA -32768\n"
        arr = np.array([[-5, 7]], dtype="<i2")
        back, meta = rg.decode_ehdr(hdr, arr.tobytes())
        assert back[0, 0] == -5 and meta["nodata"] == -32768.0

    def test_layouts_and_byteorder(self):
        a = np.arange(24, dtype=np.int16).reshape(2, 3, 4)  # (nb, nr, nc)
        for layout in ("BIL", "BIP", "BSQ"):
            hdr, body = rg.encode_ehdr(a, layout=layout)
            back, meta = rg.decode_ehdr(hdr, body)
            assert meta["bands"] == 2
            assert (back == a).all(), layout
        # big-endian body
        hdr = "NCOLS 2\nNROWS 1\nNBITS 16\nBYTEORDER M\nPIXELTYPE SIGNEDINT\n"
        back, _ = rg.decode_ehdr(hdr, np.array([[258, -2]], ">i2").tobytes())
        assert back[0, 0] == 258 and back[0, 1] == -2

    def test_roundtrip_single_band(self):
        a = (np.arange(20, dtype=np.float32).reshape(4, 5) * 3 - 7)
        hdr, body = rg.encode_ehdr(a, ulxmap=10.0, ulymap=20.0,
                                   xdim=2.0, ydim=2.0, nodata=-9999.0)
        back, meta = rg.decode_ehdr(hdr, body)
        assert (back == a).all()
        assert meta["geotransform"] == (9.0, 2.0, 0.0, 21.0, 0.0, -2.0)
        assert meta["nodata"] == -9999.0


class TestEnvi:
    HDR = ("ENVI\nsamples = 4\nlines = 3\nbands = 1\nheader offset = 0\n"
           "data type = 2\ninterleave = bsq\nbyte order = 0\n"
           "map info = {UTM, 1, 1, 500000, 4000000, 30, 30, 11, North}\n"
           "data ignore value = -99\n")

    def test_decode_golden(self):
        arr = np.arange(12, dtype="<i2").reshape(3, 4)
        back, meta = rg.decode_envi(self.HDR, arr.tobytes())
        assert (back == arr).all()
        assert meta["geotransform"] == (
            500000.0, 30.0, -0.0, 4000000.0, -0.0, -30.0)
        assert meta["nodata"] == -99.0

    def test_rotation_180_upside_down(self):
        hdr = self.HDR.replace(
            "11, North}", "11, North, rotation=180.0}")
        arr = np.zeros((3, 4), dtype="<i2")
        _, meta = rg.decode_envi(hdr, arr.tobytes())
        gt = meta["geotransform"]
        # envidataset.cpp:1368-1374: exact upside-down shortcut
        assert gt[1] == 30.0 and gt[2] == 0.0
        assert gt[4] == 0.0 and gt[5] == 30.0

    def test_interleaves_and_types(self):
        a = np.arange(24, dtype=np.float64).reshape(2, 3, 4) / 8.0
        for il in ("bsq", "bil", "bip"):
            hdr, body = rg.encode_envi(a, interleave=il)
            back, meta = rg.decode_envi(hdr, body)
            assert (back == a).all(), il
        # big-endian uint16 (data type 12, byte order 1)
        hdr = ("ENVI\nsamples = 2\nlines = 1\nbands = 1\n"
               "data type = 12\ninterleave = bsq\nbyte order = 1\n")
        back, _ = rg.decode_envi(hdr, np.array([[513, 7]], ">u2").tobytes())
        assert back[0, 0] == 513

    def test_geotransform_roundtrip(self):
        a = np.arange(6, dtype=np.float32).reshape(2, 3)
        gt = (100.0, 5.0, 0.0, 300.0, 0.0, -5.0)
        hdr, body = rg.encode_envi(a, geotransform=gt, nodata=-1.0)
        back, meta = rg.decode_envi(hdr, body)
        assert (back == a).all()
        assert meta["geotransform"][0] == 100.0
        assert meta["geotransform"][3] == 300.0
        assert meta["geotransform"][5] == -5.0
        assert meta["nodata"] == -1.0

    def test_magic_required(self):
        with pytest.raises(ValueError):
            rg.parse_envi("samples = 4\n")


class TestCellsRoundtrip:
    def test_dted_cells(self, spark):
        rows = [(0, 0, -250.0), (120, 120, 801.0), (60, 60, 0.0)]
        cells = spark.createDataFrame(rows, "bx long, by long, value double")
        import tempfile
        # lat 30: below the zone-thinning threshold, full 121x121
        path = rg.write_dted(cells, tempfile.mkdtemp(prefix="dted_"),
                             30, 13, level=0)
        back, meta = rg.read_dted(spark, path, verify_checksum=True)
        got = {(r.bx, r.by): r.value for r in back.collect()}
        # 0.0 survives (only -32767 is nodata); absent cells are nodata
        assert got == {(0, 0): -250.0, (120, 120): 801.0, (60, 60): 0.0}
        assert meta["width"] == 121


def _cs(a):
    # GDALChecksumImage twin (C-style truncated modulo)
    from lib_gdal_spark.operators.raster import CHECKSUM_PRIMES
    P = np.array(CHECKSUM_PRIMES, dtype=np.int64)
    v = np.floor(a.astype(np.float64) + 0.5).astype(np.int64)
    m = np.fmod(v.ravel(), P[np.arange(v.size) % 11])
    return int(np.sum(m)) & 0xFFFF


class TestBt:
    GT = (-67.00041667, 0.00083333, 0.0, 50.000416667, 0.0,
          -0.00083333)

    @pytest.mark.parametrize("dtype", ["<i2", "<i4", "<f4"])
    def test_createcopy_byte_4672(self, dtype):
        # gdrivers/bt.py test_bt_create_copy: byte/int16/float32
        # sources all round-trip to checksum 4672 with the NAD27 gt
        from lib_gdal_spark.sources.tiff import decode_tiff
        with open("/root/reference/autotest/gcore/data/byte.tif",
                  "rb") as f:
            src, _ = decode_tiff(f.read())
        back, meta = rg.decode_bt(
            rg.encode_bt(src.astype(np.float64), self.GT, dtype=dtype))
        assert np.array_equal(back, src)
        assert _cs(back) == 4672
        np.testing.assert_allclose(meta["geotransform"], self.GT)
        assert meta["version"] == "1.3"

    def test_column_major_bottom_up_layout(self):
        a = np.arange(6, dtype=np.float64).reshape(2, 3)
        enc = rg.encode_bt(a, (0, 1, 0, 2, 0, -1))
        # first profile = column 0 bottom-to-top: (row1, row0)
        import struct as st
        v = st.unpack_from("<hh", enc, 256)
        assert v == (3, 0)
        back, _ = rg.decode_bt(enc)
        assert np.array_equal(back, a)

    def test_not_bt(self):
        with pytest.raises(ValueError):
            rg.decode_bt(b"NOTBT" + b"\0" * 300)


class TestLan:
    DATA = "/root/reference/autotest/gdrivers/data/lan"

    def test_fakelan_checksum(self):
        # gdrivers/lan.py test_lan_1: checksum 10
        with open(f"{self.DATA}/fakelan.lan", "rb") as f:
            bands, meta = rg.decode_lan(f.read())
        assert _cs(bands[0]) == 10
        assert meta["pixel_type"] == 0

    def test_fakelan_4bit_checksum(self):
        # gdrivers/lan.py test_lan_2: 4-bit nibbles, checksum 10
        with open(f"{self.DATA}/fakelan4bit.lan", "rb") as f:
            bands, meta = rg.decode_lan(f.read())
        assert _cs(bands[0]) == 10
        assert meta["pixel_type"] == 1

    def test_read_lan_spark(self, spark):
        cells, meta = rg.read_lan(spark, f"{self.DATA}/fakelan.lan")
        assert cells.count() == meta["width"] * meta["height"]
