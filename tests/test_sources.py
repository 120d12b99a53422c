"""Format sources: AAIGrid (the reference's own fixture format) and XYZ."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lib_gdal_spark.sources import (read_aaigrid, write_aaigrid,
                                    read_xyz, write_xyz)

REF_GRD = "/root/reference/autotest/alg/data/polygonize_in.grd"


class TestAAIGrid:
    def test_reads_reference_fixture(self, spark):
        cells, meta = read_aaigrid(spark, REF_GRD)
        assert (meta["ncols"], meta["nrows"]) == (5, 7)
        assert meta["nodata_value"] == 132.0
        # 35 cells minus the 8 nodata (132) entries
        assert cells.count() == 35 - 8
        got = {(r.bx, r.by): r.value for r in cells.collect()}
        assert got[(0, 6)] == 107.0      # top-left of the .grd
        assert got[(0, 0)] == 156.0      # bottom-left
        assert (2, 6) not in got         # nodata hole

    def test_pipeline_from_reference_file(self, spark):
        # end-to-end: reference fixture file -> polygonize -> the
        # reference's expected 13 features (autotest/alg/polygonize.py)
        from lib_gdal_spark.operators import polygonize as pz

        cells, _ = read_aaigrid(spark, REF_GRD)
        out = pz.polygonize_rings(cells, block_bits=1).collect()
        assert len(out) == 13

    def test_center_and_dxdy_headers(self, spark, tmp_path):
        # the reference driver accepts xllcenter/yllcenter and dx/dy
        # headers (frmts/aaigrid ParseHeader); ADVICE r02: these used to
        # fall into the data lines and crash np.loadtxt
        p = str(tmp_path / "center.grd")
        with open(p, "w") as f:
            f.write("ncols 2\nnrows 2\nxllcenter 10.0\nyllcenter 20.0\n"
                    "dx 4.0\ndy 2.0\n1 2\n3 4\n")
        cells, meta = read_aaigrid(spark, p)
        assert cells.count() == 4
        # corner = center - cell/2, per axis with anisotropic dx/dy
        assert meta["xllcorner"] == 10.0 - 2.0
        assert meta["yllcorner"] == 20.0 - 1.0
        got = {(r.bx, r.by): r.value for r in cells.collect()}
        assert got[(0, 1)] == 1.0 and got[(1, 0)] == 4.0

    def test_roundtrip(self, spark, tmp_path):
        cells, meta = read_aaigrid(spark, REF_GRD)
        p = str(tmp_path / "out.grd")
        write_aaigrid(cells, p, meta)
        again, meta2 = read_aaigrid(spark, p)
        assert meta2["ncols"] == meta["ncols"]
        a = sorted((r.bx, r.by, r.value) for r in cells.collect())
        b = sorted((r.bx, r.by, r.value) for r in again.collect())
        assert a == b


class TestTiff:
    """The uncompressed-TIFF source against the reference's OWN gcore
    fixtures — byte.tif's checksum 4672 is the most-replayed golden in
    the entire reference autotest suite."""

    def test_byte_tif_checksum_4672(self, spark):
        from lib_gdal_spark.sources import read_tiff
        from lib_gdal_spark.operators import raster

        cells, meta = read_tiff(
            spark, "/root/reference/autotest/gcore/data/byte.tif")
        assert (meta["width"], meta["height"]) == (20, 20)
        cs = raster.checksum(cells, 0, 0, 20, 20).collect()[0].checksum
        assert cs == 4672  # e.g. autotest/gcore/tiff_read.py expectations

    def test_uint16_and_float32_same_raster(self, spark):
        # the reference ships the same 20x20 raster as uint16/float32;
        # both must decode to the identical cell table (checksum 4672)
        from lib_gdal_spark.sources import read_tiff
        from lib_gdal_spark.operators import raster

        for name in ("uint16", "float32"):
            cells, _ = read_tiff(
                spark, f"/root/reference/autotest/gcore/data/{name}.tif")
            cs = raster.checksum(cells, 0, 0, 20, 20).collect()[0].checksum
            assert cs == 4672, name

    def test_pat_tif_matches_hand_parse_and_nodata(self, spark):
        from lib_gdal_spark.sources import read_tiff
        from lib_gdal_spark.sources.tiff import decode_tiff

        buf = open("/root/reference/autotest/alg/data/pat.tif", "rb").read()
        ref = np.frombuffer(buf[251:251 + 625], dtype=np.uint8).reshape(25, 25)
        arr, meta = decode_tiff(buf)
        np.testing.assert_array_equal(arr, ref)
        assert meta["nodata"] == 255.0  # GDAL_NODATA ASCII tag 42113
        cells, _ = read_tiff(spark, "/root/reference/autotest/alg/data/pat.tif")
        # nodata cells are absent rows
        assert cells.count() == int((ref != 255).sum())

    def test_utmsmall_histogram_matches_reference_golden(self, spark):
        # autotest/gcore/histogram.py test_histogram_1: GetHistogram()
        # over data/utmsmall.tif — replay its FULL hardcoded 256-bucket
        # expectation through read_tiff + the distributed histogram
        # (default GDAL bins: [-0.5, 255.5) x 256 -> integer counts)
        import re
        from lib_gdal_spark.sources import read_tiff
        from lib_gdal_spark.operators import raster

        src = open("/root/reference/autotest/gcore/histogram.py").read()
        m = re.search(r"exp_hist = \[(.*?)\]", src, re.S)
        exp = [int(t) for t in m.group(1).split(",") if t.strip()]
        assert len(exp) == 256 and sum(exp) == 100 * 100
        cells, _ = read_tiff(
            spark, "/root/reference/autotest/gcore/data/utmsmall.tif")
        got = {r.bucket: r.n for r in raster.histogram(
            cells, lo=-0.5, hi=255.5, n_buckets=256).collect()}
        mine = [got.get(i + 1, 0) for i in range(256)]  # width_bucket 1-based
        assert mine == exp

    def test_byte_tif_statistics_golden(self, spark):
        # the reference's canonical byte.tif ComputeStatistics golden
        # [74, 255, 126.765, 22.9284708386757] (autotest/gdrivers/
        # ehdr.py:240 et al.); population stddev, exact integer mean
        from lib_gdal_spark.sources import read_tiff

        cells, _ = read_tiff(
            spark, "/root/reference/autotest/gcore/data/byte.tif")
        r = cells.agg(
            F.min("value").alias("mn"), F.max("value").alias("mx"),
            F.avg("value").alias("mean"),
            F.stddev_pop("value").alias("sd")).collect()[0]
        assert (r.mn, r.mx, r.mean) == (74.0, 255.0, 126.765)
        assert r.sd == pytest.approx(22.928470838675658, rel=1e-12)

    def test_gdaladdo_average_overview_golden(self, spark):
        # autotest/utilities/test_gdaladdo.py test_gdaladdo_2 (same as
        # gcore tiff_ovr_5): -r average factor 2 over nodata_byte.tif ->
        # overview checksum 1130. Nodata pixels are absent rows, so our
        # average is GDAL's valid-only average; the Byte write rounds as
        # floor(x+0.5); all-nodata blocks stay absent = the nodata value
        # 0 under the checksum
        from lib_gdal_spark.sources import read_tiff
        from lib_gdal_spark.operators import raster

        cells, meta = read_tiff(
            spark, "/root/reference/autotest/gcore/data/nodata_byte.tif")
        assert meta["nodata"] == 0.0
        ov = raster.overview(cells, "average").select(
            "bx", "by",
            F.floor(F.col("value") + 0.5).cast("double").alias("value"))
        cs = raster.checksum(ov, 0, 0, 10, 10).collect()[0].checksum
        assert cs == 1130

    def test_tiff_ovr_nearest_goldens(self, spark):
        # autotest/gcore/tiff_ovr.py tiff_ovr_check: NEAREST overviews at
        # factors 2 and 4 over the float32 twin of byte.tif -> checksums
        # 1087 (10x10) and 328 (5x5). Pins the top-left child pick (this
        # caught an upper-vs-lower child bug under the bottom-up by
        # convention).
        from lib_gdal_spark.sources import read_tiff
        from lib_gdal_spark.operators import raster

        cells, _ = read_tiff(
            spark, "/root/reference/autotest/gcore/data/float32.tif")
        ov2 = raster.overview(cells, "near")
        cs2 = raster.checksum(ov2, 0, 0, 10, 10).collect()[0].checksum
        assert cs2 == 1087
        ov4 = raster.overview(ov2, "near")
        cs4 = raster.checksum(ov4, 0, 0, 5, 5).collect()[0].checksum
        assert cs4 == 328

    def test_translate_scale_byte_to_uint16_golden(self, spark):
        # autotest/utilities/test_gdal_translate_lib.py:565-569:
        # -scale 0 255 0 65535 to UInt16 over byte.tif ->
        # ComputeRasterMinMax == (19018, 65535)
        from lib_gdal_spark.sources import read_tiff
        from lib_gdal_spark.operators import raster

        cells, _ = read_tiff(
            spark, "/root/reference/autotest/gcore/data/byte.tif")
        out = raster.scale_linear(cells, 0.0, 255.0, 0.0, 65535.0)
        r = out.agg(F.min("value"), F.max("value")).collect()[0]
        assert (r[0], r[1]) == (19018.0, 65535.0)

    def test_compressed_tiff_raises(self):
        from lib_gdal_spark.sources.tiff import decode_tiff
        import glob

        candidates = glob.glob(
            "/root/reference/autotest/gcore/data/*_deflate.tif") + [
            "/root/reference/autotest/gcore/data/byte_lzw.tif"]
        for p in candidates[:1]:
            try:
                buf = open(p, "rb").read()
            except OSError:
                continue
            with pytest.raises(NotImplementedError):
                decode_tiff(buf)

    def test_write_tiff_roundtrip_through_reference_fixture(self, spark, tmp_path):
        # read byte.tif -> write with our encoder -> read back: identical
        # cell table AND the canonical checksum 4672 survives the sink
        from lib_gdal_spark.sources import read_tiff, write_tiff
        from lib_gdal_spark.operators import raster

        cells, meta = read_tiff(
            spark, "/root/reference/autotest/gcore/data/byte.tif")
        p = str(tmp_path / "rt.tif")
        # nodata must avoid the data range (byte.tif holds 74..255 incl.
        # 255s) — 0 never occurs
        write_tiff(cells, p, width=20, height=20, dtype="u1", nodata=0.0)
        again, meta2 = read_tiff(spark, p)
        assert meta2["nodata"] == 0.0
        a = sorted((r.bx, r.by, r.value) for r in cells.collect())
        b = sorted((r.bx, r.by, r.value) for r in again.collect())
        assert a == b
        cs = raster.checksum(again, 0, 0, 20, 20).collect()[0].checksum
        assert cs == 4672

    def test_write_tiff_nodata_holes(self, spark, tmp_path):
        from lib_gdal_spark.sources import read_tiff, write_tiff

        df = spark.createDataFrame([(0, 0, 1.5), (2, 1, 7.25)],
                                   "bx long, by long, value double")
        p = str(tmp_path / "holes.tif")
        write_tiff(df, p, width=3, height=2, dtype="f8")
        back, meta = read_tiff(spark, p)
        got = {(r.bx, r.by): r.value for r in back.collect()}
        assert got == {(0, 0): 1.5, (2, 1): 7.25}  # holes stay absent
        assert meta["nodata"] == -9999.0

    def test_bmp_source_roundtrip(self, spark, tmp_path):
        from lib_gdal_spark.operators import multimodal
        from lib_gdal_spark.sources import read_bmp

        img = np.arange(36, dtype=np.uint8).reshape(3, 4, 3)
        p = str(tmp_path / "t.bmp")
        with open(p, "wb") as f:
            f.write(multimodal.encode_bmp(img))
        cells, meta = read_bmp(spark, p, band=2)  # green channel
        got = {(r.bx, r.by): r.value for r in cells.collect()}
        assert got[(0, 2)] == float(img[0, 0, 1])   # top-left -> by max
        assert got[(3, 0)] == float(img[2, 3, 1])   # bottom-right


class TestXYZ:
    def test_roundtrip_distributed(self, spark, tmp_path):
        cells = spark.range(200).select(
            (F.col("id") % 20).alias("bx"),
            (F.col("id") / 20).cast("long").alias("by"),
            (F.col("id") % 7).cast("double").alias("value"),
        )
        p = str(tmp_path / "xyz_out")
        write_xyz(cells, p, cellsize=2.5, origin=(100.0, 50.0))
        back = read_xyz(spark, p, cellsize=2.5, origin=(100.0, 50.0))
        a = sorted((r.bx, r.by, r.value) for r in cells.collect())
        b = sorted((r.bx, r.by, r.value) for r in back.collect())
        assert a == b

    def test_registration_inference(self, spark, tmp_path):
        cells = spark.range(100).select(
            (F.col("id") % 10).alias("bx"),
            (F.col("id") / 10).cast("long").alias("by"),
            F.lit(1.5).alias("value"),
        )
        p = str(tmp_path / "xyz_inf")
        write_xyz(cells, p, cellsize=0.5, origin=(10.0, 20.0))
        back = read_xyz(spark, p)  # origin/cellsize derived from data
        assert back.count() == 100
        r = back.agg(F.min("bx"), F.max("bx")).collect()[0]
        assert (r[0], r[1]) == (0, 9)

    def test_read_is_distributed(self, spark, tmp_path):
        # the scan must be a plain FileScan csv — no collect, no python
        cells = spark.range(50).select(
            (F.col("id") % 10).alias("bx"), (F.col("id") / 10).cast("long").alias("by"),
            F.lit(2.0).alias("value"))
        p = str(tmp_path / "xyz_plan")
        write_xyz(cells, p)
        plan = read_xyz(spark, p, cellsize=1.0, origin=(0.0, 0.0)) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "Scan csv" in plan or "FileScan csv" in plan, plan
        assert "Exchange" not in plan


class TestTiledPackbitsTiff:
    """The gdal #1179 partial-final-block quartet: the same 35x37 RGB
    image as PackBits tiles/strips, chunky and separate-plane — all four
    must decode identically with the reference's checksum (tiff_read.py
    init_list: band 2 -> 15234)."""

    QUARTET = ["separate_tiled.tif", "contig_tiled.tif",
               "contig_strip.tif", "seperate_strip.tif"]

    def test_band2_checksum_15234(self, spark):
        from pyspark.sql import functions as F

        from lib_gdal_spark.operators.raster import checksum
        from lib_gdal_spark.sources.tiff import decode_tiff, read_tiff

        first = None
        for name in self.QUARTET:
            path = f"/root/reference/autotest/gcore/data/{name}"
            arr, meta = decode_tiff(open(path, "rb").read())
            assert arr.shape == (3, 37, 35) and meta["bands"] == 3
            if first is None:
                first = arr
            else:
                assert (arr == first).all(), name
        # one of them through the full distributed source + checksum agg
        cells, _ = read_tiff(
            spark, "/root/reference/autotest/gcore/data/contig_tiled.tif")
        cs = checksum(
            cells.select("bx", "by", F.col("vals")[1].alias("value")),
            0, 0, 35, 37).head()[0]
        assert cs == 15234


class TestRetile:
    def test_tile_counts_and_overlap_membership(self, spark):
        from pyspark.sql import functions as F

        from lib_gdal_spark.operators.raster import retile

        # 101-wide, 32 tiles, overlap 8 -> step 24 -> 4 tiles
        # (gdal_retile.py:93-96 count formula)
        w, h, tw, ov = 101, 97, 32, 8
        cells = spark.range(w * h).select(
            (F.col("id") % w).alias("bx"),
            (F.col("id") / w).cast("long").alias("by"),
            F.lit(1.0).alias("value"))
        out = retile(cells, w, h, tw, tw, ov).cache()
        tiles = {(r["tx"], r["ty"]) for r in
                 out.select("tx", "ty").distinct().collect()}
        assert tiles == {(i, j) for i in range(1, 5) for j in range(1, 5)}
        # raster column rx=24..31 sits in BOTH tile 1 (0..31) and
        # tile 2 (24..55)
        got = sorted(r["tx"] for r in out.filter(
            (F.col("bx") == 28) & (F.col("by") == h - 1)).collect())
        assert got == [1, 2]
        # last tile is clipped: its cells reach rx = 100 (offset 72)
        mx = out.filter(F.col("tx") == 4).agg(
            F.max("bx"), F.min("bx")).head()
        assert (mx[0], mx[1]) == (100, 72)
        # total duplication = sum over cells of covering-tile counts
        per_cell = out.groupBy("bx", "by").count()
        assert per_cell.agg(F.max("count")).head()[0] == 4  # corner overlap
        out.unpersist()


class TestPng:
    """Pure-stdlib PNG source vs the reference's OWN autotest goldens
    (autotest/gdrivers/png.py + gcore/tiff_read.py:215 — the PNG and
    TIFF stefan fixtures hold identical pixels)."""

    REF = "/root/reference/autotest/gdrivers/data/png"

    def _cs(self, band):
        from lib_gdal_spark.operators.raster import CHECKSUM_PRIMES
        p = np.array(CHECKSUM_PRIMES, dtype=np.int64)
        h, w = band.shape
        idx = (np.arange(h * w) % 11).reshape(h, w)
        return int((band.astype(np.int64) % p[idx]).sum() & 0xFFFF)

    def test_palette_checksum_57921(self, spark):
        # GDALTest("PNG", "png/test.png", 1, 57921): 8-bit palette,
        # band 1 = indices — through the DISTRIBUTED checksum aggregate
        from lib_gdal_spark.operators import raster
        from lib_gdal_spark.sources import read_png

        cells, meta = read_png(spark, f"{self.REF}/test.png")
        assert (meta["width"], meta["height"]) == (400, 400)
        assert meta["color_type"] == 3 and meta["palette"] is not None
        cs = raster.checksum(cells, 0, 0, 400, 400).collect()[0].checksum
        assert cs == 57921

    def test_uint16_interlaced_checksum_4672(self):
        # test_png_read_interlace_16_bit: 16-bit + Adam7 in one golden
        from lib_gdal_spark.sources import decode_png

        arr, meta = decode_png(
            open(f"{self.REF}/uint16_interlaced.png", "rb").read())
        assert meta["depth"] == 16 and meta["interlace"] == 1
        assert self._cs(arr) == 4672

    def test_stefan_rgba_quartet(self):
        # gcore/tiff_read.py:215 expects [12603, 58561, 36064, 10807]
        # for stefan_full_rgba — the PNG twin must decode identically
        # (8-bit RGBA, Adam7, all five filter types exercised)
        from lib_gdal_spark.sources import decode_png

        arr, meta = decode_png(open(
            "/root/reference/autotest/gcore/data/stefan_full_rgba.png",
            "rb").read())
        assert arr.shape == (4, 150, 162) and meta["interlace"] == 1
        assert [self._cs(arr[b]) for b in range(4)] == \
            [12603, 58561, 36064, 10807]

    def test_roundtrip_rgba_and_gray16(self):
        from lib_gdal_spark.sources import decode_png, encode_png

        rng = np.random.RandomState(7)
        rgba = rng.randint(0, 255, (13, 17, 4)).astype(np.uint8)
        back, meta = decode_png(encode_png(rgba))
        assert meta["color_type"] == 6
        np.testing.assert_array_equal(np.transpose(back, (1, 2, 0)), rgba)

        g16 = rng.randint(0, 65535, (9, 5)).astype(np.uint16)
        b16, meta16 = decode_png(encode_png(g16))
        assert meta16["depth"] == 16
        np.testing.assert_array_equal(b16, g16)

    def test_subbyte_gray(self):
        # 1/2/4-bit unpacking against hand-built scanlines
        import struct
        import zlib

        from lib_gdal_spark.sources import decode_png

        def make(depth, w, h, packed_rows):
            sig = b"\x89PNG\r\n\x1a\n"
            ihdr = struct.pack(">IIBBBBB", w, h, depth, 0, 0, 0, 0)
            raw = b"".join(b"\x00" + r for r in packed_rows)

            def chunk(t, p):
                return (struct.pack(">I", len(p)) + t + p
                        + struct.pack(">I", zlib.crc32(t + p)))
            return (sig + chunk(b"IHDR", ihdr)
                    + chunk(b"IDAT", zlib.compress(raw))
                    + chunk(b"IEND", b""))

        # 1-bit, 10 px wide: bits 1100110011 -> 0b11001100 0b11......
        arr, _ = decode_png(make(1, 10, 1, [bytes([0b11001100, 0b11000000])]))
        np.testing.assert_array_equal(
            arr[0], [1, 1, 0, 0, 1, 1, 0, 0, 1, 1])
        # 4-bit, 3 px: 0xA 0x5 0xF
        arr4, _ = decode_png(make(4, 3, 1, [bytes([0xA5, 0xF0])]))
        np.testing.assert_array_equal(arr4[0], [10, 5, 15])


class TestGeoJSON:
    FEATS = [
        '{"type":"Feature","id":7,"geometry":{"type":"Point",'
        '"coordinates":[1.5,2.5]},"properties":{"name":"a","pop":3}}',
        '\x1e{"type":"Feature","geometry":{"type":"LineString",'
        '"coordinates":[[0,0],[2,1],[4,0]]},"properties":{"name":"b"}}',
        '{"type":"Feature","geometry":{"type":"Polygon","coordinates":'
        '[[[0,0],[4,0],[4,4],[0,4],[0,0]],[[1,1],[2,1],[2,2],[1,2],[1,1]]]},'
        '"properties":null}',
    ]

    def _seq_file(self, tmp_path):
        p = tmp_path / "feats.geojsonl"
        p.write_text("\n".join(self.FEATS) + "\n")
        return str(p)

    def test_seq_read(self, spark, tmp_path):
        from lib_gdal_spark.geo import wkb as wkbmod
        from lib_gdal_spark.sources import read_geojson_seq

        df = read_geojson_seq(spark, self._seq_file(tmp_path))
        rows = {r.kind: r for r in df.collect()}
        assert set(rows) == {"point", "linestring", "polygon"}
        pt = rows["point"]
        assert (pt.fid, pt.xmin, pt.ymax) == (7, 1.5, 2.5)
        assert wkbmod.decode(bytes(pt.wkb)) == ("point", (1.5, 2.5))
        ls = rows["linestring"]  # RS-prefixed line parsed fine
        assert (ls.fid, ls.xmin, ls.xmax, ls.ymin, ls.ymax) == (None, 0, 4, 0, 1)
        pg = rows["polygon"]
        kind, ringdata = wkbmod.decode(bytes(pg.wkb))
        assert kind == "polygon" and len(ringdata) == 2
        assert pg.properties == "{}"
        # properties reachable via get_json_object (HSTORE pattern)
        got = (df.filter(F.col("kind") == "point")
                 .select(F.get_json_object("properties", "$.name")).first()[0])
        assert got == "a"

    def test_whole_file_read_orders_fids(self, spark, tmp_path):
        from lib_gdal_spark.sources import read_geojson

        fc = ('{"type":"FeatureCollection","features":[' +
              ",".join(f.lstrip("\x1e") for f in self.FEATS) + "]}")
        p = tmp_path / "fc.geojson"
        p.write_text(fc)
        df = read_geojson(spark, str(p))
        got = sorted((r.fid, r.kind) for r in df.collect())
        # feature "id" wins where integer, else document order
        assert got == [(1, "linestring"), (2, "polygon"), (7, "point")]

    def test_seq_roundtrip(self, spark, tmp_path):
        from lib_gdal_spark.sources import read_geojson_seq, write_geojson_seq

        df = read_geojson_seq(spark, self._seq_file(tmp_path))
        out = str(tmp_path / "rt")
        write_geojson_seq(df, out)
        back = read_geojson_seq(spark, out)
        a = sorted((r.kind, bytes(r.wkb), r.properties, r.xmin, r.ymax)
                   for r in df.collect())
        b = sorted((r.kind, bytes(r.wkb), r.properties, r.xmin, r.ymax)
                   for r in back.collect())
        assert a == b

    def test_multi_and_collection_geometries(self):
        from lib_gdal_spark.geo import wkb as wkbmod
        from lib_gdal_spark.sources.geojson import geometry_to_wkb

        mp = {"type": "MultiPoint", "coordinates": [[0, 1], [2, 3]]}
        kind, buf, flat = geometry_to_wkb(mp)
        k, pts = wkbmod.decode(buf)
        assert (kind, k) == ("multipoint", "multipoint")
        np.testing.assert_array_equal(pts, [[0, 1], [2, 3]])

        ml = {"type": "MultiLineString",
              "coordinates": [[[0, 0], [1, 1]], [[2, 2], [3, 3], [4, 4]]]}
        kind, buf, flat = geometry_to_wkb(ml)
        k, lines = wkbmod.decode(buf)
        assert k == "multilinestring" and [len(l) for l in lines] == [2, 3]
        assert flat.shape == (5, 2)

        gc = {"type": "GeometryCollection", "geometries": [
            {"type": "Point", "coordinates": [9, 9]}, mp]}
        kind, buf, flat = geometry_to_wkb(gc)
        k, subs = wkbmod.decode(buf)
        assert k == "collection" and subs[0] == ("point", (9.0, 9.0))
        assert subs[1][0] == "multipoint" and flat.shape == (3, 2)


class TestGeoCSV:
    def test_wkt_mode(self, spark, tmp_path):
        from lib_gdal_spark.geo import wkb as wkbmod
        from lib_gdal_spark.sources import read_geocsv

        p = tmp_path / "v.csv"
        p.write_text(
            'id,name,wkt\n'
            '1,a,"POINT (3 4)"\n'
            '2,b,"POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"\n'
            '3,c,\n')
        df = read_geocsv(spark, str(p), wkt_col="wkt")
        rows = {r.id: r for r in df.collect()}
        assert rows[1].kind == "point" and rows[1].name == "a"
        assert wkbmod.decode(bytes(rows[1].wkb)) == ("point", (3.0, 4.0))
        assert (rows[2].xmin, rows[2].ymin, rows[2].xmax, rows[2].ymax) == \
            (0.0, 0.0, 2.0, 2.0)
        assert rows[3].kind is None and rows[3].wkb is None

    def test_xy_mode(self, spark, tmp_path):
        from lib_gdal_spark.sources import read_geocsv

        p = tmp_path / "pts.csv"
        p.write_text("station,lon,lat\ns1,10.5,-2.25\ns2,-7.0,44.0\n")
        df = read_geocsv(spark, str(p), x_col="lon", y_col="lat")
        rows = {r.station: r for r in df.collect()}
        assert rows["s1"].kind == "point"
        assert (rows["s1"].xmin, rows["s1"].ymax) == (10.5, -2.25)
        assert (rows["s2"].xmin, rows["s2"].ymax) == (-7.0, 44.0)

    def test_wkt_roundtrip(self, spark, tmp_path):
        from lib_gdal_spark.sources import read_geocsv, write_geocsv

        p = tmp_path / "v.csv"
        p.write_text('id,wkt\n1,"POINT (3 4)"\n'
                     '2,"LINESTRING (0 0, 5 5, 10 0)"\n')
        df = read_geocsv(spark, str(p), wkt_col="wkt")
        out = str(tmp_path / "rt")
        write_geocsv(df, out, wkt_col="wkt")
        back = read_geocsv(spark, out, wkt_col="wkt")
        a = sorted((r.id, r.kind, bytes(r.wkb)) for r in df.collect())
        b = sorted((r.id, r.kind, bytes(r.wkb)) for r in back.collect())
        assert a == b

    def test_mode_arg_validation(self, spark):
        import pytest as _pt
        from lib_gdal_spark.sources import read_geocsv

        with _pt.raises(ValueError):
            read_geocsv(spark, "/nonexistent.csv")
        with _pt.raises(ValueError):
            read_geocsv(spark, "/nonexistent.csv", wkt_col="w", x_col="x",
                        y_col="y")


class TestGeoJSONStream:
    def test_stream_equals_batch(self, spark, tmp_path):
        from lib_gdal_spark.sources import (read_geojson_seq,
                                            read_geojson_seq_stream)

        src = tmp_path / "seq_src"
        src.mkdir()
        (src / "f0.geojsonl").write_text("\n".join(
            '{"type":"Feature","geometry":{"type":"Point",'
            f'"coordinates":[{i},{i + 1}]}},"properties":{{"i":{i}}}}}'
            for i in range(20)) + "\n")
        batch = read_geojson_seq(spark, str(src)).collect()
        stream = read_geojson_seq_stream(spark, str(src))
        assert stream.isStreaming
        q = (stream.writeStream.format("memory")
             .queryName("t_geojson_stream").outputMode("append").start())
        try:
            q.processAllAvailable()
            got = spark.sql("SELECT * FROM t_geojson_stream").collect()
        finally:
            q.stop()
        a = sorted((r.kind, bytes(r.wkb), r.properties) for r in batch)
        b = sorted((r.kind, bytes(r.wkb), r.properties) for r in got)
        assert a == b and len(a) == 20


class TestShapefileWriter:
    def _roundtrip(self, feats, tmp_path):
        from lib_gdal_spark.sources import shapefile as shp
        p = str(tmp_path / "rt.shp")
        shp.write_shapefile(feats, p)
        return shp.read_shapefile(p)

    def test_point_with_attrs_roundtrip(self, tmp_path):
        feats = [
            {"NAME": "alpha", "VAL": 12.5,
             "geom": {"type": 1, "points": [(1.25, -2.5)]}},
            {"NAME": "beta", "VAL": None,
             "geom": {"type": 1, "points": [(3.0, 4.0)]}},
        ]
        back = self._roundtrip(feats, tmp_path)
        assert [f["geom"] for f in back] == [f["geom"] for f in feats]
        assert back[0]["NAME"] == "alpha" and back[0]["VAL"] == 12.5
        assert back[1]["VAL"] is None

    def test_polygon_polyline_multipoint_roundtrip(self, tmp_path):
        ring = [(0.0, 0.0), (0.0, 2.0), (2.0, 2.0), (2.0, 0.0), (0.0, 0.0)]
        hole = [(0.5, 0.5), (1.5, 0.5), (1.5, 1.5), (0.5, 1.5), (0.5, 0.5)]
        feats = [{"geom": {"type": 5, "parts": [ring, hole]}}]
        assert self._roundtrip(feats, tmp_path)[0]["geom"] == feats[0]["geom"]
        feats = [{"geom": {"type": 3,
                           "parts": [[(0.0, 0.0), (1.0, 1.0), (2.0, 0.5)]]}}]
        assert self._roundtrip(feats, tmp_path)[0]["geom"] == feats[0]["geom"]
        feats = [{"geom": {"type": 8,
                           "points": [(0.0, 0.0), (5.0, -5.0)]}}]
        assert self._roundtrip(feats, tmp_path)[0]["geom"] == feats[0]["geom"]

    def test_reference_fixture_rewrite_stable(self, tmp_path):
        # read a shapefile produced by the reference itself, rewrite it
        # with our writer, re-read: geometries must survive bit-exactly
        # (doubles pass through struct untouched) and numeric attrs to
        # the N(24,15) contract
        import glob
        from lib_gdal_spark.sources import shapefile as shp
        cands = sorted(glob.glob(
            "/root/reference/autotest/utilities/data/path.shp") + glob.glob(
            "/root/reference/autotest/ogr/data/shp/*.shp"))
        src = next(p for p in cands if "empty" not in p)
        orig = shp.read_shapefile(src)
        out = str(tmp_path / "rw.shp")
        shp.write_shapefile(orig, out)
        back = shp.read_shapefile(out)
        assert [f["geom"] for f in back] == [f["geom"] for f in orig]

    def test_field_name_laundering_and_collisions(self, tmp_path):
        # 10-char-truncation collisions uniquify (no silent attr loss);
        # non-ascii names ASCII-ize instead of crashing mid-write
        feats = [{"LONGFIELDAA": 1.0, "LONGFIELDAB": 2.0, "naïve": 3.0,
                  "geom": {"type": 1, "points": [(0.0, 0.0)]}}]
        back = self._roundtrip(feats, tmp_path)[0]
        vals = sorted(v for k, v in back.items() if k != "geom")
        assert vals == [1.0, 2.0, 3.0]
        assert len([k for k in back if k != "geom"]) == 3

    def test_empty_parts_write_null_shape(self, tmp_path):
        # read_shp can produce {'type': 5, 'parts': []} from an
        # nparts=0 record; writing it back must emit a Null shape, not
        # crash on min() of an empty sequence
        feats = [{"geom": {"type": 5, "parts": []}},
                 {"geom": {"type": 1, "points": [(1.0, 2.0)]}}]
        back = self._roundtrip(feats, tmp_path)
        assert back[0]["geom"] == {"type": 0}
        assert back[1]["geom"] == feats[1]["geom"]

    def test_mixed_geometry_types_raise(self, tmp_path):
        from lib_gdal_spark.sources import shapefile as shp
        feats = [{"geom": {"type": 1, "points": [(0.0, 0.0)]}},
                 {"geom": {"type": 5, "parts": [[(0.0, 0.0), (1.0, 0.0),
                                                 (0.0, 1.0), (0.0, 0.0)]]}}]
        import pytest
        with pytest.raises(ValueError, match="ONE shape type"):
            shp.write_shapefile(feats, str(tmp_path / "mix.shp"))


class TestGeoPackage:
    """GeoPackage source/sink (sources/geopackage.py) against the
    reference's own .gpkg fixtures (ogr/ogrsf_frmts/gpkg/ GPB header
    semantics, GPkgHeaderFromWKB)."""

    FIX = "/root/reference/autotest/ogr/data/gpkg"

    def test_poly_golden_read(self, spark):
        from lib_gdal_spark.geo import wkb
        from lib_gdal_spark.sources import geopackage as gp

        p = f"{self.FIX}/poly_golden.gpkg"
        assert gp.list_layers(p) == ["poly"]
        df = gp.read_gpkg(spark, p)
        rows = df.orderBy("fid").collect()
        assert len(rows) == 10
        # schema: fid + attributes + geometry convention columns
        assert df.schema.simpleString() == (
            "struct<fid:bigint,AREA:double,EAS_ID:bigint,PRFEDEA:string,"
            "wkb:binary,xmin:double,ymin:double,xmax:double,ymax:double>")
        kinds = {wkb.decode(bytes(r.wkb))[0] for r in rows}
        assert kinds == {"polygon"}
        # the classic poly.shp first feature: area 215229.266, EAS 168
        assert rows[0].AREA == 215229.266 and rows[0].EAS_ID == 168
        # envelopes materialized and ordered
        assert all(r.xmin <= r.xmax and r.ymin <= r.ymax for r in rows)

    def test_envelope_header_vs_computed(self, spark):
        from lib_gdal_spark.sources import geopackage as gp

        with_env = gp.read_gpkg(
            spark, f"{self.FIX}/2d_envelope.gpkg").collect()
        no_env = gp.read_gpkg(
            spark, f"{self.FIX}/no_envelope.gpkg").collect()
        # same geometries either way: header envelope == computed one
        a = sorted((bytes(r.wkb), r.xmin, r.ymin, r.xmax, r.ymax)
                   for r in with_env)
        b = sorted((bytes(r.wkb), r.xmin, r.ymin, r.xmax, r.ymax)
                   for r in no_env)
        assert a == b

    def test_null_geometry_rows_survive(self, spark):
        from lib_gdal_spark.sources import geopackage as gp

        df = gp.read_gpkg(spark, f"{self.FIX}/first_geometry_null.gpkg")
        rows = df.orderBy("fid").collect()
        assert len(rows) == 2
        assert rows[0].wkb is None and rows[0].xmin is None
        assert rows[1].wkb is not None

    def test_roundtrip_write_read(self, spark, tmp_path):
        from lib_gdal_spark.sources import geopackage as gp

        src = gp.read_gpkg(spark, f"{self.FIX}/poly_golden.gpkg")
        out = str(tmp_path / "rt.gpkg")
        n = gp.write_gpkg(src.drop("xmin", "ymin", "xmax", "ymax"), out,
                          layer="poly")
        assert n == 10
        back = gp.read_gpkg(spark, out)
        a = sorted((r.fid, bytes(r.wkb), r.AREA, r.EAS_ID, r.PRFEDEA)
                   for r in src.collect())
        b = sorted((r.fid, bytes(r.wkb), r.AREA, r.EAS_ID, r.PRFEDEA)
                   for r in back.collect())
        assert a == b

    def test_gpb_codec_units(self):
        from lib_gdal_spark.geo import wkb
        from lib_gdal_spark.sources.geopackage import encode_gpb, parse_gpb

        w = wkb.encode_point(3.0, 4.0)
        blob = encode_gpb(w, srs_id=4326)
        got, env, empty = parse_gpb(blob)
        assert got == w and env is None and not empty
        import pytest as _pt
        with _pt.raises(ValueError):
            parse_gpb(b"XX" + blob[2:])


class TestArrowIpc:
    """Arrow IPC source/sink (sources/arrowipc.py) — the reference's
    Arrow/Feather driver layouts (ogr/ogrsf_frmts/arrow/): Feather V2
    (ARROW1 file magic) AND bare IPC streams."""

    def test_roundtrip_per_partition_files(self, spark, tmp_path):
        from lib_gdal_spark.sources import arrowipc as ai

        src = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
        out = str(tmp_path / "ipc")
        n_files = ai.write_arrow_ipc(src.repartition(3), out)
        assert n_files == 3
        back = ai.read_arrow_ipc(spark, out)
        assert back.schema == src.schema or \
            back.schema.simpleString() == src.schema.simpleString()
        assert sorted(map(str, back.collect())) == \
            sorted(map(str, src.collect()))

    def test_stream_format_and_array_columns(self, spark, tmp_path):
        import pyarrow as pa

        from lib_gdal_spark.sources import arrowipc as ai

        emb = spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet")
        out = str(tmp_path / "emb")
        ai.write_arrow_ipc(emb, out)
        back = ai.read_arrow_ipc(spark, out)
        assert "array<float>" in back.schema.simpleString()
        assert back.count() == emb.count()

        # bare IPC stream (no ARROW1 footer) reads through the same API
        tbl = pa.Table.from_pandas(emb.limit(7).toPandas(),
                                   preserve_index=False)
        sp = str(tmp_path / "s.arrows")
        with pa.OSFile(sp, "wb") as s:
            with pa.ipc.new_stream(s, tbl.schema) as w:
                w.write_table(tbl)
        assert ai.read_arrow_ipc(spark, sp).count() == 7


class TestGeoPackageRaster:
    """read_gpkg_raster: GPKG tile pyramid -> cell grid, replaying the
    reference's own byte.gpkg (the classic 20x20 byte.tif re-tiled into
    one 256x256 PNG tile) — content-window crop + checksum 4672."""

    def test_byte_gpkg_checksum_and_tiff_equality(self, spark):
        from lib_gdal_spark.operators import raster
        from lib_gdal_spark.sources import geopackage as gp
        from lib_gdal_spark.sources.tiff import read_tiff

        df = gp.read_gpkg_raster(
            spark, "/root/reference/autotest/gdrivers/data/gpkg/byte.gpkg")
        assert df.count() == 400  # 20x20 window, padding cropped
        cs = raster.checksum(df, 0, 0, 20, 20).head().checksum
        assert cs == 4672  # GDALChecksumImage golden for byte.*

        # pixel-exact vs the SAME raster through the TIFF source
        tif, _ = read_tiff(
            spark, "/root/reference/autotest/gcore/data/byte.tif")
        a = {(r.bx, r.by): r.value for r in df.collect()}
        b = {(r.bx, r.by): r.value for r in tif.collect()}
        assert a == b


class TestMBTiles:
    def _tiles_df(self, spark):
        rows = [(2, 0, 0, bytes([1, 2, 3])), (2, 3, 1, bytes([4])),
                (3, 5, 7, bytes([9, 9])), (2, 1, 3, b"\x00" * 5)]
        return spark.createDataFrame(
            rows, "z int, x long, y long, data binary")

    def test_roundtrip_xyz(self, spark, tmp_path):
        from lib_gdal_spark.sources import mbtiles as mb

        p = str(tmp_path / "t.mbtiles")
        n = mb.write_mbtiles(self._tiles_df(spark), p, name="t",
                             fmt="png", bounds=(-180, -85, 180, 85))
        assert n == 4
        back = {(r.z, r.x, r.y): bytes(r.data)
                for r in mb.read_mbtiles(spark, p).collect()}
        assert back[(2, 0, 0)] == bytes([1, 2, 3])
        assert back[(3, 5, 7)] == bytes([9, 9])
        assert len(back) == 4

    def test_tms_flip_on_disk(self, spark, tmp_path):
        # the file must store TMS rows ((1<<z)-1-y,
        # mbtilesdataset.cpp:1852) even though the DataFrame is XYZ
        import sqlite3

        from lib_gdal_spark.sources import mbtiles as mb

        p = str(tmp_path / "t.mbtiles")
        mb.write_mbtiles(self._tiles_df(spark), p)
        con = sqlite3.connect(p)
        rows = set(con.execute(
            "SELECT zoom_level, tile_column, tile_row FROM tiles"))
        con.close()
        assert (2, 0, 3) in rows      # y=0 -> tms row 3
        assert (3, 5, 0) in rows      # y=7 at z=3 -> tms row 0
        assert (2, 1, 0) in rows      # y=3 -> tms row 0

    def test_metadata_required_keys(self, spark, tmp_path):
        # reference writer's required metadata rows
        # (mbtilesdataset.cpp:3047-3085) + computed minzoom/maxzoom
        from lib_gdal_spark.sources import mbtiles as mb

        p = str(tmp_path / "t.mbtiles")
        mb.write_mbtiles(self._tiles_df(spark), p, name="nm", fmt="png")
        meta = mb.read_metadata(p)
        for k in ("name", "type", "description", "version", "format"):
            assert k in meta
        assert meta["name"] == "nm"
        assert (meta["minzoom"], meta["maxzoom"]) == ("2", "3")
        assert mb.zoom_levels(p) == [2, 3]

    def test_zoom_filter_and_empty(self, spark, tmp_path):
        from lib_gdal_spark.sources import mbtiles as mb

        p = str(tmp_path / "t.mbtiles")
        mb.write_mbtiles(self._tiles_df(spark), p)
        only2 = mb.read_mbtiles(spark, p, zoom=2)
        assert only2.count() == 3
        empty = mb.read_mbtiles(spark, p, zoom=9)
        assert empty.count() == 0


class TestPMTiles:
    def test_tile_id_spec_values(self):
        # the published v3 spec's own id ladder: z0 -> 0; z1 quadrant
        # order (0,0)=1,(0,1)=2,(1,1)=3,(1,0)=4
        import numpy as np

        from lib_gdal_spark.sources import pmtiles as pm

        assert pm.tile_id_np([0], [0], [0])[0] == 0
        z = [1, 1, 1, 1]
        ids = pm.tile_id_np(z, [0, 0, 1, 1], [0, 1, 1, 0])
        assert ids.tolist() == [1, 2, 3, 4]
        # base offsets: first id of z equals sum(4^k, k<z)
        assert pm.tile_id_np([3], [0], [0])[0] == 21

    def test_tile_id_roundtrip(self):
        import numpy as np

        from lib_gdal_spark.sources import pmtiles as pm

        rng = np.random.RandomState(3)
        for z in (2, 5, 11):
            x = rng.randint(0, 1 << z, 50)
            y = rng.randint(0, 1 << z, 50)
            ids = pm.tile_id_np(np.full(50, z), x, y)
            back = [pm.tile_id_to_zxy(int(t)) for t in ids]
            assert back == list(zip([z] * 50, x.tolist(), y.tolist()))

    def _tiles_df(self, spark, n=6):
        rows = [(2, i % 4, (i * 3) % 4, bytes([i]) * (i + 1))
                for i in range(n)]
        # dedup on (z,x,y)
        seen, uniq = set(), []
        for r in rows:
            if r[:3] not in seen:
                seen.add(r[:3])
                uniq.append(r)
        return spark.createDataFrame(
            uniq, "z int, x long, y long, data binary"), uniq

    def test_roundtrip(self, spark, tmp_path):
        from lib_gdal_spark.sources import pmtiles as pm

        df, uniq = self._tiles_df(spark)
        p = str(tmp_path / "t.pmtiles")
        n = pm.write_pmtiles(df, p, metadata={"name": "t"})
        assert n == len(uniq)
        back = {(r.z, r.x, r.y): bytes(r.data)
                for r in pm.read_pmtiles(spark, p).collect()}
        assert back == {(z, x, y): d for z, x, y, d in uniq}
        assert pm.read_metadata(p) == {"name": "t"}
        h = pm.read_header(p)
        assert h["clustered"] and h["n_tiles"] == len(uniq)
        assert h["min_zoom"] == h["max_zoom"] == 2

    def test_leaf_directories(self, spark, tmp_path):
        from lib_gdal_spark.sources import pmtiles as pm

        rows = [(4, i % 16, i // 16, bytes([i % 251]))
                for i in range(150)]
        df = spark.createDataFrame(rows, "z int, x long, y long, "
                                         "data binary")
        p = str(tmp_path / "leaf.pmtiles")
        pm.write_pmtiles(df, p, leaf_split=32)
        h = pm.read_header(p)
        assert h["leaf_len"] > 0
        back = {(r.z, r.x, r.y): bytes(r.data)
                for r in pm.read_pmtiles(spark, p).collect()}
        assert back == {(z, x, y): d for z, x, y, d in rows}

    def test_zoom_filter(self, spark, tmp_path):
        from lib_gdal_spark.sources import pmtiles as pm

        rows = [(1, 0, 0, b"a"), (2, 1, 1, b"b"), (2, 3, 0, b"c")]
        df = spark.createDataFrame(rows, "z int, x long, y long, "
                                         "data binary")
        p = str(tmp_path / "zf.pmtiles")
        pm.write_pmtiles(df, p)
        assert pm.read_pmtiles(spark, p, zoom=2).count() == 2
        assert pm.read_pmtiles(spark, p, zoom=7).count() == 0


class TestFpPredictorStride:
    """libtiff tif_predict.c fpDiff/fpAcc use stride = samples-per-pixel
    for chunky multi-sample data: byte lane k only accumulates bytes at
    positions ≡ k (mod stride). A stride-1 decode of stride-2-encoded
    rows produces garbage floats (NaN/denormals)."""

    @staticmethod
    def _fp_diff_row(row_f32, stride):
        # libtiff fpDiff: split the row's samples into big-endian byte
        # planes (MSB plane first), then horizontal byte differencing
        # with the given stride.
        import numpy as np
        nsamp = row_f32.size
        be = np.frombuffer(row_f32.astype(">f4").tobytes(), np.uint8)
        planes = be.reshape(nsamp, 4).T.reshape(-1).astype(np.int64)
        out = planes.copy()
        out[stride:] -= planes[:-stride]
        return (out & 0xFF).astype(np.uint8).tobytes()

    def _build_tiff(self, arr):
        # minimal little-endian classic TIFF: one deflate strip, chunky,
        # float32, predictor 3
        import struct
        import zlib

        import numpy as np
        spp, h, w = arr.shape
        chunky = arr.transpose(1, 2, 0)  # (h, w, spp)
        strip = b"".join(self._fp_diff_row(
            np.ascontiguousarray(chunky[y]).reshape(-1), spp)
            for y in range(h))
        comp = zlib.compress(strip)
        ntags = 11
        ifd_off = 8
        data_off = ifd_off + 2 + 12 * ntags + 4
        tags = [
            (256, 3, 1, w), (257, 3, 1, h),
            (258, 3, spp, int.from_bytes(
                struct.pack("<" + "H" * spp, *([32] * spp))[:4], "little")),
            (259, 3, 1, 8),  # deflate
            (273, 4, 1, data_off), (277, 3, 1, spp),
            (278, 3, 1, h), (279, 4, 1, len(comp)),
            (284, 3, 1, 1), (317, 3, 1, 3),
            (339, 3, spp, int.from_bytes(
                struct.pack("<" + "H" * spp, *([3] * spp))[:4], "little")),
        ]
        buf = struct.pack("<2sHI", b"II", 42, ifd_off)
        buf += struct.pack("<H", ntags)
        for tag, typ, cnt, val in tags:
            buf += struct.pack("<HHII", tag, typ, cnt, val)
        buf += struct.pack("<I", 0)
        assert len(buf) == data_off
        return buf + comp

    def test_chunky_spp2_roundtrip(self):
        import numpy as np

        from lib_gdal_spark.sources.tiff import decode_tiff

        rng = np.random.default_rng(7)
        arr = (rng.standard_normal((2, 5, 9)) * 100).astype(np.float32)
        got, meta = decode_tiff(self._build_tiff(arr))
        assert meta["bands"] == 2
        assert got.shape == (2, 5, 9) and got.dtype == np.float32
        assert np.array_equal(got, arr)
        assert np.isfinite(got).all()

    def test_spp1_unchanged(self):
        import numpy as np

        from lib_gdal_spark.sources.tiff import decode_tiff

        arr = np.linspace(-3.0, 7.0, 24).astype(
            np.float32).reshape(1, 4, 6)
        got, _ = decode_tiff(self._build_tiff(arr))
        assert np.array_equal(got, arr[0])
