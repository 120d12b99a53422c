"""FlatGeobuf codec (sources/flatgeobuf.py) — replays the reference's
own fixtures (autotest/ogr/data/testfgb/*.fgb, expectations from
autotest/ogr/ogr_flatgeobuf.py) and round-trips the writer through the
fixture-validated reader."""

import numpy as np
import pytest

from lib_gdal_spark.sources import flatgeobuf as FGB

TESTFGB = "/root/reference/autotest/ogr/data/testfgb"


class TestReaderFixtures:
    def test_poly_header_and_extent(self):
        # ogr_flatgeobuf.py:134 — GetExtent golden + feature count 10
        hdr, feats = FGB.read_fgb(f"{TESTFGB}/poly.fgb")
        assert hdr["name"] == "poly"
        assert hdr["geometry_type"] == "polygon"
        assert hdr["features_count"] == 10 and len(feats) == 10
        assert hdr["envelope"] == [478315.53125, 4762880.5,
                                   481645.3125, 4765610.5]
        assert hdr["columns"] == [("AREA", "double"), ("EAS_ID", "long"),
                                  ("PRFEDEA", "string")]
        assert feats[0]["EAS_ID"] == 158
        assert feats[0]["AREA"] == 1634833.375

    def test_poly_spatial_filter_counts(self):
        # ogr_flatgeobuf.py:155 — rect (479586.0, 4764618.6, 479808.2,
        # 4764797.8): 5 features by bbox, 4 by exact intersection
        from lib_gdal_spark.geo import clip
        hdr, feats = FGB.read_fgb(f"{TESTFGB}/poly.fgb")
        bb, offs = hdr["leaves"]
        rect = (479586.0, 4764618.6, 479808.2, 4764797.8)
        keep = ~((bb[:, 2] < rect[0]) | (bb[:, 0] > rect[2])
                 | (bb[:, 3] < rect[1]) | (bb[:, 1] > rect[3]))
        assert int(keep.sum()) == 5            # without GEOS
        rectpoly = [np.array([[rect[0], rect[1]], [rect[2], rect[1]],
                              [rect[2], rect[3]], [rect[0], rect[3]],
                              [rect[0], rect[1]]])]
        n_exact = sum(
            1 for f, k in zip(feats, keep) if k and clip.relate(
                "polygon", [np.asarray(r) for r in f["geometry"][1]],
                "polygon", rectpoly, "intersects"))
        assert n_exact == 4                    # with GEOS

    def test_poly_no_index_same_features(self):
        h1, f1 = FGB.read_fgb(f"{TESTFGB}/poly.fgb")
        h2, f2 = FGB.read_fgb(f"{TESTFGB}/poly_no_index.fgb")
        assert h2["index_node_size"] == 0 and h2["leaves"] is None
        assert len(f2) == len(f1)
        # the indexed file is Hilbert-sorted; same feature SET
        assert sorted(f["EAS_ID"] for f in f2) == \
            sorted(f["EAS_ID"] for f in f1)

    def test_testdatatypes(self):
        # ogr_flatgeobuf.py test_ogr_flatgeobuf_datatypes (raw ISO form
        # of the datetime; OGR renders it as '2019/10/15 ... +00')
        _h, feats = FGB.read_fgb(f"{TESTFGB}/testdatatypes.fgb")
        f = feats[0]
        assert f["int"] == 1
        assert f["int64"] == 1234567890123
        assert f["double"] == 1.25
        assert f["string"] == "my string"
        assert f["datetime"] == "2019-10-15T12:34:56.789Z"

    def test_alldatatypes(self):
        # ogr_flatgeobuf.py test_ogr_flatgeobuf_alldatatypes — all 15
        # column types of the spec
        _h, feats = FGB.read_fgb(f"{TESTFGB}/alldatatypes.fgb")
        f = feats[0]
        assert f["byte"] == -1 and f["ubyte"] == 255
        assert f["bool"] is True
        assert f["short"] == -1 and f["ushort"] == 65535
        assert f["int"] == -1 and f["uint"] == 2**32 - 1
        assert f["long"] == -1 and f["ulong"] == 2**64 - 1
        assert f["float"] == 0.0 and f["double"] == 0.0
        assert f["string"] == "X" and f["json"] == "X"
        assert f["datetime"] == "2020-02-29T12:34:56Z"
        assert f["binary"] == b"X"

    def test_single_item_index_skip(self):
        # packedrtree generateLevelBounds is a DO-while: 1 item still
        # adds a root level (the alldatatypes fixture has exactly 1
        # feature AND an index — a wrong skip reads feature length 0)
        hdr, feats = FGB.read_fgb(f"{TESTFGB}/alldatatypes.fgb")
        assert hdr["features_count"] == 1 and len(feats) == 1

    def test_bad_magic_rejected(self):
        with pytest.raises(ValueError, match="magic"):
            FGB.read_fgb(b"not a fgb file at all")


class TestWriterRoundtrip:
    def test_poly_rewrite_exact(self, tmp_path):
        hdr, feats = FGB.read_fgb(f"{TESTFGB}/poly.fgb")
        out = str(tmp_path / "rt.fgb")
        FGB.write_fgb(out, feats, hdr["columns"],
                      geometry_type="polygon", name="poly")
        h2, f2 = FGB.read_fgb(out)
        assert h2["envelope"] == hdr["envelope"]
        assert len(f2) == len(feats)
        for a, b in zip(feats, f2):
            ka, da = a["geometry"]
            kb, db = b["geometry"]
            assert ka == kb and len(da) == len(db)
            for ra, rb in zip(da, db):
                assert np.array_equal(np.asarray(ra), np.asarray(rb))
            for c, _t in hdr["columns"]:
                assert a.get(c) == b.get(c)

    def test_mixed_types_roundtrip(self, tmp_path):
        cols = [("i", "int"), ("d", "double"), ("s", "string"),
                ("bin", "binary"), ("u", "ulong")]
        mp = [[np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], float)],
              [np.array([[10, 10], [12, 10], [12, 12], [10, 12],
                         [10, 10]], float),
               np.array([[10.5, 10.5], [11, 10.5], [11, 11], [10.5, 11],
                         [10.5, 10.5]], float)]]
        feats = [
            {"geometry": ("point", (1.5, -2.25)), "i": -7, "d": 3.5,
             "s": "héllo", "bin": b"\x00\xff", "u": 2**63},
            {"geometry": ("linestring",
                          [[0.0, 0.0], [1.0, 2.0], [3.0, 1.0]]),
             "i": 42, "d": -0.125, "s": "", "bin": b"", "u": 0},
            {"geometry": ("multipolygon", mp),
             "i": 0, "d": 0.0, "s": "mp", "bin": b"z", "u": 1},
        ]
        out = str(tmp_path / "mixed.fgb")
        FGB.write_fgb(out, feats, cols, geometry_type="unknown")
        _h, f2 = FGB.read_fgb(out)
        assert f2[0]["geometry"] == ("point", (1.5, -2.25))
        assert (f2[0]["i"], f2[0]["u"], f2[0]["bin"], f2[0]["s"]) == \
            (-7, 2**63, b"\x00\xff", "héllo")
        k, d = f2[2]["geometry"]
        assert k == "multipolygon" and len(d) == 2 and len(d[1]) == 2
        assert np.array_equal(d[1][1], mp[1][1])
        k1, d1 = f2[1]["geometry"]
        assert k1 == "linestring"
        assert np.array_equal(
            d1, np.asarray(feats[1]["geometry"][1], float))

    def test_null_property_omitted(self, tmp_path):
        cols = [("a", "int"), ("b", "string")]
        feats = [{"geometry": ("point", (0.0, 0.0)), "a": 1, "b": None}]
        out = str(tmp_path / "n.fgb")
        FGB.write_fgb(out, feats, cols)
        _h, f2 = FGB.read_fgb(out)
        assert f2[0]["a"] == 1 and "b" not in f2[0]


class TestSparkRead:
    def test_read_df_and_bbox(self, spark):
        df = FGB.read_df(spark, f"{TESTFGB}/poly.fgb")
        assert df.count() == 10
        assert set(df.columns) == {"fid", "geometry", "AREA", "EAS_ID",
                                   "PRFEDEA"}
        got = {r.EAS_ID for r in df.collect()}
        assert 158 in got
        # leaf-bbox pushdown: the autotest filter rect keeps 5
        df2 = FGB.read_df(spark, f"{TESTFGB}/poly.fgb",
                          bbox=(479586.0, 4764618.6, 479808.2, 4764797.8))
        assert df2.count() == 5
        # wkb decodes through the engine's codec
        from lib_gdal_spark.geo.wkb import decode
        kind, _data = decode(bytes(df.head().geometry))
        assert kind == "polygon"


class TestHilbertIndex:
    def test_index_write_reproduces_poly_fgb(self, tmp_path):
        # Hilbert-sorting poly_no_index.fgb's (original-order) features
        # must reproduce poly.fgb's permutation EXACTLY, and the
        # written leaf nodes must be byte-identical to the reference
        # file's index leaves (packedrtree.cpp hilbertSort: descending
        # 16-bit-cell Hilbert codes of bbox centers)
        _h1, orig = FGB.read_fgb(f"{TESTFGB}/poly_no_index.fgb")
        hdr_ref, sorted_ref = FGB.read_fgb(f"{TESTFGB}/poly.fgb")
        out = str(tmp_path / "idx.fgb")
        FGB.write_fgb(out, orig, _h1["columns"],
                      geometry_type="polygon", name="poly",
                      index_node_size=16)
        h2, f2 = FGB.read_fgb(out)
        assert [f["EAS_ID"] for f in f2] == \
            [f["EAS_ID"] for f in sorted_ref]
        bb_mine, _o = h2["leaves"]
        bb_ref, _o2 = hdr_ref["leaves"]
        assert np.array_equal(bb_mine, bb_ref)
        # root node: bbox == envelope, offset == first-child index 1
        import struct
        buf = open(out, "rb").read()
        hlen = struct.unpack_from("<I", buf, 8)[0]
        root = np.frombuffer(buf, dtype="<f8", count=5, offset=12 + hlen)
        roff = np.frombuffer(buf, dtype="<u8", count=5, offset=12 + hlen)
        assert list(root[:4]) == h2["envelope"] and roff[4] == 1
        # bbox pushdown works on our own indexed file
        rect = (479586.0, 4764618.6, 479808.2, 4764797.8)
        keep = ~((bb_mine[:, 2] < rect[0]) | (bb_mine[:, 0] > rect[2])
                 | (bb_mine[:, 3] < rect[1]) | (bb_mine[:, 1] > rect[3]))
        assert int(keep.sum()) == 5
