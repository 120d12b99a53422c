"""GML source/sink vs the reference's own autotest expectations
(autotest/ogr/ogr_gml.py)."""

import json

import numpy as np
import pytest

from lib_gdal_spark.geo import wkb as wkbmod
from lib_gdal_spark.sources import gml as gmlmod

DATA = "/root/reference/autotest/ogr/data/gml"


def _read(name):
    with open(f"{DATA}/{name}", "rb") as f:
        return f.read()


class TestReadFixtures:
    def test_ionic_wfs(self):
        # ogr_gml.py test 1: one layer "GEM", polygon + Name field
        layers = gmlmod.parse_gml_layers(_read("ionic_wfs.gml"))
        assert [n for n, _ in layers] == ["GEM"]
        rows = layers[0][1]
        assert len(rows) == 1
        assert json.loads(rows[0][9])["Name"] == "Aartselaar"
        kind, rings = wkbmod.decode(rows[0][4])
        assert kind == "polygon" and len(rings) == 1
        np.testing.assert_allclose(rings[0][0], [44038, 511549])
        np.testing.assert_allclose(rings[0][-1], [44038, 511549])
        assert len(rings[0]) == 39

    def test_rnf_linestring(self):
        # test 3: RoadSegment with cs/ts/decimal coordinate attrs
        layers = gmlmod.parse_gml_layers(_read("rnf_eg.gml"))
        assert [n for n, _ in layers] == ["RoadSegment"]
        r = layers[0][1][0]
        p = json.loads(r[9])
        assert p["ngd_id"] == 817792      # Integer-typed
        assert p["type"] == "HWY"
        kind, pts = wkbmod.decode(r[4])
        assert kind == "linestring" and len(pts) == 8
        np.testing.assert_allclose(
            pts[0], [-63.500411040289066, 46.240122507771368])
        np.testing.assert_allclose(
            pts[-1], [-63.509946573455622, 46.241745397977233])

    def test_bom_and_nested_fields(self):
        # test 4: UTF-8 BOM + nested elements (#3680) + CRLF
        layers = gmlmod.parse_gml_layers(_read("bom.gml"))
        assert [n for n, _ in layers] == ["CartographicText"]
        rows = layers[0][1]
        assert len(rows) == 3
        p = json.loads(rows[0][9])
        assert p["featureCode"] == 10198
        assert p["anchorPosition"] == 8   # nested under textRendering
        assert wkbmod.decode(rows[0][4]) == \
            ("point", (347243.85, 461299.5))
        p2 = json.loads(rows[1][9])
        assert p2["featureCode"] == 10069
        assert wkbmod.decode(rows[1][4]) == \
            ("point", (347251.45, 461250.85))

    def test_fid_variants_unique_nonnegative(self):
        # test 6: four prefix/length variants of the fid attribute
        for name in ("test_point1.gml", "test_point2.gml",
                     "test_point3.gml", "test_point4.gml"):
            rows = gmlmod.parse_gml_bytes(_read(name))
            fids = [r[2] for r in rows]
            assert len(set(fids)) == len(fids), name
            assert all(f >= 0 for f in fids), name

    def test_field_type_scan(self):
        # test 7 value-scan half: dbl Real, int Integer (str is
        # Integer by value scan; the .xsd overrides it to String)
        types = gmlmod.layer_field_types(_read("test_point.gml"))
        assert types["test_point"]["dbl"] == "Real"
        assert types["test_point"]["int"] == "Integer"

    def test_xsd_override(self):
        # test 7 schema half: the sidecar .xsd declares str a String
        xsd_types = gmlmod.parse_xsd_types(_read("test_point.xsd"))
        assert xsd_types == {"dbl": "Real", "int": "Integer",
                             "str": "String"}
        layers = gmlmod.parse_gml_layers(_read("test_point.gml"),
                                         xsd=_read("test_point.xsd"))
        p = json.loads(layers[0][1][0][9])
        assert p["str"] == "1" and p["int"] == 1 and p["dbl"] == 1.0

    def test_malformed_raises(self):
        with pytest.raises(ValueError):
            gmlmod.parse_gml_layers(b"<gml:FeatureCollection")


class TestWriter:
    def test_roundtrip_typed_fields(self):
        feats = [{"geom": ("point", (float(i), float(i + 1))),
                  "fields": {"name": f"f{i}", "rank": i,
                             "score": i / 2}} for i in range(5)]
        doc = gmlmod.gml_document([("pts", feats)]).encode()
        layers = gmlmod.parse_gml_layers(doc)
        assert [n for n, _ in layers] == ["pts"]
        rows = layers[0][1]
        assert [r[2] for r in rows] == [0, 1, 2, 3, 4]
        p = json.loads(rows[3][9])
        assert p == {"name": "f3", "rank": 3, "score": 1.5}
        assert wkbmod.decode(rows[3][4]) == ("point", (3.0, 4.0))

    def test_roundtrip_polygon_with_hole(self):
        rings = [np.array([[0., 0.], [10., 0.], [10., 10.], [0., 10.],
                           [0., 0.]]),
                 np.array([[2., 2.], [4., 2.], [4., 4.], [2., 2.]])]
        doc = gmlmod.gml_document(
            [("polys", [{"geom": ("polygon", rings)}])]).encode()
        kind, back = wkbmod.decode(
            gmlmod.parse_gml_layers(doc)[0][1][0][4])
        assert kind == "polygon" and len(back) == 2
        np.testing.assert_allclose(back[0], rings[0])

    def test_roundtrip_multilinestring(self):
        lines = [np.array([[0., 0.], [1., 1.]]),
                 np.array([[2., 2.], [3., 3.], [4., 4.]])]
        doc = gmlmod.gml_document(
            [("mls", [{"geom": ("multilinestring", lines)}])]).encode()
        kind, back = wkbmod.decode(
            gmlmod.parse_gml_layers(doc)[0][1][0][4])
        assert kind == "multilinestring" and len(back) == 2
        np.testing.assert_allclose(back[1], lines[1])


class TestGml3:
    def test_poslist_and_exterior(self):
        doc = b"""<?xml version="1.0"?>
<gml:FeatureCollection xmlns:gml="http://www.opengis.net/gml">
 <gml:featureMember>
  <app:Area xmlns:app="http://x/" gml:id="Area.7">
   <app:geom>
    <gml:Polygon>
     <gml:exterior><gml:LinearRing>
       <gml:posList>0 0 4 0 4 4 0 0</gml:posList>
     </gml:LinearRing></gml:exterior>
    </gml:Polygon>
   </app:geom>
  </app:Area>
 </gml:featureMember>
</gml:FeatureCollection>"""
        rows = gmlmod.parse_gml_bytes(doc)
        assert rows[0][2] == 7  # gml:id trailing digits
        kind, rings = wkbmod.decode(rows[0][4])
        assert kind == "polygon"
        np.testing.assert_allclose(
            rings[0], [[0, 0], [4, 0], [4, 4], [0, 0]])

    def test_curve_segments(self):
        doc = b"""<?xml version="1.0"?>
<gml:FeatureCollection xmlns:gml="http://www.opengis.net/gml">
 <gml:featureMember>
  <app:Road xmlns:app="http://x/">
   <app:geom><gml:Curve><gml:segments>
     <gml:LineStringSegment><gml:posList>0 0 1 1</gml:posList>
     </gml:LineStringSegment>
     <gml:LineStringSegment><gml:posList>1 1 2 0</gml:posList>
     </gml:LineStringSegment>
   </gml:segments></gml:Curve></app:geom>
  </app:Road>
 </gml:featureMember>
</gml:FeatureCollection>"""
        kind, pts = wkbmod.decode(
            gmlmod.parse_gml_bytes(doc)[0][4])
        assert kind == "linestring"
        np.testing.assert_allclose(pts, [[0, 0], [1, 1], [2, 0]])

    def test_multisurface(self):
        doc = b"""<?xml version="1.0"?>
<gml:FeatureCollection xmlns:gml="http://www.opengis.net/gml">
 <gml:featureMember>
  <app:Zone xmlns:app="http://x/">
   <app:geom><gml:MultiSurface>
    <gml:surfaceMember><gml:Polygon><gml:exterior><gml:LinearRing>
      <gml:posList>0 0 1 0 1 1 0 0</gml:posList>
    </gml:LinearRing></gml:exterior></gml:Polygon></gml:surfaceMember>
    <gml:surfaceMember><gml:Polygon><gml:exterior><gml:LinearRing>
      <gml:posList>5 5 6 5 6 6 5 5</gml:posList>
    </gml:LinearRing></gml:exterior></gml:Polygon></gml:surfaceMember>
   </gml:MultiSurface></app:geom>
  </app:Zone>
 </gml:featureMember>
</gml:FeatureCollection>"""
        kind, polys = wkbmod.decode(
            gmlmod.parse_gml_bytes(doc)[0][4])
        assert kind == "multipolygon" and len(polys) == 2


class TestSpark:
    def test_read_gml_distributed(self, spark, tmp_path):
        import shutil
        shutil.copy(f"{DATA}/ionic_wfs.gml", tmp_path / "a.gml")
        shutil.copy(f"{DATA}/rnf_eg.gml", tmp_path / "b.gml")
        df = gmlmod.read_gml(spark, str(tmp_path))
        rows = df.collect()
        assert len(rows) == 2
        assert {r["layer"] for r in rows} == {"GEM", "RoadSegment"}
        assert df.schema.simpleString().startswith("struct<layer:string")

    def test_write_read_spark(self, spark, tmp_path):
        feats = [{"geom": ("point", (float(i), 0.5)),
                  "fields": {"n": i}} for i in range(10)]
        gmlmod.write_gml(str(tmp_path / "w.gml"), [("pts", feats)])
        df = gmlmod.read_gml(spark, str(tmp_path / "w.gml"))
        from pyspark.sql import functions as F
        got = (df.select(F.get_json_object("properties", "$.n")
                         .cast("long").alias("n"))
               .agg(F.sum("n").alias("s")).collect()[0]["s"])
        assert got == sum(range(10))
