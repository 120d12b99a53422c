"""KML source/sink vs the reference's own autotest expectations
(autotest/ogr/ogr_kml.py — the old KML driver, not LIBKML)."""

import numpy as np
import pytest

from lib_gdal_spark.geo import wkb as wkbmod
from lib_gdal_spark.sources import kml as kmlmod

DATA = "/root/reference/autotest/ogr/data/kml"


def _read(name):
    with open(f"{DATA}/{name}", "rb") as f:
        return f.read()


def _layers(name):
    return kmlmod.parse_kml_layers(_read(name))


def _lmap(name):
    return dict(_layers(name))


class TestReadSamples:
    # ogr_kml.py::test_ogr_kml_attributes_1..4 + *_read

    def test_layers_present(self):
        names = [n for n, _ in _layers("samples.kml")]
        for expect in ("Placemarks", "Paths", "Google Campus",
                       "Highlighted Icon"):
            assert expect in names

    def test_attributes_1(self):
        feats = _lmap("samples.kml")["Placemarks"]
        assert feats[0][2] == "Simple placemark"
        assert feats[0][3] == ("Attached to the ground. Intelligently "
                               "places itself at the\nheight of the "
                               "underlying terrain.")
        assert feats[1][2] == "Floating placemark"
        assert feats[1][3] == "Floats a defined distance above the ground."
        assert feats[2][2] == "Extruded placemark"

    def test_attributes_2_empty_description(self):
        feats = _lmap("samples.kml")["Highlighted Icon"]
        assert len(feats) == 1
        assert feats[0][2] == "Roll over this icon"
        assert feats[0][3] == ""

    def test_attributes_3_entities_in_description(self):
        feats = _lmap("samples.kml")["Paths"]
        assert feats[0][2] == "Tessellated"
        assert feats[0][3] == ("If the <tessellate> tag has a value of 1, "
                               "the line will contour to the underlying "
                               "terrain")
        assert feats[1][2] == "Untessellated"

    def test_attributes_4_building_names(self):
        feats = _lmap("samples.kml")["Google Campus"]
        for i, f in enumerate(feats):
            assert f[2] == f"Building {40 + i}"
            assert f[3] == ""

    def test_point_read(self):
        feats = _lmap("samples.kml")["Placemarks"]
        kind, data, has_z = wkbmod.decode_z(feats[0][5])
        assert kind == "point" and has_z
        assert data == pytest.approx(
            (-122.0822035425683, 37.42228990140251, 0.0))
        _, d2, _ = wkbmod.decode_z(feats[1][5])
        assert d2 == pytest.approx((-122.084075, 37.4220033612141, 50.0))

    def test_linestring_read(self):
        feats = _lmap("samples.kml")["Paths"]
        kind, data, has_z = wkbmod.decode_z(feats[0][5])
        assert kind == "linestring" and has_z
        np.testing.assert_allclose(
            data,
            [[-112.081423783034495, 36.106778704771372, 0],
             [-112.087026775269294, 36.0905099328766, 0]])

    def test_polygon_read(self):
        feats = _lmap("samples.kml")["Google Campus"]
        kind, rings, has_z = wkbmod.decode_z(feats[0][5])
        assert kind == "polygon" and has_z
        assert len(rings) == 1
        np.testing.assert_allclose(
            rings[0][0], [-122.084893845961204, 37.422571240447859, 17])
        assert len(rings[0]) == 22


class TestReadLayerRules:
    def test_geometries_parse(self):
        # test_ogr_kml_read_geometries: all placemarks readable
        layers = _layers("geometries.kml")
        assert len(layers) == 1

    def test_empty(self):
        assert _layers("empty.kml") == []

    def test_emptylayers(self):
        layers = _layers("emptylayers.kml")
        assert [n for n, _ in layers] == ["Layer1", "Layer2"]
        assert [len(r) for _, r in layers] == [0, 0]

    def test_folder_with_subfolder_placemark(self):
        layers = _layers("folder_with_subfolder_placemark.kml")
        assert [n for n, _ in layers] == ["MainFolder"]
        assert len(layers[0][1]) == 0

    def test_weird_empty_folders(self):
        layers = _layers("weird_empty_folders.kml")
        assert len(layers) == 1
        assert len(layers[0][1]) == 0

    def test_truncated_raises(self):
        with pytest.raises(ValueError):
            kmlmod.parse_kml_layers(_read("truncated.kml"))

    def test_junk_after_doc_raises(self):
        with pytest.raises(ValueError):
            kmlmod.parse_kml_layers(
                _read("junk_content_after_valid_doc.kml"))

    def test_placemark_with_kml_prefix(self):
        layers = _layers("placemark_with_kml_prefix.kml")
        assert sum(len(r) for _, r in layers) == 1

    def test_duplicate_folder_name(self):
        layers = _layers("duplicate_folder_name.kml")
        assert [n for n, _ in layers] == ["layer", "layer (#2)"]

    def test_placemark_in_root_and_subfolder(self):
        layers = _lmap("placemark_in_root_and_subfolder.kml")
        assert len(layers["TopLevel"]) == 1
        assert len(layers["SubFolder1"]) == 1

    def test_placemark_at_root(self):
        layers = _layers("placemark.kml")
        assert sum(len(r) for _, r in layers) == 1

    def test_description_with_xml(self):
        # test_ogr_kml_xml_attributes
        rows = kmlmod.parse_kml_bytes(_read("description_with_xml.kml"))
        assert rows[0][3] == ('Description<br></br><i attr="val">'
                              "Interesting</i><br></br>")

    def test_non_conformant_multi(self):
        rows = kmlmod.parse_kml_bytes(_read("non_conformant_multi.kml"))
        kind, data = wkbmod.decode(rows[0][5])
        assert kind == "multipolygon"
        np.testing.assert_allclose(
            data[0][0], [[0, 0], [0, 1], [1, 1], [1, 0], [0, 0]])
        kind, data = wkbmod.decode(rows[1][5])
        assert kind == "multilinestring"
        np.testing.assert_allclose(data[0], [[0, 0], [1, 1]])
        kind, data = wkbmod.decode(rows[2][5])
        assert kind == "multipoint"
        np.testing.assert_allclose(data, [[0, 0]])

    def test_tab_separated_coordinates(self):
        rows = kmlmod.parse_kml_bytes(
            _read("tab_separated_coord_triplet.kml"))
        assert all(r[5] is not None for r in rows)


def _strip_compare(content, expected):
    # the reference's own comparator (ogr_kml.py:534-540)
    cl = content.strip().split("\n")
    el = expected.strip().split("\n")
    assert len(cl) == len(el), content
    for a, b in zip(cl, el):
        assert a.strip() == b.strip(), content


class TestWriter:
    def test_write_schema_golden(self):
        # test_ogr_kml_write_schema byte-golden (line-stripped)
        doc = kmlmod.kml_document([
            ("lyr",
             [("strfield", "string"), ("intfield", "int"),
              ("realfield", "float")],
             [{"geom": None,
               "fields": {"strfield": "strfield_val", "intfield": 1,
                          "realfield": "2.34"}}])])
        _strip_compare(doc, """<?xml version="1.0" encoding="utf-8" ?>
<kml xmlns="http://www.opengis.net/kml/2.2">
<Document id="root_doc">
<Schema name="lyr" id="lyr">
    <SimpleField name="strfield" type="string"></SimpleField>
    <SimpleField name="intfield" type="int"></SimpleField>
    <SimpleField name="realfield" type="float"></SimpleField>
</Schema>
<Folder><name>lyr</name>
  <Placemark id="lyr.1">
    <ExtendedData><SchemaData schemaUrl="#lyr">
        <SimpleData name="strfield">strfield_val</SimpleData>
        <SimpleData name="intfield">1</SimpleData>
        <SimpleData name="realfield">2.34</SimpleData>
    </SchemaData></ExtendedData>
  </Placemark>
</Folder>
</Document></kml>""")

    def test_empty_layer_golden(self):
        doc = kmlmod.kml_document([("empty", [], [])])
        _strip_compare(doc, """<?xml version="1.0" encoding="utf-8" ?>
<kml xmlns="http://www.opengis.net/kml/2.2">
<Document id="root_doc">
<Folder><name>empty</name>
</Folder>
</Document></kml>""")

    def test_two_layers_golden(self):
        doc = kmlmod.kml_document([
            ("empty", [], []),
            ("lyr", [("foo", "string")],
             [{"geom": None, "fields": {"foo": "bar"}}])])
        _strip_compare(doc, """<?xml version="1.0" encoding="utf-8" ?>
<kml xmlns="http://www.opengis.net/kml/2.2">
<Document id="root_doc">
<Folder><name>empty</name>
</Folder>
<Folder><name>lyr</name>
  <Placemark id="lyr.1">
    <ExtendedData><SchemaData schemaUrl="#lyr">
        <SimpleData name="foo">bar</SimpleData>
    </SchemaData></ExtendedData>
  </Placemark>
</Folder>
<Schema name="lyr" id="lyr">
    <SimpleField name="foo" type="string"></SimpleField>
</Schema>
</Document></kml>""")

    def test_point_geometry_element(self):
        # test_ogr_kml_write_1: POINT (2 49)
        assert kmlmod.geometry_to_kml("point", (2.0, 49.0)) == \
            "<Point><coordinates>2,49</coordinates></Point>"

    def test_polygon_geometry_element(self):
        rings = [np.array([[0., 0.], [0., 1.], [1., 1.], [0., 0.]]),
                 np.array([[.2, .2], [.2, .4], [.4, .4], [.2, .2]])]
        s = kmlmod.geometry_to_kml("polygon", rings)
        assert s.startswith("<Polygon><outerBoundaryIs><LinearRing>"
                            "<coordinates>0,0 0,1 1,1 0,0</coordinates>")
        assert "<innerBoundaryIs><LinearRing><coordinates>0.2,0.2" in s

    def test_multigeometry_element(self):
        s = kmlmod.geometry_to_kml(
            "multipoint", np.array([[2.0, 49.0], [3.0, 50.0]]))
        assert s == ("<MultiGeometry>"
                     "<Point><coordinates>2,49</coordinates></Point>"
                     "<Point><coordinates>3,50</coordinates></Point>"
                     "</MultiGeometry>")

    def test_roundtrip_through_parser(self):
        feats = [{"geom": ("point", (float(i), float(i % 90))),
                  "fields": {"Name": f"pt{i}"}} for i in range(10)]
        doc = kmlmod.kml_document(
            [("pts", [("Name", "string")], feats)]).encode()
        layers = kmlmod.parse_kml_layers(doc)
        assert [n for n, _ in layers] == ["pts"]
        rows = layers[0][1]
        assert [r[2] for r in rows] == [f"pt{i}" for i in range(10)]
        got = [wkbmod.decode(r[5])[1][:2] for r in rows]
        assert got == [(float(i), float(i % 90)) for i in range(10)]


class TestSpark:
    def test_read_kml_distributed(self, spark, tmp_path):
        # several files -> one task each; rows union across files
        for j in range(3):
            feats = [{"geom": ("point", (float(i + 10 * j), 1.0)),
                      "fields": {"Name": f"f{j}_{i}"}}
                     for i in range(5)]
            kmlmod.write_kml(str(tmp_path / f"f{j}.kml"),
                             [("L", [("Name", "string")], feats)])
        df = kmlmod.read_kml(spark, str(tmp_path))
        rows = df.collect()
        assert len(rows) == 15
        assert {r["kind"] for r in rows} == {"point"}
        assert df.schema.simpleString().startswith("struct<layer:string")

    def test_write_kml_parts_roundtrip(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from lib_gdal_spark import functions as fns

        fns.register_all(spark)
        df = spark.range(20).select(
            F.col("id"),
            F.expr("st_point(cast(id as double), 1.0d)").alias("wkb"),
            F.concat(F.lit("n"), F.col("id")).alias("name"),
            F.lit("d").alias("description"),
            F.lit("point").alias("kind"))
        out = tmp_path / "parts"
        kmlmod.write_kml_parts(df.coalesce(2), str(out))
        back = kmlmod.read_kml(spark, str(out)).collect()
        assert len(back) == 20
        assert sorted(r["name"] for r in back) == \
            sorted(f"n{i}" for i in range(20))
