"""GMT ASCII vector codec (sources/gmt.py) vs the reference's own
autotest expectations (autotest/ogr/ogr_gmt.py): the test_multi.gmt
multilinestring ladder (exact coordinates + names), the multipolygon
writer round trip of ogr_gmt_5, and the coord-only point stream."""

import json

import numpy as np
import pytest

from lib_gdal_spark.geo import wkb as wkbmod
from lib_gdal_spark.sources import gmt

OD = "/root/reference/autotest/ogr/data/gmt"


def test_multi_gmt_fixture():
    feats, meta = gmt.parse_gmt_text(
        open(f"{OD}/test_multi.gmt", encoding="utf-8").read())
    assert meta["geom_type"] == "multilinestring"
    assert meta["field_names"] == ["timer", "id", "name"]
    assert meta["field_types"] == ["datetime", "integer", "string"]
    assert len(feats) == 2
    # autotest ogr_gmt_4 exact geometries
    k, d = feats[0]["kind"], feats[0]["data"]
    assert k == "multilinestring"
    assert d == [[(175.0, -45.0), (176.0, -45.0)],
                 [(180.0, -45.3), (179.0, -45.4)]]
    assert feats[0]["fields"][2] == "feature 1"
    d2 = feats[1]["data"]
    assert d2 == [[(175.1, -45.0), (175.2, -45.1)],
                  [(180.1, -45.3), (180.0, -45.2)]]
    assert feats[1]["fields"][2] == "feature 2"


def test_multipolygon_roundtrip(tmp_path):
    # ogr_gmt_5's geometries through the writer/reader loop
    mp1 = [[[(0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (0.0, 10.0),
             (0.0, 0.0)],
            [(3.0, 3.0), (4.0, 4.0), (3.0, 4.0), (3.0, 3.0)]],
           [[(12.0, 0.0), (14.0, 0.0), (12.0, 3.0), (12.0, 0.0)]]]
    mp2 = [[[(30.0, 20.0), (40.0, 20.0), (30.0, 30.0), (30.0, 20.0)]]]
    path = str(tmp_path / "mpoly.gmt")
    gmt.write_gmt(path,
                  [(wkbmod.encode_geometry("multipolygon", mp1), [15]),
                   (wkbmod.encode_geometry("multipolygon", mp2), [16])],
                  field_names=["ID"], field_types=["integer"])
    text = open(path).read()
    assert "@R" in text  # ogr_gmt_5's own assertion
    feats, meta = gmt.parse_gmt_text(text)
    assert meta["geom_type"] == "multipolygon"
    assert len(feats) == 2
    assert feats[0]["data"] == mp1
    assert feats[1]["data"] == mp2
    assert feats[0]["fields"] == ["15"]
    assert feats[1]["fields"] == ["16"]


def test_coord_only_points():
    feats, meta = gmt.parse_gmt_text("1 2 3\n")
    assert len(feats) == 1
    assert feats[0]["kind"] == "point"
    assert feats[0]["data"] == (1.0, 2.0)


def test_quoted_fields_with_pipe(tmp_path):
    path = str(tmp_path / "q.gmt")
    gmt.write_gmt(path,
                  [(wkbmod.encode_geometry("linestring",
                                           [(0.0, 0.0), (1.0, 1.0)]),
                    ["a|b c", 7])],
                  field_names=["name", "n"],
                  field_types=["string", "integer"])
    feats, _ = gmt.parse_gmt_text(open(path).read())
    assert feats[0]["fields"] == ["a|b c", "7"]


def test_spark_face(spark, tmp_path):
    path = str(tmp_path / "lines.gmt")
    gmt.write_gmt(path,
                  [(wkbmod.encode_geometry("linestring",
                                           [(0.0, 0.0), (2.0, 1.0)]),
                    [1]),
                   (wkbmod.encode_geometry("linestring",
                                           [(5.0, 5.0), (6.0, 7.0)]),
                    [2])],
                  field_names=["id"], field_types=["integer"])
    df = gmt.read_gmt(spark, path)
    rows = df.orderBy("fid").collect()
    assert len(rows) == 2
    assert rows[0].kind == "linestring"
    assert (rows[1].xmin, rows[1].ymax) == (5.0, 7.0)
    assert json.loads(rows[0].properties) == {"id": 1}
