"""VDV-452 / IDF codec (sources/vdv.py) vs the reference's own
autotest expectations (autotest/ogr/ogr_vdv.py): the test.idf and
test_3d.idf layer ladders (exact point/linestring geometries, typed
fields) and the byte-pinned VDV writer golden of test_ogr_vdv_2."""

import json

import numpy as np
import pytest

from lib_gdal_spark.geo import wkb as wkbmod
from lib_gdal_spark.sources import vdv

VD = "/root/reference/autotest/ogr/data/vdv"


def _rows(name):
    return vdv.idf_features(vdv.parse_vdv_text(
        open(f"{VD}/{name}", encoding="latin-1").read()))


def test_idf_2d():
    rows = _rows("test.idf")
    by = {}
    for r in rows:
        by.setdefault(r[0], []).append(r)
    n0 = by["Node"][0]
    assert json.loads(n0[8])["NODE_ID"] == 1
    assert json.loads(n0[8])["foo"] == "U"
    assert wkbmod.decode(bytes(n0[3])) == ("point", (2.0, 49.0))
    # ogr_idf_1: LINESTRING (2 49,2.5 49.5,2.7 49.7,3 50)
    k, d = wkbmod.decode(bytes(by["Link"][0][3]))
    assert k == "linestring"
    assert np.asarray(d).tolist() == [[2.0, 49.0], [2.5, 49.5],
                                      [2.7, 49.7], [3.0, 50.0]]
    assert wkbmod.decode(bytes(by["LinkCoordinate"][0][3])) == \
        ("point", (2.5, 49.5))
    assert json.loads(by["Other"][0][8])["FOO"] == 1


def test_idf_3d():
    rows = _rows("test_3d.idf")
    by = {}
    for r in rows:
        by.setdefault(r[0], []).append(r)
    from lib_gdal_spark.geo.wkb import decode_z

    k, d, hz = decode_z(bytes(by["Node"][0][3]))
    assert k == "point" and hz and tuple(d) == (2.0, 49.0, 10.0)
    # ogr_idf_3d: LINESTRING (2 49 10,2.5 49.5 10,2.7 49.7 20,3 50 20)
    k, d, hz = decode_z(bytes(by["Link"][0][3]))
    assert k == "linestring" and hz
    assert np.asarray(d).tolist() == [
        [2.0, 49.0, 10.0], [2.5, 49.5, 10.0],
        [2.7, 49.7, 20.0], [3.0, 50.0, 20.0]]
    k, d, hz = decode_z(bytes(by["LinkCoordinate"][0][3]))
    assert tuple(d) == (2.5, 49.5, 10.0)


def test_vdv_writer_golden(tmp_path):
    # replicate ogr_create_vdv's dataset and match test_ogr_vdv_2's
    # byte-pinned expected output
    path = str(tmp_path / "ogr_vdv_2.x10")
    tables = [
        {"name": "another_layer",
         "fields": [("str_field", "string", None)],
         "records": [[str(i)] for i in range(5)]},
        {"name": "empty", "fields": [], "records": []},
        {"name": "empty2", "fields": [], "records": []},
        {"name": "lyr_1",
         "fields": [("str_field", "string", None),
                    ("int_field", "integer", None),
                    ("int64_field", "integer64", None),
                    ("bool_field", "boolean", None),
                    ("str2_field", "string", 2),
                    ("int2_field", "integer", 2)],
         "records": [['a"b', 12, None, 1, None, None],
                     [None, None, None, None, None, None]]},
    ]
    vdv.write_vdv(path, tables, header_extras={"foo": "bar"})
    expected = """mod; DD.MM.YYYY; HH:MM:SS; free
src; "UNKNOWN"; "01.01.1970"; "00.00.00"
chs; "ISO8859-1"
ver; "1.4"
ifv; "1.4"
dve; "1.4"
fft; ""
foo; "bar"
tbl; another_layer
atr; str_field
frm; char[80]
rec; "0"
rec; "1"
rec; "2"
rec; "3"
rec; "4"
end; 5
tbl; lyr_1
atr; str_field; int_field; int64_field; bool_field; str2_field; int2_field
frm; char[80]; num[10.0]; num[19.0]; boolean; char[2]; num[1.0]
rec; "a""b"; 12; NULL; 1; NULL; NULL
rec; NULL; NULL; NULL; NULL; NULL; NULL
end; 2
tbl; empty
atr;
frm;
end; 0
tbl; empty2
atr;
frm;
end; 0
eof; 4
"""
    assert open(path, encoding="latin-1").read() == expected
    # and it parses back with typed values
    parsed = vdv.parse_vdv_text(expected)
    lyr1 = next(t for t in parsed["tables"] if t["name"] == "lyr_1")
    assert lyr1["records"][0]["str_field"] == 'a"b'
    assert lyr1["records"][0]["int_field"] == 12
    assert lyr1["records"][0]["int64_field"] is None


def test_spark_face(spark):
    df = vdv.read_idf(spark, f"{VD}/test.idf")
    counts = {r["layer"]: r["n"] for r in
              df.groupBy("layer").count()
              .withColumnRenamed("count", "n").collect()}
    assert counts["Node"] == 2 and counts["Link"] == 4
    assert counts["LinkCoordinate"] == 3 and counts["Other"] == 1
