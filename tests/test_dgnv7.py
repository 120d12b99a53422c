"""MicroStation DGN v7 source (sources/dgnv7.py) vs the reference's
own autotest expectations (autotest/ogr/ogr_dgn.py on smalltest.dgn):
the text element with its exact LABEL style and point, the stroked
circle's envelope and vertex count, the filled shape's exact ring and
BRUSH style, and the Type/Level/ColorIndex attribute ladder."""

import json

import numpy as np
import pytest

from lib_gdal_spark.sources import dgnv7

DGN = "/root/reference/autotest/ogr/data/dgn/smalltest.dgn"


def _feats():
    return dgnv7.parse_dgn(open(DGN, "rb").read())


def test_text_element():
    f = _feats()[0]
    assert f["Type"] == 17 and f["Level"] == 1  # ogr_dgn_2
    assert f["Text"] == "Demo Text"
    x, y = f["pts"][0]
    assert abs(x - 0.7365) < 1e-7 and abs(y - 4.2198) < 1e-7
    assert f["style"] == \
        'LABEL(t:"Demo Text",c:#ffffff,s:1.000g,f:ENGINEERING)'


def test_circle_element():
    f = _feats()[1]
    assert f["Type"] == 15 and f["Level"] == 2  # ogr_dgn_3
    pts = np.asarray(f["pts"])
    assert len(pts) >= 15
    x0, x1 = pts[:, 0].min(), pts[:, 0].max()
    y0, y1 = pts[:, 1].min(), pts[:, 1].max()
    assert 0.328593 <= x0 <= 0.328594
    assert 9.68780 <= x1 <= 9.68781
    assert -0.09611 <= y0 <= -0.09610
    assert 9.26310 <= y1 <= 9.26311


def test_filled_shape():
    f = _feats()[2]
    assert f["Type"] == 6 and f["Level"] == 2  # ogr_dgn_4
    assert f["ColorIndex"] == 83
    exp = [(4.5355, 3.317), (4.3832, 2.6517), (4.9441, 2.5235),
           (4.832, 3.3331), (4.5355, 3.317)]
    assert np.abs(np.asarray(f["pts"]) - np.asarray(exp)).max() < 1e-7
    assert f["style"] == 'BRUSH(fc:#b40000,id:"ogr-brush-0")'


def test_type_filter():
    # ogr_dgn_5's attribute filter: exactly one type-15 level-2 element
    hits = [f for f in _feats() if f["Type"] == 15 and f["Level"] == 2]
    assert len(hits) == 1


def test_spark_face(spark):
    df = dgnv7.read_dgn(spark, DGN)
    rows = df.orderBy("fid").collect()
    assert [r.kind for r in rows] == ["point", "linestring", "polygon",
                                     "linestring"]
    assert json.loads(rows[0].properties)["Text"] == "Demo Text"
    assert rows[0].style.startswith('LABEL(t:"Demo Text"')
