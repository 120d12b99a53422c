"""Arc/Info E00 coverage source (sources/avce00.py) vs the reference's
own autotest expectations (autotest/ogr/ogr_avc.py, E00 paths):
UserIds 1..7 + the exact first-arc linestring on test.e00, 80 LAB
points with ValueId/WELLS-ID 80 and seven fields on testpoint.e00,
and 3 PAL polygons on testpoly.e00 with ArcIds [-4,-5], AREA
9939.059 and the exact last-ring coordinates."""

import json

import numpy as np
import pytest

from lib_gdal_spark.geo import wkb as wkbmod
from lib_gdal_spark.sources import avce00 as av

AD = "/root/reference/autotest/ogr/data/avc"


def _cov(name):
    return av.coverage_features(av.parse_e00_text(
        open(f"{AD}/{name}", encoding="latin-1").read()))


def test_arc_layer():
    rows = _cov("test.e00")
    arcs = [r for r in rows if r[0] == "ARC"]
    assert [json.loads(r[8])["UserId"] for r in arcs] == list(range(1, 8))
    k, d = wkbmod.decode(bytes(arcs[0][3]))
    assert k == "linestring"
    exp = np.array([[340099.875, 4100200.0], [340400.0625, 4100399.5],
                    [340900.125, 4100200.0], [340700.03125, 4100199.5]])
    # ogr_avc.py:40 allows 0.01 — the E00 text carries plain doubles
    assert np.abs(np.asarray(d) - exp).max() < 0.01


def test_prj_present():
    cov = av.parse_e00_text(
        open(f"{AD}/test.e00", encoding="latin-1").read())
    assert cov["prj"] and "UTM" in cov["prj"]


def test_point_coverage():
    labs = [r for r in _cov("testpoint.e00") if r[0] == "LAB"]
    assert len(labs) == 80  # ogr_avc.py:100
    last = json.loads(labs[-1][8])
    assert last["ValueId"] == 80 and last["WELLS-ID"] == 80
    assert len(last) == 7  # ValueId/PolyId + 5 PAT fields


def test_polygon_coverage():
    pals = [r for r in _cov("testpoly.e00") if r[0] == "PAL"]
    assert len(pals) == 3  # universe polygon skipped
    last = json.loads(pals[-1][8])
    assert last["ArcIds"] == [-4, -5]
    assert abs(last["AREA"] - 9939.059) < 1e-3
    assert len(last) == 5
    k, d = wkbmod.decode(bytes(pals[-1][3]))
    assert k == "polygon"
    # ogr_avc.py:141 exact E00 WKT
    assert np.asarray(d[0]).tolist() == [
        [340700.03, 4100199.5], [340500.0, 4100199.8],
        [340599.97, 4100100.2], [340700.03, 4100199.5]]


def test_not_e00_refused():
    with pytest.raises(ValueError, match="E00"):
        av.parse_e00_text("not an export file\n")


def test_spark_face(spark):
    df = av.read_e00(spark, f"{AD}/testpoly.e00")
    counts = {r["layer"]: r["n"] for r in
              df.groupBy("layer").count().withColumnRenamed(
                  "count", "n").collect()}
    assert counts["ARC"] == 7 and counts["PAL"] == 3
    assert counts["LAB"] == 2 and counts["CNT"] == 4
