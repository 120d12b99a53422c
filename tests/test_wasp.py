"""WAsP .map codec (sources/wasp.py) vs the reference's autotest
shape checks (autotest/ogr/ogr_wasp.py): ten elevation lines of three
points each with height == feature index, read back from the written
file exactly like test_ogr_wasp_elevation_from_linestring_z; plus the
roughness record layout."""

import numpy as np

from lib_gdal_spark.sources import wasp


def test_elevation_golden_shape(tmp_path):
    path = str(tmp_path / "tmp.map")
    lines = [{"pts": [(i, 0.0), (i, 0.5), (i, 1.0)], "height": i}
             for i in range(10)]
    wasp.write_wasp(path, lines)
    # the autotest's own reading loop: skip 4 header lines, then
    # alternating record/coordinate lines with h == j and n == 3
    f = open(path)
    for _ in range(4):
        f.readline()
    i = 0
    j = 0
    for line in f:
        if not i % 2:
            h, n = line.split()
            assert int(n) == 3
            assert float(h) == j
            j += 1
        i += 1
    assert j == 10


def test_elevation_roundtrip(tmp_path):
    path = str(tmp_path / "e.map")
    lines = [{"pts": [(0.0, 0.0), (10.5, 3.25), (20.0, 1.0),
                      (30.0, 2.0)], "height": 12.5}]
    wasp.write_wasp(path, lines)
    feats, srs = wasp.parse_wasp_text(open(path).read())
    assert srs == "no spatial ref sys"
    assert len(feats) == 1
    assert feats[0]["height"] == 12.5
    # %11.1f coordinate quantization
    assert feats[0]["pts"].tolist() == [[0.0, 0.0], [10.5, 3.2],
                                        [20.0, 1.0], [30.0, 2.0]]


def test_roughness_roundtrip(tmp_path):
    path = str(tmp_path / "r.map")
    lines = [{"pts": [(0.0, 0.0), (5.0, 5.0), (9.0, 2.0), (12.0, 0.0),
                      (15.0, 1.0)],
              "z_left": 0.1, "z_right": 0.4}]
    wasp.write_wasp(path, lines)
    feats, _ = wasp.parse_wasp_text(open(path).read())
    assert feats[0]["z_left"] == 0.1 and feats[0]["z_right"] == 0.4
    assert len(feats[0]["pts"]) == 5


def test_spark_face(spark, tmp_path):
    path = str(tmp_path / "s.map")
    wasp.write_wasp(path, [
        {"pts": [(0.0, 0.0), (1.0, 1.0)], "height": 3.0},
        {"pts": [(2.0, 2.0), (4.0, 4.0), (6.0, 2.0)], "height": 4.0}])
    df = wasp.read_wasp(spark, path)
    rows = df.orderBy("fid").collect()
    assert len(rows) == 2
    import json
    assert json.loads(rows[1].properties)["height"] == 4.0
    assert rows[1].xmax == 6.0
