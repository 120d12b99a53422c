"""IHO S-57 ENC source (sources/s57.py over sources/iso8211.py) vs
the reference's own autotest expectations (autotest/ogr/ogr_s57.py on
1B5X02NE.000, bug1526.000, bug2147_3R7D0889.000): the exact 13-layer
table with feature counts, the COALNE linestring, the M_QUAL polygon
ring (vertex-exact, OGRBuildPolygonFromEdges order), the SOUNDG 3-D
multipoint with its list attribute, the UCS-2 national attribute of
bug1526 and the 8-part ROADWY multilinestring of bug2147."""

import numpy as np
import pytest

from lib_gdal_spark.sources import s57

SD = "/root/reference/autotest/ogr/data/s57"


def _main():
    return s57.parse_s57(open(f"{SD}/1B5X02NE.000", "rb").read())


def test_layer_table():
    p = _main()
    expected = [("DSID", 1), ("COALNE", 1), ("DEPARE", 4),
                ("DEPCNT", 4), ("LNDARE", 1), ("LNDELV", 2),
                ("SBDARE", 2), ("SLCONS", 1), ("SLOTOP", 1),
                ("SOUNDG", 2), ("M_COVR", 1), ("M_NSYS", 1),
                ("M_QUAL", 1)]
    assert [(k, len(v)) for k, v in p["layers"].items()] == expected


def test_coalne_feature():
    f = _main()["layers"]["COALNE"][0]
    assert f["RCID"] == 1 and f["OBJL"] == 30
    assert f["LNAM"] == "FFFF7F4F0FB002D3"
    assert f["AGEN"] == 65535
    assert f["kind"] == "linestring"
    got = [(round(x, 8), round(y, 8)) for x, y in f["geom"]]
    assert got[0] == (60.976834, -32.494426)
    assert got[-1] == (60.979426, -32.498666)
    assert len(got) == 15


def test_m_qual_polygon_exact():
    f = _main()["layers"]["M_QUAL"][0]
    assert f["RCID"] == 15 and f["OBJL"] == 308 and f["AGEN"] == 65535
    exp = [(60.976834, -32.49534), (60.976834, -32.49762),
           (60.976834, -32.498666), (60.97869, -32.498666),
           (60.979426, -32.498666), (60.982152, -32.498666),
           (60.983166, -32.498666), (60.983166, -32.497558),
           (60.983166, -32.49477), (60.983166, -32.4935),
           (60.981468, -32.4935), (60.980298, -32.4935),
           (60.979474, -32.4935), (60.979016, -32.4935),
           (60.976834, -32.4935), (60.976834, -32.494426),
           (60.976834, -32.494698), (60.976834, -32.49534)]
    got = [(round(x, 6), round(y, 6)) for x, y in f["geom"][0]]
    assert got == exp


def test_soundg_multipoint_z():
    f = _main()["layers"]["SOUNDG"][0]
    assert f["RCID"] == 20 and f["OBJL"] == 129 and f["AGEN"] == 65535
    assert f["attrs"]["QUASOU"] == ["1"]
    exp = [(60.981644, -32.49449, 3.4), (60.981344, -32.496424, 1.4),
           (60.978142, -32.494874, -3.2),
           (60.980712, -32.495196, 1.2)]
    got = [(round(x, 6), round(y, 6), round(z, 6))
           for x, y, z in f["geom"]]
    assert got == exp


def test_double_byte_attrs():
    p = s57.parse_s57(open(f"{SD}/bug1526.000", "rb").read())
    f = p["layers"]["FOGSIG"][0]
    assert f["attrs"]["INFORM"] == (
        "During South winds nautophone is not always heard in S "
        "direction from lighthouse")
    assert len(f["attrs"]["NINFOM"]) >= 1


def test_multilinestring_bug2147():
    p = s57.parse_s57(
        open(f"{SD}/bug2147_3R7D0889.000", "rb").read())
    f = p["layers"]["ROADWY"][0]
    assert f["kind"] == "multilinestring"
    assert len(f["geom"]) == 8
    head = [(round(x, 7), round(y, 7)) for x, y in f["geom"][0][:3]]
    assert head == [(22.5659615, 44.5541942),
                    (22.5652045, 44.5531651),
                    (22.5654315, 44.5517774)]
    assert len(f["geom"][0]) == 21  # first part of the expected WKT


def test_not_s57_refused():
    with pytest.raises(ValueError, match="8211"):
        s57.parse_s57(b"garbage data that is not ddf" * 4)


def test_spark_face(spark):
    df = s57.read_s57(spark, f"{SD}/1B5X02NE.000")
    counts = {r["layer"]: r["n"] for r in
              df.groupBy("layer").count()
              .withColumnRenamed("count", "n").collect()}
    assert counts["COALNE"] == 1 and counts["DEPARE"] == 4
    assert counts["SOUNDG"] == 2
    import json
    row = df.filter("layer = 'COALNE'").collect()[0]
    assert row.lnam == "FFFF7F4F0FB002D3"
