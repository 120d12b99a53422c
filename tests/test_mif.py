"""MapInfo MIF/MID source/sink vs the reference's own autotest
expectations (autotest/ogr/ogr_mitab.py + all_geoms.mif.golden.csv)."""

import csv
import json

import numpy as np
import pytest

from lib_gdal_spark.geo import wkb as wkbmod
from lib_gdal_spark.geo import wkt as wktmod
from lib_gdal_spark.sources import mif as mifmod

DATA = "/root/reference/autotest/ogr/data/mitab"


def _read(name):
    with open(f"{DATA}/{name}", "rb") as f:
        return f.read()


def _geom_equal(k1, d1, k2, d2, tol=1e-9):
    if k1 != k2:
        return False
    if k1 == "collection":
        return len(d1) == len(d2) and all(
            _geom_equal(a[0], a[1], b[0], b[1], tol)
            for a, b in zip(d1, d2))
    a, b = mifmod._flat(k1, d1), mifmod._flat(k2, d2)
    return a.shape == b.shape and float(np.max(np.abs(a - b))) <= tol


class TestAllGeomsGolden:
    def test_every_geometry_matches_golden_wkt(self):
        # ogr_mitab.py test 39: data/mitab/all_geoms.mif vs its own
        # golden CSV — covers Point/Symbol variants, Line, all three
        # Pline spellings, PLINE MULTIPLE, Rect, RoundRect (45-point
        # corner arcs), Ellipse (180-point ring), both Arc spellings
        # (2-degree stroking), Text (rotation-adjusted anchor point),
        # MultiPoint, Region, Collection
        _cols, rows = mifmod.parse_mif(_read("all_geoms.mif"))
        golden = list(csv.DictReader(
            open(f"{DATA}/all_geoms.mif.golden.csv")))
        assert len(rows) == len(golden) == 16
        for i, (r, g) in enumerate(zip(rows, golden)):
            gk, gd = wktmod.from_wkt(g["WKT"])
            k, d = wkbmod.decode(r[2])
            assert _geom_equal(k, d, gk, gd), f"feature {i}: {k}"

    def test_truncation_never_crashes(self):
        # ogr_mitab.py test 40: every prefix parses or raises cleanly
        content = _read("all_geoms.mif")
        for i in range(0, len(content), 101):
            try:
                mifmod.parse_mif(content[:i])
            except (ValueError, IndexError, AttributeError,
                    NotImplementedError):
                pass


class TestSmallMif:
    def test_attributes_and_geometry(self):
        # ogr_mitab.py test 10
        _cols, rows = mifmod.parse_mif(_read("small.mif"),
                                       _read("small.mid"))
        p0 = json.loads(rows[0][8])
        assert p0["NAME"] == " S. 11th St."
        assert p0["FLOODZONE"] == 10
        kind, rings = wkbmod.decode(rows[0][2])
        assert kind == "polygon"
        np.testing.assert_allclose(
            rings[0],
            [[407131.721, 155322.441], [407134.468, 155329.616],
             [407142.741, 155327.242], [407141.503, 155322.467],
             [407140.875, 155320.049], [407131.721, 155322.441]])
        # doubled-quote unescaping in the MID
        p1 = json.loads(rows[1][8])
        assert p1["OWNER"] == 'Guarino "Chucky" Sandra'

    def test_nomid(self):
        # ogr_mitab.py test 13 (#5141): .mif without .mid still reads
        _cols, rows = mifmod.parse_mif(_read("nomid.mif"))
        assert len(rows) >= 1
        assert all(json.loads(r[8]) == {} for r in rows)

    def test_tab_delimiter_empty_first_field(self):
        cols, rows = mifmod.parse_mif(
            _read("empty_first_field_with_tab_delimiter.mif"),
            _read("empty_first_field_with_tab_delimiter.mid"))
        p = json.loads(rows[0][8])
        names = [n for n, _ in cols]
        assert p.get(names[0]) is None  # empty first field -> null


class TestWriter:
    def test_roundtrip(self):
        feats = [
            {"geom": ("point", (2.0, 49.0)),
             "fields": {"name": 'say "hi"', "rank": 3, "score": 1.5,
                        "flag": True}},
            {"geom": ("linestring",
                      np.array([[0., 0.], [1., 1.], [2., 0.]])),
             "fields": {"name": "l", "rank": 1, "score": 0.25,
                        "flag": False}},
            {"geom": ("polygon",
                      [np.array([[0., 0.], [4., 0.], [4., 4.],
                                 [0., 0.]])]),
             "fields": {"name": "p", "rank": 2, "score": 2.0,
                        "flag": True}},
            {"geom": ("multipoint", np.array([[1., 2.], [3., 4.]])),
             "fields": {"name": "mp", "rank": 4, "score": 0.0,
                        "flag": False}},
        ]
        cols = [("name", "String"), ("rank", "Integer"),
                ("score", "Real"), ("flag", "Logical")]
        import tempfile, os
        d = tempfile.mkdtemp()
        p = os.path.join(d, "rt.mif")
        mifmod.write_mif(p, cols, feats)
        with open(p, "rb") as f:
            mif = f.read()
        with open(os.path.join(d, "rt.mid"), "rb") as f:
            mid = f.read()
        cols2, rows = mifmod.parse_mif(mif, mid)
        assert [t for _n, t in cols2] == \
            ["String", "Integer", "Real", "Logical"]
        assert len(rows) == 4
        p0 = json.loads(rows[0][8])
        assert p0 == {"name": 'say "hi"', "rank": 3, "score": 1.5,
                      "flag": True}
        for i, feat in enumerate(feats):
            k, dgot = wkbmod.decode(rows[i][2])
            assert _geom_equal(k, dgot, *feat["geom"])

    def test_multi_ring_region_holes(self):
        outer = np.array([[0., 0.], [10., 0.], [10., 10.], [0., 10.],
                          [0., 0.]])
        hole = np.array([[4., 4.], [6., 4.], [6., 6.], [4., 6.],
                         [4., 4.]])
        mif = ("Version 300\nDelimiter \",\"\nColumns 0\nData\n\n"
               "Region 2\n  5\n"
               + "".join(f"{x} {y}\n" for x, y in outer)
               + "  5\n" + "".join(f"{x} {y}\n" for x, y in hole))
        _c, rows = mifmod.parse_mif(mif.encode())
        kind, rings = wkbmod.decode(rows[0][2])
        assert kind == "polygon" and len(rings) == 2

    def test_two_shell_region(self):
        a = np.array([[0., 0.], [1., 0.], [1., 1.], [0., 0.]])
        b = np.array([[5., 5.], [6., 5.], [6., 6.], [5., 5.]])
        mif = ("Version 300\nColumns 0\nData\n\nRegion 2\n  4\n"
               + "".join(f"{x} {y}\n" for x, y in a) + "  4\n"
               + "".join(f"{x} {y}\n" for x, y in b))
        _c, rows = mifmod.parse_mif(mif.encode())
        kind, polys = wkbmod.decode(rows[0][2])
        assert kind == "multipolygon" and len(polys) == 2


class TestSpark:
    def test_read_mif(self, spark):
        df = mifmod.read_mif(spark, f"{DATA}/small.mif")
        rows = df.collect()
        assert len(rows) == 2
        assert {r["kind"] for r in rows} == {"polygon"}
        from pyspark.sql import functions as F
        fz = (df.select(F.get_json_object("properties", "$.FLOODZONE")
                        .cast("long").alias("fz"))
              .agg(F.sum("fz")).collect()[0][0])
        assert fz == 20
