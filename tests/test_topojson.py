"""TopoJSON source vs the reference's own autotest matrix
(autotest/ogr/ogr_topojson.py)."""

import numpy as np
import pytest

from lib_gdal_spark.geo import wkb as wkbmod
from lib_gdal_spark.geo import wkt as wktmod
from lib_gdal_spark.sources import topojson as tj
from lib_gdal_spark.sources.mif import _flat

DATA = "/root/reference/autotest/ogr/data/topojson"

# test_ogr_topojson_objects_is_array's expected (id, name, wkt) rows
EXPECTED = [
    ("foo", None, "POINT EMPTY"), (None, None, "POINT EMPTY"),
    (None, None, "POINT EMPTY"), (None, None, "POINT (100 1010)"),
] + [(None, None, "LINESTRING EMPTY")] * 8 + [
    (None, "0", "LINESTRING EMPTY"), (None, "foo", "LINESTRING EMPTY"),
    ("1", None, "LINESTRING (100 1000,110 1000,110 1100)"),
    ("2", None, "LINESTRING (110 1100,110 1000,100 1000)"),
    (None, None, "POLYGON EMPTY"), (None, None, "POLYGON EMPTY"),
    (None, None, "POLYGON EMPTY"),
    (None, None, "POLYGON ((100 1000,110 1000,110 1100,100 1100,"
     "100 1000),(101 1010,101 1090,109 1090,109 1010,101 1010))"),
    (None, None, "POLYGON ((110 1100,110 1000,100 1000,100 1100,"
     "110 1100),(101 1010,109 1010,109 1090,101 1090,101 1010))"),
    (None, None, "MULTIPOINT EMPTY"), (None, None, "MULTIPOINT EMPTY"),
    (None, None, "MULTIPOINT EMPTY"), (None, None, "MULTIPOINT EMPTY"),
    (None, None, "MULTIPOINT (100 1010,101 1020)"),
    (None, None, "MULTIPOLYGON EMPTY"),
    (None, None, "MULTIPOLYGON EMPTY"),
    (None, None, "MULTIPOLYGON EMPTY"),
    (None, None, "MULTIPOLYGON (((110 1100,110 1000,100 1000,"
     "100 1100,110 1100)),((101 1010,109 1010,109 1090,101 1090,"
     "101 1010)))"),
    (None, None, "MULTILINESTRING EMPTY"),
    (None, None, "MULTILINESTRING EMPTY"),
    (None, None, "MULTILINESTRING ((100 1000,110 1000,110 1100))"),
    (None, None, "MULTILINESTRING ((100 1000,110 1000,110 1100,"
     "100 1100,100 1000))"),
    (None, None, "MULTILINESTRING ((100 1000,110 1000,110 1100,"
     "100 1100,100 1000),(101 1010,101 1090,109 1090,109 1010,"
     "101 1010))"),
]


def _read(name):
    with open(f"{DATA}/{name}", "rb") as f:
        return f.read()


class TestObjectsIsArray:
    def test_full_matrix(self):
        layers = dict(tj.parse_topojson_layers(
            _read("topojson1.topojson")))
        assert set(layers) == {"a_layer", "TopoJSON"}
        k, pts = wkbmod.decode(layers["a_layer"][0][5])
        assert k == "linestring"
        np.testing.assert_allclose(
            pts, [[100, 1000], [110, 1000], [110, 1100]])
        rows = layers["TopoJSON"]
        assert len(rows) == len(EXPECTED)
        for i, (row, (eid, ename, ewkt)) in enumerate(
                zip(rows, EXPECTED)):
            assert row[2] == eid and row[3] == ename, i
            if ewkt.endswith("EMPTY"):
                assert row[5] is None, i
                assert row[4] == ewkt.split()[0].lower(), i
                continue
            gk, gd = wktmod.from_wkt(ewkt)
            k, d = wkbmod.decode(row[5])
            assert k == gk, i
            a, b = _flat(k, d), _flat(gk, gd)
            assert a.shape == b.shape, i
            np.testing.assert_allclose(a, b, atol=1e-9)


class TestOtherForms:
    def test_objects_is_dict(self):
        layers = dict(tj.parse_topojson_layers(
            _read("topojson2.topojson")))
        a = layers["a_layer"][0]
        assert a[2] == "foo" and a[3] == "line"
        np.testing.assert_allclose(
            wkbmod.decode(a[5])[1],
            [[100, 1000], [110, 1000], [110, 1100]])
        t = layers["TopoJSON"][0]
        assert t[2] == "1"
        np.testing.assert_allclose(
            wkbmod.decode(t[5])[1],
            [[100, 1000], [110, 1000], [110, 1100]])

    def test_no_transform_absolute_arcs(self):
        layers = dict(tj.parse_topojson_layers(
            _read("topojson3.topojson")))
        np.testing.assert_allclose(
            wkbmod.decode(layers["a_layer"][0][5])[1],
            [[0, 0], [10, 0], [0, 10], [10, 0], [0, 0]])

    def test_not_topology_raises(self):
        with pytest.raises(ValueError):
            tj.parse_topojson_layers(b'{"type":"FeatureCollection"}')


class TestSpark:
    def test_read_topojson(self, spark, tmp_path):
        import shutil
        shutil.copy(f"{DATA}/topojson2.topojson", tmp_path)
        df = tj.read_topojson(spark, str(tmp_path))
        rows = df.collect()
        assert len(rows) == 2
        assert {r["layer"] for r in rows} == {"a_layer", "TopoJSON"}
