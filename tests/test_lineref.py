"""ogrlineref (apps/ogrlineref.cpp) replays over the reference's own
shapefile fixtures (autotest/utilities/data/path.shp + mstones.shp) and
expectations (autotest/utilities/test_ogrlineref.py):

- test_ogrlineref_1: -create -s 1000 on the path/mstones pair -> 9 parts
- test_ogrlineref_2: -get_pos (-1.4345, 51.9497) -> "15977.724709"
- test_ogrlineref_3: -get_coord 15977.724709 -> "-1.435097,51.950080"
- test_ogrlineref_4: -get_subline 13300..17400 -> 1 feature

The -create chain exercises the whole stack: SHP/DBF source, planar
projection/sublines, and the Krueger/Karney UTM forward (the reference
measures the extrapolated parts in the midpoint UTM zone via PROJ; the
6-dp golden only matches if our transverse Mercator agrees with PROJ far
below a micrometer).
"""

import numpy as np
import pytest

from lib_gdal_spark.operators import lineref
from lib_gdal_spark.sources.shapefile import read_shapefile

DATA = "/root/reference/autotest/utilities/data"


@pytest.fixture(scope="module")
def parts():
    path = read_shapefile(f"{DATA}/path.shp")
    posts = read_shapefile(f"{DATA}/mstones.shp")
    path_pts = path[0]["geom"]["parts"][0]
    repers = [(p["pos"], p["geom"]["points"][0]) for p in posts]
    return lineref.create_parts(path_pts, repers, step=1000.0,
                                geographic=True)


class TestOgrlinerefReplay:
    def test_create_9_parts(self, parts):
        assert len(parts) == 9
        # fixed-step structure: interior parts span exactly 1000
        interior = [p for p in parts
                    if p["beg"] % 1000 == 0 and p["end"] % 1000 == 0]
        assert all(p["end"] - p["beg"] == 1000.0 for p in interior)
        # monotone, contiguous
        for a, b in zip(parts, parts[1:]):
            assert a["end"] == b["beg"]

    def test_get_pos(self, parts):
        m = lineref.get_position(parts, -1.4345, 51.9497)
        assert "%f" % m == "15977.724709"

    def test_get_coord(self, parts):
        x, y = lineref.get_coordinate(parts, 15977.724709)
        assert "%f,%f" % (x, y) == "-1.435097,51.950080"

    def test_get_subline(self, parts):
        sub = lineref.get_subline_by_measure(parts, 13300.0, 17400.0)
        assert sub is not None and len(sub) >= 2  # one merged feature

    def test_roundtrip_pos_coord(self, parts):
        for m in (12500.0, 14000.5, 18200.25):
            x, y = lineref.get_coordinate(parts, m)
            assert lineref.get_position(parts, x, y) == \
                pytest.approx(m, abs=1e-6)


class TestShapefileSource:
    def test_polyline_and_points(self):
        path = read_shapefile(f"{DATA}/path.shp")
        assert len(path) == 1
        assert path[0]["geom"]["type"] == 3
        assert len(path[0]["geom"]["parts"][0]) == 14
        posts = read_shapefile(f"{DATA}/mstones.shp")
        assert len(posts) == 7
        assert {p["pos"] for p in posts} == {
            12100.0, 13700.0, 14900.0, 15900.0, 16900.0, 18100.0, 18900.0}

    def test_points_df(self, spark):
        from lib_gdal_spark.sources.shapefile import read_points_df
        df = read_points_df(spark, f"{DATA}/mstones.shp")
        assert df.count() == 7
        assert "pos" in df.columns


class TestPrimitives:
    LINE = [(0.0, 0.0), (10.0, 0.0), (10.0, 5.0)]

    def test_project_and_value(self):
        m, d = lineref.project(self.LINE, 5.0, 2.0)
        assert m == 5.0 and d == 2.0
        m, d = lineref.project(self.LINE, 12.0, 2.0)
        assert m == 12.0 and d == 2.0
        assert lineref.value(self.LINE, 12.0) == (10.0, 2.0)
        assert lineref.value(self.LINE, 99.0) == (10.0, 5.0)

    def test_subline(self):
        sub = lineref.get_subline(self.LINE, 2.0, 12.0)
        assert sub == [(2.0, 0.0), (10.0, 0.0), (10.0, 2.0)]
        assert lineref.get_subline(self.LINE, 20.0, 25.0) is None


class TestDistributedFaces:
    def _parts(self):
        path = [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (20.0, 10.0)]
        # interior repers -> extrapolated leading/trailing parts exist
        repers = [(100.0, (2.0, 0.0)), (130.0, (10.0, 8.0))]
        return lineref.create_parts(path, repers, step=10.0,
                                    geographic=False)

    def test_locate_df_matches_scalar(self, spark):
        parts = self._parts()
        rows = [(i, (i * 13 % 2300) / 97.0, (i * 7 % 1100) / 97.0)
                for i in range(60)]
        df = spark.createDataFrame(rows, "id long, x double, y double")
        got = {r["id"]: r["measure"]
               for r in lineref.locate_df(df, parts).collect()}
        for i, x, y in rows:
            assert got[i] == pytest.approx(
                lineref.get_position(parts, x, y), rel=1e-12), (i, x, y)

    def test_interpolate_df_matches_scalar(self, spark):
        parts = self._parts()
        # +0.05 keeps measures OFF exact part boundaries: get_coord is
        # strict (beg < m < end), mirroring the reference's filter
        rows = [(i, 100.05 + (i * 29 % 290) / 10.0) for i in range(40)]
        df = spark.createDataFrame(rows, "id long, measure double")
        out = lineref.interpolate_df(df, parts)
        for r in out.collect():
            ex, ey = lineref.get_coordinate(parts, r["measure"])
            assert r["ix"] == pytest.approx(ex, rel=1e-14)
            assert r["iy"] == pytest.approx(ey, rel=1e-14)
