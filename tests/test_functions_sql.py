"""SQL function catalog tests — parity with the reference's SQLite-dialect
spatial functions (ogrsqlitesqlfunctions.cpp) exercised through
spark.sql over registered UDFs."""

import pytest
from pyspark.sql import functions as F

from lib_gdal_spark import functions as fns
from lib_gdal_spark.geo import wkb


@pytest.fixture(scope="module")
def sql(spark):
    fns.register_all(spark)
    unit = wkb.encode_polygon([[(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)]])
    holed = wkb.encode_polygon([
        [(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)],
        [(1, 1), (2, 1), (2, 2), (1, 2), (1, 1)],
    ])
    multi = wkb.encode_multipolygon([
        [[(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)]],
        [[(10, 10), (12, 10), (12, 12), (10, 12), (10, 10)]],
    ])
    df = spark.createDataFrame(
        [(1, bytearray(unit)), (2, bytearray(holed)), (3, bytearray(multi))],
        schema="gid int, geom binary",
    )
    df.createOrReplaceTempView("geoms")
    return spark


class TestStFunctions:
    def test_st_area(self, sql):
        got = {r.gid: r.a for r in sql.sql(
            "SELECT gid, st_area(geom) AS a FROM geoms").collect()}
        assert got[1] == 16.0
        assert got[2] == 15.0  # hole subtracted
        assert got[3] == 5.0   # multipolygon parts summed

    def test_st_contains_point(self, sql):
        rows = sql.sql("""
            SELECT gid,
                   st_contains_point(geom, 1.5d, 1.5d) AS in_hole_spot,
                   st_contains_point(geom, 3.0d, 3.0d) AS inside,
                   st_contains_point(geom, 11.0d, 11.0d) AS in_part2
            FROM geoms ORDER BY gid""").collect()
        by = {r.gid: r for r in rows}
        assert by[1].in_hole_spot and by[1].inside
        assert not by[2].in_hole_spot  # inside the hole -> outside
        assert by[2].inside
        assert by[3].in_part2 and not by[3].inside

    def test_envelope(self, sql):
        r = sql.sql("""
            SELECT st_xmin(geom) a, st_ymin(geom) b, st_xmax(geom) c,
                   st_ymax(geom) d FROM geoms WHERE gid = 3""").collect()[0]
        assert (r.a, r.b, r.c, r.d) == (0.0, 0.0, 12.0, 12.0)

    def test_st_point_roundtrip(self, sql):
        r = sql.sql("SELECT st_point(2.5d, -3.5d) AS p").collect()[0]
        assert wkb.decode(bytes(r.p)) == ("point", (2.5, -3.5))


class TestTileFunctions:
    def test_tile_matches_column_api(self, sql, spark):
        from lib_gdal_spark.geo import mercator

        df = spark.range(100).select(
            ((F.col("id") * 37 % 360) - 180.0 + 0.5).alias("lon"),
            ((F.col("id") * 17 % 160) - 80.0 + 0.5).alias("lat"),
        )
        df.createOrReplaceTempView("pts")
        via_sql = sql.sql(
            "SELECT tile_x(lon, 7) x, tile_y(lat, 7) y FROM pts").toPandas()
        via_col = df.select(
            mercator.tile_x_col(F.col("lon"), 7).alias("x"),
            mercator.tile_y_col(F.col("lat"), 7).alias("y"),
        ).toPandas()
        assert (via_sql.values == via_col.values).all()

    def test_cell_id_parent(self, sql):
        r = sql.sql("""
            SELECT cell_id(3L, 5L, 4) AS c,
                   cell_parent(cell_id(3L, 5L, 4), 1) AS p,
                   cell_id(1L, 2L, 3) AS cp FROM range(1)""").collect()[0]
        assert r.p == r.cp  # parent of (3,5)@z4 is (1,2)@z3


class TestCentroid:
    def test_square_and_hole(self, sql):
        r = sql.sql("""
            SELECT gid, st_centroid_x(geom) cx, st_centroid_y(geom) cy
            FROM geoms ORDER BY gid""").collect()
        by = {x.gid: (x.cx, x.cy) for x in r}
        assert by[1] == (2.0, 2.0)  # unit square 0..4
        # holed square: symmetric hole at (1..2)^2 pulls centroid away
        hx, hy = by[2]
        assert hx > 2.0 and hy > 2.0

    def test_multipolygon_weighted(self, sql):
        r = sql.sql(
            "SELECT st_centroid_x(geom) cx FROM geoms WHERE gid = 3").collect()[0]
        # parts: unit square at (0.5,0.5) area 1; 2x2 at (11,11) area 4
        assert r.cx == pytest.approx((0.5 * 1 + 11 * 4) / 5)
