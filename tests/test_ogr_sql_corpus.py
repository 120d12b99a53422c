"""Replay of the reference's OWN SQL golden corpus against this engine.

Fixture data is the reference's autotest fixture, transcribed from the DBF
headers/records of /root/reference/autotest/ogr/data/poly.dbf (10 records:
AREA N(12,3), EAS_ID N(11,0), PRFEDEA C(16)) and idlink.dbf (7 records:
EAS_ID N(8,0), NAME C(32)); fid = 0-based record index, as OGR assigns.

Each test cites the reference test it replays
(autotest/ogr/ogr_sql_test.py, autotest/ogr/ogr_join_test.py) and asserts
the reference's OWN hard-coded expected values.
"""

import pytest
from pyspark.sql import functions as F

from lib_gdal_spark.operators import ogrsql

# poly.dbf records in file order (fid 0..9)
POLY = [
    (0, 215229.266, 168, "35043411"),
    (1, 247328.172, 179, "35043423"),
    (2, 261752.781, 171, "35043414"),
    (3, 547597.188, 173, "35043416"),
    (4, 15775.758, 172, "35043415"),
    (5, 101429.977, 169, "35043412"),
    (6, 268597.625, 166, "35043409"),
    (7, 1634833.375, 158, "35043369"),
    (8, -596610.313, 165, "35043408"),
    (9, 5268.813, 170, "35043413"),
]
# idlink.dbf records in file order
IDLINK = [
    (168, "_168_"), (179, "_179_"), (171, "_171_"), (170, "_170_"),
    (165, "_165_"), (158, "_158_"), (166, "_166_"),
]


@pytest.fixture(scope="module")
def tables(spark):
    poly = spark.createDataFrame(
        POLY, schema="fid long, area double, eas_id long, prfedea string"
    )
    idlink = spark.createDataFrame(IDLINK, schema="eas_id long, name string")
    poly.createOrReplaceTempView("poly")
    idlink.createOrReplaceTempView("idlink")
    return poly, idlink


class TestSqlCorpus:
    def test_ogr_sql_1_where_count(self, spark, tables):
        # ogr_sql_test.py test_ogr_sql_1
        poly, _ = tables
        assert poly.filter("eas_id < 167").count() == 3
        assert poly.count() == 10

    def test_ogr_sql_2_distinct(self, spark, tables):
        # test_ogr_sql_2: expect [168, 169, 166, 158, 165] (encounter
        # order in the reference; set-equal here — distributed DISTINCT
        # has no inherent order, the reference's ORDER BY tests pin order)
        got = {r.eas_id for r in spark.sql(
            "select distinct eas_id from poly where eas_id < 170").collect()}
        assert got == {168, 169, 166, 158, 165}

    def test_ogr_sql_3_distinct_order(self, spark, tables):
        # test_ogr_sql_3 / test_ogr_sql_3_desc
        got = [r.eas_id for r in spark.sql(
            "select distinct eas_id from poly where eas_id < 170 order by eas_id"
        ).collect()]
        assert got == [158, 165, 166, 168, 169]
        got = [r.eas_id for r in spark.sql(
            "select distinct eas_id from poly where eas_id < 170 order by eas_id desc"
        ).collect()]
        assert got == [169, 168, 166, 165, 158]

    def test_ogr_sql_4_distinct_strings(self, spark, tables):
        # test_ogr_sql_4
        got = [r.name for r in spark.sql(
            "select distinct name from idlink order by name asc").collect()]
        assert got == ["_158_", "_165_", "_166_", "_168_", "_170_", "_171_", "_179_"]

    def test_ogr_sql_5_summary_aggregates(self, spark, tables):
        # test_ogr_sql_5 — the reference's exact values incl. Kahan/Welford
        # stddev; our decimal-moment path must agree to its tolerances
        _, idlink = tables
        r = ogrsql.summary_record(idlink, "eas_id").collect()[0]
        assert r.max_v == 179
        assert r.min_v == 158
        assert r.avg_v == pytest.approx(168.142857142857, abs=1e-12)
        assert r.stddev_pop_v == pytest.approx(5.9384599116647205, rel=1e-15)
        assert r.stddev_samp_v == pytest.approx(6.414269805898183, rel=1e-15)
        assert r.count_v == 7
        assert r.sum_v == 1177

    def test_ogr_sql_6_count_star(self, spark, tables):
        # test_ogr_sql_6
        assert spark.sql("select count(*) as n from poly").collect()[0].n == 10

    def test_ogr_sql_7_fid_special_field(self, spark, tables):
        # test_ogr_sql_7: FID is a queryable column
        got = [r.fid for r in spark.sql(
            "select eas_id, fid from poly where eas_id in (158,165) order by fid"
        ).collect()]
        assert got == [7, 8]

    def test_ogr_sql_8_wildcard(self, spark, tables):
        # test_ogr_sql_8
        got = sorted(r.prfedea for r in spark.sql(
            "select * from poly where eas_id in (158,165)").collect())
        assert got == ["35043369", "35043408"]

    def test_ogr_sql_15_fid_filter(self, spark, tables):
        # test_ogr_sql_15
        got = spark.sql(
            "select fid, eas_id, prfedea from poly where fid = 7").collect()
        assert len(got) == 1 and got[0].eas_id == 158


class TestJoinCorpus:
    def _join(self, tables):
        poly, idlink = tables
        return ogrsql.first_match_left_join(
            poly, idlink.withColumnRenamed("eas_id", "_r_eas"),
            on=poly.eas_id == F.col("_r_eas"),
            left_key="fid", right_order="_r_eas",
        )

    def test_ogr_join_1_count(self, tables):
        # ogr_join_test.py test_ogr_join_1: one output row per left row
        assert self._join(tables).count() == 10

    def test_ogr_join_2_values(self, tables):
        # test_ogr_join_2: NAME for eas_id < 168, in fid (file) order
        j = self._join(tables).filter("eas_id < 168").orderBy("fid")
        assert [r.name for r in j.collect()] == ["_166_", "_158_", "_165_"]

    def test_ogr_join_4_unmatched_null(self, tables):
        # test_ogr_join_4: eas_id > 170 -> ["_179_", "_171_", None, None]
        j = self._join(tables).filter("eas_id > 170").orderBy("fid")
        assert [r.name for r in j.collect()] == ["_179_", "_171_", None, None]

    def test_ogr_join_6_order_by(self, tables):
        # test_ogr_join_6: ORDER BY eas_id -> [171, 172, 173, 179]
        j = self._join(tables).filter("eas_id > 170").orderBy("eas_id")
        assert [r.eas_id for r in j.collect()] == [171, 172, 173, 179]

    def test_ogr_join_first_match_semantics(self, spark, tables):
        # duplicate right keys: the reference fetches ONE feature
        # (ogr_gensql.cpp:1537); deterministic min-order match here
        poly, _ = tables
        dup = spark.createDataFrame(
            [(168, "first"), (168, "second")], schema="k long, tag string")
        j = ogrsql.first_match_left_join(
            poly, dup, on=poly.eas_id == dup.k, left_key="fid",
            right_order="tag",
        )
        assert j.count() == 10
        hit = j.filter("eas_id = 168").collect()[0]
        assert hit.tag == "first"


class TestRfc28Corpus:
    """Replays of autotest/ogr/ogr_sql_rfc28.py against the same fixture."""

    def _count(self, spark, sql):
        return spark.sql(sql).count()

    def test_rfc28_1_expr_left_side(self, spark, tables):
        assert self._count(spark, "select * from poly where 160+7 > eas_id") == 3

    def test_rfc28_2_concat_in_where(self, spark, tables):
        assert self._count(
            spark, "select * from poly where CONCAT('x', prfedea) = 'x35043423'") == 1

    def test_rfc28_4_modulo(self, spark, tables):
        assert self._count(spark, "select * from poly where eas_id % 5 = 1") == 2

    def test_rfc28_6_quoted_field(self, spark, tables):
        assert self._count(spark, 'select * from poly where `eas_id` = 166') == 1

    def test_rfc28_12_constant_select(self, spark, tables):
        r = spark.sql(
            "select 'constant string' as field_1, 'other' as abc, eas_id "
            "from idlink where eas_id = 165").collect()
        assert len(r) == 1
        assert r[0].abc == "other" and r[0].eas_id == 165
        assert r[0].field_1 == "constant string"

    def test_rfc28_13_substr_in_where(self, spark, tables):
        assert self._count(
            spark, "select * from poly where SUBSTR(prfedea, 5, 4) = '3423'") == 1

    def test_rfc28_14_substr_select(self, spark, tables):
        got = sorted(r.s for r in spark.sql(
            "select SUBSTR(prfedea, 4, 5) as s from poly "
            "where eas_id in (168,179)").collect())
        assert got == ["43411", "43423"]

    def test_rfc28_15_concat_cast(self, spark, tables):
        got = sorted(r.s for r in spark.sql(
            "select CONCAT(prfedea, ' ', CAST(eas_id AS STRING)) as s "
            "from poly where eas_id in (168,179)").collect())
        assert got == ["35043411 168", "35043423 179"]

    def test_rfc28_16_negative_numbers(self, spark, tables):
        r = spark.sql(
            "select -1 as f1, 3 - -1 as f2, 3 * -1 as f3, 2e-1 as f4, "
            "3-1 as f5 from poly where eas_id = 168").collect()[0]
        assert (r.f1, r.f2, r.f3, r.f5) == (-1, 4, -3, 2)
        assert r.f4 == pytest.approx(0.2)

    def test_rfc28_17_division_types(self, spark, tables):
        # OGR: 5/2 = 2 (integer division); Spark's / is float -> use div
        r = spark.sql(
            "select 5 div 2 as f1, 5.0/2.0 as f2, 5/2.0 as f3, 5.0/2 as f4 "
            "from poly where eas_id = 168").collect()[0]
        assert r.f1 == 2
        assert float(r.f2) == float(r.f3) == float(r.f4) == 2.5

    def test_rfc28_19_not_in(self, spark, tables):
        assert self._count(
            spark, "select * from poly where eas_id not in (158,165)") == 8

    def test_rfc28_20_precedence_unary_minus(self, spark, tables):
        # select -intfield + 1 + 2*3 + 5 - 3*2 with intfield=2 -> 4
        r = spark.sql("select -2 + 1 + 2*3 + 5 - 3*2 as v").collect()[0]
        assert r.v == 4

    def test_rfc28_21_between_equivalence(self, spark, tables):
        a = self._count(spark, "select * from poly where eas_id between 165 and 169")
        b = self._count(
            spark, "select * from poly where eas_id >= 165 and eas_id <= 169")
        assert a == b == 4

    def test_rfc28_22_not_between(self, spark, tables):
        a = self._count(
            spark, "select * from poly where eas_id not between 165 and 169")
        b = self._count(
            spark, "select * from poly where not(eas_id >= 165 and eas_id <= 169)")
        assert a == b == 6

    def test_rfc28_23_not_like(self, spark, tables):
        a = self._count(
            spark, "select * from poly where prfedea NOT LIKE '35043413'")
        b = self._count(
            spark, "select * from poly where NOT (prfedea LIKE '35043413')")
        assert a == b == 9

    def test_rfc28_24_null_fields(self, spark, tables):
        r = spark.sql(
            "select *, NULL as f4, NULL as nullstrfield, "
            "CAST(null as integer) as nullintfield from poly "
            "where NULL IS NULL").collect()
        # OGR: "NULL IS NULL" is true -> all rows; null projected fields unset
        assert len(r) == 10
        assert r[0].f4 is None and r[0].nullstrfield is None
        assert r[0].nullintfield is None

    def test_rfc28_25_like_escape(self, spark, tables):
        # OGR lets ESCAPE precede ANY character ("x35043408" ESCAPE 'x'
        # -> literal 35043408); ANSI/Spark only permits escaping _, % or
        # the escape char itself and raises otherwise. Same predicate,
        # the portable spelling: unescape the pattern up front.
        import re

        pattern = re.sub("x(.)", r"\1", "x35043408")
        assert self._count(
            spark,
            f"select * from poly where prfedea LIKE '{pattern}'") == 1

    def test_rfc28_26_substr_negative_offset(self, spark, tables):
        got = sorted(r.s for r in spark.sql(
            "select SUBSTR(prfedea, -2) as s from poly "
            "where eas_id in (168,179)").collect())
        assert got == ["11", "23"]

    def test_rfc28_27_float_literal_comparison(self, spark, tables):
        assert self._count(
            spark, "SELECT * FROM poly WHERE 4000000000. > 2000000000.") == 10


class TestSqlCorpusSemantics:
    """More ogr_sql_test.py replays: case sensitivity, empty-table
    aggregates, and the OGR_GEOM_AREA special field."""

    def test_ogr_sql_like_ilike_case(self, spark):
        # test_ogr_sql_like / test_ogr_sql_ilike over the prime_meridian
        # fixture's 'Greenwich' value: LIKE is case-SENSITIVE (GDAL >= 3.1
        # behavior the tests pin), ILIKE is not
        spark.createDataFrame([("Greenwich",), ("Paris",), ("Ferro",)],
                              "name string").createOrReplaceTempView("pm")
        cnt = lambda q: spark.sql(q).count()
        assert cnt("select * from pm where name like 'Green%'") == 1
        assert cnt("select * from pm where name like '%wich'") == 1
        assert cnt("select * from pm where name like 'GREEN%'") == 0
        assert cnt("select * from pm where name ilike 'GREEN%'") == 1
        assert cnt("select * from pm where name ilike '%WICH'") == 1
        assert cnt("select * from pm where name ilike 'FOO%'") == 0

    def test_ogr_sql_11_max_on_empty(self, spark):
        # MAX() over an empty table -> ONE row holding NULL
        spark.createDataFrame([], "eas_id long").createOrReplaceTempView("empty_t")
        rows = spark.sql("select max(eas_id) as m from empty_t").collect()
        assert len(rows) == 1 and rows[0].m is None

    def test_ogr_sql_12_distinct_on_empty(self, spark):
        # DISTINCT over an empty table -> zero rows
        spark.createDataFrame([], "eas_id long").createOrReplaceTempView("empty_t2")
        assert spark.sql("select distinct eas_id from empty_t2").collect() == []

    def test_ogr_sql_25_geom_area_special_field(self, spark):
        # OGR_GEOM_AREA (#2949): filter + project on computed geometry
        # area — our analog is st_area over the WKB geometry column
        from lib_gdal_spark import functions as fns
        from lib_gdal_spark.geo import wkb

        fns.register_all(spark)
        rows = [
            ("0", bytearray(wkb.encode_polygon(
                [[(0, 0), (0, 1), (1, 1), (1, 0), (0, 0)]]))),
            ("1", bytearray(wkb.encode_polygon(
                [[(0, 0), (0, 0.5), (0.5, 0.5), (0.5, 0), (0, 0)]]))),
        ]
        spark.createDataFrame(rows, "test string, geom binary") \
             .createOrReplaceTempView("areas")
        got = spark.sql(
            "SELECT test, st_area(geom) AS ogr_geom_area FROM areas "
            "WHERE st_area(geom) > 0.9").collect()
        assert len(got) == 1
        assert got[0].ogr_geom_area == 1.0 and got[0].test == "0"


class TestSqlCorpusNulls:
    """ogr_sql_test.py 29-36 replays: NULL handling, mixed aggregates,
    implicit conversions, huge projections."""

    def test_ogr_sql_29_is_null(self, spark):
        spark.createDataFrame([("a",), ("b",), (None,)], "strfield string") \
             .createOrReplaceTempView("nulltab")
        assert spark.sql(
            "select * from nulltab where strfield is null").count() == 1
        assert spark.sql(
            "select * from nulltab where strfield is not null").count() == 2

    def test_ogr_sql_30_mixed_agg(self, spark, tables):
        r = spark.sql(
            "select min(eas_id) as m, count(*) as n from poly").collect()[0]
        assert r.n == 10 and r.m == 158

    def test_ogr_sql_31_min_over_empty_filter(self, spark, tables):
        # one row with NULL, no error (#4022)
        r = spark.sql(
            "select min(eas_id) as m from poly where area = 0").collect()
        assert len(r) == 1 and r[0].m is None

    def test_ogr_sql_34_implicit_string_to_numeric(self, spark, tables):
        # eas_id in ('165') -> string literal coerces to the column type
        assert spark.sql(
            "select count(*) as n from poly where eas_id in ('165')"
        ).collect()[0].n == 1

    def test_ogr_sql_35_huge_projection(self, spark, tables):
        # 1024-fold duplicated column list (#4262) analyzes and runs
        cols = "area"
        for _ in range(10):
            cols = cols + "," + cols
        df = spark.sql(f"select {cols} from poly")
        assert len(df.columns) == 1024 and df.count() == 10

    def test_ogr_sql_36_distinct_null_ordering(self, spark):
        # DISTINCT + ORDER BY over a null: asc -> NULL first,
        # desc -> NULL last (the reference's observed ordering; Spark's
        # nulls-first-asc default matches)
        spark.createDataFrame(
            [(1, 2.3, "456", 1234567890123), (None, None, None, None)],
            "intfield int, floatfield double, strfield string, int64field long",
        ).createOrReplaceTempView("nulls36")
        for f in ["intfield", "int64field", "floatfield", "strfield"]:
            asc = spark.sql(
                f"select distinct {f} from nulls36 order by {f} asc").collect()
            assert asc[0][0] is None and asc[1][0] is not None, f
            desc = spark.sql(
                f"select distinct {f} from nulls36 order by {f} desc").collect()
            assert desc[0][0] is not None and desc[1][0] is None, f


class TestSpecialFields:
    # ogr/ogr_p.h:172-179 + ogrfeature.cpp:2445-2495 value semantics
    def test_names_area_wkt(self, spark):
        from pyspark.sql import functions as F

        from lib_gdal_spark import functions as fns
        from lib_gdal_spark.operators import ogrsql

        fns.register_all(spark)
        df = spark.createDataFrame(
            [(1, "POINT (3 4)"),
             (2, "POLYGON ((0 0,4 0,4 3,0 3,0 0))"),
             (3, "LINESTRING (0 0,1 1)"),
             (4, "MULTIPOLYGON (((0 0,2 0,2 2,0 2,0 0)))")],
            "fid long, wkt string").select(
            "fid", F.expr("st_geomfromtext(wkt)").alias("wkb"))
        out = {r.FID: r for r in
               ogrsql.with_special_fields(df).collect()}
        assert out[1].OGR_GEOMETRY == "POINT"
        assert out[2].OGR_GEOMETRY == "POLYGON"
        assert out[3].OGR_GEOMETRY == "LINESTRING"
        assert out[4].OGR_GEOMETRY == "MULTIPOLYGON"
        assert out[1].OGR_GEOM_AREA == 0.0      # OGR_G_Area on a point
        assert out[2].OGR_GEOM_AREA == 12.0
        assert out[4].OGR_GEOM_AREA == 4.0
        assert out[1].OGR_STYLE == ""
        assert out[2].OGR_GEOM_WKT.startswith("POLYGON")

    def test_z_flag_collapses_to_base_name(self, spark):
        from pyspark.sql import functions as F

        from lib_gdal_spark import functions as fns
        from lib_gdal_spark.operators import ogrsql

        fns.register_all(spark)
        df = spark.createDataFrame(
            [(1, "POINT Z (1 2 3)")], "fid long, wkt string").select(
            "fid", F.expr("st_geomfromtext(wkt)").alias("wkb"))
        row = ogrsql.with_special_fields(df).collect()[0]
        assert row.OGR_GEOMETRY == "POINT"

    def test_where_on_special_field(self, spark):
        # the reference-shaped statement runs as plain SQL
        from pyspark.sql import functions as F

        from lib_gdal_spark import functions as fns
        from lib_gdal_spark.operators import ogrsql

        fns.register_all(spark)
        df = spark.createDataFrame(
            [(1, "POINT (0 0)"), (2, "POLYGON ((0 0,1 0,1 1,0 1,0 0))")],
            "fid long, wkt string").select(
            "fid", F.expr("st_geomfromtext(wkt)").alias("wkb"))
        ogrsql.with_special_fields(df).createOrReplaceTempView("lyr")
        got = spark.sql(
            "SELECT FID, OGR_GEOM_AREA FROM lyr "
            "WHERE OGR_GEOMETRY = 'POLYGON'").collect()
        assert len(got) == 1 and got[0].FID == 2
