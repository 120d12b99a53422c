"""Tests for the `gdal vector pipeline` analog (plans/pipeline.py)."""

import pytest
from pyspark.sql import functions as F

from lib_gdal_spark.plans import run_pipeline


@pytest.fixture(scope="module")
def src(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("pipe") / "pts.parquet")
    spark.range(100).select(
        F.col("id"),
        ((F.col("id") % 36) * 10.0 - 180.0 + 0.5).alias("lon"),
        ((F.col("id") % 16) * 10.0 - 80.0 + 0.5).alias("lat"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"),
    ).write.mode("overwrite").parquet(p)
    return p


class TestPipeline:
    def test_read_filter_select_limit(self, spark, src):
        out = run_pipeline(
            spark, f"read {src} ! filter lang = 'en' "
            "! select id, lon ! limit 10")
        assert out.columns == ["id", "lon"]
        assert out.count() == 10

    def test_sql_step(self, spark, src):
        out = run_pipeline(
            spark, f"read {src} ! sql SELECT lang, count(*) AS n "
            "FROM input GROUP BY lang")
        got = {r.lang: r.n for r in out.collect()}
        assert got == {"en": 50, "de": 50}

    def test_reproject_adds_meters(self, spark, src):
        from lib_gdal_spark.geo import mercator

        out = run_pipeline(spark, f"read {src} ! limit 1 ! reproject")
        r = out.collect()[0]
        assert r.mx == pytest.approx(r.lon * (mercator.ORIGIN_SHIFT / 180.0))

    def test_clip_halfopen(self, spark, src):
        out = run_pipeline(spark, f"read {src} ! clip 0 0 90 90")
        rows = out.collect()
        assert rows and all(0 <= r.lon < 90 and 0 <= r.lat < 90 for r in rows)

    def test_partitioned_write_and_concat(self, spark, src, tmp_path):
        dst = str(tmp_path / "out")
        run_pipeline(
            spark, f"read {src} ! partition lang ! write {dst}")
        back = spark.read.parquet(dst)
        assert back.count() == 100
        # Hive partition dirs by lang (gdalalg_vector_partition.h scheme)
        assert back.filter("lang = 'en'").count() == 50
        doubled = run_pipeline(spark, f"read {dst} ! concat {dst}")
        assert doubled.count() == 200

    def test_filter_pushdown_survives_chain(self, spark, src):
        # the pipeline adds no optimization barrier: a filter typed after
        # select still reaches the parquet scan as a pushed filter
        out = run_pipeline(
            spark, f"read {src} ! select id, lon, lang ! filter id = 7")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters: [" in plan and "id" in plan.split("PushedFilters")[1][:80]

    def test_unknown_step_raises(self, spark, src):
        with pytest.raises(ValueError, match="unknown pipeline step"):
            run_pipeline(spark, f"read {src} ! frobnicate 3")

    def test_tee_materializes_copy(self, spark, src, tmp_path):
        t = str(tmp_path / "teed")
        out = run_pipeline(
            spark, f"read {src} ! filter lang = 'de' ! tee {t} ! limit 5")
        assert out.count() == 5
        assert spark.read.parquet(t).count() == 50


class TestGeoSteps:
    def test_tile_and_pyramid_end_to_end(self, spark, src, tmp_path):
        out = str(tmp_path / "pyr_out")
        res = run_pipeline(
            spark,
            f"read {src} ! filter lang = 'en' ! tile 6 "
            f"! pyramid 6 0 ! partition z ! write {out}")
        back = spark.read.parquet(out)
        levels = {r.z for r in back.select("z").distinct().collect()}
        assert levels == set(range(7))
        # total count at every level equals the filtered row count
        per = {r.z: r.s for r in back.groupBy("z")
               .agg(F.sum("n_pages").alias("s")).collect()}
        assert all(v == 50 for v in per.values())

    def test_grid_step(self, spark, tmp_path):
        p = str(tmp_path / "ptsz.parquet")
        spark.range(200).select(
            ((F.col("id") * 97 % 500) / 10.0).alias("x"),
            ((F.col("id") * 31 % 500) / 10.0).alias("y"),
            (F.col("id") % 9).cast("double").alias("z"),
        ).write.mode("overwrite").parquet(p)
        out = run_pipeline(spark, f"read {p} ! grid 10 15")
        assert set(out.columns) == {"bx", "by", "value"}
        assert out.count() > 0


class TestGeometrySteps:
    # the three registry steps (gdalalg_vector_pipeline.cpp:138-186)
    # that operate on the wkb column
    def test_buffer_simplify_segmentize(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from lib_gdal_spark import functions as fns
        from lib_gdal_spark.plans.pipeline import run_pipeline

        fns.register_all(spark)
        src = str(tmp_path / "geoms.parquet")
        spark.createDataFrame(
            [(1, "LINESTRING (0 0,10 0)")], "fid long, wkt string"
        ).select("fid", F.expr("st_geomfromtext(wkt)").alias("wkb")) \
         .write.parquet(src)

        seg = run_pipeline(spark, f"read {src} ! segmentize 2.5")
        n = seg.select(F.expr("st_npoints(wkb)").alias("n")).collect()[0].n
        assert n == 5            # 4 segments of 2.5

        buf = run_pipeline(spark, f"read {src} ! buffer 1.0")
        area = buf.select(F.expr("st_area(wkb)").alias("a")).collect()[0].a
        assert 22.0 < area < 23.3   # ~ 2*10 + pi*1^2 = 23.14

        simp = run_pipeline(
            spark, f"read {src} ! segmentize 1.0 ! simplify 0.5")
        n2 = simp.select(
            F.expr("st_npoints(wkb)").alias("n")).collect()[0].n
        assert n2 == 2           # collinear densified points drop back
