"""Raster attribute tables (operators/rat.py) — replays the reference's
autotest/gcore/rat.py fixture plus the VAT.DBF sidecar path
(gcore/gdal_rat_vat_dbf.cpp usage inference) through the engine's own
dBASE codec."""

import pytest
from pyspark.sql import functions as F

from lib_gdal_spark.operators import rat as R


def _autotest_rat(spark):
    # autotest/gcore/rat.py:25 — Value(minmax)/Count(pixelcount),
    # rows (10,100) (11,200) (12,90)
    df = spark.createDataFrame(
        [(0, 10, 100), (1, 11, 200), (2, 12, 90)],
        "_row long, Value long, Count long")
    return R.RasterAttributeTable(df, {"Value": "minmax",
                                       "Count": "pixelcount"})


class TestRowOfValue:
    def test_autotest_rat_1(self, spark):
        rat = _autotest_rat(spark)
        assert rat.usage_col("pixelcount") == "Count"
        assert rat.usage_col("min") == "Value"       # minmax serves both
        assert rat.row_of_value(11.0) == 1           # rat.py:60
        assert rat.row_of_value(10.0) == 0
        assert rat.row_of_value(13.0) == -1

    def test_linear_binning(self, spark):
        df = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c")],
                                   "_row long, name string")
        rat = R.RasterAttributeTable(df, {"name": "name"},
                                     row0min=100.0, binsize=10.0)
        assert rat.row_of_value(100.0) == 0
        assert rat.row_of_value(119.9) == 1
        assert rat.row_of_value(129.9) == 2
        assert rat.row_of_value(99.9) == -1
        assert rat.row_of_value(130.0) == -1


class TestClassify:
    def test_exact_value_join(self, spark):
        rat = _autotest_rat(spark)
        px = spark.createDataFrame(
            [(10.0,), (11.0,), (12.0,), (13.0,)], "value double")
        out = {r.value: (r._row, r.Count)
               for r in R.classify(px, rat).collect()}
        assert out[10.0] == (0, 100)
        assert out[11.0] == (1, 200)
        assert out[12.0] == (2, 90)
        assert out[13.0] == (None, None)             # -1 -> NULL row

    def test_first_match_on_overlap(self, spark):
        # catch-all last row: first record-order match wins (the
        # GetRowOfValue scan order)
        df = spark.createDataFrame(
            [(0, 0, 9, "low"), (1, 10, 19, "high"), (2, 0, 19, "all")],
            "_row long, vmin long, vmax long, name string")
        rat = R.RasterAttributeTable(
            df, {"vmin": "min", "vmax": "max", "name": "name"})
        px = spark.createDataFrame([(5,), (15,), (19,)], "value int")
        out = {r.value: r.name for r in R.classify(px, rat).collect()}
        assert out == {5: "low", 15: "high", 19: "high"}

    def test_binned_classify(self, spark):
        df = spark.createDataFrame([(0, "a"), (1, "b")],
                                   "_row long, name string")
        rat = R.RasterAttributeTable(df, {"name": "name"},
                                     row0min=0.0, binsize=5.0)
        px = spark.createDataFrame([(1.0,), (6.0,), (11.0,)],
                                   "value double")
        out = {r.value: r.name for r in R.classify(px, rat).collect()}
        assert out == {1.0: "a", 6.0: "b", 11.0: None}


class TestVatDbf:
    def test_sidecar_roundtrip(self, spark, tmp_path):
        # write a VALUE/COUNT/CLASS dbf through the engine's shapefile
        # writer, read it back as a RAT with the reference's usage
        # inference (gdal_rat_vat_dbf.cpp:50-108)
        from lib_gdal_spark.sources.shapefile import write_shapefile
        feats = [
            {"VALUE": 1, "COUNT": 10, "CLASS": "water",
             "geom": {"type": 1, "points": [(0.0, 0.0)]}},
            {"VALUE": 2, "COUNT": 20, "CLASS": "forest",
             "geom": {"type": 1, "points": [(1.0, 1.0)]}},
        ]
        base = str(tmp_path / "thematic")
        write_shapefile(feats, base + ".shp")
        rat = R.from_vat_dbf(spark, base + ".dbf")
        assert rat.usages["VALUE"] == "minmax"
        assert rat.usages["COUNT"] == "pixelcount"
        assert rat.usages["CLASS"] == "name"
        assert rat.row_of_value(2) == 1
        rows = {r["_row"]: (r["VALUE"], r["COUNT"], r["CLASS"])
                for r in rat.df.collect()}
        assert rows[0] == (1, 10, "water")
        assert rows[1] == (2, 20, "forest")


class TestFromHistogram:
    def test_counts(self, spark):
        px = spark.createDataFrame(
            [(5,), (5,), (7,), (9,), (9,), (9,)], "value int")
        rat = R.from_histogram(px)
        rows = {r.VALUE: (r._row, r.COUNT) for r in rat.df.collect()}
        assert rows == {5: (0, 2), 7: (1, 1), 9: (2, 3)}
        assert rat.row_of_value(7) == 1


class TestColorTableBridge:
    def test_translate_to_color_table(self, spark):
        # gdal_rat.cpp TranslateToColorTable: entry value -> row color,
        # unmatched entries transparent black, alpha defaults 255
        df = spark.createDataFrame(
            [(0, 0, 1, 10, 20, 30), (1, 3, 4, 40, 50, 60)],
            "_row long, vmin long, vmax long, r long, g long, b long")
        rat = R.RasterAttributeTable(
            df, {"vmin": "min", "vmax": "max", "r": "red",
                 "g": "green", "b": "blue"})
        ct = R.to_color_table(rat)          # scans max 'max' + 1 = 5
        assert len(ct) == 5
        assert ct[0] == (10, 20, 30, 255) and ct[1] == (10, 20, 30, 255)
        assert ct[2] == (0, 0, 0, 0)        # gap value -> no row
        assert ct[3] == (40, 50, 60, 255) and ct[4] == (40, 50, 60, 255)

    def test_translate_requires_rgb(self, spark):
        rat = _autotest_rat(spark)
        assert R.to_color_table(rat) is None

    def test_from_color_table_roundtrip(self, spark):
        entries = [(255, 0, 0, 255), (0, 255, 0, 128), (0, 0, 255)]
        rat = R.from_color_table(spark, entries)
        assert rat.binsize == 1.0 and rat.row0min == 0.0
        assert rat.row_of_value(1) == 1
        ct = R.to_color_table(rat, n_entries=3)
        assert ct == [(255, 0, 0, 255), (0, 255, 0, 128),
                      (0, 0, 255, 255)]
