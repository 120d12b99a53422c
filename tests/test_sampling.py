"""Training-data assembly operators (operators/sampling.py)."""

import pytest
from pyspark.sql import functions as F

from lib_gdal_spark.operators.sampling import (
    dataset_split, host_quota, sequence_pack, split_thresholds_sql,
)


class TestDatasetSplit:
    def test_deterministic_and_complete(self, spark):
        df = spark.range(2000).withColumnRenamed("id", "k")
        out = dataset_split(df, "k").cache()
        assert out.count() == 2000
        a = {r["k"]: r["split"] for r in out.collect()}
        b = {r["k"]: r["split"]
             for r in dataset_split(df, "k").collect()}
        assert a == b  # same key -> same split, always
        frac = out.groupBy("split").count().collect()
        got = {r["split"]: r["count"] / 2000 for r in frac}
        assert got["train"] == pytest.approx(0.9, abs=0.03)
        assert got["val"] == pytest.approx(0.05, abs=0.02)
        out.unpersist()

    def test_sql_twin_matches(self, spark):
        import duckdb

        df = spark.range(500).withColumnRenamed("id", "k")
        got = {r["k"]: r["split"]
               for r in dataset_split(df, "k").collect()}
        con = duckdb.connect()
        sql = split_thresholds_sql("k")
        exp = con.sql(
            f"SELECT k, {sql} AS s FROM range(0, 500) t(k)").fetchall()
        for k, s in exp:
            assert got[k] == s, k


class TestHostQuota:
    def test_cap_and_determinism(self, spark):
        rows = [(i, f"h{i % 3}", float(i % 7)) for i in range(60)]
        df = spark.createDataFrame(rows, "id long, host string, q double")
        out = host_quota(df, "host", 4, "q", "id")
        got = out.groupBy("host").count().collect()
        assert all(r["count"] == 4 for r in got)
        # deterministic kept set: lowest (q, id) per host
        kept = sorted(r["id"] for r in out.collect())
        exp = sorted(sum((sorted(range(h, 60, 3),
                                 key=lambda i: (i % 7, i))[:4]
                          for h in range(3)), []))
        assert kept == exp


class TestSequencePack:
    def test_greedy_semantics(self, spark):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate([5, 5, 5, 9, 2, 20, 1])],
            "id long, tokens long")
        out = sequence_pack(df, "id", "tokens", budget=10, n_buckets=1)
        got = {r["id"]: (r["bin"], r["off"]) for r in out.collect()}
        # hand-replay of the greedy recurrence
        acc, b, exp = 0, 0, {}
        first = True
        for i, t in enumerate([5, 5, 5, 9, 2, 20, 1]):
            if first or acc + t <= 10:
                exp[i] = (b, acc)
                acc += t
                first = False
            else:
                b += 1
                exp[i] = (b, 0)
                acc = t
        assert got == exp
        # the over-budget doc (20) sits alone in its bin
        bins = {}
        for i, (bb, _) in got.items():
            bins.setdefault(bb, []).append(i)
        assert [5] in bins.values()

    def test_partition_count_independent(self, spark):
        rows = [(i, (i * 37) % 900 + 1) for i in range(400)]
        df = spark.createDataFrame(rows, "id long, tokens long")
        a = sorted(map(tuple, sequence_pack(
            df.repartition(2), "id", "tokens", 2048).collect()))
        b = sorted(map(tuple, sequence_pack(
            df.repartition(17), "id", "tokens", 2048).collect()))
        assert a == b

    def test_bins_respect_budget(self, spark):
        rows = [(i, (i * 37) % 900 + 1) for i in range(400)]
        df = spark.createDataFrame(rows, "id long, tokens long")
        out = sequence_pack(df, "id", "tokens", 2048)
        sums = out.groupBy("bucket", "bin").agg(
            F.sum("tokens").alias("s"), F.count("*").alias("n")).collect()
        for r in sums:
            assert r["s"] <= 2048 or r["n"] == 1
