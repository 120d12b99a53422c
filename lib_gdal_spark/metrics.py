"""Per-partition lineage + metrics capture, and snapshot-style resume.

North-rule requirement: "every stage checkpoints per-partition lineage and
row-count/byte metrics to a metadata table so a killed job resumes from the
last committed snapshot". The reference's analogs: GDALProgressFunc
callbacks threaded through every long op (e.g. ogrlayer.cpp:5205) and
gdal2tiles --resume (gdal2tiles.py:1497-1500).

Design:
- `instrument(df, stage)` wraps a DataFrame in a zero-copy mapInPandas
  pass-through that counts rows/bytes per partition into a Spark
  accumulator; after the action, `flush_metrics(spark, path)` appends the
  collected rows to the `_metrics` parquet table (the Iceberg metadata
  table stand-in). The wrapper costs one Arrow pass — use it on stage
  boundaries, not every intermediate.
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
