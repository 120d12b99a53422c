"""Custom stateful streaming operators via applyInPandasWithState.

The reference has no streaming subsystem (SURVEY §2.11); this is the
engine-native layer a continuously-crawled pages table needs. The flagship
op is STREAMING DEDUP: emit each content hash's first arrival only —
the incremental face of dedup.exact_dedup, with the seen-set as managed
per-group state in the state store (RocksDB on a real cluster).

Scale design:
- groups are hash buckets (`pmod(xxhash64(content), n_buckets)`), so state
  shards evenly across executors and no group's state exceeds
  |distinct|/n_buckets entries;
- state per group is a single array column of seen hashes — at larger
  scale swap the exact set for a Bloom filter in the same state slot
  (same operator shape, bounded memory, documented false-positive rate);
- arrival order within a micro-batch ties break to min doc_id, so replay
  of the same batches reproduces the same survivors (idempotent resume —
  the engine's snapshot discipline, tiles.resume_filter analog).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType, LongType, StructField, StructType,
)

DOCS_SCHEMA = "doc_id long, text string"

_OUT_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("h", LongType()),
])
_STATE_SCHEMA = StructType([StructField("seen", ArrayType(LongType()))])


def _dedup_fn(key, pdf_iter, state: GroupState):
    seen = set(state.get[0]) if state.exists else set()
    out = []
    for pdf in pdf_iter:
        # deterministic within-batch tie-break: first occurrence = min
        # doc_id per hash
        pdf = pdf.sort_values("doc_id")
        fresh = pdf[~pdf["h"].isin(seen) & ~pdf.duplicated("h", keep="first")]
        out.append(fresh[["doc_id", "h"]])
        seen.update(int(x) for x in fresh["h"])
    state.update((list(seen),))
    yield pd.concat(out) if out else pd.DataFrame({"doc_id": [], "h": []})


def keyed_hashes(df: DataFrame, content_col: str = "text",
                 n_buckets: int = 64) -> DataFrame:
    """content -> (doc_id, h, bucket): xxhash64 content hash + state shard."""
    return df.select(
        "doc_id",
        F.xxhash64(F.col(content_col)).alias("h"),
    ).withColumn("bucket", F.pmod("h", F.lit(n_buckets)))


def dedup_stream(spark: SparkSession, src_dir: str, n_buckets: int = 64,
                 query_name: str = "dedup_stream"):
    """Start the streaming first-arrival dedup over a parquet file source.

    Memory sink for test determinism; production sinks via foreachBatch to
    a partitioned table keyed by epoch for idempotent commits."""
    src = spark.readStream.schema(DOCS_SCHEMA).parquet(src_dir)
    keyed = keyed_hashes(src, n_buckets=n_buckets)
    out = keyed.groupBy("bucket").applyInPandasWithState(
        _dedup_fn,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )


def dedup_batch_twin(df: DataFrame, content_col: str = "text") -> DataFrame:
    """Batch twin: min doc_id per content hash — what the stream must
    equal after processAllAvailable() over the same files."""
    return (
        keyed_hashes(df, content_col)
        .groupBy("h")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id", "h")
    )


# ---------------------------------------------------------------- keep-latest

PAGES_SCHEMA = "url string, warc_ts long, doc_id long"

_SNAP_OUT = StructType([
    StructField("url_h", LongType()),
    StructField("warc_ts", LongType()),
    StructField("doc_id", LongType()),
])
_SNAP_STATE = StructType([
    StructField("uh", ArrayType(LongType())),
    StructField("ts", ArrayType(LongType())),
    StructField("pid", ArrayType(LongType())),
])


def _latest_fn(key, pdf_iter, state: GroupState):
    """Keep-latest per url hash: emit a row whenever a url's newest-known
    crawl improves ((ts, doc_id) lexicographic — the latest_snapshot
    tie-break); stale arrivals emit nothing. The LAST emission per url
    therefore equals the batch twin at any processAllAvailable() point."""
    if state.exists:
        uh, ts, pid = state.get
        best = {int(u): (int(t), int(p)) for u, t, p in zip(uh, ts, pid)}
    else:
        best = {}
    out = []
    for pdf in pdf_iter:
        pdf = pdf.sort_values(["warc_ts", "doc_id"])  # winners arrive last
        for row in pdf.itertuples(index=False):
            k = int(row.url_h)
            cand = (int(row.warc_ts), int(row.doc_id))
            if k not in best or cand > best[k]:
                best[k] = cand
                out.append((k, cand[0], cand[1]))
    state.update((
        [k for k in best], [v[0] for v in best.values()],
        [v[1] for v in best.values()],
    ))
    yield pd.DataFrame(out, columns=["url_h", "warc_ts", "doc_id"])


def latest_snapshot_stream(spark: SparkSession, src_dir: str,
                           n_buckets: int = 64,
                           query_name: str = "latest_stream"):
    """Streaming keep-latest crawl dedup — the incremental face of
    pages.ops.latest_snapshot. State shards by url-hash bucket; per-url
    state is one (ts, doc_id) pair, so state size is |distinct urls|,
    independent of crawl history length."""
    src = spark.readStream.schema(PAGES_SCHEMA).parquet(src_dir)
    keyed = src.select(
        F.xxhash64("url").alias("url_h"), "warc_ts", "doc_id",
    ).withColumn("bucket", F.pmod("url_h", F.lit(n_buckets)))
    out = keyed.groupBy("bucket").applyInPandasWithState(
        _latest_fn,
        outputStructType=_SNAP_OUT,
        stateStructType=_SNAP_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )


def latest_batch_twin(df: DataFrame) -> DataFrame:
    """Batch twin: max (warc_ts, doc_id) per url hash."""
    from pyspark.sql import Window

    w = Window.partitionBy("url_h").orderBy(F.col("warc_ts").desc(),
                                            F.col("doc_id").desc())
    return (
        df.select(F.xxhash64("url").alias("url_h"), "warc_ts", "doc_id")
        .withColumn("_rn", F.row_number().over(w))
        .filter("_rn = 1").drop("_rn")
    )
