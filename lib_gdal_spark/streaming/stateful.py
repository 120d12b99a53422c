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
