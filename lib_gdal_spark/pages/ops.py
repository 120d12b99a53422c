"""Operators over the Common-Crawl page shape (url, warc_ts, html, text,
lang) — the input_hint table the engine is built around.

These are the crawl-maintenance passes a 10^12-page corpus needs before
any spatial/text analytics run, expressed as plain Catalyst (window +
aggregate) so they ride AQE and bucketing like every other operator:

- latest_snapshot: one row per url, the newest crawl wins (ties break on
  the largest secondary key — deterministic under any partitioning).
  This is the "current web" view over an append-only WARC history, and
  the batch twin of streaming/stateful.py's first-arrival dedup (keep
  LAST by time instead of keep FIRST by arrival).
- host / host_stats: host extraction (regex — identical in the duckdb
  twin) and per-host rollups, the unit of politeness/partitioning in
  crawl pipelines (hot-host skew is the salting lever's target).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_HOST_RE = r"^[a-z]+://([^/]+)"


def host(df: DataFrame, url_col: str = "url",
         out_col: str = "host") -> DataFrame:
    """Extract the host from the url (scheme://host/...)."""
    return df.withColumn(out_col, F.regexp_extract(F.col(url_col),
                                                   _HOST_RE, 1))


def latest_snapshot(df: DataFrame, url_col: str = "url",
                    ts_col: str = "warc_ts",
                    tie_col: str | None = None) -> DataFrame:
    """One row per url: the newest warc_ts wins; equal timestamps break
    to the LARGEST tie_col (default: the ts column again, then the rest
    is already unique by contract). Deterministic, partition-invariant."""
    order = [F.col(ts_col).desc()]
    if tie_col:
        order.append(F.col(tie_col).desc())
    w = Window.partitionBy(url_col).orderBy(*order)
    return (df.withColumn("_rn", F.row_number().over(w))
            .filter("_rn = 1").drop("_rn"))


def host_stats(df: DataFrame, url_col: str = "url",
               text_col: str = "text") -> DataFrame:
    """Per-host rollup: page count + total/mean text length — the
    host-skew histogram that sizes the salting lever."""
    h = host(df, url_col)
    return h.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.sum(F.length(text_col)).alias("total_chars"),
        (F.sum(F.length(text_col)) / F.count(F.lit(1))).alias("mean_chars"),
    )
