#!/usr/bin/env python
"""One flagship-pipeline run at a given parallelism — the scaling probe.

Submitted via spark-submit --py-files (see scripts/bench_scaling.py).

Phase 0 (untimed setup): synthesize the deterministic pages table to
parquet once (production reads an existing pages table; synthesizing it is
not part of the measured workload — both parallelism levels read the SAME
files).
Timed phase: read pages parquet -> extract text geotags (JVM regex) ->
z12 cell index -> broadcast exact-PIP spatial join -> zoom 0-12 pyramid ->
partitioned parquet sink, with per-partition lineage metrics.

Prints one JSON line with wall seconds and throughput.

Usage: spark-submit --master local[N] --py-files lib.zip scaling_job.py
       [n_pages] [out_dir] [pages_parquet_dir]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F


def main():
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="tiles_")
    pages_dir = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
        tempfile.gettempdir(), f"pages_{n_pages}"
    )

    spark = (
        SparkSession.builder.appName("scaling_job")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism
    spark.conf.set("spark.sql.shuffle.partitions", str(max(cores * 2, 8)))

    import __spark_entry__ as em
    from lib_gdal_spark import metrics
    from lib_gdal_spark.operators import sjoin, tiles
    from lib_gdal_spark.pages.synth import pages_df

    # ---- setup (untimed): materialize the deterministic input once;
    # 64 fixed partitions so both parallelism levels read identical files
    if not os.path.exists(os.path.join(pages_dir, "_SUCCESS")):
        pages_df(spark, n_pages, partitions=64).write.mode("overwrite").parquet(pages_dir)
    if len(sys.argv) > 4 and sys.argv[4] == "prepare":
        print(json.dumps({"prepared": n_pages}))
        spark.stop()
        return

    # warm-up (JVM codegen + python-worker pool spawn), excluded from
    # timing: steady-state throughput is the metric, not container cold-start
    # functional form: decorator type-hints are strings under
    # `from __future__ import annotations` and pandas_udf rejects them
    _warm = F.pandas_udf(lambda x: x * 1.0, "double")

    spark.range(0, 100_000, 1, cores).select(
        F.sum(_warm(F.col("id").cast("double")))
    ).collect()
    spark.read.parquet(pages_dir).limit(1000).count()

    # ---- timed job
    t0 = time.time()
    pages = spark.read.parquet(pages_dir)
    pts = sjoin.with_tile(sjoin.geocode(pages.select("url", "text")), zoom=12)
    pts = metrics.instrument(pts.select("url", "lon", "lat", "tile_x", "tile_y"),
                             "geocode_cell")
    pts.persist()
    # materialize the cache as its own stage: otherwise the PIP filter
    # chains a second python runner into the same task pipeline (2 python
    # workers per task = 2x core oversubscription)
    n_pts = pts.count()
    joined = sjoin.spatial_join(pts, em._rect_polyset(), zoom=7, how="inner")
    join_rows = joined.count()
    pyr = tiles.tile_pyramid(pts, max_zoom=12, min_zoom=0)
    tiles.write_pyramid(pyr, os.path.join(out_dir, "pyramid"))
    wall = time.time() - t0

    n_tiles = spark.read.parquet(os.path.join(out_dir, "pyramid")).count()
    metrics.flush_metrics(spark, os.path.join(out_dir, "_metrics"))

    rows = n_pages + join_rows + n_tiles
    print(json.dumps({
        "cores": cores,
        "n_pages": n_pages,
        "join_rows": join_rows,
        "tiles": n_tiles,
        "sec": round(wall, 3),
        "rows_per_sec": round(rows / wall, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
