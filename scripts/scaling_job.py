#!/usr/bin/env python
"""One flagship-pipeline run at a given parallelism — the scaling probe.

Submitted via spark-submit --py-files (see scripts/bench_scaling.py). Runs:
synthetic pages (deterministic, partition-independent) -> geocode ->
cell index -> broadcast exact-PIP spatial join -> zoom 0-12 pyramid ->
parquet sink. Prints one JSON line with wall seconds and throughput.

Usage: spark-submit --master local[N] --py-files lib.zip scaling_job.py
       [n_pages] [out_dir]
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

    # warm-up (JVM/codegen), excluded from timing
    spark.range(10_000).select(F.sum("id")).collect()

    t0 = time.time()
    pages = pages_df(spark, n_pages)
    pts = sjoin.with_tile(sjoin.geocode(pages.select("url", "text")), zoom=12)
    pts = metrics.instrument(pts, "geocode_cell")
    joined = sjoin.spatial_join(pts, em._rect_polyset(), zoom=7, how="inner")
    join_rows = joined.count()
    pyr = tiles.tile_pyramid(pts.select("url", "tile_x", "tile_y"),
                             max_zoom=12, min_zoom=0)
    tiles.write_pyramid(pyr, os.path.join(out_dir, "pyramid"))
    n_tiles = spark.read.parquet(os.path.join(out_dir, "pyramid")).count()
    wall = time.time() - t0
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
