"""Focal (neighborhood) operators over the cell grid — the reference's
raster "window functions" (SURVEY §2.5).

Reference semantics:
- generic k x k neighbor kernel: GDALRasterNeighborsAlgorithm
  (apps/gdalalg_raster_pipeline.cpp:173);
- DEM derivatives (slope/aspect/hillshade/TPI/TRI/roughness) are 3x3
  stencils over elevation (apps/gdaldem_lib.cpp);
- Python pixel functions declare a BufferRadius — a halo of neighbor
  pixels shipped with each block (frmts/vrt/vrtderivedrasterband.cpp:151).

Distributed recast: the halo exchange IS a self-equi-join of the cell table
on shifted keys — explode each cell to the (2k+1)^2 neighbor slots it
feeds, then groupBy the target cell. One shuffle, no UDF for the
aggregating kernels (mean/min/max/sum/count/range); TPI/roughness derive
from those. Sparse-grid semantics: missing neighbors simply don't
contribute (matches nodata-aware kernels).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

FOCAL_STATS = ("mean", "min", "max", "sum", "count", "range")


def focal(cells: DataFrame, stat: str = "mean", k: int = 1,
          value_col: str = "value", include_center: bool = True) -> DataFrame:
    """k-radius focal statistic: out(bx,by) = stat over the (2k+1)^2 window.

    Returns (bx, by, value, focal_<stat>) for cells present in the input.
    """
    offsets = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in range(-k, k + 1) for dy in range(-k, k + 1)
        if include_center or (dx, dy) != (0, 0)
    ])
    contrib = cells.select(
        F.explode(offsets).alias("_o"),
        (F.col("bx")).alias("_sx"), (F.col("by")).alias("_sy"),
        F.col(value_col).alias("_v"),
    ).select(
        (F.col("_sx") + F.col("_o.dx")).alias("bx"),
        (F.col("_sy") + F.col("_o.dy")).alias("by"),
        F.col("_v"),
    )
    aggs = {
        "mean": F.avg("_v"), "min": F.min("_v"), "max": F.max("_v"),
        "sum": F.sum("_v"), "count": F.count("_v"),
        "range": F.max("_v") - F.min("_v"),
    }
    out_col = f"focal_{stat}"
    g = contrib.groupBy("bx", "by").agg(aggs[stat].alias(out_col))
    # keep only cells that exist in the input (stencil over the raster,
    # not its dilation)
    return cells.join(g, on=["bx", "by"], how="inner")


def tpi(cells: DataFrame, value_col: str = "value") -> DataFrame:
    """Topographic Position Index: value - mean(8 neighbors)
    (gdaldem TPI semantics, apps/gdaldem_lib.cpp)."""
    n = focal(cells, "mean", k=1, value_col=value_col, include_center=False)
    return n.withColumn("tpi", F.col(value_col) - F.col("focal_mean")).drop("focal_mean")


def roughness(cells: DataFrame, value_col: str = "value") -> DataFrame:
    """Roughness: max - min over the 3x3 window incl. center (gdaldem)."""
    n = focal(cells, "range", k=1, value_col=value_col, include_center=True)
    return n.withColumnRenamed("focal_range", "roughness")


def tri(cells: DataFrame, value_col: str = "value",
        alg: str = "riley") -> DataFrame:
    """Terrain Ruggedness Index (gdaldem TRI, apps/gdaldem_lib.cpp):
    - 'riley' (the reference's default): sqrt(sum (center-neighbor)^2)
      over the 8-neighborhood;
    - 'wilson': mean |center-neighbor|.
    Sparse-grid semantics: only present neighbors contribute (nodata-aware
    window). Needs per-(center, neighbor) pairs, so the halo explode joins
    the center value back on the (bx, by) key — co-partitioned with the
    final aggregate, still a single real exchange.

    On integer-valued grids both forms are cross-engine exact: squared
    diffs / abs diffs and their sums stay integral; sqrt and one division
    are single IEEE ops."""
    offsets = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in (-1, 0, 1) for dy in (-1, 0, 1) if (dx, dy) != (0, 0)
    ])
    contrib = cells.select(
        F.explode(offsets).alias("_o"),
        F.col("bx").alias("_sx"), F.col("by").alias("_sy"),
        F.col(value_col).alias("_v"),
    ).select(
        (F.col("_sx") + F.col("_o.dx")).alias("bx"),
        (F.col("_sy") + F.col("_o.dy")).alias("by"),
        F.col("_v"),
    )
    j = contrib.join(
        cells.select("bx", "by", F.col(value_col).alias("_c")),
        on=["bx", "by"], how="inner",
    )
    if alg == "riley":
        agg = F.sqrt(F.sum((F.col("_c") - F.col("_v"))
                           * (F.col("_c") - F.col("_v"))))
    elif alg == "wilson":
        agg = F.avg(F.abs(F.col("_c") - F.col("_v")))
    else:
        raise ValueError(f"unknown TRI alg={alg}")
    g = j.groupBy("bx", "by").agg(F.min("_c").alias(value_col),
                                  agg.alias("tri"))
    return g
