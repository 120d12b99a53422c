"""Proximity (distance transform) and nodata filling over the cell grid.

References:
- GDALComputeProximity (/root/reference/alg/gdalproximity.cpp:94, 577 LoC):
  for every pixel, the distance to the nearest target pixel, capped at
  MAXDIST; the reference runs a two-pass (top-down + bottom-up) serial
  raster scan — inherently sequential row recurrence.
- GDALFillNodata (/root/reference/alg/rasterfill.cpp, 1,008 LoC): fill
  nodata pixels by inverse-distance weighting of valid pixels found within
  a max search distance, then optional smoothing passes.

Distributed recast: a serial scan recurrence doesn't distribute, but both
ops are "per cell, look at everything within radius R" queries — so for a
bounded MAXDIST they become one explode+groupBy: every TARGET (resp.
valid) cell is exploded to the disk of cells within R around it, and a
groupBy(cell) keeps min(distance) (resp. the IDW fold). Shuffle volume =
targets x pi R^2 — proportional to the answer's support, not the raster
area, and each stage is pure Catalyst (no UDF, exact IEEE sqrt). For
unbounded distances, ring-doubling iteration (operators/knn.py machinery)
is the scale path; the reference itself caps at MAXDIST in practice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _disk_offsets(radius: float):
    r = int(radius)
    offs = [
        (dx, dy)
        for dx in range(-r, r + 1)
        for dy in range(-r, r + 1)
        if dx * dx + dy * dy <= radius * radius
    ]
    return F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx, dy in offs
    ])


def proximity(cells: DataFrame, target_values: list, maxdist: float,
              value_col: str = "value") -> DataFrame:
    """(bx, by, dist) for every grid cell within `maxdist` of a target
    cell (value in target_values), including targets themselves (dist 0).

    Distance is Euclidean in cell units (gdalproximity DISTUNITS=PIXEL).
    Cells farther than maxdist are absent (the reference writes the
    nodata/maxdist fill there — a left-join against the full grid restores
    that form when the caller has one).
    """
    targets = cells.filter(F.col(value_col).isin([float(v) for v in target_values]))
    expl = targets.select(
        F.col("bx").alias("_tx"), F.col("by").alias("_ty"),
        F.explode(_disk_offsets(maxdist)).alias("_o"),
    ).select(
        (F.col("_tx") + F.col("_o.dx")).alias("bx"),
        (F.col("_ty") + F.col("_o.dy")).alias("by"),
        F.sqrt(
            (F.col("_o.dx") * F.col("_o.dx") + F.col("_o.dy") * F.col("_o.dy"))
            .cast("double")
        ).alias("_d"),
    )
    return expl.groupBy("bx", "by").agg(F.min("_d").alias("dist"))


def fillnodata(cells: DataFrame, radius: float,
               value_col: str = "value") -> DataFrame:
    """Fill missing grid cells by inverse-distance-squared weighting of
    present cells within `radius` (rasterfill.cpp IDW semantics; the
    reference's optional smoothing iterations compose by re-running).

    Input: present cells only (nodata = absent row — the engine's NULL
    convention, SURVEY §1.2). Output: (bx, by, value, filled) covering
    present cells (filled=0, value untouched) plus fillable holes
    (filled=1, IDW value).
    """
    expl = cells.select(
        F.col("bx").alias("_sx"), F.col("by").alias("_sy"),
        F.col(value_col).alias("_v"),
        F.explode(_disk_offsets(radius)).alias("_o"),
    ).select(
        (F.col("_sx") + F.col("_o.dx")).alias("bx"),
        (F.col("_sy") + F.col("_o.dy")).alias("by"),
        F.col("_v"),
        (F.col("_o.dx") * F.col("_o.dx") + F.col("_o.dy") * F.col("_o.dy"))
        .cast("double").alias("_d2"),
    ).filter(F.col("_d2") > 0)
    # order-independent IDW: weights are dyadic-exact only for d2 in
    # {1,2,4,...}; sum order still matters at the last ulp, so callers
    # comparing across engines round (the oracle does the same)
    idw = expl.groupBy("bx", "by").agg(
        (F.sum(F.col("_v") / F.col("_d2")) / F.sum(F.lit(1.0) / F.col("_d2")))
        .alias("_fill")
    )
    present = cells.select("bx", "by", F.col(value_col).alias("value"))
    holes = idw.join(present.select("bx", "by"), on=["bx", "by"], how="left_anti")
    return present.withColumn("filled", F.lit(0)).unionByName(
        holes.select("bx", "by", F.col("_fill").alias("value"))
        .withColumn("filled", F.lit(1))
    )
