"""Viewshed / line-of-sight over the cell grid.

Reference: gdal_viewshed (/root/reference/alg/viewshed.cpp, Wang et al.
2000's sweep: a target is visible iff no intermediate DEM sample along
the observer->target line subtends a larger elevation angle). The
reference sweeps the raster outward single-node; the distributed recast
enumerates each target's line samples as a BOUNDED explode (<= chebyshev
distance, itself <= maxdist cells) and resolves them with one equi-join
against the cell table plus one groupBy — no sequential sweep, no UDF.

Sampling variant (documented): the LOS is sampled at the chebyshev
integer steps j/n of the segment and each sample reads the NEAREST cell
(floor(p + 0.5)); the reference interpolates across cell edges instead.
Missing cells (holes) don't block. The angle test is exact arithmetic:
(z_j - oz) / (j/n * D) >= (z_t - oz) / D reduces to
(z_j - oz) * n / j >= (z_t - oz) — the distance D cancels, so no sqrt
enters the comparison and a duckdb twin matches bit for bit.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F


def line_of_sight(cells: DataFrame, a: tuple, b: tuple) -> bool:
    """gdal.IsLineOfSightVisible (apps surface; autotest/alg/los.py):
    True iff the straight 3-D segment (ax, ay, az) -> (bx, by, bz) stays
    on-or-above the DEM at every chebyshev-sampled cell, endpoints
    included (a point below the terrain at its own cell is not visible —
    the reference's basic-case semantics).

    Scalar API over the distributed cell table: only the <= chebyshev-
    distance sampled cells are filtered out of the table (predicate
    pushdown on (bx, by)), so the lookup touches one partition-pruned
    scan, never a full collect."""
    ax, ay, az = float(a[0]), float(a[1]), float(a[2])
    bx, by, bz = float(b[0]), float(b[1]), float(b[2])
    n = max(1, int(max(abs(bx - ax), abs(by - ay))))
    samples = []
    for j in range(n + 1):
        px = ax + (bx - ax) * j / n
        py = ay + (by - ay) * j / n
        pz = az + (bz - az) * j / n
        samples.append((int(math.floor(px + 0.5)), int(math.floor(py + 0.5)), pz))
    keys = {(sx, sy) for sx, sy, _ in samples}
    cond = None
    for sx, sy in keys:
        c = (F.col("bx") == sx) & (F.col("by") == sy)
        cond = c if cond is None else (cond | c)
    dem = {(r.bx, r.by): r.value for r in
           cells.filter(cond).select("bx", "by", "value").collect()}
    for sx, sy, pz in samples:
        z = dem.get((sx, sy))
        if z is not None and pz < z:
            return False
    return True


def viewshed(cells: DataFrame, observer: tuple, maxdist: float,
             observer_height: float = 0.0) -> DataFrame:
    """(bx, by, value=elevation) -> (bx, by, value, visible int) for every
    cell within `maxdist` (euclidean, cell units) of the observer cell.
    The observer cell itself is emitted visible=1."""
    obx, oby = int(observer[0]), int(observer[1])
    oz_row = cells.filter((F.col("bx") == obx) & (F.col("by") == oby)).select(
        "value").collect()
    if not oz_row:
        raise ValueError(f"observer cell ({obx}, {oby}) not in the grid")
    oz = float(oz_row[0][0]) + float(observer_height)

    d2 = float(maxdist) * float(maxdist)
    t = cells.select(
        "bx", "by", "value",
        (F.col("bx") - obx).alias("_dx"),
        (F.col("by") - oby).alias("_dy"),
    ).filter(
        (F.col("_dx") * F.col("_dx") + F.col("_dy") * F.col("_dy")) <= d2
    ).withColumn(
        "_n", F.greatest(F.abs("_dx"), F.abs("_dy"))
    )

    # intermediate samples j = 1 .. n-1 (targets with n <= 1 have none
    # and are always visible)
    s = t.filter(F.col("_n") >= 2).select(
        "bx", "by", "value", "_dx", "_dy", "_n",
        F.explode(F.sequence(F.lit(1), F.col("_n") - 1)).alias("_j"),
    ).select(
        "bx", "by", "value", "_n", "_j",
        F.floor(F.lit(float(obx)) + F.col("_dx") * F.col("_j") / F.col("_n")
                + F.lit(0.5)).cast("long").alias("_sx"),
        F.floor(F.lit(float(oby)) + F.col("_dy") * F.col("_j") / F.col("_n")
                + F.lit(0.5)).cast("long").alias("_sy"),
    )
    dem = cells.select(F.col("bx").alias("_sx"), F.col("by").alias("_sy"),
                       F.col("value").alias("_zj"))
    blocked = (
        s.join(dem, on=["_sx", "_sy"], how="inner")
        .filter((F.col("_zj") - F.lit(oz)) * F.col("_n") / F.col("_j")
                >= (F.col("value") - F.lit(oz)))
        .select("bx", "by").distinct()
    )
    out = t.join(blocked.withColumn("_blk", F.lit(1)), on=["bx", "by"],
                 how="left")
    return out.select(
        "bx", "by", "value",
        F.when(F.col("_blk").isNotNull(), F.lit(0)).otherwise(F.lit(1))
        .alias("visible"),
    )
