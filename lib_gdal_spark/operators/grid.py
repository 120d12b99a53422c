"""Gridding / interpolation: scattered points -> regular cell grid.

Reference: /root/reference/alg/gdalgrid.cpp (4,200 LoC) — inverse distance
weighting (:109), moving average (:629), nearest (:879), data metrics
(minimum :1033, maximum :1327, range :1484, count, average distance), all
driven by a per-output-cell neighborhood search (quadtree + radius).

Distributed recast: candidate (point, cell) pairs come from a bounded
explode — each point contributes to every output cell within `radius`
(ceil(radius/cell) offsets in each axis, a constant fan-out) — then ONE
groupBy(cell) computes the kernel. No per-cell search structure at all:
the equi-join + map-side combine replaces the quadtree, and the fan-out
constant plays the role of the reference's search radius.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F


def _candidates(points: DataFrame, cell_size: float, radius: float,
                x: str, y: str):
    """(cell bx,by, point x,y,z, dist) pairs for cells whose CENTER is
    within `radius` of the point."""
    r = int(math.ceil(radius / cell_size)) + 1
    offsets = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in range(-r, r + 1) for dy in range(-r, r + 1)
    ])
    c = points.select(
        F.col(x).alias("_px"), F.col(y).alias("_py"), F.col("z").alias("_z"),
        F.explode(offsets).alias("_o"),
    ).select(
        (F.floor(F.col("_px") / cell_size) + F.col("_o.dx")).alias("bx"),
        (F.floor(F.col("_py") / cell_size) + F.col("_o.dy")).alias("by"),
        "_px", "_py", "_z",
    )
    cx = (F.col("bx") + 0.5) * cell_size
    cy = (F.col("by") + 0.5) * cell_size
    dist = F.sqrt((cx - F.col("_px")) * (cx - F.col("_px"))
                  + (cy - F.col("_py")) * (cy - F.col("_py")))
    return c.withColumn("_d", dist).filter(F.col("_d") <= radius)


def grid_idw(points: DataFrame, cell_size: float, radius: float,
             power: float = 2.0, x: str = "x", y: str = "y") -> DataFrame:
    """Inverse-distance-weighted interpolation (gdalgrid.cpp:109 semantics:
    w = 1/d^power; an exact-hit point [d~0] dominates via epsilon clamp).
    Output: (bx, by, value) for cells with >=1 point in radius."""
    cand = _candidates(points, cell_size, radius, x, y)
    d = F.greatest(F.col("_d"), F.lit(1e-12))
    # power==2 via plain multiply: libm pow() is not ulp-identical across
    # engines; d*d is (oracle parity)
    w = F.lit(1.0) / (d * d if power == 2.0 else F.pow(d, F.lit(power)))
    return (
        cand.withColumn("_w", w)
        .groupBy("bx", "by")
        .agg((F.sum(F.col("_w") * F.col("_z")) / F.sum("_w")).alias("value"))
    )


def grid_invdistnn(points: DataFrame, cell_size: float, radius: float,
                   max_points: int = 12, min_points: int = 0,
                   smoothing: float = 0.0,
                   x: str = "x", y: str = "y") -> DataFrame:
    """Inverse distance to a power, nearest-neighbor-capped — gdalgrid.cpp
    :191 GDALGridInverseDistanceToAPowerNearestNeighbor with power = 2:
    candidates within `radius` are ranked by smoothed distance^2
    (r^2 + smoothing^2), the nearest `max_points` contribute weight
    1/(r^2 + s^2), and a cell with fewer than `min_points` neighbors is
    nodata (absent).

    power is fixed at 2 so the weight is RATIONAL (no libm pow) — the
    oracle-parity discipline; the reference's general power needs
    pow(r2, p/2) (:316). Rank ties break (distance^2, z) ascending:
    deterministic under any partitioning, and value-equivalent (equal
    d2+z means equal contribution, so which twin is cut is irrelevant).
    The reference's exact-hit short-circuit (:290) becomes the same
    epsilon clamp grid_idw uses. One window + one groupBy over the same
    (bx, by) key — AQE keeps them co-partitioned, single wide exchange.
    """
    cand = _candidates(points, cell_size, radius, x, y)
    cx = (F.col("bx") + 0.5) * cell_size
    cy = (F.col("by") + 0.5) * cell_size
    d2 = ((cx - F.col("_px")) * (cx - F.col("_px"))
          + (cy - F.col("_py")) * (cy - F.col("_py")))
    if smoothing != 0.0:
        d2 = d2 + F.lit(float(smoothing) * float(smoothing))
    c = cand.withColumn("_sd2", F.greatest(d2, F.lit(1e-13)))
    w = Window.partitionBy("bx", "by").orderBy(F.col("_sd2").asc(),
                                               F.col("_z").asc())
    ranked = (c.withColumn("_rk", F.row_number().over(w))
              .filter(F.col("_rk") <= max_points))
    out = (
        ranked.withColumn("_w", F.lit(1.0) / F.col("_sd2"))
        .groupBy("bx", "by")
        .agg((F.sum(F.col("_w") * F.col("_z")) / F.sum("_w")).alias("value"),
             F.count(F.lit(1)).alias("_n"))
    )
    if min_points > 0:
        out = out.filter(F.col("_n") >= min_points)
    return out.drop("_n")


def grid_metrics(points: DataFrame, cell_size: float, radius: float,
                 x: str = "x", y: str = "y",
                 include_pts_distance: bool = False) -> DataFrame:
    """Data metrics per cell (gdalgrid.cpp minimum/maximum/range/count/
    average_distance).

    include_pts_distance adds `average_distance_pts` — the mean pairwise
    distance between the window's points over strict i<j pairs
    (GDALGridDataMetricAverageDistancePts, gdalgrid.cpp:2283; its brute
    path :2361 iterates j>i — the quadtree path :2331 starts j at k and
    so also accumulates zero-length self-pairs, a reference-internal
    inconsistency; we implement the documented strict-pair semantic).
    Cells with a single point get NULL (the reference writes nodata when
    n == 0 pairs). Costs one extra per-cell self-join, O(k^2) pairs for
    k points per window — k is bounded by radius x point density, and
    the join is the same (bx, by) key the metrics groupBy already
    shuffles on, so AQE keeps it co-partitioned."""
    cand = _candidates(points, cell_size, radius, x, y)
    if not include_pts_distance:
        return cand.groupBy("bx", "by").agg(
            F.min("_z").alias("minimum"),
            F.max("_z").alias("maximum"),
            (F.max("_z") - F.min("_z")).alias("range"),
            F.count("_z").alias("count"),
            F.avg("_d").alias("average_distance"),
        )
    # Shared-upstream shape (CLAUDE.md rule): both self-join sides are
    # the SAME windowed frame, and AQE reuses their shuffle stage at
    # runtime (verified: one ReusedQueryStage in the final plan), so the
    # pair join costs ONE exchange of the candidate explode. The base-
    # metrics branch prunes the unused window entirely (plain partial
    # agg before its own, much smaller, exchange) — its explode re-run
    # is map-only and collapses to one row per (cell, stat).
    w = Window.partitionBy("bx", "by").orderBy("_px", "_py", "_z")
    idx = cand.withColumn("_i", F.row_number().over(w))
    base = idx.groupBy("bx", "by").agg(
        F.min("_z").alias("minimum"),
        F.max("_z").alias("maximum"),
        (F.max("_z") - F.min("_z")).alias("range"),
        F.count("_z").alias("count"),
        F.avg("_d").alias("average_distance"),
    )
    a = idx.select("bx", "by", F.col("_i").alias("_ia"),
                   F.col("_px").alias("_ax"), F.col("_py").alias("_ay"))
    b = idx.select("bx", "by", F.col("_i").alias("_ib"),
                   F.col("_px").alias("_bx2"), F.col("_py").alias("_by2"))
    # SHUFFLE_MERGE: the pair side is corpus-sized, so broadcasting it
    # (what the optimizer picks at fixture scale) is wrong at 100 TB —
    # and the sort-merge self-join makes the two sides IDENTICAL
    # exchanges, which Catalyst then computes once (ReusedExchange).
    pd_ = (a.join(b.hint("merge"), on=["bx", "by"])
           .filter(F.col("_ia") < F.col("_ib"))
           .groupBy("bx", "by")
           .agg(F.avg(F.sqrt(
               (F.col("_bx2") - F.col("_ax")) * (F.col("_bx2") - F.col("_ax"))
               + (F.col("_by2") - F.col("_ay")) * (F.col("_by2") - F.col("_ay"))
           )).alias("average_distance_pts")))
    return base.join(pd_, on=["bx", "by"], how="left")


def grid_movavg(points: DataFrame, cell_size: float, radius: float,
                x: str = "x", y: str = "y") -> DataFrame:
    """Moving average (gdalgrid.cpp:629 GDALGridMovingAverage): cell value
    = mean z of the points within `radius` of the cell center.

    The sum goes through DECIMAL so it is fold-order independent, then one
    double division — engine-exact without rounding (the money-sum
    discipline; a plain double avg differs across engines in the last ulp
    depending on aggregation order)."""
    cand = _candidates(points, cell_size, radius, x, y)
    s = F.sum(F.col("_z").cast("decimal(30,6)")).cast("double")
    return cand.groupBy("bx", "by").agg(
        (s / F.count("_z")).alias("value")
    )


def grid_metrics_quadrant(points: DataFrame, cell_size: float, radius: float,
                          min_points: int = 1,
                          x: str = "x", y: str = "y") -> DataFrame:
    """Per-quadrant data metrics (gdalgrid.cpp:1145-1442: the
    nMinPointsPerQuadrant search variant): a cell yields metrics only when
    EVERY quadrant around its center holds >= `min_points` points within
    the radius; otherwise it is nodata (absent).

    Quadrant = (dx >= 0) + 2*(dy >= 0) relative to the cell center —
    exact-double comparisons, identical in the duckdb twin. One extra
    groupBy over the same (bx, by[, quad]) key; AQE keeps the qualifying-
    cell semi-join co-partitioned with the final aggregate."""
    cand = _candidates(points, cell_size, radius, x, y)
    cx = (F.col("bx") + 0.5) * cell_size
    cy = (F.col("by") + 0.5) * cell_size
    c = cand.withColumn(
        "_q",
        F.when(F.col("_px") >= cx, 1).otherwise(0)
        + F.when(F.col("_py") >= cy, 2).otherwise(0),
    )
    perq = c.groupBy("bx", "by", "_q").agg(F.count(F.lit(1)).alias("_nq"))
    ok = (
        perq.groupBy("bx", "by")
        .agg(F.count(F.lit(1)).alias("_kq"), F.min("_nq").alias("_mn"))
        .filter((F.col("_kq") == 4) & (F.col("_mn") >= min_points))
        .select("bx", "by")
    )
    return c.join(ok, on=["bx", "by"], how="left_semi").groupBy("bx", "by").agg(
        F.min("_z").alias("minimum"),
        F.max("_z").alias("maximum"),
        (F.max("_z") - F.min("_z")).alias("range"),
        F.count("_z").alias("count"),
        F.avg("_d").alias("average_distance"),
    )


def grid_linear(points: DataFrame, cell_size: float,
                block_cells: int = 8, margin: float | None = None,
                x: str = "x", y: str = "y") -> DataFrame:
    """Linear (Delaunay/TIN) gridding — gdalgrid.cpp GGA_Linear backed by
    alg/delaunay.c (qhull) in the reference: triangulate the scatter,
    then each output cell takes the barycentric-linear value of the
    triangle containing its center.

    Distributed recast: the plane is cut into square blocks of
    `block_cells` x `block_cells` output cells; every point replicates to
    each block whose `margin`-expanded bbox contains it (<= 4 blocks when
    margin < block size — a bounded explode), each block triangulates its
    LOCAL point set (geo/delaunay.py, sorted first so the result depends
    only on the point set, never on partitioning) and interpolates only
    the cells it OWNS. This matches the global triangulation wherever
    every triangle overlapping an owned cell has circumradius < margin —
    the density assumption that replaces the reference's single-node
    global qhull pass; cells in no local triangle are absent (nodata).
    margin defaults to half the block size. Shuffle: one groupBy on the
    block key; per-block work is O(n_block^2) NumPy, so block_cells (and
    margin) bound the per-task cost — size them so a block holds ~10^3
    points.
    """
    import pandas as pd

    from ..geo.delaunay import delaunay, tin_interpolate
    from ..session import ship_package

    ship_package(points.sparkSession)
    S = float(block_cells * cell_size)
    if margin is None:
        margin = S / 2.0
    r = int(math.ceil(margin / S))
    offsets = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in range(-r, r + 1) for dy in range(-r, r + 1)
    ])
    c = points.select(
        F.col(x).alias("_px"), F.col(y).alias("_py"), F.col("z").alias("_z"),
        F.explode(offsets).alias("_o"),
    ).select(
        (F.floor(F.col("_px") / S) + F.col("_o.dx")).alias("_blk_x"),
        (F.floor(F.col("_py") / S) + F.col("_o.dy")).alias("_blk_y"),
        "_px", "_py", "_z",
    )
    in_halo = (
        (F.greatest(F.col("_blk_x") * S - F.col("_px"),
                    F.col("_px") - (F.col("_blk_x") + 1) * S,
                    F.lit(0.0)) <= margin)
        & (F.greatest(F.col("_blk_y") * S - F.col("_py"),
                      F.col("_py") - (F.col("_blk_y") + 1) * S,
                      F.lit(0.0)) <= margin)
    )
    c = c.filter(in_halo)

    bc = block_cells
    cs = float(cell_size)

    def interp_block(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        blk_x = int(pdf["_blk_x"].iloc[0])
        blk_y = int(pdf["_blk_y"].iloc[0])
        pts = pdf[["_px", "_py"]].to_numpy(np.float64)
        vals = pdf["_z"].to_numpy(np.float64)
        # dedupe exact coordinate duplicates (keep min z — deterministic)
        order = np.lexsort((vals, pts[:, 1], pts[:, 0]))
        pts, vals = pts[order], vals[order]
        _, first = np.unique(pts, axis=0, return_index=True)
        pts, vals = pts[np.sort(first)], vals[np.sort(first)]
        tris = delaunay(pts)
        gx = np.arange(blk_x * bc, (blk_x + 1) * bc, dtype=np.int64)
        gy = np.arange(blk_y * bc, (blk_y + 1) * bc, dtype=np.int64)
        mx, my = np.meshgrid(gx, gy)
        mx, my = mx.ravel(), my.ravel()
        got = tin_interpolate(pts, vals, tris,
                              (mx + 0.5) * cs, (my + 0.5) * cs)
        ok = ~np.isnan(got)
        return pd.DataFrame({"bx": mx[ok], "by": my[ok], "value": got[ok]})

    return c.groupBy("_blk_x", "_blk_y").applyInPandas(
        interp_block, schema="bx long, by long, value double")


def grid_nearest(points: DataFrame, cell_size: float, radius: float,
                 x: str = "x", y: str = "y") -> DataFrame:
    """Nearest-neighbor gridding (gdalgrid.cpp:879): cell value = z of the
    nearest point within radius; deterministic tie-break on z then
    coordinates."""
    from pyspark.sql import Window as W

    cand = _candidates(points, cell_size, radius, x, y)
    w = W.partitionBy("bx", "by").orderBy(
        F.col("_d").asc(), F.col("_z").asc(), F.col("_px").asc(), F.col("_py").asc()
    )
    return (
        cand.withColumn("_rn", F.row_number().over(w))
        .filter("_rn = 1")
        .select("bx", "by", F.col("_z").alias("value"))
    )
