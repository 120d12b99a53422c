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


#: 2 * WGS84 semi-major axis — the reference's default Earth diameter
#: when the SRS provides one (viewshed_executor.cpp:161-166)
EARTH_DIAMETER = 2.0 * 6378137.0

#: the reference's default curvature+refraction coefficient (1 - 1/7,
#: viewshed_types.h:77)
CURVE_COEFF_DEFAULT = 0.85714


def viewshed(cells: DataFrame, observer: tuple, maxdist: float,
             observer_height: float = 0.0, target_height: float = 0.0,
             curve_coeff: float = 0.0,
             earth_diameter: float = EARTH_DIAMETER,
             cell_size: float = 1.0, mode: str = "normal") -> DataFrame:
    """(bx, by, value=elevation) -> visibility within `maxdist`
    (euclidean, cell units) of the observer cell.

    Option parity with gdal_viewshed (alg/viewshed/viewshed.cpp):
    - observer_height / target_height: added to the DEM at the observer /
      target cell (GDALViewshedGenerate dfObserverHeight/dfTargetHeight).
    - curve_coeff + earth_diameter: earth-curvature + refraction
      correction [Height] -= curve_coeff * R^2 / earth_diameter, the
      reference's adjustHeight (viewshed_executor.cpp:295, factor
      curveCoeff / (2 * semiMajor) at :166); `cell_size` converts cell
      units to SRS meters for R. Default coefficient when enabled is
      0.85714 (viewshed_types.h:77). All terms stay +-*/ rational
      (R^2 needs no sqrt), so a duckdb twin matches bit for bit.
    - mode: 'normal' -> (bx, by, value, visible int); 'min_height' ->
      (bx, by, value, min_height_from_dem double), the reference's
      GVOT_MIN_TARGET_HEIGHT_FROM_DEM (setOutput :184: how much height
      ABOVE THE DEM a target at the cell needs to become visible; 0 when
      already visible).

    Scale note (why no per-ray sample sharing): targets whose offsets are
    integer multiples of one primitive direction do share a sample
    lattice, and a per-ray running-max window would dedup them — but on
    an integer grid almost all offsets within radius R are themselves
    primitive (density 6/pi^2), each contributing its own ~R samples, so
    ray-sharing saves only the harmonic constant (~1.6x), not a factor of
    R; total exact-LOS volume is Theta(R^3) either way. The reference's
    O(R^2) sweep (Wang et al. 2000) gets there by interpolating required
    heights BETWEEN adjacent rays — an approximation the reference
    accepts; this operator keeps per-target exact LOS, fully distributed
    (bounded explode + equi-join + agg, no collect).
    """
    obx, oby = int(observer[0]), int(observer[1])
    oz_row = cells.filter((F.col("bx") == obx) & (F.col("by") == oby)).select(
        "value").collect()
    if not oz_row:
        raise ValueError(f"observer cell ({obx}, {oby}) not in the grid")
    oz = float(oz_row[0][0]) + float(observer_height)
    # precomputed quotient (CLAUDE.md op-order rule): the per-sample
    # correction is CH * d2 * j^2 / n^2 with d2 in cell^2 units
    ch = float(curve_coeff) * float(cell_size) * float(cell_size) \
        / float(earth_diameter)

    d2 = float(maxdist) * float(maxdist)
    t = cells.select(
        "bx", "by", "value",
        (F.col("bx") - obx).alias("_dx"),
        (F.col("by") - oby).alias("_dy"),
    ).filter(
        (F.col("_dx") * F.col("_dx") + F.col("_dy") * F.col("_dy")) <= d2
    ).withColumn(
        "_n", F.greatest(F.abs("_dx"), F.abs("_dy"))
    ).withColumn(
        "_d2", F.col("_dx") * F.col("_dx") + F.col("_dy") * F.col("_dy")
    )

    # target's adjusted height relative to the observer eye
    zt_rel = F.col("value") + F.lit(float(target_height)) - F.lit(oz)
    if curve_coeff != 0.0:
        zt_rel = zt_rel - F.lit(ch) * F.col("_d2")

    # intermediate samples j = 1 .. n-1 (targets with n <= 1 have none
    # and are always visible)
    s = t.filter(F.col("_n") >= 2).select(
        "bx", "by", "value", "_dx", "_dy", "_n", "_d2",
        F.explode(F.sequence(F.lit(1), F.col("_n") - 1)).alias("_j"),
    ).select(
        "bx", "by", "value", "_n", "_j", "_d2",
        F.floor(F.lit(float(obx)) + F.col("_dx") * F.col("_j") / F.col("_n")
                + F.lit(0.5)).cast("long").alias("_sx"),
        F.floor(F.lit(float(oby)) + F.col("_dy") * F.col("_j") / F.col("_n")
                + F.lit(0.5)).cast("long").alias("_sy"),
    )
    dem = cells.select(F.col("bx").alias("_sx"), F.col("by").alias("_sy"),
                       F.col("value").alias("_zj"))
    zj_rel = F.col("_zj") - F.lit(oz)
    if curve_coeff != 0.0:
        # sample distance^2 = d2 * j^2 / n^2 (rational, no sqrt)
        zj_rel = zj_rel - F.lit(ch) * F.col("_d2") * F.col("_j") \
            * F.col("_j") / (F.col("_n") * F.col("_n"))
    # required relative height at the target subtended by sample j
    q = (zj_rel * F.col("_n") / F.col("_j")).alias("_q")
    joined = s.join(dem, on=["_sx", "_sy"], how="inner")

    if mode == "normal":
        blocked = (
            joined.filter(q >= (F.col("value") + F.lit(float(target_height))
                                - F.lit(oz)
                                - (F.lit(ch) * F.col("_d2")
                                   if curve_coeff != 0.0 else F.lit(0.0))))
            .select("bx", "by").distinct()
        )
        out = t.join(blocked.withColumn("_blk", F.lit(1)), on=["bx", "by"],
                     how="left")
        return out.select(
            "bx", "by", "value",
            F.when(F.col("_blk").isNotNull(), F.lit(0)).otherwise(F.lit(1))
            .alias("visible"),
        )
    if mode != "min_height":
        raise ValueError(f"mode must be 'normal' or 'min_height', got {mode!r}")
    # GVOT_MIN_TARGET_HEIGHT_FROM_DEM: needed = max(0, max_j q_j - zt_rel)
    # where zt_rel EXCLUDES target_height (height is what we solve for)
    need = (joined.select("bx", "by", q)
            .groupBy("bx", "by").agg(F.max("_q").alias("_maxq")))
    zt_dem = F.col("value") - F.lit(oz)
    if curve_coeff != 0.0:
        zt_dem = zt_dem - F.lit(ch) * F.col("_d2")
    return (
        t.join(need, on=["bx", "by"], how="left")
        .select("bx", "by", "value",
                F.greatest(F.lit(0.0),
                           F.coalesce(F.col("_maxq") - zt_dem, F.lit(0.0)))
                .alias("min_height_from_dem"))
    )


def viewshed_cumulative(cells: DataFrame, spacing: int = 10,
                        observer_height: float = 0.0,
                        target_height: float = 0.0) -> DataFrame:
    """Cumulative viewshed — `gdal raster viewshed --mode cumulative`
    (alg/viewshed/cumulative.cpp).

    Reference semantics replayed:
    - observers sit on the grid every `spacing` cells starting at 0
      (Cumulative::run, cumulative.cpp:66-68; default spacing 10,
      viewshed_types.h:84);
    - each observer runs a NORMAL-mode viewshed with visibleVal=1 over
      the FULL extent — cumulative mode ignores any sub-window and has
      no distance cutoff (cumulative.cpp:46-48 + 61-63);
    - per-cell visibility flags are summed into a uint32 rollup
      (rollupRasters, cumulative.cpp:182-195);
    - the rollup is spread over 8 bits: factor = 255 / max(sum), then
      v -> floor(factor * v) (scaleOutput, cumulative.cpp:200-213).
      factor is computed FIRST (a single IEEE divide), then multiplied —
      the same two-op order on both engines, so the floor is exact
      cross-engine.

    Distributed shape: the observer grid is |cells| / spacing^2 rows —
    bounded by construction — so it travels as one broadcast to a
    crossJoin, and every (observer, target) pair resolves its LOS with
    the same bounded explode + equi-join as viewshed(); there is no
    per-observer driver loop, and `spacing` directly controls the
    broadcast bound at scale. Sampling variant vs the reference's
    Wang-et-al. interpolating sweep is as documented on viewshed().

    Output: (bx, by, nvis BIGINT — the raw uint32 rollup, scaled BIGINT
    — the 8-bit spread value actually written by the reference).
    """
    sp = int(spacing)
    obs = cells.filter((F.col("bx") % sp == 0) & (F.col("by") % sp == 0)).select(
        F.col("bx").alias("_ox"), F.col("by").alias("_oy"),
        (F.col("value") + F.lit(float(observer_height))).alias("_oz"),
    )
    p = cells.crossJoin(F.broadcast(obs)).select(
        "bx", "by", "value", "_ox", "_oy", "_oz",
        (F.col("bx") - F.col("_ox")).alias("_dx"),
        (F.col("by") - F.col("_oy")).alias("_dy"),
    ).withColumn("_n", F.greatest(F.abs("_dx"), F.abs("_dy")))

    s = p.filter(F.col("_n") >= 2).select(
        "bx", "by", "value", "_ox", "_oy", "_oz", "_n",
        F.explode(F.sequence(F.lit(1), F.col("_n") - 1)).alias("_j"),
        (F.col("_dx")).alias("_dx"), (F.col("_dy")).alias("_dy"),
    ).select(
        "bx", "by", "value", "_ox", "_oy", "_oz", "_n", "_j",
        F.floor(F.col("_ox") + F.col("_dx") * F.col("_j") / F.col("_n")
                + F.lit(0.5)).cast("long").alias("_sx"),
        F.floor(F.col("_oy") + F.col("_dy") * F.col("_j") / F.col("_n")
                + F.lit(0.5)).cast("long").alias("_sy"),
    )
    dem = cells.select(F.col("bx").alias("_sx"), F.col("by").alias("_sy"),
                       F.col("value").alias("_zj"))
    blocked = (
        s.join(dem, on=["_sx", "_sy"], how="inner")
        .filter((F.col("_zj") - F.col("_oz")) * F.col("_n") / F.col("_j")
                >= (F.col("value") + F.lit(float(target_height))
                    - F.col("_oz")))
        .select("bx", "by", "_ox", "_oy").distinct()
        .withColumn("_blk", F.lit(1))
    )
    vis = (
        p.join(blocked, on=["bx", "by", "_ox", "_oy"], how="left")
        .groupBy("bx", "by")
        .agg(F.sum(F.when(F.col("_blk").isNull(), F.lit(1))
                   .otherwise(F.lit(0))).cast("long").alias("nvis"))
    )
    mx = vis.agg(F.max("nvis").cast("double").alias("_mx"))
    return (
        vis.crossJoin(F.broadcast(mx))
        .select("bx", "by", "nvis",
                F.floor((F.lit(255.0) / F.col("_mx")) * F.col("nvis"))
                .cast("long").alias("scaled"))
    )
