"""DEM derivatives (slope / aspect / hillshade) over the cell grid.

Reference: gdaldem (apps/gdaldem_lib.cpp) — 3x3 Horn stencils over
elevation; registered as pipeline steps at
apps/gdalalg_raster_pipeline.cpp:181-223. The reference walks the raster
row-by-row keeping a 3-line window; here the window is ONE self-equi-join
shuffle: every cell is exploded into the 9 neighbor slots it feeds
(labelled z1..z9), then a groupBy(target) pivots the window into columns
and the Horn formula runs as pure Catalyst column math — whole-stage
codegen, no UDF, no Python.

Grid convention: by grows SOUTH (raster row order), bx grows EAST, so
z1..z9 sweep NW..SE:

    z1 z2 z3        z1 = (bx-1, by-1)   north-west
    z4 z5 z6        z5 = center
    z7 z8 z9        z9 = (bx+1, by+1)   south-east

Horn (gdaldem_lib.cpp, GDALSlopeHornAlg / GDALHillshade):
    dzdx = ((z3 + 2*z6 + z9) - (z1 + 2*z4 + z7)) / (8 * xres)
    dzdy = ((z7 + 2*z8 + z9) - (z1 + 2*z2 + z3)) / (8 * yres)
    slope_pct  = 100 * sqrt(dzdx^2 + dzdy^2)        (gdaldem slope -p)
    slope_deg  = degrees(atan(sqrt(...)))
    aspect_deg = azimuth of steepest descent
    hillshade  = 255 * (cos(zen)*cos(s) + sin(zen)*sin(s)*cos(az - a))

Edge semantics: output only cells whose full 3x3 window exists (the
reference's default skips/mirrors edges; complete-window-only keeps the
distributed result deterministic under any partitioning).

The transcendental-free forms (slope_pct, dzdx/dzdy, compass sector) are
what the cross-engine oracle checks hash — atan/cos differ by ULPs across
math libraries, sqrt and +-*/ are IEEE-exact everywhere.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

_OFFSETS = [  # (label, dx, dy) with by growing south
    ("z1", -1, -1), ("z2", 0, -1), ("z3", 1, -1),
    ("z4", -1, 0), ("z5", 0, 0), ("z6", 1, 0),
    ("z7", -1, 1), ("z8", 0, 1), ("z9", 1, 1),
]


def window3x3(cells: DataFrame, value_col: str = "value") -> DataFrame:
    """(bx, by, z1..z9) for every cell with a complete 3x3 neighborhood.

    One explode (x9) + one groupBy shuffle; volume bounded by 9x the cell
    count, partial-aggregated map-side. At pyramid scale this is the same
    halo-exchange shape as focal.focal()."""
    offs = F.array(*[
        F.struct(F.lit(lbl).alias("slot"), F.lit(dx).alias("dx"),
                 F.lit(dy).alias("dy"))
        for lbl, dx, dy in _OFFSETS
    ])
    contrib = cells.select(
        F.explode(offs).alias("_o"), F.col("bx").alias("_sx"),
        F.col("by").alias("_sy"), F.col(value_col).alias("_v"),
    ).select(
        # the source cell at (sx, sy) occupies slot (lbl) of the window
        # centered at (sx - dx, sy - dy)
        (F.col("_sx") - F.col("_o.dx")).alias("bx"),
        (F.col("_sy") - F.col("_o.dy")).alias("by"),
        F.col("_o.slot").alias("slot"),
        F.col("_v"),
    )
    # conditional aggregation, NOT groupBy().pivot(): pivot plans as TWO
    # aggregations (groupBy+slot pre-agg, then pivotfirst) = two shuffles
    # of the exploded volume; max(when(slot=..)) folds in ONE map-side-
    # combined shuffle (each slot holds at most one value per window)
    g = contrib.groupBy("bx", "by").agg(*[
        F.max(F.when(F.col("slot") == lbl, F.col("_v"))).alias(lbl)
        for lbl, _, _ in _OFFSETS
    ])
    cond = None
    for lbl, _, _ in _OFFSETS:
        c = F.col(lbl).isNotNull()
        cond = c if cond is None else (cond & c)
    return g.filter(cond)


def _dz(xres: float, yres: float):
    dzdx = (
        (F.col("z3") + 2 * F.col("z6") + F.col("z9"))
        - (F.col("z1") + 2 * F.col("z4") + F.col("z7"))
    ) / F.lit(8.0 * xres)
    dzdy = (
        (F.col("z7") + 2 * F.col("z8") + F.col("z9"))
        - (F.col("z1") + 2 * F.col("z2") + F.col("z3"))
    ) / F.lit(8.0 * yres)
    return dzdx, dzdy


def slope(cells: DataFrame, value_col: str = "value", xres: float = 1.0,
          yres: float = 1.0, percent: bool = True) -> DataFrame:
    """gdaldem slope. percent=True -> the -p flag (100*rise/run, exact
    IEEE); percent=False -> degrees (atan)."""
    w = window3x3(cells, value_col)
    dzdx, dzdy = _dz(xres, yres)
    mag = F.sqrt(dzdx * dzdx + dzdy * dzdy)
    out = (100.0 * mag) if percent else F.degrees(F.atan(mag))
    name = "slope_pct" if percent else "slope_deg"
    return w.select("bx", "by", dzdx.alias("dzdx"), dzdy.alias("dzdy"),
                    out.alias(name))


def aspect(cells: DataFrame, value_col: str = "value",
           sector: bool = True) -> DataFrame:
    """gdaldem aspect. sector=True returns the 8-way compass sector
    0..7 (N, NE, E, SE, S, SW, W, NW) by sign/magnitude comparisons only
    (cross-engine exact); sector=False returns degrees via atan2
    (gdaldem convention: 0 = north, clockwise)."""
    w = window3x3(cells, value_col)
    dzdx, dzdy = _dz(1.0, 1.0)
    if not sector:
        deg = F.degrees(F.atan2(dzdy, -dzdx))
        deg = F.when(deg < 0, deg + 360.0).otherwise(deg)
        # rotate math-angle (0=east, CCW) to compass (0=north, CW)
        compass = (450.0 - deg) % 360.0
        return w.select("bx", "by", compass.alias("aspect_deg"))
    # downhill direction sign pattern; |dzdx| vs |dzdy| picks the axis.
    # flat cells (both zero) -> -1
    ax, ay = F.abs(dzdx), F.abs(dzdy)
    east = dzdx < 0  # downhill toward +x
    south = dzdy < 0  # downhill toward +y (by grows south)
    sec = (
        F.when((ax == 0) & (ay == 0), F.lit(-1))
        .when(ax >= 2 * ay, F.when(east, F.lit(2)).otherwise(F.lit(6)))  # E/W
        .when(ay >= 2 * ax, F.when(south, F.lit(4)).otherwise(F.lit(0)))  # S/N
        .otherwise(
            F.when(east & ~south, F.lit(1))   # NE
            .when(east & south, F.lit(3))     # SE
            .when(~east & south, F.lit(5))    # SW
            .otherwise(F.lit(7))              # NW
        )
    )
    return w.select("bx", "by", sec.cast("int").alias("aspect_sector"))


def hillshade(cells: DataFrame, value_col: str = "value", xres: float = 1.0,
              yres: float = 1.0, azimuth: float = 315.0,
              altitude: float = 45.0, zfactor: float = 1.0) -> DataFrame:
    """gdaldem hillshade (Horn, ZevenbergenThorne excluded), 0..255."""
    w = window3x3(cells, value_col)
    dzdx, dzdy = _dz(xres / zfactor, yres / zfactor)
    zen = math.radians(90.0 - altitude)
    az = math.radians(360.0 - azimuth + 90.0)
    slope_r = F.atan(F.sqrt(dzdx * dzdx + dzdy * dzdy))
    aspect_r = F.atan2(-dzdy, dzdx)
    shade = (
        F.lit(math.cos(zen)) * F.cos(slope_r)
        + F.lit(math.sin(zen)) * F.sin(slope_r) * F.cos(F.lit(az) - aspect_r)
    )
    val = F.greatest(F.lit(0.0), F.least(F.lit(255.0), 255.0 * shade))
    return w.select("bx", "by", F.round(val, 4).alias("hillshade"))


def color_relief(cells: DataFrame, ramp, value_col: str = "value") -> DataFrame:
    """gdaldem color-relief (apps/gdaldem_lib.cpp color-relief mode,
    default interpolated colors): map elevations to RGB by piecewise
    LINEAR interpolation between sorted ramp entries
    [(elev, r, g, b), ...]; values below/above the ramp clamp to the end
    colors.

    Per-segment slopes are precomputed driver-side as plain doubles, so
    each channel is `c_i + (v - v_i) * slope` — two IEEE ops, identical
    in a duckdb twin with the same injected constants. Output:
    (bx, by, value, r, g, b)."""
    ramp = sorted((float(v), float(r), float(g), float(b))
                  for v, r, g, b in ramp)
    v = F.col(value_col)

    def channel(idx):
        expr = F.lit(ramp[-1][idx])                    # clamp above
        # REVERSED so the first segment's test ends outermost — the
        # when-chain must check segments in ascending order
        for (v0, *c0), (v1, *c1) in reversed(list(zip(ramp[:-1], ramp[1:]))):
            slope = (c1[idx - 1] - c0[idx - 1]) / (v1 - v0)
            expr = F.when(
                v < F.lit(v1),
                F.lit(c0[idx - 1]) + (v - F.lit(v0)) * F.lit(slope),
            ).otherwise(expr)
        return F.when(v < F.lit(ramp[0][0]), F.lit(ramp[0][idx])).otherwise(expr)

    return cells.select(
        "bx", "by", v.alias("value"),
        channel(1).alias("r"), channel(2).alias("g"), channel(3).alias("b"),
    )
