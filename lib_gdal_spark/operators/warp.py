"""Warp / reproject raster with the GDAL resampling-kernel family.

Reference: /root/reference/alg/gdalwarper.cpp:1921-1947 enumerates the
resampling kernels (near, bilinear, cubic, cubicspline, lanczos, average,
rms, mode, max, min, med, q1, q3, sum). The reference pulls target blocks
through a per-block transformer single-node; the distributed recast here
has two shapes, both pure Catalyst:

- FORWARD (aggregating kernels: average / sum / min / max / rms / mode /
  med / q1 / q3): closed-form reprojection of each SOURCE-cell center to
  its target tile (geo/mercator column math), then ONE groupBy(x, y)
  computes the kernel over contributing source cells — a map-side-combined
  shuffle keyed on the output tile, GDAL's area-aggregating kernels on a
  downsampling warp. No search structure, no Python.

- INVERSE (sampling kernels: near / bilinear): the target-tile set is the
  distinct forward image of the source; each target CENTER is
  inverse-projected (mercator.tile_center_*_col, closed form) and samples
  the REGULAR source grid by index arithmetic — floor() for near, a
  4-tap weighted join for bilinear. This is GDAL's pull-based sampling
  re-expressed as an equi-join on source grid indices: shuffle volume is
  |target tiles| x (1 or 4), never |src| x |tgt|.

Scale notes: both shapes shuffle once on the output key; the inverse
join's source side is the (already aggregated) source grid — broadcastable
when it is a coarse overview, hash-joined otherwise. Quantile kernels add
one window over the same (x, y) key, which AQE keeps co-partitioned with
the final aggregate.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F

from ..geo import mercator

AGG_KERNELS = ("average", "sum", "min", "max", "rms", "mode")

# Convolution kernels (the last three of gdalwarper.cpp's 14): taps per
# axis = 2 * radius
CONV_RADIUS = {"cubic": 2, "cubicspline": 2, "lanczos": 3}

_PI = repr(math.pi)


def kernel_weight_sql(d: str, kernel: str) -> str:
    """SQL text for the 1-D kernel weight at signed distance expression
    `d` (in source-grid units). The SAME string runs as a Spark Column
    (F.expr) and inside the duckdb oracle, so the float op ORDER is
    identical across engines by construction (CLAUDE.md exactness rule).

    Formulas are term-for-term the reference's:
    - cubic: Catmull-Rom, alg/gdalresamplingkernels.h:23-42
      (x^2*(1.5|x| - 2.5) + 1; x^2*(-0.5|x| + 2.5) - 4|x| + 2)
    - cubicspline: cubic B-spline, alg/gdalwarpkernel.cpp:3680 GWKBSpline
      (Mitchell (B,C)=(1,0); the reference omits the 1/6 factor and so do
      we — it cancels in the sum(w*v)/sum(w) normalization)
    - lanczos: radius-3 windowed sinc, alg/gdalwarpkernel.cpp:3540
      GWKLanczosSinc including its sin(3x) = (3 - 4 sin^2 x) sin x trick,
      so only ONE transcendental sin() per weight in both engines
    """
    if kernel == "cubic":
        return (
            f"CASE WHEN abs({d}) <= 1.0 THEN"
            f" ({d})*({d}) * (1.5*abs({d}) - 2.5) + 1.0"
            f" WHEN abs({d}) <= 2.0 THEN"
            f" ({d})*({d}) * (-0.5*abs({d}) + 2.5) - 4.0*abs({d}) + 2.0"
            f" ELSE 0.0 END"
        )
    if kernel == "cubicspline":
        return (
            f"CASE WHEN abs({d}) < 1.0 THEN"
            f" 3.0*abs({d})*abs({d})*abs({d})"
            f" - 6.0*abs({d})*abs({d}) + 4.0"
            f" WHEN abs({d}) < 2.0 THEN"
            f" -(abs({d})*abs({d})*abs({d}))"
            f" + 6.0*abs({d})*abs({d}) - 12.0*abs({d}) + 8.0"
            f" ELSE 0.0 END"
        )
    if kernel == "lanczos":
        s = f"sin({_PI}*({d})/3.0)"
        return (
            f"CASE WHEN ({d}) = 0.0 THEN 1.0"
            f" WHEN abs({d}) < 3.0 THEN"
            f" (3.0 - 4.0*({s})*({s})) * (({s})*({s}))"
            f" / (({_PI}*({d})) * ({_PI}*({d})/3.0))"
            f" ELSE 0.0 END"
        )
    raise ValueError(f"unknown convolution kernel {kernel!r}")


def _tiled(src: DataFrame, zoom: int, lon_col: str, lat_col: str,
           value_col: str) -> DataFrame:
    return src.select(
        mercator.tile_x_col(F.col(lon_col), zoom).alias("x"),
        mercator.tile_y_col(F.col(lat_col), zoom).alias("y"),
        F.col(value_col).alias("_v"),
    )


def warp_agg(src: DataFrame, zoom: int, kernel: str,
             lon_col: str = "cx", lat_col: str = "cy",
             value_col: str = "v") -> DataFrame:
    """Forward warp with an aggregating kernel -> (x, y, value).

    src: source-cell centers (lon/lat) + value. Kernel semantics follow
    gdalwarper.cpp / gcore/overview.cpp: mode ties break to the SMALLEST
    value (deterministic under any partitioning)."""
    t = _tiled(src, zoom, lon_col, lat_col, value_col)
    if kernel == "mode":
        g = t.groupBy("x", "y", "_v").agg(F.count(F.lit(1)).alias("_n"))
        w = Window.partitionBy("x", "y").orderBy(F.col("_n").desc(),
                                                 F.col("_v").asc())
        return (
            g.withColumn("_rn", F.row_number().over(w))
            .filter("_rn = 1")
            .select("x", "y", F.col("_v").alias("value"))
        )
    if kernel == "rms":
        # sqrt of the mean square — exact cross-engine when values are
        # integer-valued (squares and sums stay exact, one division)
        agg = F.sqrt(F.avg(F.col("_v") * F.col("_v")))
    else:
        agg = {"average": F.avg("_v"), "sum": F.sum("_v"),
               "min": F.min("_v"), "max": F.max("_v")}[kernel]
    return t.groupBy("x", "y").agg(agg.alias("value"))


def warp_quartiles(src: DataFrame, zoom: int,
                   lon_col: str = "cx", lat_col: str = "cy",
                   value_col: str = "v") -> DataFrame:
    """Forward warp with the med/q1/q3 kernels (gdalwarper.cpp:1940-1943)
    in one pass -> (x, y, q1, med, q3).

    Discrete percentile (percentile_disc): the value at rank
    max(1, ceil(p * n)) in ascending order — identical index arithmetic
    in the duckdb twin, so results are engine-exact (a VALUE from the
    input, never an interpolated float)."""
    t = _tiled(src, zoom, lon_col, lat_col, value_col)
    w = Window.partitionBy("x", "y")
    ranked = t.select(
        "x", "y", "_v",
        F.row_number().over(w.orderBy(F.col("_v").asc())).alias("_rn"),
        F.count(F.lit(1)).over(w).alias("_n"),
    )

    def pick(p: float, name: str):
        idx = F.greatest(F.lit(1), F.ceil(F.lit(p) * F.col("_n")))
        return F.max(F.when(F.col("_rn") == idx, F.col("_v"))).alias(name)

    return ranked.groupBy("x", "y").agg(
        pick(0.25, "q1"), pick(0.5, "med"), pick(0.75, "q3")
    )


def _target_centers(src: DataFrame, zoom: int, lon_col: str, lat_col: str):
    """Distinct target tiles (the forward image of the source) with their
    inverse-projected center coordinates."""
    tgt = src.select(
        mercator.tile_x_col(F.col(lon_col), zoom).alias("x"),
        mercator.tile_y_col(F.col(lat_col), zoom).alias("y"),
    ).distinct()
    return tgt.withColumn(
        "_lon", mercator.tile_center_lon_col(F.col("x"), zoom)
    ).withColumn("_lat", mercator.tile_center_lat_col(F.col("y"), zoom))


def warp_near(src: DataFrame, zoom: int, cell_size: float,
              lon_col: str = "cx", lat_col: str = "cy",
              value_col: str = "v") -> DataFrame:
    """Inverse warp, nearest-neighbor kernel (gdalwarper.cpp near):
    sample the source grid at each target center -> (x, y, value).

    The source must be a regular `cell_size`-degree grid whose cell
    centers sit at (g + 0.5) * cell_size; nearest-cell lookup is then
    floor(coord / cell_size) — index arithmetic, no distance search.
    Target tiles whose center falls in a source hole drop (nodata)."""
    tgt = _target_centers(src, zoom, lon_col, lat_col).select(
        "x", "y",
        F.floor(F.col("_lon") / cell_size).cast("long").alias("_gx"),
        F.floor(F.col("_lat") / cell_size).cast("long").alias("_gy"),
    )
    s = src.select(
        F.floor(F.col(lon_col) / cell_size).cast("long").alias("_gx"),
        F.floor(F.col(lat_col) / cell_size).cast("long").alias("_gy"),
        F.col(value_col).alias("value"),
    )
    return tgt.join(s, on=["_gx", "_gy"], how="inner").select("x", "y", "value")


def warp_bilinear(src: DataFrame, zoom: int, cell_size: float,
                  lon_col: str = "cx", lat_col: str = "cy",
                  value_col: str = "v") -> DataFrame:
    """Inverse warp, bilinear kernel (gdalwarper.cpp bilinear): 4-tap
    weighted sample of the source grid at each target center ->
    (x, y, value). Complete 4-tap windows only (edge/hole tiles drop,
    the engine's deterministic nodata discipline).

    The weights derive from the target center's fractional position in
    source-grid units; the inverse latitude is transcendental, so callers
    comparing across engines must round the weighted fold (the weights
    differ in the last ulp, never more)."""
    taps = F.array(*[
        F.struct(F.lit(i).alias("i"), F.lit(j).alias("j"))
        for i in (0, 1) for j in (0, 1)
    ])
    tgt = _target_centers(src, zoom, lon_col, lat_col).select(
        "x", "y",
        (F.col("_lon") / cell_size - 0.5).alias("_fx"),
        (F.col("_lat") / cell_size - 0.5).alias("_fy"),
        F.explode(taps).alias("_t"),
    ).select(
        "x", "y",
        (F.floor("_fx") + F.col("_t.i")).cast("long").alias("_gx"),
        (F.floor("_fy") + F.col("_t.j")).cast("long").alias("_gy"),
        (
            F.when(F.col("_t.i") == 0,
                   F.lit(1.0) - (F.col("_fx") - F.floor("_fx")))
            .otherwise(F.col("_fx") - F.floor("_fx"))
            * F.when(F.col("_t.j") == 0,
                     F.lit(1.0) - (F.col("_fy") - F.floor("_fy")))
            .otherwise(F.col("_fy") - F.floor("_fy"))
        ).alias("_w"),
    )
    s = src.select(
        F.floor(F.col(lon_col) / cell_size).cast("long").alias("_gx"),
        F.floor(F.col(lat_col) / cell_size).cast("long").alias("_gy"),
        F.col(value_col).alias("_v"),
    )
    return (
        tgt.join(s, on=["_gx", "_gy"], how="inner")
        .groupBy("x", "y")
        .agg(F.sum(F.col("_w") * F.col("_v")).alias("value"),
             F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") == 4)
        .drop("_n")
    )


def warp_convolution(src: DataFrame, zoom: int, cell_size: float,
                     kernel: str = "cubic",
                     lon_col: str = "cx", lat_col: str = "cy",
                     value_col: str = "v") -> DataFrame:
    """Inverse warp with a convolution kernel — cubic / cubicspline /
    lanczos, the last three of gdalwarper.cpp:1921-1947's 14 ->
    (x, y, value).

    Same pull-based shape as `warp_bilinear`, widened to the kernel's
    support: each target-tile center explodes (2r)^2 taps on the regular
    source grid (r=2 for the cubics, r=3 for lanczos) and one
    groupBy(x, y) folds sum(w*v)/sum(w) — normalized convolution, the
    reference's accumulator-weight semantics (GWKResample's
    dfAccumulatorWeight divide; exact 1 for Catmull-Rom, and absorbing
    B-spline's omitted 1/6). Only COMPLETE (2r)^2-tap windows survive
    (edge/hole tiles drop — the engine's nodata discipline).

    Scale: shuffle volume is |target tiles| x (2r)^2 against the
    (already aggregated) source grid — an equi-join on grid indices,
    never |src| x |tgt|; the source side is broadcastable when coarse.

    Weights are evaluated from ONE shared SQL text (kernel_weight_sql)
    reused verbatim by the duckdb oracle, so cross-engine drift is
    limited to the final fold order — callers comparing across engines
    round the output (the weights involve the transcendental inverse
    latitude anyway, as in bilinear).
    """
    r = CONV_RADIUS[kernel]
    ks = list(range(-(r - 1), r + 1))
    taps = F.array(*[
        F.struct(F.lit(i).alias("i"), F.lit(j).alias("j"))
        for i in ks for j in ks
    ])
    wx = kernel_weight_sql("_fx - (floor(_fx) + _t.i)", kernel)
    wy = kernel_weight_sql("_fy - (floor(_fy) + _t.j)", kernel)
    tgt = _target_centers(src, zoom, lon_col, lat_col).select(
        "x", "y",
        (F.col("_lon") / cell_size - 0.5).alias("_fx"),
        (F.col("_lat") / cell_size - 0.5).alias("_fy"),
        F.explode(taps).alias("_t"),
    ).select(
        "x", "y",
        (F.floor("_fx") + F.col("_t.i")).cast("long").alias("_gx"),
        (F.floor("_fy") + F.col("_t.j")).cast("long").alias("_gy"),
        (F.expr(wx) * F.expr(wy)).alias("_w"),
    )
    s = src.select(
        F.floor(F.col(lon_col) / cell_size).cast("long").alias("_gx"),
        F.floor(F.col(lat_col) / cell_size).cast("long").alias("_gy"),
        F.col(value_col).alias("_v"),
    )
    full = (2 * r) * (2 * r)
    return (
        tgt.join(s, on=["_gx", "_gy"], how="inner")
        .groupBy("x", "y")
        .agg((F.sum(F.col("_w") * F.col("_v"))
              / F.sum("_w")).alias("value"),
             F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") == full)
        .drop("_n")
    )
