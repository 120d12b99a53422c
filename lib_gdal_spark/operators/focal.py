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

from pyspark.sql import DataFrame, Window, functions as F

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


# gdal raster neighbors named kernels
# (apps/gdalalg_raster_neighbors.cpp:48-77, from the classic image-
# processing kernel table). Row-major over (row_offset, col_offset).
NEIGHBOR_KERNELS = {
    "u": (3, [0, 0, 0, -1, 0, 1, 0, 0, 0]),
    "v": (3, [0, -1, 0, 0, 0, 0, 0, 1, 0]),
    "equal-3x3": (3, [1] * 9),
    "equal-5x5": (5, [1] * 25),
    "edge1": (3, [0, -1, 0, -1, 4, -1, 0, -1, 0]),
    "edge2": (3, [-1, -1, -1, -1, 8, -1, -1, -1, -1]),
    "sharpen": (3, [0, -1, 0, -1, 5, -1, 0, -1, 0]),
    "gaussian-3x3": (3, [1, 2, 1, 2, 4, 2, 1, 2, 1]),
    "gaussian-5x5": (5, [1, 4, 6, 4, 1, 4, 16, 24, 16, 4,
                         6, 24, 36, 24, 6, 4, 16, 24, 16, 4,
                         1, 4, 6, 4, 1]),
    "unsharp-masking-5x5": (5, [1, 4, 6, 4, 1, 4, 16, 24, 16, 4,
                                6, 24, -476, 24, 6, 4, 16, 24, 16, 4,
                                1, 4, 6, 4, 1]),
}

NEIGHBOR_METHODS = ("mean", "sum", "min", "max", "stddev", "median", "mode")


def neighbors(cells: DataFrame, kernel="equal-3x3", method: str = "mean",
              value_col: str = "value", complete: bool = True) -> DataFrame:
    """gdal raster neighbors (apps/gdalalg_raster_neighbors.cpp +
    frmts/vrt/vrtfilters.cpp:500-690 VRTKernelFilteredSource): combine
    the weighted window values v = pixel * coef (zero-coefficient taps
    skipped) with `method`:

    - mean   — sum(v) / sum(coef over contributing taps) (normalized)
    - sum    — sum(v) (non-normalized)
    - min/max — extreme of the WEIGHTED values (vrtfilters.cpp:595-603)
    - stddev — population stddev of v (Welford in the reference; here
      the algebraically identical (sum(v^2) - sum(v)^2/n)/n — the two
      agree exactly when v is integer-valued, the engine's
      cross-exactness discipline)
    - median — lower middle for odd n, average of the two middles for
      even n (vrtfilters.cpp:649-673 nth_element replay)
    - mode   — the FIRST value (in kernel tap order) to reach the
      maximal multiplicity (vrtfilters.cpp:616-621 `>` only): order by
      count desc, then the tap index of the value's LAST occurrence asc
      — the count of v reaches its final value at v's last tap.

    kernel: a NEIGHBOR_KERNELS name or (size, row-major coefficient
    list). Kernel rows run DOWN the raster (by decreases), matching the
    reference's iII axis. `complete=True` keeps only cells whose
    nonzero-coefficient taps all exist (the reference writes interior
    pixels only — vrtfilters.cpp:536-541); False gives sparse-grid
    semantics like `focal`.

    Scale: one explode (taps x cells, coef-0 taps never shipped) + one
    groupBy — same single-Exchange stencil shape as focal/dem."""
    if isinstance(kernel, str):
        size, coefs = NEIGHBOR_KERNELS[kernel]
    else:
        size, coefs = kernel
        if len(coefs) != size * size:
            raise ValueError("kernel needs size*size coefficients")
    r = size // 2
    taps = [(ii, jj, coefs[(ii + r) * size + (jj + r)],
             (ii + r) * size + (jj + r))
            for ii in range(-r, r + 1) for jj in range(-r, r + 1)
            if coefs[(ii + r) * size + (jj + r)] != 0]
    n_taps = len(taps)
    offsets = F.array(*[
        F.struct(F.lit(jj).alias("dx"), F.lit(-ii).alias("dy"),
                 F.lit(float(c)).alias("coef"), F.lit(k).alias("k"))
        for ii, jj, c, k in taps])
    contrib = cells.select(
        F.explode(offsets).alias("_o"),
        F.col("bx").alias("_sx"), F.col("by").alias("_sy"),
        F.col(value_col).alias("_v"),
    ).select(
        # source cell (_sx,_sy) feeds target (_sx - dx, _sy - dy): the
        # target's tap at offset (dx,dy) reads it
        (F.col("_sx") - F.col("_o.dx")).alias("bx"),
        (F.col("_sy") - F.col("_o.dy")).alias("by"),
        (F.col("_v") * F.col("_o.coef")).alias("v"),
        F.col("_o.coef").alias("coef"),
        F.col("_o.k").alias("k"),
    )
    out_col = f"neighbors_{method}"
    if method in ("mean", "sum", "min", "max", "stddev"):
        aggs = {
            # zero kernel sum (e.g. the u/v/edge kernels) -> 0.0, the
            # reference's nValidCount==0 || dfKernSum==0 branch
            # (vrtfilters.cpp:679-681)
            "mean": F.when(F.sum("coef") != 0.0,
                           F.sum("v") / F.sum("coef")).otherwise(0.0),
            "sum": F.sum("v"),
            "min": F.min("v"),
            "max": F.max("v"),
            "stddev": F.sqrt(
                (F.sum(F.col("v") * F.col("v"))
                 - F.sum("v") * F.sum("v") / F.count("v")) / F.count("v")),
        }
        g = contrib.groupBy("bx", "by").agg(
            aggs[method].alias(out_col), F.count("v").alias("_n"))
    elif method == "median":
        w = Window.partitionBy("bx", "by").orderBy("v")
        ranked = contrib.withColumn("_rn", F.row_number().over(w)) \
                        .withColumn("_n", F.count("v").over(
                            Window.partitionBy("bx", "by")))
        lo = (F.col("_n") + 1) / 2
        g = (ranked.filter((F.col("_rn") == F.floor(lo))
                           | (F.col("_rn") == F.ceil(lo)))
             .groupBy("bx", "by")
             .agg(F.avg("v").alias(out_col), F.max("_n").alias("_n")))
    elif method == "mode":
        per_val = contrib.groupBy("bx", "by", "v").agg(
            F.count("*").alias("_c"), F.max("k").alias("_last"),
            F.lit(1).alias("_one"))
        w = Window.partitionBy("bx", "by").orderBy(
            F.desc("_c"), F.asc("_last"))
        tot = contrib.groupBy("bx", "by").agg(F.count("v").alias("_n"))
        g = (per_val.withColumn("_rn", F.row_number().over(w))
             .filter(F.col("_rn") == 1)
             .select("bx", "by", F.col("v").alias(out_col))
             .join(tot, ["bx", "by"]))
    else:
        raise ValueError(f"unknown method {method!r}")
    if complete:
        g = g.filter(F.col("_n") == n_taps)
    return cells.join(g.drop("_n"), on=["bx", "by"], how="inner")
