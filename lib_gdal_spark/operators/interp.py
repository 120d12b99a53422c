"""Point query on a raster: sample the cell grid at arbitrary coordinates.

Reference: GDALInterpolateAtPoint (alg/gdal_interpolateatpoint.cpp:415 —
nearest / bilinear / cubic sampling of a band at a georeferenced
coordinate) and the gdallocationinfo CLI (apps/gdallocationinfo.cpp).
The reference does one RasterIO window read per queried point; here the
whole point SET is answered in one join: each point explodes to the cell
slots its kernel touches (1 for nearest, 4 for bilinear), equi-joins the
cell table on (bx, by), and a groupBy(point) folds the weighted sum —
two shuffles total, independent of point count, no UDF.

Sampling convention (matches GDALRasterInterpolateAtPoint pixel-center
semantics): cell (bx, by) holds the value at center (bx + 0.5, by + 0.5)
in grid units. Bilinear requires all 4 surrounding centers to exist;
incomplete windows yield no row (the reference returns nodata/FALSE
there, gdal_interpolateatpoint.cpp bilinear branch).

All arithmetic is +-*/ and floor — IEEE-exact across engines, so the
duckdb oracle hashes bit-identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interpolate_at_points(points: DataFrame, cells: DataFrame,
                          x_col: str = "px", y_col: str = "py",
                          value_col: str = "value",
                          method: str = "bilinear",
                          id_col: str = "pt_id") -> DataFrame:
    """Sample `cells` (bx, by, value) at each point. Returns
    (id_col, x, y, value).

    method: 'nearest' | 'bilinear'.
    """
    x, y = F.col(x_col), F.col(y_col)
    if method == "nearest":
        # nearest cell center == containing cell for pixel-center grids
        pt = points.select(
            id_col, x_col, y_col,
            F.floor(x).cast("long").alias("bx"),
            F.floor(y).cast("long").alias("by"),
        )
        return pt.join(cells, on=["bx", "by"], how="inner").select(
            id_col, x_col, y_col, F.col(value_col).alias("value")
        )
    if method != "bilinear":
        raise ValueError(f"unknown method {method}")
    # base cell = the one whose CENTER is at-or-left/above the point
    i0 = F.floor(x - 0.5).cast("long")
    j0 = F.floor(y - 0.5).cast("long")
    fx = x - 0.5 - i0.cast("double")  # in [0,1): weight toward the +x cell
    fy = y - 0.5 - j0.cast("double")
    corners = F.array(*[
        F.struct(F.lit(cx).alias("cx"), F.lit(cy).alias("cy"))
        for cx in (0, 1) for cy in (0, 1)
    ])
    expl = points.select(
        id_col, x_col, y_col, i0.alias("_i0"), j0.alias("_j0"),
        fx.alias("_fx"), fy.alias("_fy"), F.explode(corners).alias("_c"),
    ).select(
        id_col, x_col, y_col,
        (F.col("_i0") + F.col("_c.cx")).alias("bx"),
        (F.col("_j0") + F.col("_c.cy")).alias("by"),
        # wx * wy, picking (1-f) for the near corner and f for the far one
        (
            F.when(F.col("_c.cx") == 0, 1.0 - F.col("_fx")).otherwise(F.col("_fx"))
            * F.when(F.col("_c.cy") == 0, 1.0 - F.col("_fy")).otherwise(F.col("_fy"))
        ).alias("_w"),
    )
    hit = expl.join(cells, on=["bx", "by"], how="inner")
    return (
        hit.groupBy(id_col, x_col, y_col)
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(F.col("_w") * F.col(value_col)).alias("_wv"),
        )
        .filter(F.col("_n") == 4)  # complete 2x2 window only
        .select(id_col, x_col, y_col, F.col("_wv").alias("value"))
    )


def _cubic_w(t):
    """Cubic convolution weight (a=-0.5, the GDAL kernel,
    alg/gdal_interpolateatpoint.cpp cubic branch) as a Catalyst
    expression of the POLYNOMIAL only — callers pass |offset - frac| in
    [0,2). Pure arithmetic, so cross-engine exact."""
    at = F.abs(t)
    return (
        F.when(at <= 1.0, (1.5 * at - 2.5) * at * at + 1.0)
        .when(at < 2.0, ((-0.5 * at + 2.5) * at - 4.0) * at + 2.0)
        .otherwise(F.lit(0.0))
    )


def interpolate_cubic(points: DataFrame, cells: DataFrame,
                      x_col: str = "px", y_col: str = "py",
                      value_col: str = "value",
                      id_col: str = "pt_id") -> DataFrame:
    """Bicubic (4x4 cubic convolution) sampling at points — the third
    member of the reference's nearest/bilinear/cubic set. Same
    corner-explode + equi-join shape as bilinear, 16 taps; weights are
    separable cubic(m - frac) polynomials evaluated per point in
    whole-stage codegen. Complete 4x4 windows only (the reference falls
    back to bilinear at edges; deterministic absence here)."""
    x, y = F.col(x_col), F.col(y_col)
    i0 = F.floor(x - 0.5).cast("long")
    j0 = F.floor(y - 0.5).cast("long")
    fx = x - 0.5 - i0.cast("double")
    fy = y - 0.5 - j0.cast("double")
    taps = F.array(*[
        F.struct(F.lit(mx).alias("mx"), F.lit(my).alias("my"))
        for mx in (-1, 0, 1, 2) for my in (-1, 0, 1, 2)
    ])
    expl = points.select(
        id_col, x_col, y_col, i0.alias("_i0"), j0.alias("_j0"),
        fx.alias("_fx"), fy.alias("_fy"), F.explode(taps).alias("_t"),
    ).select(
        id_col, x_col, y_col,
        (F.col("_i0") + F.col("_t.mx")).alias("bx"),
        (F.col("_j0") + F.col("_t.my")).alias("by"),
        (_cubic_w(F.col("_t.mx").cast("double") - F.col("_fx"))
         * _cubic_w(F.col("_t.my").cast("double") - F.col("_fy"))).alias("_w"),
    )
    hit = expl.join(cells, on=["bx", "by"], how="inner")
    return (
        hit.groupBy(id_col, x_col, y_col)
        .agg(F.count(F.lit(1)).alias("_n"),
             F.sum(F.col("_w") * F.col(value_col)).alias("_wv"),
             F.sum("_w").alias("_ws"))
        .filter(F.col("_n") == 16)
        # cubic weights sum to 1 by construction; normalize anyway so the
        # result is robust to the polynomial's last-ulp drift
        .select(id_col, x_col, y_col, (F.col("_wv") / F.col("_ws")).alias("value"))
    )
