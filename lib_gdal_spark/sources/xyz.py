"""XYZ text raster codec — "x y z" lines, one cell per line.

Reference: frmts/xyz/xyzdataset.cpp (it sorts/scans the file sequentially
to infer the grid). Here the read IS distributed: spark.read.csv splits
the file(s), and cell indices derive from the georeferenced coordinates
by closed-form column math — no sequential inference pass. The grid
registration (origin + cellsize) is either supplied or derived from two
cheap aggregates (min coordinate and the smallest coordinate step).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

_SCHEMA = T.StructType([
    T.StructField("x", T.DoubleType()),
    T.StructField("y", T.DoubleType()),
    T.StructField("z", T.DoubleType()),
])


def read_xyz(spark: SparkSession, path: str, cellsize: float | None = None,
             origin: tuple | None = None, sep: str = " ") -> DataFrame:
    """-> (bx, by, value) cell table. Cell index = round((coord - origin)
    / cellsize); when registration is not supplied it derives from the
    data (origin = min coords; cellsize = min positive x-step), the same
    inference the reference performs in its sequential pre-scan."""
    from pyspark.sql import Window

    raw = spark.read.csv(path, sep=sep, schema=_SCHEMA,
                         ignoreLeadingWhiteSpace=True).dropna()
    if cellsize is None:
        # min consecutive step over the distinct x coordinates (robust to
        # holes at the grid edge); the global-order window runs over at
        # most raster-width rows
        xd = raw.select("x").distinct()
        step = xd.select(
            (F.col("x") - F.lag("x").over(Window.orderBy("x"))).alias("d")
        ).agg(F.min("d")).collect()[0][0]
        cellsize = float(step) if step else 1.0
    if origin is None:
        r = raw.agg(F.min("x"), F.min("y")).collect()[0]
        origin = (float(r[0]), float(r[1]))
    ox, oy = origin
    return raw.select(
        F.round((F.col("x") - ox) / cellsize).cast("long").alias("bx"),
        F.round((F.col("y") - oy) / cellsize).cast("long").alias("by"),
        F.col("z").alias("value"),
    )


def write_xyz(cells: DataFrame, path: str, cellsize: float = 1.0,
              origin: tuple = (0.0, 0.0), sep: str = " ") -> None:
    """(bx, by, value) -> XYZ text (a directory of part files — the
    distributed sink shape; `coalesce(1)` upstream for one file)."""
    ox, oy = origin
    out = cells.select(
        (F.col("bx") * cellsize + ox).alias("x"),
        (F.col("by") * cellsize + oy).alias("y"),
        F.col("value").alias("z"),
    )
    out.select(F.concat_ws(sep, "x", "y", "z").alias("value")) \
        .write.mode("overwrite").text(path)
