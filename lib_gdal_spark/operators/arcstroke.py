"""Distributed circular-arc metrics: GetCurveParameters + stroking over a
table of 3-point arcs.

The reference strokes arcs one geometry at a time
(/root/reference/ogr/ogrgeometryfactory.cpp:5677 curveToLineString); this
face runs the same kernel over a DataFrame of arcs — one Arrow batch pass,
no shuffle, embarrassingly parallel (the 100 TB shape: arcs live in rows,
each partition strokes independently; nothing is collected).

Output columns per arc:
- cx, cy: circumcenter (bit-exact rational math, oracle-mirrorable)
- r: radius (reference's sqrt-of-squares DISTANCE form)
- sweep: |alpha2 - alpha0| total swept angle in radians
- n_pts: vertex count of the DEFAULT stroked linestring (4-degree step,
  stealth step-count rule) — measured from the actual stroked array, not
  recomputed from a formula, so the driver query exercises the real
  stroking kernel end to end.
Aligned / degenerate triples yield NULL metrics and n_pts = 3 (the
control points pass through unchanged).
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, types as T

from ..geo import curves

_SCHEMA = T.StructType([
    T.StructField("gid", T.LongType()),
    T.StructField("cx", T.DoubleType()),
    T.StructField("cy", T.DoubleType()),
    T.StructField("r", T.DoubleType()),
    T.StructField("sweep", T.DoubleType()),
    T.StructField("n_pts", T.LongType()),
])


def arc_metrics(df: DataFrame, id_col: str = "gid") -> DataFrame:
    """df: (id_col, x0, y0, x1, y1, x2, y2) -> (gid, cx, cy, r, sweep,
    n_pts). One mapInPandas projection; partition-count independent."""
    from ..session import ship_package

    ship_package(df.sparkSession)

    cols = [id_col, "x0", "y0", "x1", "y1", "x2", "y2"]

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n = len(pdf)
            out = {"gid": pdf[id_col].to_numpy("int64"),
                   "cx": [None] * n, "cy": [None] * n, "r": [None] * n,
                   "sweep": [None] * n, "n_pts": [0] * n}
            x0 = pdf["x0"].to_numpy("float64")
            y0 = pdf["y0"].to_numpy("float64")
            x1 = pdf["x1"].to_numpy("float64")
            y1 = pdf["y1"].to_numpy("float64")
            x2 = pdf["x2"].to_numpy("float64")
            y2 = pdf["y2"].to_numpy("float64")
            for i in range(n):
                prm = curves.get_curve_parameters(
                    x0[i], y0[i], x1[i], y1[i], x2[i], y2[i])
                stroked = curves.curve_to_linestring(
                    (x0[i], y0[i]), (x1[i], y1[i]), (x2[i], y2[i]))
                out["n_pts"][i] = len(stroked)
                if prm is not None:
                    R, cx, cy, a0, _, a2 = prm
                    out["cx"][i] = cx
                    out["cy"][i] = cy
                    out["r"][i] = R
                    out["sweep"][i] = math.fabs(a2 - a0)
            yield pd.DataFrame(out)

    return df.select(*cols).mapInPandas(_batches, schema=_SCHEMA)
