"""nearblack — collar removal (apps/nearblack_lib.cpp, the twopasses
algorithm) replayed distributed.

The reference walks the raster twice (top-down then bottom-up over its
own output), per line running a vertical check against a per-column
counter array plus two horizontal scans (left->right, right->left).
The distributed recast per pass:

- the per-column counter state is a prefix property of the ORIGINAL
  rows above (counts increment only while <= max_non_black, so the
  stored value equals min(cumulative nonblack count, max+1), plus the
  reference's top-line override) -> ONE window over (column, row);
- given that column state, every LINE is independent -> groupBy(row)
  + applyInPandas transliterates ProcessLine (vertical replacement,
  then both horizontal scans over the line being modified, evaluating
  nonblackness on the modified pixels exactly as the reference does).

Two passes = two window + two per-row stages; no driver-side state.
Replays test_nearblack_lib_1's rgbsmall.tif checksums (21106 / 20736 /
21309) exactly.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F


def _scan_line(vals, mask, counts, colors, near_dist, max_nb, repl,
               line_idx, bottom_up):
    """ProcessLine (nearblack_lib.cpp:545) for one line: vertical
    replacement + L->R + R->L horizontal scans. `counts` is the
    per-column state BEFORE this line; returns the modified line and
    post-line counts."""
    w = len(counts)

    def nonblack(px):
        for color in colors:
            nb = False
            for b, cb in enumerate(color):
                if cb - px[b] > near_dist or px[b] > near_dist + cb:
                    nb = True
                    break
            if not nb:
                return False
        return True

    # vertical check
    for i in range(w):
        if counts[i] > max_nb:
            continue
        if nonblack(vals[i]):
            counts[i] += 1
            if counts[i] > max_nb:
                continue
            if line_idx == 0 and max_nb > 0:
                counts[i] = max_nb + 1
                continue
        vals[i][:] = repl
        mask[i] = 0

    # horizontal checks, both directions
    for (i_start, i_end) in ((0, w - 1), (w - 1, 0)):
        nnb = 0
        mh = 0 if bottom_up else max_nb
        idir = 1 if i_start < i_end else -1
        do_test = True
        i = i_start
        while i != i_end:
            if do_test:
                nb = nonblack(vals[i])
                if nb:
                    if counts[i] <= mh:
                        nnb = counts[i]
                    else:
                        nnb += 1
                if nnb > mh:
                    do_test = False
                    i += idir
                    continue
                if nb and mh > 0 and i == i_start:
                    do_test = False
                    i += idir
                    continue
                vals[i][:] = repl
                mask[i] = 0
            elif counts[i] == 0:
                do_test = True
                nnb = 0
            i += idir
    return vals, mask


def _one_pass(cells: DataFrame, width: int, height: int, colors,
              near_dist: int, max_nb: int, repl: float,
              bottom_up: bool) -> DataFrame:
    from ..session import ship_package

    spark = cells.sparkSession
    ship_package(spark)
    # pass-order row index: 0 = first line processed
    r = (F.col("by") if bottom_up
         else (F.lit(height - 1) - F.col("by"))).alias("_r")
    c = cells.select("bx", "by", "vals", "mask", r)

    # nonblackness of the INPUT pixel (drives the counter state)
    col_list = [list(map(float, cc)) for cc in colors]
    nd = float(near_dist)
    match_terms = []
    for k, color in enumerate(col_list):
        ands = " AND ".join(
            f"(NOT ({cb!r} - vals[{b}] > {nd!r}"
            f" OR vals[{b}] > {nd!r} + {cb!r}))"
            for b, cb in enumerate(color))
        match_terms.append(f"({ands})")
    nb_expr = f"NOT ({' OR '.join(match_terms)})"
    c = c.withColumn("_nb", F.expr(nb_expr).cast("int"))

    w = Window.partitionBy("bx").orderBy("_r") \
        .rowsBetween(Window.unboundedPreceding, -1)
    w0 = Window.partitionBy("bx")
    c = c.withColumn("_cum", F.coalesce(F.sum("_nb").over(w), F.lit(0)))
    c = c.withColumn("_top", F.max(
        F.when(F.col("_r") == 0, F.col("_nb"))).over(w0))
    # stored counter value before this line (see module docstring)
    if max_nb > 0:
        cnt = F.when(F.col("_top") == 1, max_nb + 1).otherwise(
            F.least(F.col("_cum"), F.lit(max_nb + 1)))
    else:
        cnt = F.least(F.col("_cum"), F.lit(max_nb + 1))
    c = c.withColumn("_cnt", cnt)

    def run(key, pdf):
        import pandas as pd

        pdf = pdf.sort_values("bx")
        vals = [np.array(v, dtype=np.float64) for v in pdf["vals"]]
        mask = pdf["mask"].to_numpy().copy()
        counts = pdf["_cnt"].to_numpy().copy()
        line_idx = int(pdf["_r"].iloc[0])
        vals, mask = _scan_line(vals, mask, counts, col_list, near_dist,
                                max_nb, repl, line_idx, bottom_up)
        return pd.DataFrame({
            "bx": pdf["bx"].to_numpy(),
            "by": pdf["by"].to_numpy(),
            "vals": [list(v) for v in vals],
            "mask": mask,
        })

    return c.groupBy("by").applyInPandas(
        run, "bx long, by long, vals array<double>, mask long")


def nearblack(cells: DataFrame, width: int, height: int,
              near_dist: int = 15, max_non_black: int = 2,
              white: bool = False, colors=None) -> DataFrame:
    """gdal nearblack, twopasses algorithm.  cells: (bx, by,
    vals array<double>) dense multi-band byte grid, by increasing
    upward.  Returns the same shape plus the validity `mask` column
    (255 kept, 0 collar — the reference's setMask band), with collar
    pixels replaced by 0 (255 with white=True), exactly as the
    reference writes them."""
    if colors is None:
        colors = [[255.0] * _nbands(cells)] if white \
            else [[0.0] * _nbands(cells)]
    repl = 255.0 if (len(colors) == 1 and colors[0]
                     and colors[0][0] == 255) else 0.0
    if "mask" not in cells.columns:
        cells = cells.withColumn("mask", F.lit(255).cast("long"))
    p1 = _one_pass(cells, width, height, colors, near_dist,
                   max_non_black, repl, bottom_up=False)
    return _one_pass(p1, width, height, colors, near_dist,
                     max_non_black, repl, bottom_up=True)


def _nbands(cells: DataFrame) -> int:
    return len(cells.select("vals").head()["vals"])
