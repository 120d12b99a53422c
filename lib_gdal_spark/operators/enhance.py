"""gdalenhance — histogram equalization (apps/gdalenhance.cpp).

The reference computes, per band: a 256-bin histogram
(GDALGetDefaultHistogramEx), zeroes the two extreme bins, folds a
half-open cumulative histogram cum[i] = sum(h[:i]) + h[i]/2
(gdalenhance.cpp:426-430), derives a 256-entry LUT
LUT[i] = clamp(cum[i*nHist/nLUT] * nLUT / nTotal) (:453-461), and maps
each pixel through bin = clamp(int((v - scaleMin) * nLUT / (scaleMax -
scaleMin))) (:510-540, EnhancerCallback).

Spark-first: the ONLY data-sized stage is the histogram — a
groupBy(bin).count() with at most 256 groups (map-side combine reduces
everything executor-side; the collect is constant-size). The LUT fold is
256 integer ops on the driver, and the mapping is a pure-Column
element_at over the LUT literal — no shuffle beyond the histogram, no
Python in the hot path, any input size. Every step is integer / rational
arithmetic, so the duckdb twin (window-function cumulative over the same
groupBy) matches bit for bit — no constant injection needed.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F


def equalization_lut(hist: np.ndarray, n_lut_bins: int = 256) -> np.ndarray:
    """ComputeEqualizationLUTs (gdalenhance.cpp:377-469) over a counted
    histogram: zero the extreme bins, half-bin cumulative, integer-scaled
    clamp. Exact integer arithmetic throughout."""
    h = np.asarray(hist, np.int64).copy()
    n_hist = len(h)
    h[0] = 0
    h[n_hist - 1] = 0
    cum = np.concatenate([[0], np.cumsum(h)[:-1]]) + h // 2
    total = max(1, int(h.sum()))  # the reference's zero-total guard
    idx = (np.arange(n_lut_bins, dtype=np.int64) * n_hist) // n_lut_bins
    lut = (cum[idx] * n_lut_bins) // total
    return np.clip(lut, 0, n_lut_bins - 1)


def band_histogram(cells: DataFrame, value_col: str = "value",
                   scale_min: float = -0.5, scale_max: float = 255.5,
                   n_bins: int = 256) -> np.ndarray:
    """Distributed GDALGetDefaultHistogramEx analog: out-of-range values
    clamp into the end bins (bIncludeOutOfRange)."""
    scale = n_bins / (scale_max - scale_min)
    b = F.floor((F.col(value_col) - scale_min) * scale).cast("long")
    b = F.least(F.lit(n_bins - 1), F.greatest(F.lit(0), b))
    rows = cells.groupBy(b.alias("bin")).count().collect()
    h = np.zeros(n_bins, np.int64)
    for r in rows:
        h[r["bin"]] = r["count"]
    return h


def equalize(cells: DataFrame, value_col: str = "value",
             scale_min: float = -0.5, scale_max: float = 255.5,
             n_bins: int = 256, out_col: str = "equalized") -> DataFrame:
    """Histogram-equalize one band: adds `out_col` (byte LUT output).

    Pixel binning replays EnhancerCallback exactly: dfBin = (v -
    scaleMin) * scale; bin = 0 unless dfBin > 0 (NaN-safe), nBins-1
    unless dfBin < nBins-1, else trunc."""
    lut = equalization_lut(band_histogram(
        cells, value_col, scale_min, scale_max, n_bins), n_bins)
    scale = n_bins / (scale_max - scale_min)
    dfbin = (F.col(value_col) - scale_min) * scale
    b = (F.when(~(dfbin > 0), F.lit(0))
         .when(~(dfbin < n_bins - 1), F.lit(n_bins - 1))
         .otherwise(dfbin.cast("long")))
    arr = F.array(*[F.lit(int(v)) for v in lut])
    return cells.withColumn(
        out_col, F.element_at(arr, (b + 1).cast("int")).cast("long"))
