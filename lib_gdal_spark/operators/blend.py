"""gdal raster blend (apps/gdalalg_raster_blend.cpp): composite an
overlay raster onto a color raster.

Two operators, matching the reference's SetChoices (blend.cpp:81):

- src-over  — Porter-Duff over with integer byte math, exactly the
  reference's general scalar path (blend.cpp:1176-1212): overlay alpha
  scaled by opacity, (x*y + 255)/256 products, the (dst*255 + dstA/2)
  / dstA un-premultiply when dstA is not 0/255, min(…, 255) clamp.
  Pure integer -> exact duckdb oracle.
- hsv-value — replace the V channel of the color image with a
  grayscale overlay (hillshade compositing; derived from the
  reference's hsv_merge.py lineage, blend.cpp:157-253). The reference
  computes in C float; the kernel here replays it in np.float32 so the
  autotest's full-color-cube identity (blend with v = max(r,g,b)
  returns the input bit-exactly, test_gdalalg_raster_blend.py:24-117)
  holds for every one of the 64^3 cube colors.

Scale shape: src-over is a single equi-join on the pixel key plus
Column math (co-partition by tile at 100 TB); hsv-value ships narrow
byte columns through an Arrow pandas kernel (mapInPandas, no state).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F


def opacity_255(opacity_pct: int) -> int:
    """blend.cpp:1441: (opacity*255 + 50) / 100."""
    return (opacity_pct * 255 + 50) // 100


def _d(x, y):
    """Integer division on non-negative ints (C '/' == Spark DIV)."""
    return F.expr(f"({x}) div ({y})")


def blend_srcover(color: DataFrame, overlay: DataFrame,
                  opacity: int = 100, key: str = "pid") -> DataFrame:
    """color: (key, r, g, b[, a]); overlay: (key, r, g, b[, a]) — byte
    values. Returns (key, r, g, b, a) blended. Missing alpha = 255."""
    op255 = opacity_255(opacity)
    c = color.alias("c")
    o = overlay.alias("o")
    j = c.join(o, key)
    has_ca = "a" in color.columns
    has_oa = "a" in overlay.columns

    oa_raw = "o.a" if has_oa else "255"
    sa = "c.a" if has_ca else "255"
    # overlayA = (oa * op255 + 255) / 256  (or op255 when no alpha band)
    if has_oa:
        overlay_a = f"(({oa_raw}) * {op255} + 255) div 256"
    else:
        overlay_a = str(op255)
    src_amul = f"(({sa}) * (255 - ({overlay_a})) + 255) div 256"
    dst_a = f"(({overlay_a}) + ({src_amul}))"

    def band(name):
        num = (f"(o.{name} * ({overlay_a}) + c.{name} * ({src_amul})"
               f" + 255) div 256")
        unpre = (f"CASE WHEN ({dst_a}) <> 0 AND ({dst_a}) <> 255 "
                 f"THEN (({num}) * 255 + ({dst_a}) div 2) div ({dst_a}) "
                 f"ELSE ({num}) END")
        return F.expr(f"least({unpre}, 255)").cast("long").alias(name)

    return j.select(
        F.col(f"c.{key}").alias(key),
        band("r"), band("g"), band("b"),
        F.expr(dst_a).cast("long").alias("a"))


def rgb_to_hs_np(r, g, b):
    """blend.cpp:157 rgb_to_hs in np.float32 (h, s in [0, 1])."""
    r = r.astype(np.int64)
    g = g.astype(np.int64)
    b = b.astype(np.int64)
    minc = np.minimum(np.minimum(r, g), b)
    maxc = np.maximum(np.maximum(r, g), b)
    span = (maxc - minc).astype(np.int64)
    s = (span.astype(np.float32)
         / np.maximum(1, maxc).astype(np.float32)).astype(np.float32)
    six_span = np.where(span == 0, np.float32(1.0),
                        np.float32(6.0) * span.astype(np.float32)
                        ).astype(np.float32)
    h_b = (np.float32(4.0 / 6.0)
           + (r - g).astype(np.float32) / six_span).astype(np.float32)
    h_g = (np.float32(2.0 / 6.0)
           + (b - r).astype(np.float32) / six_span).astype(np.float32)
    tmp = ((g - b).astype(np.float32) / six_span).astype(np.float32)
    h_r = np.where(tmp < 0, (tmp + np.float32(1.0)).astype(np.float32), tmp)
    # branch order matches the C: maxc==b first, then maxc==g, else r
    h = np.where(maxc == b, h_b, np.where(maxc == g, h_g, h_r)) \
        .astype(np.float32)
    return h, s


def hsv_to_rgb_np(h, s, v):
    """blend.cpp:239 hsv_to_rgb in np.float32; v is the byte value."""
    one = np.float32(1.0)
    half = np.float32(0.5)
    vf = v.astype(np.float32)
    i = (np.float32(6.0) * h).astype(np.int32)
    f = (np.float32(6.0) * h - i.astype(np.float32)).astype(np.float32)
    p = (vf * (one - s) + half).astype(np.uint8)
    q = (vf * (one - (s * f).astype(np.float32)) + half).astype(np.uint8)
    t = (vf * (one - (s * (one - f).astype(np.float32)).astype(np.float32))
         + half).astype(np.uint8)
    vb = v.astype(np.uint8)
    idx = np.clip(i, 0, 5)
    r = np.choose(idx, [vb, q, p, p, t, vb])
    g = np.choose(idx, [t, vb, vb, q, p, p])
    b = np.choose(idx, [p, p, t, vb, vb, q])
    return r, g, b


def blend_hsv_np(r, g, b, gray):
    """hsv-value blend of one pixel batch (all np arrays of bytes)."""
    h, s = rgb_to_hs_np(r, g, b)
    return hsv_to_rgb_np(h, s, gray)


def blend_hsv(color: DataFrame, overlay_gray: DataFrame,
              opacity: int = 100, key: str = "pid") -> DataFrame:
    """color: (key, r, g, b[, a]); overlay_gray: (key, v). Returns the
    color frame with V replaced (alpha passed through untouched —
    blend.cpp:1052 returns the source alpha band as-is). opacity < 100
    first composites the overlay value against max(r,g,b) with the
    integer src-over value blend (blend.cpp:1325-1329), so opacity=0 is
    a bit-exact no-op and opacity=50 against v=max(r,g,b) is too — the
    autotest's identity assertions (test_gdalalg_raster_blend.py:
    226-251)."""
    from ..session import ship_package

    ship_package(color.sparkSession)
    has_a = "a" in color.columns
    j = color.join(overlay_gray.withColumnRenamed("v", "_gray"), key)
    cols = [key, "r", "g", "b"] + (["a"] if has_a else []) + ["_gray"]
    j = j.select(*cols)
    out_schema = f"{key} long, r long, g long, b long" \
                 + (", a long" if has_a else "")

    op255 = opacity_255(opacity)

    def kernel(batches):
        for pdf in batches:
            cr = pdf["r"].to_numpy(np.uint8)
            cg = pdf["g"].to_numpy(np.uint8)
            cb = pdf["b"].to_numpy(np.uint8)
            gray = pdf["_gray"].to_numpy(np.int64)
            cv = np.maximum(np.maximum(cr, cg), cb).astype(np.int64)
            target = ((gray * op255 + cv * (255 - op255) + 255)
                      // 256).astype(np.uint8)
            r, g, b = blend_hsv_np(cr, cg, cb, target)
            out = {key: pdf[key], "r": r.astype(np.int64),
                   "g": g.astype(np.int64), "b": b.astype(np.int64)}
            if has_a:
                out["a"] = pdf["a"]
            import pandas as pd
            yield pd.DataFrame(out)

    return j.mapInPandas(kernel, out_schema)
