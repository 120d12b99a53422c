"""ogrlineref — linear referencing (apps/ogrlineref.cpp).

The reference builds a "parts" table from a path polyline + milepost
points (-create: project posts onto the path, split, extrapolate the
leading/trailing parts with UTM-measured meter lengths, then emit
fixed-step parts carrying beg/end/scale fields), answers point->measure
(-get_pos), measure->point (-get_coord) and measure-range->subline
(-get_subline) against that table.

Distributed recast: parts tables are SMALL by construction (path length
/ step), so `create_parts` / `subline` stay driver-side exactly like
the reference, while the per-ROW operations — locating millions of
points (`locate_df`) and interpolating millions of measures
(`interpolate_df`) — broadcast the parts and run vectorized NumPy over
Arrow batches. All geometry is planar +-*/ and sqrt, so a duckdb twin
over an exploded segment table matches exactly (`lineref_locate`).

Primitive parity (cited to the reference):
- Value()            ogr/ogrlinestring.cpp OGRSimpleCurve::Value
- getSubLine()       ogrlinestring.cpp:2237 (clamping, vertex walk)
- Project()          GEOS locate: measure of the nearest point, first
                     segment wins ties (strict <)
- part fields        beg/end/scale (ogrlineref.cpp:31-33)
- tolerances         DELTA 1e-8, TOLERANCE_DEGREE/METER
                     (ogrlineref.cpp:34-37)
- UTM part lengths   midpoint zone pick + transform
                     (ogrlineref.cpp:554-580) via geo/tmerc.py
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

from ..geo import tmerc

DELTA = 0.00000001
TOLERANCE_DEGREE = 0.00008983153
TOLERANCE_METER = 10.0


# ---------------------------------------------------------------------------
# planar polyline primitives (NumPy)
# ---------------------------------------------------------------------------

def _segs(pts):
    p = np.asarray(pts, float)
    a, b = p[:-1], p[1:]
    d = b - a
    seglen = np.sqrt(d[:, 0] ** 2 + d[:, 1] ** 2)
    cum = np.concatenate([[0.0], np.cumsum(seglen)])
    return a, b, d, seglen, cum


def line_length(pts) -> float:
    return float(_segs(pts)[4][-1])


def project(pts, px: float, py: float):
    """-> (measure, distance): measure along the line of the nearest
    point (GEOS Project semantics, first-nearest segment wins)."""
    a, b, d, seglen, cum = _segs(pts)
    if (px, py) == tuple(pts[0]):
        return 0.0, 0.0
    if (px, py) == tuple(pts[-1]):
        return float(cum[-1]), 0.0
    len2 = seglen ** 2
    with np.errstate(divide="ignore", invalid="ignore"):
        t = ((px - a[:, 0]) * d[:, 0] + (py - a[:, 1]) * d[:, 1]) / len2
    t = np.clip(np.where(np.isfinite(t), t, 0.0), 0.0, 1.0)
    cx = a[:, 0] + t * d[:, 0]
    cy = a[:, 1] + t * d[:, 1]
    d2 = (px - cx) ** 2 + (py - cy) ** 2
    i = int(np.argmin(d2))
    return float(cum[i] + t[i] * seglen[i]), float(np.sqrt(d2[i]))


def value(pts, dist: float):
    """OGRSimpleCurve::Value — point at `dist` along the line (clamped
    to the endpoints), with the reference's exact walk arithmetic."""
    p = np.asarray(pts, float)
    if dist < 0:
        return tuple(p[0])
    length = 0.0
    for i in range(len(p) - 1):
        dx = p[i + 1, 0] - p[i, 0]
        dy = p[i + 1, 1] - p[i, 1]
        seg = np.sqrt(dx * dx + dy * dy)
        if seg > 0:
            if length <= dist <= length + seg:
                r = (dist - length) / seg
                return (p[i, 0] * (1 - r) + p[i + 1, 0] * r,
                        p[i, 1] * (1 - r) + p[i + 1, 1] * r)
            length += seg
    return tuple(p[-1])


def get_subline(pts, d_from: float, d_to: float):
    """OGRSimpleCurve::getSubLine(:2237) — the sub-polyline between two
    distances (interpolated endpoints, intermediate vertices kept)."""
    p = np.asarray(pts, float)
    total = line_length(pts)
    d_from = max(d_from, 0.0)
    d_to = min(d_to, total)
    if d_from > d_to or d_from >= total:
        return None
    out = []
    i = 0
    length = 0.0
    if d_from == 0:
        out.append((p[0, 0], p[0, 1]))
    else:
        while i < len(p) - 1:
            dx = p[i + 1, 0] - p[i, 0]
            dy = p[i + 1, 1] - p[i, 1]
            seg = np.sqrt(dx * dx + dy * dy)
            if seg > 0:
                if length <= d_from <= length + seg:
                    r = (d_from - length) / seg
                    out.append((p[i, 0] * (1 - r) + p[i + 1, 0] * r,
                                p[i, 1] * (1 - r) + p[i + 1, 1] * r))
                    if length <= d_to <= length + seg:
                        r = (d_to - length) / seg
                        out.append((p[i, 0] * (1 - r) + p[i + 1, 0] * r,
                                    p[i, 1] * (1 - r) + p[i + 1, 1] * r))
                        return out if len(out) >= 2 else None
                    i += 1
                    length += seg
                    break
                length += seg
            i += 1
    while i < len(p) - 1:
        out.append((p[i, 0], p[i, 1]))
        dx = p[i + 1, 0] - p[i, 0]
        dy = p[i + 1, 1] - p[i, 1]
        seg = np.sqrt(dx * dx + dy * dy)
        if seg > 0:
            if length <= d_to <= length + seg:
                r = (d_to - length) / seg
                out.append((p[i, 0] * (1 - r) + p[i + 1, 0] * r,
                            p[i, 1] * (1 - r) + p[i + 1, 1] * r))
                return out if len(out) >= 2 else None
            length += seg
        i += 1
    out.append((p[-1, 0], p[-1, 1]))
    return out if len(out) >= 2 else None


def _utm_length(pts) -> float:
    """The reference's geographic part measure (ogrlineref.cpp:554-580):
    transform the part to the UTM zone of its length-midpoint, take the
    planar meter length."""
    mid = value(pts, line_length(pts) / 2)
    epsg = tmerc.utm_zone_epsg(mid[0], mid[1])
    p = np.asarray(pts, float)
    ex, ny = tmerc.utm_forward(p[:, 0], p[:, 1], epsg)
    return float(np.sqrt(np.diff(ex) ** 2 + np.diff(ny) ** 2).sum())


# ---------------------------------------------------------------------------
# -create (driver-side, like the reference: output size ~ length/step)
# ---------------------------------------------------------------------------

def create_parts(path_pts, repers, step: float,
                 geographic: bool = True) -> list[dict]:
    """CreatePartsFromLineString (ogrlineref.cpp:421-838): -> parts
    [{pts, beg, end, scale}] at every `step` of the milepost measure.
    repers: [(position, (x, y)), ...]."""
    tol = TOLERANCE_DEGREE if geographic else TOLERANCE_METER
    path = [tuple(map(float, p)) for p in path_pts]
    mo = {}
    for pos, pt in repers:
        measure, dist = project(path, pt[0], pt[1])
        if dist < tol:
            mo[float(pos)] = tuple(map(float, pt))
    if len(mo) < 2:
        raise ValueError("not enough repers on the path")
    keys = sorted(mo)
    d1 = project(path, *mo[keys[0]])[0]
    d2 = project(path, *mo[keys[1]])[0]
    if d1 > d2:  # path opposite the reper direction -> reverse
        path = path[::-1]
        d1 = project(path, *mo[keys[0]])[0]
        d2 = project(path, *mo[keys[1]])[0]

    sublines = []  # (pts, beg, end, factor)
    pt_beg = pt_end = None
    beg_pos = end_pos = 0.0
    position = keys[0]
    if d1 > DELTA:  # leading extrapolated part
        part = get_subline(path, 0.0, d1)
        if part is not None:
            plen = line_length(part)
            dflen = _utm_length(part) if geographic else plen
            sublines.append((part, position - dflen, position,
                             plen / dflen if geographic else 1.0))
            pt_beg = part[0]
            beg_pos = position - dflen
    if d2 - d1 > DELTA:
        part = get_subline(path, d1, d2)
        if part is not None:
            sublines.append((part, position, keys[1],
                             line_length(part) / (keys[1] - position)))
    d1 = d2
    position = keys[1]
    end_position = 0.0
    for key in keys[2:]:
        end_position = key
        d2 = project(path, *mo[key])[0]
        if d2 - d1 > DELTA:
            part = get_subline(path, d1, d2)
            if part is not None:
                sublines.append((part, position, key,
                                 line_length(part) / (key - position)))
                d1 = d2
                position = key
    total = line_length(path)
    if total - d1 > DELTA:  # trailing extrapolated part
        part = get_subline(path, d1, total)
        if part is not None:
            plen = line_length(part)
            dflen = _utm_length(part) if geographic else plen
            sublines.append((part, position, position + dflen,
                             plen / dflen if geographic else 1.0))
            pt_end = part[-1]
            end_pos = position + dflen

    # pickets at every multiple of step (ogrlineref.cpp:726-775)
    round_beg = (np.ceil(beg_pos / step) * step if pt_beg is not None
                 else np.ceil(keys[0] / step) * step)
    if pt_end is not None:
        end_position = end_pos
    pickets = {}
    if pt_beg is not None:
        pickets[beg_pos] = pt_beg
    if pt_end is not None:
        pickets[end_pos] = pt_end
    dist = float(round_beg)
    while dist <= end_position:
        for pts, beg, end, factor in sublines:
            if dist + DELTA >= beg and dist - DELTA <= end:
                real = (dist - beg) * factor
                pickets[dist] = value(pts, real)
                break
        dist += step

    # final fixed-step parts between consecutive pickets (:788-819)
    parts = []
    d1 = 0.0
    pkeys = sorted(pickets)
    position = pkeys[0]
    for key in pkeys:
        d2 = project(path, *pickets[key])[0]
        if d2 - d1 > DELTA:
            part = get_subline(path, d1, d2)
            if part is not None:
                parts.append({
                    "pts": part, "beg": position, "end": key,
                    "scale": line_length(part) / (key - position),
                })
                d1 = d2
                position = key
    return parts


# ---------------------------------------------------------------------------
# -get_pos / -get_coord / -get_subline
# ---------------------------------------------------------------------------

def get_position(parts, x: float, y: float) -> float:
    """GetPosition (ogrlineref.cpp:980): nearest part (strict <, file
    order) -> measure = beg + project_distance / scale."""
    best = None
    best_dist = np.inf
    for part in parts:
        _, dist = _min_distance(part["pts"], x, y)
        if dist < best_dist:
            best_dist = dist
            best = part
    real, _ = project(best["pts"], x, y)
    return best["beg"] + real / best["scale"]


def _min_distance(pts, px, py):
    a, b, d, seglen, cum = _segs(pts)
    len2 = seglen ** 2
    with np.errstate(divide="ignore", invalid="ignore"):
        t = ((px - a[:, 0]) * d[:, 0] + (py - a[:, 1]) * d[:, 1]) / len2
    t = np.clip(np.where(np.isfinite(t), t, 0.0), 0.0, 1.0)
    d2 = (px - (a[:, 0] + t * d[:, 0])) ** 2 \
        + (py - (a[:, 1] + t * d[:, 1])) ** 2
    i = int(np.argmin(d2))
    return i, float(np.sqrt(d2[i]))


def get_coordinate(parts, m: float):
    """GetCoordinates (ogrlineref.cpp:1043): the part with
    beg < m < end -> point at (m - beg) * scale along it."""
    for part in parts:
        if part["beg"] < m < part["end"]:
            return value(part["pts"], (m - part["beg"]) * part["scale"])
    raise ValueError(f"position {m} not covered by any part")


def get_subline_by_measure(parts, m_beg: float, m_end: float):
    """CreateSubline (ogrlineref.cpp:260): merge the covering parts and
    trim both ends by measure -> ONE polyline."""
    cover = sorted((p for p in parts
                    if p["end"] > m_beg and p["beg"] < m_end),
                   key=lambda p: p["beg"])
    if not cover:
        raise ValueError("no parts cover the range")
    merged = []
    for p in cover:
        pts = p["pts"]
        merged.extend(pts if not merged else pts[1:])
    beg0 = cover[0]["beg"]
    d_from = (max(m_beg, beg0) - beg0) * cover[0]["scale"]
    # distances accumulate along the merged line
    off = sum(line_length(p["pts"]) for p in cover[:-1])
    d_to = off + (min(m_end, cover[-1]["end"]) - cover[-1]["beg"]) \
        * cover[-1]["scale"]
    return get_subline(merged, d_from, d_to)


# ---------------------------------------------------------------------------
# distributed faces
# ---------------------------------------------------------------------------

def locate_df(df: DataFrame, parts, x_col: str = "x", y_col: str = "y",
              out_col: str = "measure") -> DataFrame:
    """-get_pos over a DataFrame of points: the bounded parts table is
    broadcast in the closure; each Arrow batch runs the vectorized
    nearest-part + projection kernel."""
    from ..session import ship_package

    ship_package(df.sparkSession)
    models = [(np.asarray(p["pts"], float), p["beg"], p["scale"])
              for p in parts]

    @F.pandas_udf("double")
    def _locate(xs, ys):
        import pandas as pd

        px = xs.to_numpy()
        py = ys.to_numpy()
        best_d2 = np.full(len(px), np.inf)
        best_m = np.zeros(len(px))
        for pts, beg, scale in models:
            a, b = pts[:-1], pts[1:]
            d = b - a
            seglen = np.sqrt(d[:, 0] ** 2 + d[:, 1] ** 2)
            cum = np.concatenate([[0.0], np.cumsum(seglen)])[:-1]
            len2 = seglen ** 2
            with np.errstate(divide="ignore", invalid="ignore"):
                t = ((px[:, None] - a[None, :, 0]) * d[None, :, 0]
                     + (py[:, None] - a[None, :, 1]) * d[None, :, 1]) \
                    / len2[None, :]
            t = np.clip(np.where(np.isfinite(t), t, 0.0), 0.0, 1.0)
            cx = a[None, :, 0] + t * d[None, :, 0]
            cy = a[None, :, 1] + t * d[None, :, 1]
            d2 = (px[:, None] - cx) ** 2 + (py[:, None] - cy) ** 2
            j = d2.argmin(axis=1)
            rows = np.arange(len(px))
            dmin = d2[rows, j]
            m = beg + (cum[j] + t[rows, j] * seglen[j]) / scale
            upd = dmin < best_d2
            best_d2 = np.where(upd, dmin, best_d2)
            best_m = np.where(upd, m, best_m)
        return pd.Series(best_m)

    return df.withColumn(out_col, _locate(F.col(x_col), F.col(y_col)))


def interpolate_df(df: DataFrame, parts, m_col: str = "measure",
                   out_cols: tuple[str, str] = ("ix", "iy")) -> DataFrame:
    """-get_coord over a DataFrame of measures (broadcast parts +
    vectorized Value walk)."""
    from ..session import ship_package

    ship_package(df.sparkSession)
    models = [(np.asarray(p["pts"], float), p["beg"], p["end"], p["scale"])
              for p in parts]

    @F.pandas_udf("struct<x: double, y: double>")
    def _interp(ms):
        import pandas as pd

        m = ms.to_numpy()
        ox = np.full(len(m), np.nan)
        oy = np.full(len(m), np.nan)
        for pts, beg, end, scale in models:
            sel = (beg < m) & (m < end) & np.isnan(ox)
            if not sel.any():
                continue
            for i in np.nonzero(sel)[0]:
                ox[i], oy[i] = value(pts, (m[i] - beg) * scale)
        return pd.DataFrame({"x": ox, "y": oy})

    tmp = df.withColumn("_pt", _interp(F.col(m_col)))
    return (tmp.withColumn(out_cols[0], F.col("_pt.x"))
            .withColumn(out_cols[1], F.col("_pt.y")).drop("_pt"))
