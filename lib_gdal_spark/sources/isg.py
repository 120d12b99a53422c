"""ISG (International Service for the Geoid) geoid grid reader.

Reference: ISGDataset in frmts/aaigrid/aaigriddataset.cpp:732-1003 —
a free-text preamble, a begin_of_head..end_of_head block of
"key : value" / "key = value" lines, then N-to-S rows of ASCII
values. ISG format >= 2.0 treats lat/lon min/max as CELL CENTERS
(half-cell expansion, :855-861); coord units may be dms (degree
symbol parsed as DD°MM'SS", :825-848). The reference's rounding
correction ladder replays exactly: deltas whose reciprocal is near an
integer round to 1/round(1/delta) when min/max sit near half-integer
or integer multiples (TryRoundTo, :878-953, incl. the "0.0167"
special case at 1e-1 tolerance), else a 0.005-relative approximate
fallback recomputes the deltas from the extent with a warning — or
rejects unless skip_georef_check (ISG_SKIP_GEOREF_CONSISTENCY_CHECK).
gt = (lonmin, dlon, 0, latmax, 0, -dlat).
"""

from __future__ import annotations

import math
import re

import numpy as np


def _parse_dms(s: str) -> float:
    s = s.replace("°", "D").strip()
    m = re.match(r"(-?)(\d+)D(\d+)'(\d+(?:\.\d+)?)\"?", s)
    if not m:
        return float(s)
    v = int(m.group(2)) + int(m.group(3)) / 60.0 + float(m.group(4)) / 3600.0
    return -v if m.group(1) == "-" else v


def _try_round_to(delta, rounded, vmin, vmax, nvals, tol):
    """TryRoundTo (:878-932): returns (ok, delta, vmin, vmax)."""
    dmin, dmax, dtry = vmin, vmax, delta
    if rounded != delta \
            and abs(abs(vmin / rounded)
                    - (math.floor(abs(vmin / rounded)) + 0.5)) < tol \
            and abs(abs(vmax / rounded)
                    - (math.floor(abs(vmax / rounded)) + 0.5)) < tol:
        val = (math.floor(abs(vmin / rounded)) + 0.5) * rounded
        dmin = -val if vmin < 0 else val
        val = (math.floor(abs(vmax / rounded)) + 0.5) * rounded
        dmax = -val if vmax < 0 else val
        dtry = rounded
    elif rounded != delta \
            and abs(abs(vmin / rounded)
                    - math.floor(abs(vmin / rounded) + 0.5)) < tol \
            and abs(abs(vmax / rounded)
                    - math.floor(abs(vmax / rounded) + 0.5)) < tol:
        val = math.floor(abs(vmin / rounded) + 0.5) * rounded
        dmin = -val if vmin < 0 else val
        val = math.floor(abs(vmax / rounded) + 0.5) * rounded
        dmax = -val if vmax < 0 else val
        dtry = rounded
    if abs(dmin + dtry * nvals - dmax) < tol * dtry:
        return True, dtry, dmin, dmax
    return False, delta, vmin, vmax


def read_isg_grid(path: str, skip_georef_check: bool = False) -> dict:
    with open(path, encoding="utf-8", errors="replace") as f:
        text = f.read()
    if "begin_of_head" not in text:
        raise ValueError("not an ISG file")
    head_start = text.find("begin_of_head")
    head_end = text.find("end_of_head")
    if head_end < 0:
        raise ValueError("ISG: missing end_of_head")
    head = text[head_start:head_end]
    kv = {}
    for ln in head.splitlines():
        m = re.match(r"\s*([A-Za-z ]+?)\s*[:=]\s*(.*?)\s*$", ln)
        if m:
            kv[m.group(1)] = m.group(2)
    for key, allowed in (("data format", "grid"),
                         ("data ordering", "N-to-S, W-to-E"),
                         ("coord type", "geodetic")):
        if kv.get(key) and kv[key] != allowed:
            raise NotImplementedError(f"ISG: {key} = {kv[key]!r}")
    use_dms = kv.get("coord units") == "dms"
    if kv.get("coord units") not in (None, "", "deg", "dms"):
        raise NotImplementedError(
            f"ISG: coord units = {kv['coord units']!r}")
    conv = _parse_dms if use_dms else float
    lat_min, lat_max = conv(kv["lat min"]), conv(kv["lat max"])
    lon_min, lon_max = conv(kv["lon min"]), conv(kv["lon max"])
    dlat_s, dlon_s = kv["delta lat"], kv["delta lon"]
    dlat, dlon = conv(dlat_s), conv(dlon_s)
    version = float(kv.get("ISG format", "0") or 0)
    if version >= 2.0:
        lat_min -= dlat / 2.0
        lat_max += dlat / 2.0
        lon_min -= dlon / 2.0
        lon_max += dlon / 2.0
    nrows, ncols = int(kv["nrows"]), int(kv["ncols"])
    nodata = float(kv["nodata"]) if kv.get("nodata") else None

    def rounded(ds, d):
        if ds == "0.0167" or (d < 1
                              and abs(1 / d - math.floor(1 / d + 0.5)) < 0.06):
            return 1.0 / math.floor(1 / d + 0.5)
        return d

    ok1, dlon2, lon_min2, lon_max2 = _try_round_to(
        dlon, rounded(dlon_s, dlon), lon_min, lon_max, ncols, 1e-2)
    ok2, dlat2, lat_min2, lat_max2 = _try_round_to(
        dlat, rounded(dlat_s, dlat), lat_min, lat_max, nrows, 1e-2)
    ok = ok1 and ok2
    if not ok and dlon_s == "0.0167" and dlat_s == "0.0167":
        ok1, dlon2, lon_min2, lon_max2 = _try_round_to(
            dlon, 0.016667, lon_min, lon_max, ncols, 1e-1)
        ok2, dlat2, lat_min2, lat_max2 = _try_round_to(
            dlat, 0.016667, lat_min, lat_max, nrows, 1e-1)
        ok = ok1 and ok2
    approx = False
    if ok:
        dlon, lon_min, lon_max = dlon2, lon_min2, lon_max2
        dlat, lat_min, lat_max = dlat2, lat_min2, lat_max2
    else:
        near = (abs((lon_max - lon_min) / ncols - dlon) < 0.005 * dlon
                and abs((lat_max - lat_min) / nrows - dlat) < 0.005 * dlat)
        if near or skip_georef_check:
            approx = True
            dlon = (lon_max - lon_min) / ncols
            dlat = (lat_max - lat_min) / nrows
        else:
            raise ValueError(
                "ISG: inconsistent extent/resolution/raster dimension "
                "(set skip_georef_check=True to accept, the reference's "
                "ISG_SKIP_GEOREF_CONSISTENCY_CHECK)")
    body = text[head_end:]
    body = body[body.find("\n") + 1:]
    toks = body.split()
    vals = np.full(nrows * ncols, np.nan)
    n = min(len(toks), nrows * ncols)
    vals[:n] = [float(t) for t in toks[:n]]
    grid = vals.reshape(nrows, ncols)
    return {"width": ncols, "height": nrows, "values": grid,
            "gt": (lon_min, dlon, 0.0, lat_max, 0.0, -dlat),
            "nodata": nodata, "approx_georef": approx,
            "model_name": kv.get("model name"),
            "units": kv.get("units") or kv.get("data units"),
            "header": kv}


def read_isg(spark, path: str, **kw):
    import pandas as pd

    g = read_isg_grid(path, **kw)
    h, w = g["height"], g["width"]
    by, bx = np.mgrid[0:h, 0:w]
    v = g["values"].ravel()
    keep = ~np.isnan(v)
    if g["nodata"] is not None:
        keep &= v != g["nodata"]
    pdf = pd.DataFrame({
        "bx": bx.ravel()[keep].astype(np.int64),
        "by": (h - 1 - by).ravel()[keep].astype(np.int64),
        "value": v[keep]})
    meta = {k: g[k] for k in g if k not in ("values", "header")}
    return spark.createDataFrame(pdf), meta
