"""Geosoft GXF ASCII grid reader.

Reference: frmts/gxf/gxfopen.c — #KEY records with value lines
(#POINTS/#ROWS dims, #DUMMY, #SENSE (default GXFS_LL_RIGHT = 1),
#TRANSFORM scale/offset, #GTYPE n selects n-character base-90
compression, #PTSEPARATION/#RWSEPARATION/#XORIGIN/#YORIGIN/#ROTATION
georef). #GRID values: GTYPE 0 is whitespace-separated ASCII (dummy
matched as a STRING token, :503-506); GTYPE>0 packs each value in
nGType base-90 chars (digit - 37, :438-455) with '!' = dummy and '"'
prefix = repeat-count escape (count then value, :533-588). Sense
LL_RIGHT/LR_LEFT mirrors rows so raster row 0 is the TOP
(:640-643; LR/UR senses also mirror columns); the geotransform is
the rotated half-cell form of gxfdataset.cpp:180-190.
"""

from __future__ import annotations

import math

import numpy as np


def read_gxf_grid(path: str) -> dict:
    with open(path, encoding="latin-1") as f:
        text = f.read()
    lines = text.splitlines()
    keys: dict[str, list[str]] = {}
    grid_start = None
    cur = None
    for idx, ln in enumerate(lines):
        if ln.startswith("#"):
            cur = ln.strip().upper()
            keys[cur] = []
            if cur.startswith("#GRID"):
                grid_start = idx + 1
                break
        elif cur:
            keys[cur].append(ln)
    if grid_start is None:
        raise ValueError("not a GXF file (no #GRID)")

    def val(prefixes, default=None):
        for k, v in keys.items():
            for p in prefixes:
                if k.startswith(p) and v:
                    return v[0].strip()
        return default

    nx = int(val(["#POIN"], "0"))
    ny = int(val(["#ROWS"], "0"))
    if nx <= 0 or ny <= 0:
        raise ValueError("GXF: missing #POINTS/#ROWS")
    gtype = int(val(["#GTYPE"], "0"))
    sense = int(val(["#SENS"], "1"))
    dummy_str = val(["#DUMMY"])
    dummy = float(dummy_str) if dummy_str is not None else -1e12
    scale, offset = 1.0, 0.0
    tr = val(["#TRANSFORM"])
    if tr:
        parts = tr.split()
        scale, offset = float(parts[0]), float(parts[1])
    px = float(val(["#PTSEPARATION"], "1"))
    py = float(val(["#RWSEPARATION"], "1"))
    x0 = float(val(["#XORIGIN"], "0"))
    y0 = float(val(["#YORIGIN"], "0"))
    rot = float(val(["#ROTATION"], "0")) * math.pi / 180.0

    body = lines[grid_start:]
    vals = np.empty(ny * nx, np.float64)
    n = 0
    if gtype == 0:
        for ln in body:
            if ln.startswith("#"):
                break
            for tok in ln.split():
                if n >= ny * nx:
                    break
                if dummy_str is not None and tok == dummy_str:
                    vals[n] = dummy
                else:
                    vals[n] = float(tok)
                n += 1
    else:
        it = iter(body)
        buf = next(it, "")
        while n < ny * nx:
            if len(buf) < gtype:
                buf = next(it, None)
                if buf is None:
                    raise ValueError("GXF: truncated compressed grid")
                continue
            tok, buf = buf[:gtype], buf[gtype:]
            if tok[0] == "!":
                vals[n] = dummy
                n += 1
            elif tok[0] == '"':
                if len(buf) < gtype:
                    buf = next(it, None)
                    if buf is None:
                        raise ValueError("GXF: truncated repeat")
                cnt_tok, buf = buf[:gtype], buf[gtype:]
                count = int(_base90(cnt_tok, gtype))
                if len(buf) < gtype:
                    buf = next(it, None)
                    if buf is None:
                        raise ValueError("GXF: truncated repeat value")
                v_tok, buf = buf[:gtype], buf[gtype:]
                if v_tok[0] == "!":
                    v = dummy
                else:
                    v = _base90(v_tok, gtype) * scale + offset
                count = min(count, ny * nx - n)
                vals[n:n + count] = v
                n += count
            else:
                vals[n] = _base90(tok, gtype) * scale + offset
                n += 1
    raw = vals.reshape(ny, nx)
    if sense in (1, -4):      # LL_RIGHT / LR_LEFT: mirror rows
        raster = raw[::-1, :]
    elif sense in (-2, 3):    # UL_RIGHT / UR_LEFT: file order
        raster = raw
    else:
        raise NotImplementedError(f"GXF column sense {sense}")
    if sense in (-4, 3):      # LR/UR: mirror columns too
        raster = raster[:, ::-1]
    # GXFGetPosition sense remap (:1007-1040): LL-origin senses hoist
    # the origin to the top row; then the point-oriented half-cell
    # geotransform of gxfdataset.cpp:183-190
    ox, oy = x0, y0
    if sense in (1, -4):
        oy = y0 + (ny - 1) * py
    if sense in (-4, 3):
        ox = x0 - (nx - 1) * px
    gt1 = px * math.cos(rot)
    gt2 = py * math.sin(rot)
    gt4 = px * math.sin(rot)
    gt5 = -py * math.cos(rot)
    gt = (ox - 0.5 * gt1 - 0.5 * gt2, gt1, gt2,
          oy - 0.5 * gt4 - 0.5 * gt5, gt4, gt5)
    return {"width": nx, "height": ny, "values": raster.copy(),
            "gt": gt, "dummy": dummy, "sense": sense, "gtype": gtype,
            "scale": scale, "offset": offset}


def _base90(tok: str, gtype: int) -> float:
    v = 0
    for i in range(gtype):
        v = v * 90 + (ord(tok[i]) - 37)
    return float(v)


def read_gxf(spark, path: str):
    import pandas as pd

    g = read_gxf_grid(path)
    h, w = g["height"], g["width"]
    by, bx = np.mgrid[0:h, 0:w]
    v = g["values"].ravel()
    keep = v != g["dummy"]
    pdf = pd.DataFrame({
        "bx": bx.ravel()[keep].astype(np.int64),
        "by": (h - 1 - by).ravel()[keep].astype(np.int64),
        "value": v[keep]})
    meta = {k: g[k] for k in g if k != "values"}
    return spark.createDataFrame(pdf), meta
