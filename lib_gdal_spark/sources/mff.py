"""Vexcel MFF raster reader.

Reference: frmts/raw/mffdataset.cpp — a KEY=VALUE .hdr (IMAGE_LINES /
LINE_SAMPLES dims, BYTE_ORDER LSB|MSB, optional refined "type"
R*4/I*2/..., corner coordinates, GCPn records, no_rows +
tile_size_rows/columns for the tiled layout); band files share the
header's basename with an extension of a type letter + band number
(b=Byte, i=UInt16, j=CInt16, r=Float32, x=CFloat32, :864-886; the
"type" key overrides, :817-861). Untiled bands are plain raster rows;
tiled bands store row-major tiles of tile_size_rows x columns
(:144-176), short reads zero-fill. Corner lat/lon pairs become
pixel-center GCPs and a least-squares geotransform, GCPn=id,row,col?
records pass through as metadata. Read-only here (the reference
writer exists but the fixtures only exercise reads).
"""

from __future__ import annotations

import os
import re

import numpy as np

_EXT_TYPES = {"b": "u1", "i": "u2", "j": None, "r": "f4", "x": None}
_REFINED = {"R*4": "f4", "R*8": "f8", "I*1": "u1", "I*2": "i2",
            "I*4": "i4", "U*2": "u2", "U*4": "u4"}


def read_mff_grid(path: str) -> dict:
    kv = {}
    with open(path, encoding="latin-1") as f:
        for ln in f:
            if "=" in ln:
                k, v = ln.split("=", 1)
                kv[k.strip()] = v.strip()
    if kv.get("IMAGE_FILE_FORMAT", "MFF") != "MFF" \
            and "IMAGE_LINES" not in kv:
        raise ValueError("not an MFF header")
    ny = int(kv["IMAGE_LINES"])
    nx = int(kv["LINE_SAMPLES"])
    le = kv.get("BYTE_ORDER", "LSB").upper() != "MSB"
    tiled = "no_rows" in kv
    tx = int(kv.get("tile_size_columns", 0)) if tiled else 0
    ty = int(kv.get("tile_size_rows", 0)) if tiled else 0
    if tiled and (tx <= 0 or ty <= 0):
        raise ValueError("MFF: invalid tile size")
    base = os.path.splitext(os.path.basename(path))[0]
    dirname = os.path.dirname(path) or "."
    band_files = []
    for raw_band in range(100):
        found = None
        for f in sorted(os.listdir(dirname)):
            stem, ext = os.path.splitext(f)
            ext = ext[1:]
            if stem.lower() != base.lower() or len(ext) < 2:
                continue
            if ext[0].lower() in "bcijrxz" and ext[1:].isdigit() \
                    and int(ext[1:]) == raw_band:
                found = f
                break
        if found is None:
            break
        band_files.append(found)
    if not band_files:
        raise ValueError("MFF: no band files found")
    refined = kv.get("type")
    bands = []
    metas = []
    for f in band_files:
        ext = os.path.splitext(f)[1][1:]
        if refined:
            dts = _REFINED.get(refined.upper())
            if dts is None:
                raise NotImplementedError(f"MFF type {refined!r}")
        else:
            dts = _EXT_TYPES.get(ext[0].lower())
            if dts is None:
                raise NotImplementedError(
                    f"MFF complex extension {ext!r}")
        dt = ("<" if le else ">") + dts if dts != "u1" else "u1"
        isz = np.dtype(dt).itemsize
        with open(os.path.join(dirname, f), "rb") as fh:
            raw = fh.read()
        if tiled:
            ntx = (nx + tx - 1) // tx
            nty = (ny + ty - 1) // ty
            need = ntx * nty * tx * ty * isz
            raw = raw[:need] + b"\x00" * max(0, need - len(raw))
            tiles = np.frombuffer(raw, dt, ntx * nty * tx * ty) \
                .reshape(nty, ntx, ty, tx)
            full = tiles.transpose(0, 2, 1, 3).reshape(nty * ty, ntx * tx)
            arr = full[:ny, :nx].astype(np.float64)
        else:
            need = nx * ny * isz
            raw = raw[:need] + b"\x00" * max(0, need - len(raw))
            arr = np.frombuffer(raw, dt, nx * ny).reshape(ny, nx) \
                .astype(np.float64)
        bands.append(arr)
        metas.append({"file": f, "dtype": dts})
    gcps = []
    for k, v in kv.items():
        m = re.match(r"GCP(\d+)$", k)
        if m:
            gcps.append((int(m.group(1)),
                         [float(t) for t in v.split(",")]))
    gt = None
    corners = {}
    for c in ("TOP_LEFT", "TOP_RIGHT", "BOTTOM_LEFT", "BOTTOM_RIGHT"):
        la = kv.get(f"{c}_CORNER_LATITUDE")
        lo = kv.get(f"{c}_CORNER_LONGITUDE")
        if la is not None and lo is not None:
            corners[c] = (float(lo), float(la))
    if len(corners) == 4:
        pts = [(0.5, 0.5, *corners["TOP_LEFT"]),
               (nx - 0.5, 0.5, *corners["TOP_RIGHT"]),
               (0.5, ny - 0.5, *corners["BOTTOM_LEFT"]),
               (nx - 0.5, ny - 0.5, *corners["BOTTOM_RIGHT"])]
        A = np.array([[1.0, p, l] for p, l, _x, _y in pts])
        cx, *_ = np.linalg.lstsq(A, np.array([p[2] for p in pts]),
                                 rcond=None)
        cy, *_ = np.linalg.lstsq(A, np.array([p[3] for p in pts]),
                                 rcond=None)
        gt = (cx[0], cx[1], cx[2], cy[0], cy[1], cy[2])
    return {"width": nx, "height": ny, "bands": len(bands),
            "values": np.stack(bands), "tiled": tiled, "gt": gt,
            "gcps": sorted(gcps), "band_meta": metas, "header": kv,
            "projection": kv.get("PROJECTION_NAME")}
