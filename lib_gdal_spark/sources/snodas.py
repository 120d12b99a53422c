"""NOHRSC SNODAS raster reader (.hdr + big-endian Int16 .dat).

Reference: frmts/raw/snodasdataset.cpp — a "Key: value" text header
("Format version: NOHRSC GIS/RS raster file v1.1"); data description
keys select the band shape (Data type integer, Data bytes per pixel 2
-> big-endian Int16, :90); the geotransform comes from the min/max
axis coordinates (:457-462): gt = (MinX, (MaxX-MinX)/cols, 0, MaxY,
0, -(MaxY-MinY)/rows). Band nodata from "No data value"; slope/
intercept exposed as scale/offset. Read-only, like the reference
driver. Short/absent .dat files zero-pad (the autotest fixture ships
an EMPTY .dat and expects checksum 0).
"""

from __future__ import annotations

import os

import numpy as np


def read_snodas_grid(path: str) -> dict:
    meta: dict = {}
    with open(path) as f:
        for line in f:
            if ":" not in line:
                continue
            k, v = line.split(":", 1)
            meta[k.strip()] = v.strip()
    if not meta.get("Format version", "").startswith(
            "NOHRSC GIS/RS raster file"):
        raise ValueError("not a SNODAS header")
    if meta.get("Data type") != "integer" \
            or meta.get("Data bytes per pixel") != "2":
        raise NotImplementedError("SNODAS: only 2-byte integer data")
    cols = int(meta["Number of columns"])
    rows = int(meta["Number of rows"])
    minx = float(meta["Minimum x-axis coordinate"])
    maxx = float(meta["Maximum x-axis coordinate"])
    miny = float(meta["Minimum y-axis coordinate"])
    maxy = float(meta["Maximum y-axis coordinate"])
    gt = (minx, (maxx - minx) / cols, 0.0, maxy, 0.0,
          -(maxy - miny) / rows)
    dat = meta.get("Data file pathname", "")
    datpath = os.path.join(os.path.dirname(path), os.path.basename(dat))
    raw = b""
    if os.path.exists(datpath):
        with open(datpath, "rb") as f:
            raw = f.read()
    need = rows * cols * 2
    raw = raw[:need] + b"\x00" * max(0, need - len(raw))
    values = np.frombuffer(raw, ">i2", count=rows * cols) \
        .astype(np.int64).reshape(rows, cols)
    out = {"width": cols, "height": rows, "gt": gt, "values": values,
           "nodata": (float(meta["No data value"])
                      if "No data value" in meta else None),
           "scale": float(meta.get("Data slope", 1.0)),
           "offset": float(meta.get("Data intercept", 0.0)),
           "description": meta.get("Description", ""),
           "units": meta.get("Data units", ""), "header": meta}
    return out


def read_snodas(spark, path: str):
    """-> (cells DataFrame (bx, by, value), meta): raw Int16 values,
    nodata cells absent, by increasing northward."""
    import pandas as pd

    g = read_snodas_grid(path)
    h, w = g["height"], g["width"]
    by, bx = np.mgrid[0:h, 0:w]
    v = g["values"].ravel()
    keep = np.ones(len(v), bool) if g["nodata"] is None \
        else v != int(g["nodata"])
    pdf = pd.DataFrame({
        "bx": bx.ravel()[keep].astype(np.int64),
        "by": (h - 1 - by).ravel()[keep].astype(np.int64),
        "value": v[keep].astype(np.float64)})
    meta = {k: g[k] for k in g if k != "values"}
    return spark.createDataFrame(pdf), meta
