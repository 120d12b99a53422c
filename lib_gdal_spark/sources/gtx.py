"""NOAA/VDatum GTX vertical datum shift grid codec.

Reference: frmts/raw/gtxdataset.cpp — a 40-byte BIG-ENDIAN header
(lower-left CELL-CENTER lat, lon as float64; dlat, dlon as float64;
rows, cols as int32), then rows*cols samples stored BOTTOM-UP,
big-endian float32 (post-2009) or float64 (legacy, detected from file
size, :278-281). The N-up geotransform derives as :245-252: gt3 takes
the top cell center + half cell, gt0 backs off half a cell, gt5
negates dlat. Band nodata is -88.8888 (:145) — such cells become
ABSENT rows in the DataFrame view (the engine's nodata discipline).
"""

from __future__ import annotations

import struct

import numpy as np

NODATA = -88.8888


def read_gtx_grid(path: str) -> dict:
    """Driver-side parse -> {width, height, gt, values (H, W) float64
    N-up, dtype} (shift lattices are small by construction)."""
    with open(path, "rb") as f:
        data = f.read()
    if len(data) < 40:
        raise ValueError("GTX: file shorter than the 40-byte header")
    lat0, lon0, dlat, dlon = struct.unpack(">dddd", data[:32])
    rows, cols = struct.unpack(">ii", data[32:40])
    if rows <= 0 or cols <= 0:
        raise ValueError(f"GTX: invalid dimensions {cols}x{rows}")
    n = rows * cols
    if len(data) - 40 == 8 * n:
        dt = ">f8"
    elif len(data) - 40 >= 4 * n:
        dt = ">f4"
    else:
        raise ValueError("GTX: file too short for header dimensions")
    raw = np.frombuffer(data, dtype=dt, count=n, offset=40) \
        .reshape(rows, cols)
    values = raw[::-1, :].astype(np.float64)  # bottom-up -> N-up
    gt3 = lat0 + dlat * (rows - 1)
    gt = (lon0 - dlon * 0.5, dlon, 0.0, gt3 + dlat * 0.5, 0.0, -dlat)
    return {"width": cols, "height": rows, "gt": gt, "values": values,
            "dtype": "Float64" if dt == ">f8" else "Float32",
            "lat0": lat0, "lon0": lon0, "dlat": dlat, "dlon": dlon}


def read_gtx(spark, path: str):
    """-> (cells DataFrame (bx, by, value), meta); nodata (-88.8888)
    cells are absent; by increases northward (by = height-1-row)."""
    import pandas as pd

    g = read_gtx_grid(path)
    h, w = g["height"], g["width"]
    by, bx = np.mgrid[0:h, 0:w]
    v = g["values"].ravel()
    # a Float32 file can only hold float32(-88.8888) = -88.88880157...,
    # so the nodata test must compare in STORAGE precision or every
    # nodata cell leaks through the float64 equality
    nd = float(np.float32(NODATA)) if g["dtype"] == "Float32" else NODATA
    keep = v != nd
    pdf = pd.DataFrame({
        "bx": bx.ravel()[keep].astype(np.int64),
        "by": (h - 1 - by).ravel()[keep].astype(np.int64),
        "value": v[keep]})
    meta = {k: g[k] for k in ("width", "height", "gt", "dtype")}
    return spark.createDataFrame(pdf), meta


def write_gtx(path: str, values, gt, dtype: str = "Float32") -> str:
    """values: (H, W) N-up array (NaN -> nodata -88.8888); gt: N-up
    6-tuple. Header per GTXDataset::SetGeoTransform (:339-353): origin
    is the LOWER-LEFT cell center."""
    arr = np.asarray(values, np.float64)
    h, w = arr.shape
    arr = np.where(np.isnan(arr), NODATA, arr)
    xorigin = gt[0] + 0.5 * gt[1]
    yorigin = gt[3] + (h - 0.5) * gt[5]
    out = struct.pack(">dddd", yorigin, xorigin, -gt[5], gt[1])
    out += struct.pack(">ii", h, w)
    dt = ">f8" if dtype == "Float64" else ">f4"
    out += np.ascontiguousarray(arr[::-1, :], dtype=dt).tobytes()
    with open(path, "wb") as f:
        f.write(out)
    return path
