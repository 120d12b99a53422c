"""Racurs PHOTOMOD PRF / x-dem tiled dataset reader.

Reference: frmts/prf/phprfdataset.cpp — a phini XML (.prf / .x-dem)
with Width/Height/QChans/SizeX/SizeY/CountX/CountY; tiles are sibling
TIFFs named <base>_<row>_<col>.tif (.demtif for DEMs) mosaicked at
row*SizeY/col*SizeX offsets; missing tiles stay zero. Photo georef
comes from the GeoRef A_0..B_2 block with the PH_GEOREF_SHIFT_Y=1 row
shift on gt3 (:258-259); DEM georef from the XR/YR pixel-center
ranges as gt = (XR_0 - gt1/2, (XR_1-XR_0)/(W-1), 0, YR_1 - gt5/2, 0,
(YR_0-YR_1)/(H-1)) plus the optional DemShift (:574-587), with BadZ
as nodata and meters elevation units. A Pyramid.demtif sibling is the
single overview.
"""

from __future__ import annotations

import os
import re
import xml.etree.ElementTree as ET

import numpy as np

from .tiff import decode_tiff


def _phini(path: str):
    with open(path, "rb") as f:
        data = f.read()
    # the DOCTYPE references a DTD we don't have; strip it
    text = re.sub(rb"<!DOCTYPE[^>]*>", b"", data)
    return ET.fromstring(text)


def _items(el):
    out = {}
    for c in el:
        if c.tag in ("i", "d", "s") and c.get("n") is not None:
            out[c.get("n")] = c.get("v")
    return out


def _read_tile(p: str) -> np.ndarray:
    """Tiles are TIFFs, or (in DEM pyramids written by PHOTOMOD)
    source-less VRT stubs that read as zeros."""
    with open(p, "rb") as f:
        blob = f.read()
    if blob.lstrip().startswith(b"<VRTDataset"):
        root = ET.fromstring(blob)
        w = int(root.get("rasterXSize", 0))
        h = int(root.get("rasterYSize", 0))
        if root.find(".//SimpleSource") is not None \
                or root.find(".//ComplexSource") is not None:
            raise NotImplementedError("PRF VRT tile with sources")
        return np.zeros((h, w), np.float64)
    arr, _meta = decode_tiff(blob)
    return arr


def read_prf_grid(path: str) -> dict:
    root = _phini(path)
    if root.tag != "phini":
        raise ValueError("not a PHOTOMOD phini file")
    top = _items(root)
    nx, ny = int(top["Width"]), int(top["Height"])
    nbands = int(top.get("QChans", 1))
    sx, sy = int(top["SizeX"]), int(top["SizeY"])
    cx, cy = int(top["CountX"]), int(top["CountY"])
    is_dem = path.lower().endswith(".x-dem")
    ext = ".demtif" if is_dem else ".tif"
    base = os.path.splitext(path)[0]
    tiledir = base if os.path.isdir(base) else os.path.dirname(path)
    stem = os.path.basename(base)
    bands = np.zeros((nbands, ny, nx))
    for r in range(cy):
        for c in range(cx):
            p = os.path.join(tiledir, f"{stem}_{r}_{c}{ext}")
            if not os.path.exists(p):
                continue
            arr = _read_tile(p)
            planes = arr[None] if arr.ndim == 2 else arr
            for b in range(min(nbands, planes.shape[0])):
                a = planes[b]
                h, w = a.shape
                h = min(h, ny - r * sy)
                w = min(w, nx - c * sx)
                bands[b, r * sy:r * sy + h, c * sx:c * sx + w] = a[:h, :w]
    out = {"width": nx, "height": ny, "bands": nbands, "values": bands,
           "gt": None, "nodata": None, "units": None, "overview": None}
    gr = None
    dem_shift = (0.0, 0.0)
    for el in root:
        if el.tag == "x" and el.get("n") == "GeoRef":
            gr = _items(el)
        elif el.tag == "x" and el.get("n") == "DemShift":
            ds = _items(el)
            dem_shift = (float(ds.get("x", 0)), float(ds.get("y", 0)))
    if gr and all(k in gr for k in ("A_0", "A_1", "A_2",
                                    "B_0", "B_1", "B_2")):
        gt = [float(gr["A_0"]), float(gr["A_1"]), float(gr["A_2"]),
              float(gr["B_0"]), float(gr["B_1"]), float(gr["B_2"])]
        gt[3] -= gt[4] + gt[5]  # PH_GEOREF_SHIFT_Y = 1
        out["gt"] = tuple(gt)
    if is_dem and all(k in top for k in ("XR_0", "XR_1", "YR_0", "YR_1")):
        x0, x1 = float(top["XR_0"]), float(top["XR_1"])
        y0, y1 = float(top["YR_0"]), float(top["YR_1"])
        gt1 = (x1 - x0) / (nx - 1)
        gt5 = (y0 - y1) / (ny - 1)
        out["gt"] = (x0 - 0.5 * gt1 + dem_shift[0], gt1, 0.0,
                     y1 - 0.5 * gt5 + dem_shift[1], 0.0, gt5)
        out["units"] = "m"
        if "BadZ" in top:
            out["nodata"] = float(top["BadZ"])
    pyr = os.path.join(tiledir, "Pyramid.demtif")
    if is_dem and os.path.exists(pyr):
        arr = _read_tile(pyr)
        out["overview"] = arr if arr.ndim == 2 else arr[0]
    return out
