"""DigitalGlobe .TIL tiled-product source.

Reference: frmts/til/tildataset.cpp — a .TIL manifest is `key = value`
text (numTiles, per-tile filename + UL/LR col/row offsets) naming the
tile rasters (TIFFs); the sibling .IMD carries the imagery metadata
GDAL surfaces as SATELLITEID (satId), CLOUDCOVER (cloudCover) and
ACQUISITIONDATETIME (firstLineTime) in the IMAGERY domain
(autotest/gdrivers/til.py:44-48). The mosaic places each tile at its
UL offsets; testtil.til replays byte.tif's checksum 4672."""

from __future__ import annotations

import os
import re

import numpy as np


def _parse_kv(text: str) -> dict:
    kv = {}
    for line in text.splitlines():
        line = line.strip().rstrip(";")
        if "=" in line:
            k, v = line.split("=", 1)
            kv[k.strip()] = v.strip().strip('"')
    return kv


def parse_til(text: str):
    kv = _parse_kv(text)
    n = int(kv.get("numTiles", "0"))
    tiles = []
    for i in range(1, n + 1):
        p = f"TILE_{i}."
        tiles.append({
            "filename": kv[p + "filename"],
            "ul_col": int(kv.get(p + "ULColOffset", "0")),
            "ul_row": int(kv.get(p + "ULRowOffset", "0")),
            "lr_col": int(kv.get(p + "LRColOffset", "0")),
            "lr_row": int(kv.get(p + "LRRowOffset", "0"))})
    return tiles


def parse_imd(text: str) -> dict:
    """IMAGERY-domain metadata from the .IMD sidecar."""
    md = {}
    m = re.search(r"satId\s*=\s*\"([^\"]*)\"", text)
    if m:
        md["SATELLITEID"] = m.group(1)
    m = re.search(r"cloudCover\s*=\s*([0-9.eE+-]+)", text)
    if m:
        md["CLOUDCOVER"] = m.group(1)
    m = re.search(r"firstLineTime\s*=\s*([0-9TZ:.\-]+)", text)
    if m:
        md["ACQUISITIONDATETIME"] = m.group(1)
    return md


def read_til_array(path: str):
    """-> (mosaic (h, w) float64 north-up, meta). Tiles decode through
    the engine's own TIFF codec."""
    from .tiff import decode_tiff

    base = os.path.dirname(path)
    tiles = parse_til(open(path, encoding="latin-1").read())
    if not tiles:
        raise ValueError("not a TIL manifest (numTiles missing)")
    imd = {}
    sidecar = os.path.splitext(path)[0] + ".imd"
    for cand in (sidecar, sidecar.upper()):
        if os.path.exists(cand):
            imd = parse_imd(open(cand, encoding="latin-1").read())
            break
    parts = []
    for t in tiles:
        arr, m = decode_tiff(
            open(os.path.join(base, t["filename"]), "rb").read())
        if arr.ndim == 3:
            arr = arr[0]
        parts.append((t, arr))
    w = max(t["ul_col"] + p.shape[1] for t, p in parts)
    h = max(t["ul_row"] + p.shape[0] for t, p in parts)
    out = np.zeros((h, w), np.float64)
    for t, p in parts:
        out[t["ul_row"]:t["ul_row"] + p.shape[0],
            t["ul_col"]:t["ul_col"] + p.shape[1]] = p
    files = [path] + [os.path.join(base, t["filename"]) for t in tiles]
    if imd:
        files.append(sidecar)
    return out, {"width": w, "height": h, "imagery": imd,
                 "file_list": files, "n_tiles": len(tiles)}


def read_til(spark, path: str):
    import pandas as pd

    vals, meta = read_til_array(path)
    h, w = vals.shape
    yy, xx = np.mgrid[0:h, 0:w]
    pdf = pd.DataFrame({"bx": xx.ravel().astype(np.int64),
                        "by": (h - 1 - yy).ravel().astype(np.int64),
                        "value": vals.ravel()})
    return (spark.createDataFrame(pdf, "bx long, by long, value double"),
            meta)
