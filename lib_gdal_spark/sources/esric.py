"""Esri compact cache V2 (ESRIC) tiled source.

Reference semantics (studied, re-expressed — no code copied):
frmts/esric/esric_dataset.cpp —
- conf.xml: CacheStorageInfo (StorageFormat must be
  esriMapCacheStorageModeCompactV2, PacketSize 128), TileCacheInfo
  (TileCols/Rows, TileOrigin, LODInfo resolutions) and
  TileImageInfo/CacheTileFormat (JPEG -> 3 bands, else RGBA).
- the raster spans origin..-origin at the FINEST resolution; coarser
  LODs are overviews; the bundle directory for a level is
  L%02d (level number = minLOD + nres - lvl - 1, resolutions sorted
  ascending) and each 128x128-tile bundle file is named
  R%04xC%04x.bundle by its block-start row/col in hex (:846-853).
- bundle: 64-byte header then 128*128 little-endian u64 entries —
  tile offset in the low 40 bits, size in the high bits; size 0 =
  missing tile (:862-867). Tile payloads are PNG/JPEG blobs; PNG
  decodes through the engine's own codec, grayscale tiles replicate
  across RGB, missing alpha fills 255."""

from __future__ import annotations

import os
import re
import struct

import numpy as np


def parse_conf(text: str) -> dict:
    def grab(pattern, default=None):
        m = re.search(pattern, text, re.S)
        return m.group(1) if m else default

    fmt = grab(r"<StorageFormat>([^<]+)")
    if fmt != "esriMapCacheStorageModeCompactV2":
        raise ValueError("not an Esri compact cache V2 conf.xml")
    if int(float(grab(r"<PacketSize>([0-9.]+)", "128"))) != 128:
        raise ValueError("only PacketSize 128 is supported")
    tsz = int(float(grab(r"<TileCols>([0-9.]+)", "256")))
    origin = re.search(
        r"TileOrigin[^>]*>\s*<X>([0-9.eE+-]+)</X>\s*<Y>([0-9.eE+-]+)",
        text, re.S)
    ox, oy = float(origin.group(1)), float(origin.group(2))
    resolutions = sorted(float(v) for v in
                         re.findall(r"<Resolution>([0-9.eE+-]+)", text))
    tile_format = grab(r"<CacheTileFormat>([^<]+)", "JPEG")
    res = resolutions[0]
    w = int(round((-ox - ox) / res))
    h = int(round((oy - -oy) / res))
    return {"tile_size": tsz, "origin": (ox, oy),
            "resolutions": resolutions, "tile_format": tile_format,
            "width": w, "height": h,
            "bands": 3 if tile_format == "JPEG" else 4,
            "gt": (ox, res, 0.0, oy, 0.0, -res)}


def _read_bundle_index(path: str):
    data = open(path, "rb").read()
    idx = np.frombuffer(data, "<u8", count=128 * 128, offset=64)
    return data, idx


def read_esric_level(cache_dir: str, overview: int = -1):
    """-> (bands [r, g, b(, a)] (h, w) uint8 north-up, meta).
    ``overview`` -1 = full resolution, k >= 0 = k-th overview
    (matching the reference's overview ordering)."""
    from .png import decode_png

    conf = parse_conf(open(os.path.join(cache_dir, "conf.xml"),
                           encoding="utf-8", errors="replace").read())
    nres = len(conf["resolutions"])
    lvl = 0 if overview < 0 else overview + 1
    if lvl >= nres:
        raise ValueError("no such overview level")
    res = conf["resolutions"][lvl]
    lxx = nres - lvl - 1
    tsz = conf["tile_size"]
    w = int(round(conf["width"] * conf["resolutions"][0] / res))
    h = int(round(conf["height"] * conf["resolutions"][0] / res))
    ntx = (w + tsz - 1) // tsz
    nty = (h + tsz - 1) // tsz
    nb = conf["bands"]
    bands = [np.zeros((h, w), np.uint8) for _ in range(nb)]
    if nb == 4:
        bands[3][:] = 0
    bundles = {}
    for ty in range(nty):
        for tx in range(ntx):
            bx = (tx // 128) * 128
            by = (ty // 128) * 128
            bpath = os.path.join(
                cache_dir, "_alllayers",
                "L%02d" % lxx, "R%04xC%04x.bundle" % (by, bx))
            if bpath not in bundles:
                bundles[bpath] = (_read_bundle_index(bpath)
                                  if os.path.exists(bpath) else None)
            entry = bundles[bpath]
            if entry is None:
                continue
            data, idx = entry
            v = int(idx[(ty % 128) * 128 + (tx % 128)])
            size = v >> 40
            offset = v & ((1 << 40) - 1)
            if size == 0:
                continue
            blob = data[offset:offset + size]
            arr, _m = decode_png(blob)
            if arr.ndim == 2:
                planes = [arr, arr, arr]
            else:
                planes = [arr[k] for k in range(arr.shape[0])]
                if len(planes) == 2:  # gray + alpha
                    planes = [planes[0], planes[0], planes[0],
                              planes[1]]
            y0, x0 = ty * tsz, tx * tsz
            th = min(tsz, h - y0)
            tw = min(tsz, w - x0)
            for b in range(nb):
                src = planes[b] if b < len(planes) else (
                    np.full((tsz, tsz), 255, np.uint8))
                bands[b][y0:y0 + th, x0:x0 + tw] = src[:th, :tw]
    meta = dict(conf)
    meta["level_width"] = w
    meta["level_height"] = h
    meta["gt"] = (conf["origin"][0], res, 0.0, conf["origin"][1],
                  0.0, -res)
    return bands, meta


def read_esric(spark, cache_dir: str, band: int = 1,
               overview: int = -1):
    import pandas as pd

    bands, meta = read_esric_level(cache_dir, overview)
    vals = bands[band - 1].astype(np.float64)
    h, w = vals.shape
    yy, xx = np.mgrid[0:h, 0:w]
    keep = vals != 0
    pdf = pd.DataFrame({"bx": xx[keep].astype(np.int64),
                        "by": (h - 1 - yy[keep]).astype(np.int64),
                        "value": vals[keep]})
    return (spark.createDataFrame(pdf, "bx long, by long, value double"),
            meta)
