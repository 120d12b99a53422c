"""NASA/ESRI Meta Raster Format (MRF) source.

Reference semantics (studied, re-expressed — no code copied):
frmts/mrf/ — an .mrf XML header (Raster/Size, PageSize, Compression,
DataType, GeoTags/BoundingBox), a .idx of big-endian u64
(offset, size) pairs per page (row-major pages, full-resolution level
first, then each overview level), and a data file whose extension
names the page codec: .til NONE, .pzp DEFLATE (zlib), .ppg PNG,
.ptf TIF, .pjg JPEG, .lrc LERC. A zero-size idx entry is an empty
(fill) page. Pages decode through the engine's own codecs; the
four autotest byte fixtures (none/deflate/png/tif) all replay
byte.tif's checksum 4672 with its geotransform."""

from __future__ import annotations

import os
import struct
import xml.etree.ElementTree as ET
import zlib

import numpy as np

_DATA_EXT = {"NONE": ".til", "DEFLATE": ".pzp", "PNG": ".ppg",
             "PPNG": ".ppg", "TIF": ".ptf", "JPEG": ".pjg",
             "LERC": ".lrc"}

_DTYPES = {"Byte": "u1", "UInt16": "<u2", "Int16": "<i2",
           "UInt32": "<u4", "Int32": "<i4", "Float32": "<f4",
           "Float64": "<f8"}


def parse_mrf(text: str) -> dict:
    root = ET.fromstring(text)
    size = root.find("Raster/Size")
    page = root.find("Raster/PageSize")
    comp = root.findtext("Raster/Compression", "PNG").upper()
    dtype = root.findtext("Raster/DataType", "Byte")
    meta = {
        "width": int(size.get("x")), "height": int(size.get("y")),
        "bands": int(size.get("c", "1")),
        "page_w": int(page.get("x")) if page is not None else 512,
        "page_h": int(page.get("y")) if page is not None else 512,
        "compression": comp, "dtype": dtype, "gt": None,
    }
    bbox = root.find("GeoTags/BoundingBox")
    if bbox is not None:
        minx = float(bbox.get("minx"))
        miny = float(bbox.get("miny"))
        maxx = float(bbox.get("maxx"))
        maxy = float(bbox.get("maxy"))
        meta["gt"] = (minx, (maxx - minx) / meta["width"], 0.0,
                      maxy, 0.0, -(maxy - miny) / meta["height"])
    return meta


def _decode_page(blob: bytes, comp: str, pw: int, ph: int, c: int,
                 dt: np.dtype) -> np.ndarray:
    if comp == "NONE":
        raw = blob
        arr = np.frombuffer(raw, dt, count=pw * ph * c)
        return arr.reshape(ph, pw, c) if c > 1 else \
            arr.reshape(ph, pw)
    if comp == "DEFLATE":
        raw = zlib.decompress(blob)
        arr = np.frombuffer(raw, dt, count=pw * ph * c)
        return arr.reshape(ph, pw, c) if c > 1 else \
            arr.reshape(ph, pw)
    if comp in ("PNG", "PPNG"):
        from .png import decode_png

        arr, _m = decode_png(blob)
        if arr.ndim == 3:  # band-first per the png source contract
            arr = arr[0]
        return arr
    if comp == "TIF":
        from .tiff import decode_tiff

        arr, _m = decode_tiff(blob)
        if arr.ndim == 3:
            arr = arr[0]
        return arr
    raise ValueError(f"MRF compression {comp!r} not available")


def read_mrf_array(path: str):
    """-> (band-1 values (h, w) north-up, meta)."""
    meta = parse_mrf(open(path, encoding="utf-8").read())
    base = os.path.splitext(path)[0]
    idx = open(base + ".idx", "rb").read()
    ext = _DATA_EXT.get(meta["compression"])
    if ext is None:
        raise ValueError(
            f"MRF compression {meta['compression']!r} not available")
    data = open(base + ext, "rb").read()
    dt = np.dtype(_DTYPES.get(meta["dtype"], "u1"))
    w, h, c = meta["width"], meta["height"], meta["bands"]
    pw, ph = meta["page_w"], meta["page_h"]
    px = (w + pw - 1) // pw
    py = (h + ph - 1) // ph
    out = np.zeros((h, w), np.float64)
    for k in range(px * py):
        off, size = struct.unpack_from(">2Q", idx, k * 16)
        if size == 0:
            continue
        page = _decode_page(data[off:off + size], meta["compression"],
                            pw, ph, c, dt)
        if page.ndim == 3:
            page = page[:, :, 0]
        r, cidx = divmod(k, px)
        y0, x0 = r * ph, cidx * pw
        th = min(ph, h - y0)
        tw = min(pw, w - x0)
        out[y0:y0 + th, x0:x0 + tw] = page[:th, :tw]
    return out, meta


def read_mrf(spark, path: str):
    import pandas as pd

    vals, meta = read_mrf_array(path)
    h, w = vals.shape
    yy, xx = np.mgrid[0:h, 0:w]
    pdf = pd.DataFrame({"bx": xx.ravel().astype(np.int64),
                        "by": (h - 1 - yy).ravel().astype(np.int64),
                        "value": vals.ravel()})
    return (spark.createDataFrame(pdf, "bx long, by long, value double"),
            meta)
