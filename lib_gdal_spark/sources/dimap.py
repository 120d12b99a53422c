"""SPOT DIMAP (v1) product source.

Reference semantics (studied, re-expressed — no code copied):
frmts/dimap/dimapdataset.cpp —
- METADATA.DIM is the dataset: Data_Access/DATA_FILE_PATH names the
  imagery file (the autotest fixture's IMAGERY.TIF is itself a VRT
  onto rgbsmall.tif), Production/Processing SCENE_PROCESSING_LEVEL /
  PROCESSING_LEVEL surfaces as PROCESSING_LEVEL, Spectral_Band_Info's
  PHYSICAL_BIAS as SPECTRAL_PHYSICAL_BIAS ("%f"-formatted, 6 dp).
- Geoposition/Tie_Point entries become GCPs: pixel/line =
  TIE_POINT_DATA_X/Y - 0.5 (the reference's half-pixel shift —
  dimap.py asserts GCPPixel 0.5 for DATA_X 1.0), CRS X/Y/Z are the
  geographic coordinates (WGS 84).
- the imagery window reads through the engine's own codecs (TIFF, or
  the VRT SimpleSource composition used by the fixture)."""

from __future__ import annotations

import os
import re
import xml.etree.ElementTree as ET

import numpy as np


def parse_dim(text: str) -> dict:
    root = ET.fromstring(text)

    def find_text(name):
        for el in root.iter():
            if el.tag.split("}")[-1] == name:
                return (el.text or "").strip()
        return None

    data_file = None
    for el in root.iter():
        if el.tag.split("}")[-1] == "Data_File_Path" or \
                el.tag.split("}")[-1] == "DATA_FILE_PATH":
            data_file = el.get("href") or (el.text or "").strip()
            break
    ncols = find_text("NCOLS")
    nrows = find_text("NROWS")
    md = {}
    lvl = find_text("PROCESSING_LEVEL") or \
        find_text("SCENE_PROCESSING_LEVEL")
    if lvl:
        md["PROCESSING_LEVEL"] = lvl
    bias = find_text("PHYSICAL_BIAS")
    if bias is not None:
        md["SPECTRAL_PHYSICAL_BIAS"] = "%f" % float(bias)
    gcps = []
    for tp in root.iter():
        if tp.tag.split("}")[-1] != "Tie_Point":
            continue
        vals = {}
        for c in tp:
            vals[c.tag.split("}")[-1]] = float((c.text or "0").strip())
        gcps.append({
            "pixel": vals.get("TIE_POINT_DATA_X", 0.0) - 0.5,
            "line": vals.get("TIE_POINT_DATA_Y", 0.0) - 0.5,
            "x": vals.get("TIE_POINT_CRS_X", 0.0),
            "y": vals.get("TIE_POINT_CRS_Y", 0.0),
            "z": vals.get("TIE_POINT_CRS_Z", 0.0)})
    srs = find_text("HORIZONTAL_CS_NAME") or find_text("GEO_TABLES")
    return {"data_file": data_file, "metadata": md, "gcps": gcps,
            "width": int(ncols) if ncols else None,
            "height": int(nrows) if nrows else None, "srs_name": srs}


def _read_vrt_window(vrt_path: str, w: int, h: int) -> np.ndarray:
    """Band-1 window (0, 0, w, h) of a SimpleSource-only VRT, through
    the engine's TIFF codec."""
    from .tiff import decode_tiff

    root = ET.fromstring(open(vrt_path, encoding="utf-8").read())
    out = np.zeros((h, w), np.float64)
    band = None
    for b in root.findall("VRTRasterBand"):
        if int(b.get("band", "1")) == 1:
            band = b
            break
    if band is None:
        return out
    base = os.path.dirname(vrt_path)
    for src in band.findall("SimpleSource"):
        fn = src.find("SourceFilename")
        rel = (fn.text or "").strip()
        sb = int((src.findtext("SourceBand") or "1").strip())
        # the autotest co-locates the source next to the VRT; fall
        # back to the parent directory for in-tree fixtures
        cand = [os.path.join(base, rel),
                os.path.join(base, os.pardir, rel)]
        spath = next((c for c in cand if os.path.exists(c)), cand[0])
        arr, _m = decode_tiff(open(spath, "rb").read())
        if arr.ndim == 3:
            arr = arr[sb - 1]
        sr = src.find("SrcRect")
        dr = src.find("DstRect")
        sx = int(float(sr.get("xOff", "0")))
        sy = int(float(sr.get("yOff", "0")))
        sw = int(float(sr.get("xSize", str(arr.shape[1]))))
        sh = int(float(sr.get("ySize", str(arr.shape[0]))))
        dx = int(float(dr.get("xOff", "0")))
        dy = int(float(dr.get("yOff", "0")))
        cw = min(sw, w - dx)
        chh = min(sh, h - dy)
        if cw <= 0 or chh <= 0:
            continue
        out[dy:dy + chh, dx:dx + cw] = arr[sy:sy + chh, sx:sx + cw]
    return out


def read_dimap_window(dim_path: str, w: int, h: int):
    """-> (band-1 window (h, w) float64, parsed label). The fixture's
    imagery is a VRT; plain TIFF imagery decodes directly."""
    from .tiff import decode_tiff

    meta = parse_dim(open(dim_path, encoding="utf-8").read())
    base = os.path.dirname(dim_path)
    data = meta["data_file"] or "IMAGERY.TIF"
    p = os.path.join(base, data)
    if not os.path.exists(p):
        p = os.path.join(base, "IMAGERY.TIF")
    blob = open(p, "rb").read()
    if blob[:4] in (b"II*\x00", b"MM\x00*"):
        arr, _m = decode_tiff(blob)
        if arr.ndim == 3:
            arr = arr[0]
        return arr[:h, :w].astype(np.float64), meta
    return _read_vrt_window(p, w, h), meta
