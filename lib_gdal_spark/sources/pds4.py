"""NASA PDS4 planetary product source (XML label + raw array file).

Reference semantics (studied, re-expressed — no code copied):
frmts/pds4/pds4dataset.cpp —
- the .xml label's File_Area_Observational names the data file and an
  Array_2D/Array_3D(_Image/_Spectrum) with byte offset, axes,
  Element_Array data_type and Axis_Array (Band/Line/Sample order,
  `elements` per axis).
- data types map to fixed raw layouts (UnsignedByte, SignedByte,
  (Un)SignedLSB/MSB 2/4, IEEE754LSB/MSB Single/Double).
- cartography: cart:upperleft_corner_x/_y and
  cart:pixel_resolution_x/_y build the geotransform, with km units
  scaled to meters (the 1700 fixture mixes m/pixel and km/pixel; all
  four cart schema generations 1700/1B00/1D00/1G00 replay byte.tif's
  checksum 4672 and gt (-59280, 60, 0, 3751320, 0, -60))."""

from __future__ import annotations

import os
import re
import xml.etree.ElementTree as ET

import numpy as np

_DTYPES = {
    "UnsignedByte": "u1", "SignedByte": "i1",
    "UnsignedLSB2": "<u2", "SignedLSB2": "<i2",
    "UnsignedMSB2": ">u2", "SignedMSB2": ">i2",
    "UnsignedLSB4": "<u4", "SignedLSB4": "<i4",
    "UnsignedMSB4": ">u4", "SignedMSB4": ">i4",
    "IEEE754LSBSingle": "<f4", "IEEE754MSBSingle": ">f4",
    "IEEE754LSBDouble": "<f8", "IEEE754MSBDouble": ">f8",
}


def _local(tag: str) -> str:
    return tag.split("}")[-1]


def _find(el, name):
    for c in el.iter():
        if _local(c.tag) == name:
            return c
    return None


def _findall(el, name):
    return [c for c in el.iter() if _local(c.tag) == name]


def _unit_scale(el) -> float:
    u = (el.get("unit") or "").lower()
    return 1000.0 if u.startswith("km") else 1.0


def parse_pds4_label(text: str) -> dict:
    root = ET.fromstring(text)
    fao = _find(root, "File_Area_Observational")
    if fao is None:
        raise ValueError("not a PDS4 observational label")
    fname = _find(fao, "file_name")
    arr = None
    for c in fao.iter():
        if _local(c.tag).startswith("Array"):
            arr = c
            break
    if arr is None or fname is None:
        raise ValueError("no Array in PDS4 label")
    off_el = _find(arr, "offset")
    offset = int(off_el.text) if off_el is not None else 0
    dt_el = _find(arr, "data_type")
    dtype = (dt_el.text or "").strip()
    if dtype not in _DTYPES:
        raise ValueError(f"unsupported PDS4 data_type {dtype!r}")
    axes = []
    for ax in _findall(arr, "Axis_Array"):
        nm = _find(ax, "axis_name")
        el = _find(ax, "elements")
        axes.append(((nm.text or "").strip() if nm is not None else "",
                     int(el.text)))
    if not axes:
        # compact form: bare <elements> children in axis order
        els = _findall(arr, "elements")
        names = ["Band", "Line", "Sample"][3 - len(els):]
        axes = list(zip(names, (int(e.text) for e in els)))
    gt = None
    ulx = _find(root, "upperleft_corner_x")
    uly = _find(root, "upperleft_corner_y")
    rx = _find(root, "pixel_resolution_x")
    ry = _find(root, "pixel_resolution_y")
    if None not in (ulx, uly, rx, ry):
        gt = (float(ulx.text) * _unit_scale(ulx),
              float(rx.text) * _unit_scale(rx), 0.0,
              float(uly.text) * _unit_scale(uly), 0.0,
              -float(ry.text) * _unit_scale(ry))
    bounds = {}
    for k in ("west_bounding_coordinate", "east_bounding_coordinate",
              "north_bounding_coordinate", "south_bounding_coordinate"):
        el = _find(root, k)
        if el is not None:
            bounds[k.split("_")[0]] = float(el.text)
    return {"file_name": (fname.text or "").strip(), "offset": offset,
            "dtype": dtype, "axes": axes, "gt": gt, "bounds": bounds}


def read_pds4_array(label_path: str):
    """-> (values (h, w) or (bands, h, w) north-up, meta)."""
    meta = parse_pds4_label(open(label_path, encoding="utf-8").read())
    data_path = os.path.join(os.path.dirname(label_path),
                             meta["file_name"])
    dt = np.dtype(_DTYPES[meta["dtype"]])
    dims = [n for _, n in meta["axes"]]
    n = int(np.prod(dims))
    raw = np.frombuffer(open(data_path, "rb").read(), dt, count=n,
                        offset=meta["offset"]).reshape(dims)
    names = [nm for nm, _ in meta["axes"]]
    if len(dims) == 3:
        order = [names.index(k) if k in names else i
                 for i, k in enumerate(("Band", "Line", "Sample"))]
        raw = np.transpose(raw, order)
        if raw.shape[0] == 1:
            raw = raw[0]
    meta = dict(meta)
    meta["shape"] = raw.shape
    return raw, meta


def read_pds4(spark, label_path: str, band: int = 1):
    import pandas as pd

    vals, meta = read_pds4_array(label_path)
    if vals.ndim == 3:
        vals = vals[band - 1]
    vals = vals.astype(np.float64)
    h, w = vals.shape
    yy, xx = np.mgrid[0:h, 0:w]
    pdf = pd.DataFrame({"bx": xx.ravel().astype(np.int64),
                        "by": (h - 1 - yy).ravel().astype(np.int64),
                        "value": vals.ravel()})
    return (spark.createDataFrame(pdf, "bx long, by long, value double"),
            meta)
