"""Remote-sensing raw readers: ROI_PAC, ISCE, NLAPS NDF.

- ROI_PAC (frmts/raw/roipacdataset.cpp): a .rsc sidecar of KEY VALUE
  pairs (WIDTH/FILE_LENGTH dims, X_FIRST/Y_FIRST + X_STEP/Y_STEP
  verbatim geotransform, Z_SCALE/Z_OFFSET band scaling); the data
  extension picks the type (.dem/.hgt Int16... here the .dem = Int16
  single-band little-endian case the fixture exercises).
- ISCE (frmts/raw/iscedataset.cpp): a <imageFile> XML sidecar of
  <property name=X><value>..</value></property> entries plus two
  Coordinate components (startingValue/delta -> verbatim gt);
  DATA_TYPE per the ISCE:GDAL table (:21-24), SCHEME BIL/BIP/BSQ,
  BYTE_ORDER 'l'/'b'.
- NLAPS NDF (frmts/raw/ndfdataset.cpp): KEY=VALUE; lines ending in
  ';', BANDn_FILENAME data files (or .In extension fallback),
  PIXELS_PER_LINE/LINES_PER_DATA_FILE dims, BYTE data, corner records
  whose 3rd/4th comma fields give the pixel-center corner easting/
  northing -> the half-pixel-shifted affine of :385-401.
"""

from __future__ import annotations

import os
import re
import xml.etree.ElementTree as ET

import numpy as np

_ISCE_TYPES = {"BYTE": ("u1", 1), "CHAR": ("u1", 1), "SHORT": ("i2", 1),
               "INT": ("i4", 1), "FLOAT": ("f4", 1), "DOUBLE": ("f8", 1),
               "CSHORT": ("i2", 2), "CINT": ("i4", 2),
               "CFLOAT": ("f4", 2), "CDOUBLE": ("f8", 2)}


def read_roipac_grid(path: str) -> dict:
    rsc = path + ".rsc"
    if not os.path.exists(rsc):
        raise ValueError("ROI_PAC: missing .rsc sidecar")
    kv = {}
    with open(rsc) as f:
        for ln in f:
            parts = ln.split(None, 1)
            if len(parts) == 2:
                kv[parts[0]] = parts[1].strip()
    nx = int(kv["WIDTH"])
    ny = int(kv["FILE_LENGTH"])
    ext = os.path.splitext(path)[1].lower()
    if ext not in (".dem", ".hgt"):
        raise NotImplementedError(f"ROI_PAC extension {ext!r}")
    dt = "<i2"
    with open(path, "rb") as f:
        raw = f.read()
    need = nx * ny * 2
    raw = raw[:need] + b"\x00" * max(0, need - len(raw))
    vals = np.frombuffer(raw, dt, nx * ny).reshape(ny, nx) \
        .astype(np.float64)
    gt = (float(kv.get("X_FIRST", 0)), float(kv.get("X_STEP", 1)), 0.0,
          float(kv.get("Y_FIRST", 0)), 0.0, float(kv.get("Y_STEP", -1)))
    return {"width": nx, "height": ny, "values": vals[None], "gt": gt,
            "scale": float(kv.get("Z_SCALE", 1.0)),
            "offset": float(kv.get("Z_OFFSET", 0.0)),
            "projection": kv.get("PROJECTION"), "header": kv}


def read_isce_grid(path: str) -> dict:
    xml_path = path + ".xml"
    if not os.path.exists(xml_path):
        raise ValueError("ISCE: missing .xml sidecar")
    root = ET.parse(xml_path).getroot()
    props = {}
    coords = {}
    for el in root:
        if el.tag == "property":
            v = el.find("value")
            props[el.get("name", "").upper()] = \
                v.text if v is not None else None
        elif el.tag == "component":
            sub = {}
            for p in el.findall("property"):
                v = p.find("value")
                sub[p.get("name", "")] = v.text if v is not None else None
            coords[el.get("name", "")] = sub
    nx = int(props["WIDTH"])
    ny = int(props["LENGTH"])
    dtype = props.get("DATA_TYPE", "FLOAT").upper()
    if dtype not in _ISCE_TYPES:
        raise NotImplementedError(f"ISCE DATA_TYPE {dtype!r}")
    dts, ncomp = _ISCE_TYPES[dtype]
    le = props.get("BYTE_ORDER", "l").lower().startswith("l")
    dt = ("<" if le else ">") + dts
    nbands = int(props.get("NUMBER_BANDS", 1))
    scheme = props.get("SCHEME", "BIP").upper()
    isz = np.dtype(dt).itemsize
    with open(path, "rb") as f:
        raw = f.read()
    n = nx * ny * nbands * ncomp
    raw = raw[:n * isz] + b"\x00" * max(0, n * isz - len(raw))
    flat = np.frombuffer(raw, dt, n).astype(np.float64)
    if scheme == "BIP":
        cube = flat.reshape(ny, nx, nbands * ncomp).transpose(2, 0, 1)
        bands = np.stack([
            np.ascontiguousarray(
                cube[b * ncomp:(b + 1) * ncomp].transpose(1, 2, 0)
                .reshape(ny, nx * ncomp))
            for b in range(nbands)])
    elif scheme == "BIL":
        cube = flat.reshape(ny, nbands, nx * ncomp)
        bands = np.ascontiguousarray(cube.transpose(1, 0, 2))
    else:  # BSQ
        bands = flat.reshape(nbands, ny, nx * ncomp)
    gt = (0.0, 1.0, 0.0, 0.0, 0.0, -1.0)
    c1, c2 = coords.get("Coordinate1"), coords.get("Coordinate2")
    if c1 and c2 and c1.get("startingValue") is not None:
        gt = (float(c1["startingValue"]), float(c1["delta"]), 0.0,
              float(c2["startingValue"]), 0.0, float(c2["delta"]))
    return {"width": nx, "height": ny, "bands": nbands,
            "complex": ncomp == 2, "values": bands, "gt": gt,
            "scheme": scheme, "data_type": dtype, "props": props}


def read_ndf_grid(path: str) -> dict:
    kv = {}
    with open(path, encoding="latin-1") as f:
        for ln in f:
            ln = ln.strip().rstrip(";")
            if "=" in ln:
                k, v = ln.split("=", 1)
                kv[k.strip()] = v.strip()
    if "NDF_REVISION" not in kv and "PIXELS_PER_LINE" not in kv:
        raise ValueError("not an NDF header")
    if kv.get("PIXEL_FORMAT", "BYTE") != "BYTE":
        raise NotImplementedError("NDF: only BYTE pixels")
    nx = int(kv["PIXELS_PER_LINE"])
    ny = int(kv["LINES_PER_DATA_FILE"])
    nbands = int(kv.get("NUMBER_OF_BANDS_IN_VOLUME", 1))
    dirname = os.path.dirname(path) or "."
    bands = []
    names = []
    for b in range(1, nbands + 1):
        fn = kv.get(f"BAND{b}_FILENAME")
        if fn:
            fp = os.path.join(dirname, os.path.basename(fn))
        else:
            fp = os.path.splitext(path)[0] + f".I{b}"
        with open(fp, "rb") as f:
            raw = f.read()
        need = nx * ny
        raw = raw[:need] + b"\x00" * max(0, need - len(raw))
        bands.append(np.frombuffer(raw, "u1", need).reshape(ny, nx)
                     .astype(np.float64))
        names.append(kv.get(f"BAND{b}_NAME", ""))
    gt = (0.0, 1.0, 0.0, 0.0, 0.0, -1.0)
    corners = {}
    for c in ("UPPER_LEFT", "UPPER_RIGHT", "LOWER_LEFT", "LOWER_RIGHT"):
        v = kv.get(f"{c}_CORNER")
        if v:
            toks = v.split(",")
            corners[c] = (float(toks[2]), float(toks[3]))
    if len(corners) >= 3:
        ul, ur, ll = (corners["UPPER_LEFT"], corners["UPPER_RIGHT"],
                      corners["LOWER_LEFT"])
        gt1 = (ur[0] - ul[0]) / (nx - 1)
        gt2 = (ur[1] - ul[1]) / (nx - 1)
        gt4 = (ll[0] - ul[0]) / (ny - 1)
        gt5 = (ll[1] - ul[1]) / (ny - 1)
        gt = (ul[0] - gt1 * 0.5 - gt4 * 0.5, gt1, gt2,
              ul[1] - gt2 * 0.5 - gt5 * 0.5, gt4, gt5)
    return {"width": nx, "height": ny, "bands": nbands,
            "values": np.stack(bands), "gt": gt, "band_names": names,
            "header": kv,
            "zone": int(kv.get("USGS_MAP_ZONE", 0)),
            "projection": kv.get("MAP_PROJECTION_NAME")}
