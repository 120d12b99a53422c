"""Generic Binary (.bil+.hdr), Erdas Imagine Raw (EIR), MFF2/HKV.

- GenBin (frmts/raw/genbindataset.cpp): "KEY: value" .hdr with
  BANDS/ROWS/COLS, INTERLEAVING BSQ|BIL|BIP, DATATYPE U8/U16/S16/
  F32/F64, UL/LR pixel-CENTER corner coordinates -> the
  (LR-UL)/(n-1) half-pixel geotransform (:703-709), BYTE_ORDER.
- EIR (frmts/raw/eirdataset.cpp): IMAGINE_RAW_FILE token header
  (WIDTH/HEIGHT/NUM_LAYERS/PIXEL_FILES/FORMAT/DATATYPE/DATA_OFFSET).
- MFF2/HKV (frmts/raw/hkvdataset.cpp): a DIRECTORY holding `attrib`
  (key=value; starred choices inside {..} braces select the active
  option), `image_data` raw and `georef` corner lat/lons; pixel.size
  bits + unsigned/twos-complement/ieee-754 encodings pick the dtype,
  channel.interleave *pixel|tile|sequential.
"""

from __future__ import annotations

import os
import re

import numpy as np

_GENBIN_TYPES = {"U8": "u1", "U16": "u2", "S16": "i2", "F32": "f4",
                 "F64": "f8"}


def read_genbin_grid(path: str) -> dict:
    hdr_path = os.path.splitext(path)[0] + ".hdr"
    if not os.path.exists(hdr_path):
        raise ValueError("GenBin: missing .hdr sidecar")
    kv = {}
    with open(hdr_path) as f:
        for ln in f:
            if ":" in ln:
                k, v = ln.split(":", 1)
                kv[k.strip()] = v.strip()
    if "BANDS" not in kv or "ROWS" not in kv or "COLS" not in kv:
        raise ValueError("not a GenBin header")
    nb, ny, nx = int(kv["BANDS"]), int(kv["ROWS"]), int(kv["COLS"])
    dts = _GENBIN_TYPES.get(kv.get("DATATYPE", "U8").upper(), "u1")
    en = ">" if kv.get("BYTE_ORDER", "NA").upper() == "MSB" else "<"
    dt = dts if dts == "u1" else en + dts
    isz = np.dtype(dt).itemsize
    inter = kv.get("INTERLEAVING", "BSQ").upper()
    with open(path, "rb") as f:
        raw = f.read()
    need = nb * ny * nx * isz
    raw = raw[:need] + b"\x00" * max(0, need - len(raw))
    flat = np.frombuffer(raw, dt, nb * ny * nx).astype(np.float64)
    if inter == "BSQ":
        bands = flat.reshape(nb, ny, nx)
    elif inter == "BIL":
        bands = flat.reshape(ny, nb, nx).transpose(1, 0, 2)
    elif inter == "BIP":
        bands = flat.reshape(ny, nx, nb).transpose(2, 0, 1)
    else:
        raise NotImplementedError(f"GenBin interleave {inter!r}")
    gt = None
    if all(k in kv for k in ("UL_X_COORDINATE", "UL_Y_COORDINATE",
                             "LR_X_COORDINATE", "LR_Y_COORDINATE")):
        ulx, uly = float(kv["UL_X_COORDINATE"]), float(kv["UL_Y_COORDINATE"])
        lrx, lry = float(kv["LR_X_COORDINATE"]), float(kv["LR_Y_COORDINATE"])
        gt1 = (lrx - ulx) / (nx - 1)
        gt5 = (lry - uly) / (ny - 1)
        gt = (ulx - gt1 * 0.5, gt1, 0.0, uly - gt5 * 0.5, 0.0, gt5)
    return {"width": nx, "height": ny, "bands": nb,
            "values": np.ascontiguousarray(bands), "gt": gt,
            "header": kv}


def read_eir_grid(path: str) -> dict:
    with open(path) as f:
        text = f.read()
    if "IMAGINE_RAW_FILE" not in text:
        raise ValueError("not an EIR header")
    kv = {}
    for ln in text.splitlines():
        toks = ln.split()
        if len(toks) >= 2:
            kv[toks[0]] = toks[1]
    nx, ny = int(kv["WIDTH"]), int(kv["HEIGHT"])
    nb = int(kv.get("NUM_LAYERS", 1))
    dts = {"U8": "u1", "U16": "<u2", "S16": "<i2", "F32": "<f4",
           "U1": "u1", "U2": "u1", "U4": "u1"}.get(
        kv.get("DATATYPE", "U8"), "u1")
    offset = int(kv.get("DATA_OFFSET", 0))
    img = os.path.join(os.path.dirname(path) or ".", kv["PIXEL_FILES"])
    with open(img, "rb") as f:
        raw = f.read()[offset:]
    isz = np.dtype(dts).itemsize
    need = nb * ny * nx * isz
    raw = raw[:need] + b"\x00" * max(0, need - len(raw))
    flat = np.frombuffer(raw, dts, nb * ny * nx).astype(np.float64)
    fmt = kv.get("FORMAT", "BIL").upper()
    if fmt == "BIL":
        bands = flat.reshape(ny, nb, nx).transpose(1, 0, 2)
    elif fmt == "BSQ":
        bands = flat.reshape(nb, ny, nx)
    else:
        bands = flat.reshape(ny, nx, nb).transpose(2, 0, 1)
    return {"width": nx, "height": ny, "bands": nb,
            "values": np.ascontiguousarray(bands), "header": kv}


def _hkv_choice(v: str) -> str:
    m = re.search(r"\*(\S+)", v)
    return m.group(1) if m else v.strip()


def read_mff2_grid(path: str) -> dict:
    """path: the dataset DIRECTORY."""
    attrib = os.path.join(path, "attrib")
    if not os.path.isdir(path) or not os.path.exists(attrib):
        raise ValueError("not an MFF2/HKV dataset directory")
    kv = {}
    with open(attrib) as f:
        for ln in f:
            if "=" in ln:
                k, v = ln.split("=", 1)
                kv[k.strip()] = v.strip()
    nx = int(kv["extent.cols"])
    ny = int(kv["extent.rows"])
    nb = int(kv.get("channel.enumeration", 1))
    size = int(kv.get("pixel.size", 8)) // 8
    enc = _hkv_choice(kv.get("pixel.encoding", "unsigned"))
    field = _hkv_choice(kv.get("pixel.field", "real"))
    order = _hkv_choice(kv.get("pixel.order", "lsbf"))
    inter = _hkv_choice(kv.get("channel.interleave", "pixel"))
    if field == "complex":
        raise NotImplementedError("MFF2 complex pixels")
    base = {("unsigned", 1): "u1", ("unsigned", 2): "u2",
            ("unsigned", 4): "u4", ("twos-complement", 1): "i1",
            ("twos-complement", 2): "i2", ("twos-complement", 4): "i4",
            ("ieee-754", 4): "f4", ("ieee-754", 8): "f8"}.get((enc, size))
    if base is None:
        raise NotImplementedError(f"MFF2 pixel {enc}/{size}")
    dt = base if size == 1 else (("<" if order == "lsbf" else ">") + base)
    with open(os.path.join(path, "image_data"), "rb") as f:
        raw = f.read()
    need = nb * ny * nx * size
    raw = raw[:need] + b"\x00" * max(0, need - len(raw))
    flat = np.frombuffer(raw, dt, nb * ny * nx).astype(np.float64)
    if inter == "pixel":
        bands = flat.reshape(ny, nx, nb).transpose(2, 0, 1)
    elif inter == "sequential":
        bands = flat.reshape(nb, ny, nx)
    else:  # tile
        raise NotImplementedError("MFF2 tile interleave")
    georef = {}
    gpath = os.path.join(path, "georef")
    if os.path.exists(gpath):
        with open(gpath) as f:
            for ln in f:
                if "=" in ln:
                    k, v = ln.split("=", 1)
                    georef[k.strip()] = v.strip()
    return {"width": nx, "height": ny, "bands": nb,
            "values": np.ascontiguousarray(bands), "header": kv,
            "georef": georef}
