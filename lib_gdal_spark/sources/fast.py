"""EOSAT FAST Format (Landsat / Euromap IRS) reader.

Reference: frmts/raw/fastdataset.cpp — an ASCII administrative header
with fixed-size values after each label (GetValue skips spaces and
'=', :455-470), then radiometric (GAINS/BIASES order depends on which
word comes first, values grabbed as the next number runs, :805-866)
and geometric records (corner coordinates 28 chars after the
"UL/UR/LL/LR " markers inside the PROJECTION section, 13-char fields,
:940-986). Band files resolve per satellite: Landsat uses the
FILENAME fields (case-insensitive in the header's directory), Euromap
IRS PAN/LISS3 derive sibling names from the header's last letter
(:305-452) and the generic fallback ladder tries <prefix>.<band>,
IMAGERY<n>/BAND<n> variants (:219-292). 8-bit -> Byte, 10/16-bit ->
UInt16 (:779-800). The geotransform is the least-squares affine
through the four pixel-center corner GCPs at (0.5, 0.5) ..
(nx-0.5, ny-0.5) — GDALGCPsToGeoTransform over TL/TR/BR/BL — with
UTM zone-prefixed eastings stripped (:991-999). Read-only, like the
reference driver.
"""

from __future__ import annotations

import os
import re

import numpy as np

_VALUE_SIZE = 24


def _get_value(header: str, name: str, size: int,
               normalize: bool = True) -> str | None:
    i = header.find(name)
    if i < 0:
        return None
    i += len(name)
    while i < len(header) and header[i] == " ":
        i += 1
    while i < len(header) and header[i] == "=":
        i += 1
    v = header[i:i + size]
    return " ".join(v.split()) if normalize else v.strip()


def _scan_numbers(text: str, count: int) -> list[float]:
    out = []
    pos = 0
    for _ in range(count):
        # Fortran D-exponents appear in RevB USGS parameter lists
        m = re.search(r"[-+]?[.0-9]+(?:[dDeE][-+]?[0-9]+)?", text[pos:])
        if not m:
            break
        out.append(float(m.group(0).replace("D", "E").replace("d", "e")))
        pos += m.end()
    return out


def _corner(geom: str, marker: str):
    i = geom.find(marker)
    if i < 0:
        return None
    base = i + len(marker) + 28
    x = float(geom[base:base + 13])
    y = float(geom[base + 14:base + 14 + 13])
    return x, y


def _gcps_to_gt(gcps):
    """Least-squares affine (GDALGCPsToGeoTransform) for
    (pixel, line) -> (X, Y)."""
    A = np.array([[1.0, p, l] for p, l, _x, _y in gcps])
    bx = np.array([x for _p, _l, x, _y in gcps])
    by = np.array([y for _p, _l, _x, y in gcps])
    cx, *_ = np.linalg.lstsq(A, bx, rcond=None)
    cy, *_ = np.linalg.lstsq(A, by, rcond=None)
    return (cx[0], cx[1], cx[2], cy[0], cy[1], cy[2])


def _find_ci(dirname: str, name: str) -> str | None:
    p = os.path.join(dirname, name)
    if os.path.exists(p):
        return p
    low = name.lower()
    for f in os.listdir(dirname):
        if f.lower() == low:
            return os.path.join(dirname, f)
    return None


def _euromap_pan(path: str):
    last = os.path.basename(path)[-1].lower()
    if "a" <= last <= "j":
        cand = path[:-1] + chr(ord(last) - ord("a") + ord("0"))
    elif "k" <= last <= "m":
        cand = path[:-1] + chr(ord(last) - ord("k") + ord("n"))
    else:
        return []
    for c in (cand, cand[:-1] + cand[-1].upper()):
        if os.path.exists(c):
            return [c]
    return []


_LISS_GROUPS = ["02345", "6789a", "bcdef", "ghijk", "lmnop", "qrstu",
                "vwxyz"]


def _euromap_liss3(path: str):
    last = os.path.basename(path)[-1].lower()
    for grp in _LISS_GROUPS:
        if last == grp[0]:
            out = []
            for ch in grp[1:]:
                for c in (path[:-1] + ch, path[:-1] + ch.upper()):
                    if os.path.exists(c):
                        out.append(c)
                        break
            return out
    return []


def _euromap_wifs(path: str):
    # header ends in '0'; bands are siblings '1' and '2' (:417-436)
    if os.path.basename(path)[-1] != "0":
        return []
    out = []
    for j in ("1", "2"):
        c = path[:-1] + j
        if os.path.exists(c):
            out.append(c)
    return out


def _fallback_ladder(path: str, band: int):
    d = os.path.dirname(path)
    base = os.path.basename(path)
    prefix, _, suffix = base.rpartition(".")
    names = [f"{prefix}.{band}.{suffix}" if suffix else f"{prefix}.{band}"]
    for pat in ("IMAGERY%d", "imagery%d"):
        names.append(f"{pat % band}.{suffix}" if suffix else pat % band)
    names += [f"IMAGERY{band}.DAT", f"imagery{band}.dat",
              f"IMAGERY{band}.dat", f"imagery{band}.DAT"]
    for pat in ("BAND%d", "band%d"):
        names.append(f"{pat % band}.{suffix}" if suffix else pat % band)
    names += [f"BAND{band}.DAT", f"band{band}.dat", f"BAND{band}.dat",
              f"band{band}.DAT"]
    for n in names:
        p = os.path.join(d, n)
        if os.path.exists(p):
            return p
    return None


def read_fast(path: str) -> dict:
    with open(path, "rb") as f:
        header = f.read().decode("ascii", "replace")
    if "ACQUISITION DATE" not in header or "SATELLITE" not in header:
        raise ValueError("not a FAST header")
    meta = {
        "ACQUISITION_DATE": _get_value(header, "ACQUISITION DATE", 8) or "",
        "SATELLITE": _get_value(header, "SATELLITE", 10) or "",
        "SENSOR": _get_value(header, "SENSOR", 10) or "",
    }
    is_landsat = meta["SATELLITE"].upper().startswith("LANDSAT")
    dirname = os.path.dirname(path) or "."

    band_files: list[str] = []
    if "FILENAME" not in header and "GENERATING AGENCY =EUROMAP" in header:
        if meta["SATELLITE"] in ("IRS 1C", "IRS 1D"):
            if meta["SENSOR"] == "PAN":
                band_files = _euromap_pan(path)
            elif meta["SENSOR"] == "LISS3":
                band_files = _euromap_liss3(path)
            elif meta["SENSOR"] == "WIFS":
                band_files = _euromap_wifs(path)
    if not band_files:
        # the reference always iterates 7 candidate bands (:710-741):
        # Landsat opens the FILENAME entries, everything else walks
        # the generic <prefix>.<n> / IMAGERY<n> / BAND<n> ladder
        pos = 0
        for _i in range(7):
            j = header.find("FILENAME", pos)
            name = None
            if j >= 0:
                k = j + len("FILENAME")
                while k < len(header) and header[k] == " ":
                    k += 1
                while k < len(header) and header[k] == "=":
                    k += 1
                name = header[k:k + 29].strip()
                pos = k
            f = None
            if is_landsat:
                if name:
                    f = _find_ci(dirname, name)
                else:
                    break
            else:
                f = _fallback_ladder(path, len(band_files) + 1)
            if f:
                band_files.append(f)
            elif not is_landsat:
                break
    if not band_files:
        raise ValueError("FAST: no band data files found")

    nx = int(_get_value(header, "PIXELS PER LINE", 5, False) or 0)
    lines = _get_value(header, "LINES PER BAND", 5, False) \
        or _get_value(header, "LINES PER IMAGE", 5, False)
    ny = int(lines)
    bits = int(_get_value(header, "OUTPUT BITS PER PIXEL", 2, False) or 8)
    dt = np.uint8 if bits == 8 else np.dtype("<u2")
    isz = np.dtype(dt).itemsize

    # gains/biases: whichever word appears first names the first column
    bi, gi = header.find("BIASES"), header.find("GAINS")
    if bi >= 0 and gi >= 0:
        first, second = ("GAIN", "BIAS") if bi > gi else ("BIAS", "GAIN")
        tail = header[min(bi, gi):]
        nums = _scan_numbers(tail, 2 * len(band_files))
        for i in range(len(band_files)):
            if 2 * i + 1 < len(nums):
                meta[f"{first}{i + 1}"] = nums[2 * i]
                meta[f"{second}{i + 1}"] = nums[2 * i + 1]

    zone = int(_get_value(header, "USGS MAP ZONE", 6, False) or 0)
    proj = _get_value(header, "MAP PROJECTION", 4) or ""
    params = []
    i = header.find("USGS PROJECTION PARAMETERS")
    if i >= 0:
        params = _scan_numbers(header[i + 26:], 15)

    gt = (0.0, 1.0, 0.0, 0.0, 0.0, 1.0)
    geom = header[header.find("PROJECTION"):] \
        if "PROJECTION" in header else ""
    corners = {m: _corner(geom, m + " ")
               for m in ("UL", "UR", "LL", "LR")}
    if all(corners.values()) and all(
            x != 0 and y != 0 for x, y in corners.values()):
        cc = {}
        for k, (x, y) in corners.items():
            if x >= 1000000.0:
                x -= zone * 1000000.0
            cc[k] = (x, y)
        gcps = [
            (0.5, 0.5, *cc["UL"]),
            (nx - 0.5, 0.5, *cc["UR"]),
            (nx - 0.5, ny - 0.5, *cc["LR"]),
            (0.5, ny - 0.5, *cc["LL"]),
        ]
        gt = _gcps_to_gt(gcps)

    bands = []
    for f in band_files:
        with open(f, "rb") as fh:
            raw = fh.read()
        need = nx * ny * isz
        raw = raw[:need] + b"\x00" * max(0, need - len(raw))
        bands.append(np.frombuffer(raw, dt, nx * ny).reshape(ny, nx)
                     .astype(np.float64))
    return {"width": nx, "height": ny, "bands": len(bands),
            "values": np.stack(bands), "gt": gt, "meta": meta,
            "band_files": band_files, "bits": bits, "zone": zone,
            "projection": proj, "proj_params": params}


def read_fast_df(spark, path: str, band: int = 1):
    import pandas as pd

    g = read_fast(path)
    h, w = g["height"], g["width"]
    by, bx = np.mgrid[0:h, 0:w]
    pdf = pd.DataFrame({
        "bx": bx.ravel().astype(np.int64),
        "by": (h - 1 - by).ravel().astype(np.int64),
        "value": g["values"][band - 1].ravel()})
    meta = {k: g[k] for k in g if k != "values"}
    return spark.createDataFrame(pdf), meta
