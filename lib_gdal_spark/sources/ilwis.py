"""ILWIS raster map codec (.mpr/.mpl ini ODFs + .mp# raw data).

Reference: frmts/ilwis/ilwisdataset.cpp — the object definition file
is an ini ([Section] Key=Value); [Map] Size gives "lines cols",
[MapStore] names the raw data file and store type (Byte/Int/Long/
Float/Real = u1/i2/i4/f4/f8 little-endian rows, top-down), and the
[Map] GeoRef points at a .grf whose GeoRefCorners block yields the
geotransform (:503-538: pixel = delta/size; CornersOfCorners=Yes uses
the extent directly, No treats the corners as CELL CENTERS and pads a
half pixel). Multi-band maps are .mpl MapLists of per-band .mpr.
Value domains (system value/count/... or Type=DomainValue .dom files)
carry a BaseMap Range "lo:hi[:step][:offset=r0]" whose raw->value rule
is rValue (:2141-2157): value = (raw + r0)*step, undef raw (0 for
byte, shUNDEF -32767 for int, iUNDEF -2147483647 for long) -> NaN,
with the r0/undef defaults of ValueRange::init (:2046-2123); class/
identifier/bool domains pass raw values through (the reference's
"user converts classes manually" rule).
"""

from __future__ import annotations

import os

import numpy as np

_STORE = {"Byte": ("u1", 1), "Int": ("<i2", 2), "Long": ("<i4", 4),
          "Float": ("<f4", 4), "Real": ("<f8", 8)}
_VALUE_DOMAINS = {"value", "count", "distance", "min1to1", "nilto1",
                  "noaa", "perc", "radar"}
_BYTE_DOMAINS = {"bool", "byte", "bit", "image", "colorcmp",
                 "flowdirection", "hortonratio", "yesno"}
_SH_UNDEF = -32767
_I_UNDEF = -2147483647


def read_odf(path: str) -> dict:
    out: dict = {}
    section = None
    with open(path, encoding="latin-1") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith(";"):
                continue
            if line.startswith("[") and line.endswith("]"):
                section = line[1:-1]
                out.setdefault(section, {})
            elif "=" in line and section is not None:
                k, v = line.split("=", 1)
                out[section][k.strip()] = v.strip()
    return out


def _parse_range(rng: str, store: str):
    """ValueRange(sRng) + init(): -> (step, r0, lo, hi, undef_raw) or
    None when the range carries no step semantics."""
    if ":" not in rng:
        return None
    r0 = None
    for marker in (",offset=", ":offset="):
        if marker in rng:
            head, _, tail = rng.partition(marker)
            r0 = float(tail)
            rng = head
            break
    parts = rng.split(":")
    if len(parts) >= 3:
        step = float(parts[-1])
        lo, hi = float(parts[0]), float(parts[1])
    else:
        step = 1.0
        lo, hi = float(parts[0]), float(parts[1])
    if step < 0:
        step = 0.0
    if step < 1e-06:
        st = "Real"
        step = 0.0
    else:
        span = (hi - lo) / step + 2 if hi - lo <= 0xFFFFFFFF else 1 << 40
        if span > 0x7FFFFFFF:
            st = "Real"
        elif span <= 256 + 0.5:
            st = "Byte"
        elif span <= 32767 + 0.5:
            st = "Int"
        else:
            st = "Long"
    if r0 is None:
        r0 = -1.0 if st == "Byte" else 0.0
    undef = {"Byte": 0, "Int": _SH_UNDEF, "Long": _I_UNDEF}.get(st)
    return step, r0, lo, hi, undef


def _georef_gt(grf_path: str, cols: int, lines: int):
    g = read_odf(grf_path)
    c = g.get("GeoRefCorners")
    if not c:
        return (0.0, 1.0, 0.0, 0.0, 0.0, -1.0)
    minx, miny = float(c["MinX"]), float(c["MinY"])
    maxx, maxy = float(c["MaxX"]), float(c["MaxY"])
    px = (maxx - minx) / cols
    py = (maxy - miny) / lines
    if c.get("CornersOfCorners", "Yes") == "Yes":
        gt0, gt3 = minx, maxy
    else:
        gt0, gt3 = minx - px / 2.0, maxy + py / 2.0
    return (gt0, px, 0.0, gt3, 0.0, -py)


def _read_band(mpr_path: str) -> dict:
    odf = read_odf(mpr_path)
    base = os.path.dirname(mpr_path)
    size = odf["Map"]["Size"].split()
    lines, cols = int(size[0]), int(size[1])
    store = odf["MapStore"]["Type"]
    if store not in _STORE:
        raise NotImplementedError(f"ILWIS store type {store!r}")
    dt, isz = _STORE[store]
    datafile = os.path.join(base, odf["MapStore"]["Data"])
    with open(datafile, "rb") as f:
        raw = f.read()
    need = lines * cols * isz
    raw = raw[:need] + b"\x00" * max(0, need - len(raw))
    vals = np.frombuffer(raw, dt, lines * cols) \
        .reshape(lines, cols).astype(np.float64)
    # domain dispatch
    dom = os.path.splitext(
        os.path.basename(odf["BaseMap"].get("Domain", "")))[0].lower()
    use_range = dom in _VALUE_DOMAINS
    if not use_range and dom not in _BYTE_DOMAINS and dom:
        dom_path = os.path.join(base, dom + ".dom")
        if os.path.exists(dom_path):
            dt_dom = read_odf(dom_path).get("Domain", {}) \
                .get("Type", "").lower()
            use_range = dt_dom == "domainvalue"
    scale, offset, nodata = 1.0, 0.0, None
    if use_range and "Range" in odf["BaseMap"]:
        pr = _parse_range(odf["BaseMap"]["Range"], store)
        if pr is not None:
            step, r0, lo, hi, undef = pr
            if step != 0:
                masked = vals.copy()
                if undef is not None:
                    masked[vals == undef] = np.nan
                vals = (masked + r0) * step
                eps = step / 3.0
                if lo != hi:
                    vals[(vals - lo < -eps) | (vals - hi > eps)] = np.nan
                scale, offset = step, r0 * step
                nodata = float("nan")
    gt = _georef_gt(
        os.path.join(base, odf["Map"]["GeoRef"]), cols, lines) \
        if "GeoRef" in odf.get("Map", {}) else (0, 1, 0, 0, 0, -1)
    return {"width": cols, "height": lines, "values": vals, "gt": gt,
            "store": store, "domain": dom, "scale": scale,
            "offset": offset, "nodata": nodata, "odf": odf}


def read_ilwis_grid(path: str) -> dict:
    """.mpr -> single band; .mpl MapList -> multi-band stack."""
    if path.lower().endswith(".mpl"):
        odf = read_odf(path)
        ml = odf["MapList"]
        n = int(ml["Maps"])
        base = os.path.dirname(path)
        bands = []
        first = None
        for i in range(n):
            name = ml[f"Map{i}"]
            if not name.lower().endswith(".mpr"):
                name += ".mpr"
            b = _read_band(os.path.join(base, name))
            first = first or b
            bands.append(b["values"])
        out = dict(first)
        out["values"] = np.stack(bands)
        out["bands"] = n
        return out
    b = _read_band(path)
    b["values"] = b["values"][None]
    b["bands"] = 1
    return b


def read_ilwis(spark, path: str, band: int = 1):
    import pandas as pd

    g = read_ilwis_grid(path)
    h, w = g["height"], g["width"]
    by, bx = np.mgrid[0:h, 0:w]
    v = g["values"][band - 1].ravel()
    keep = ~np.isnan(v)
    pdf = pd.DataFrame({
        "bx": bx.ravel()[keep].astype(np.int64),
        "by": (h - 1 - by).ravel()[keep].astype(np.int64),
        "value": v[keep]})
    meta = {k: g[k] for k in g if k not in ("values", "odf")}
    return spark.createDataFrame(pdf), meta


def write_ilwis(path: str, values, *, gt=(0.0, 1.0, 0.0, 0.0, 0.0, -1.0),
                store: str = "Byte", domain: str = "image") -> str:
    """Single-band .mpr + .grf + .mp# writer (CornersOfCorners=Yes,
    matching the reference's own create path :565-575)."""
    arr = np.asarray(values)
    lines, cols = arr.shape
    dt, _isz = _STORE[store]
    base, _ = os.path.splitext(path)
    name = os.path.basename(base)
    minx, maxy = gt[0], gt[3]
    maxx = minx + cols * gt[1]
    miny = maxy + lines * gt[5]
    with open(base + ".grf", "w") as f:
        f.write("[Ilwis]\nType=GeoRef\nClass=GeoReference Corners\n"
                "Version=3.1\n"
                f"[GeoRef]\nLines={lines}\nColumns={cols}\n"
                "Type=GeoRefCorners\n"
                "[GeoRefCorners]\nCornersOfCorners=Yes\n"
                f"MinX={minx!r}\nMinY={miny!r}\n"
                f"MaxX={maxx!r}\nMaxY={maxy!r}\n")
    with open(base + ".mpr", "w") as f:
        f.write("[Ilwis]\nType=BaseMap\nClass=Raster Map\nVersion=3.1\n"
                f"[BaseMap]\nDomain={domain}.dom\n"
                f"[Map]\nType=MapStore\nGeoRef={name}.grf\n"
                f"Size={lines} {cols}\n"
                f"[MapStore]\nData={name}.mp#\nStructure=Line\n"
                f"RowLength={cols}\nStartOffset=0\nSwapBytes=No\n"
                f"Type={store}\n")
    with open(base + ".mp#", "wb") as f:
        f.write(np.ascontiguousarray(arr, dt).tobytes())
    return base + ".mpr"
