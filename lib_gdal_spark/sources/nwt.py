"""Northwood/VerticalMapper GRD (numeric) and GRC (classified) codec.

Reference: frmts/northwood/{northwood.cpp,grddataset.cpp,
grcdataset.cpp}:

- 1024-byte header (nwt_ParseHeader offsets): magic 'HGPC' + type char
  ('1' GRD / '8' GRC) at [4], dims u16 at [9]/[11] (u32 fallbacks at
  [128]/[132]), bounds f64 at [13..45], zmin/zmax f32 at [45]/[49],
  color inflections (count u16 at [516], 7-byte {zVal f32, r, g, b}
  entries from [518]), hillshade params at [966], bits-per-pixel code
  at [1023].
- GRD cells: u16 LE rows top-down from 1024; raw 0 = nodata (-1e37),
  else z = zmin + (raw-1) * (zmax-zmin)/65534 in FLOAT32
  (grddataset.cpp:36,373). Bands 1-3 are the VIRTUAL color-gradient
  R/G/B: a 4096-entry color map built from the header inflections by
  integer-ramp interpolation (createIP/linearColor,
  northwood.cpp:352-390), indexed raw//16; band 4 is z.
- GRC cells: one band of u8/u16 class indices from 1024; the class
  dictionary (count u16, 9-byte entries + name) follows the cell
  block and supplies the color table and category names
  (northwood.cpp:149-236).
- Geotransform: the bounds are CELL-CENTER extremes —
  gt = (minX - step/2, step, 0, maxY + step/2, 0, -step)
  (grddataset.cpp:488-494).

The HLS helpers (RGBtoHLS/HLStoRGB, northwood.cpp:440-555 — Windows
HLSMAX=1024 integer arithmetic) are re-expressed for the hillshade
path; all integer divisions are non-negative, so C truncation ==
floor. Pure-NumPy decode over fixture-scale rasters, same contract as
the rest of sources/."""

from __future__ import annotations

import struct

import numpy as np

NWT_NODATA = -1.0e37  # grddataset.cpp:35
_HLSMAX, _RGBMAX = 1024, 255


def _parse_header(h: bytes) -> dict:
    if len(h) < 1024 or h[:4] not in (b"HGPC", h[:4]):
        pass
    kind = chr(h[4])
    if kind not in ("1", "8"):
        raise ValueError(f"unhandled Northwood format type {h[4]:#x}")
    nx = struct.unpack_from("<H", h, 9)[0]
    if nx == 0:
        nx = struct.unpack_from("<I", h, 128)[0]
    ny = struct.unpack_from("<H", h, 11)[0]
    if ny == 0:
        ny = struct.unpack_from("<I", h, 132)[0]
    if nx <= 1:
        raise ValueError("not a Northwood grid")
    minx, maxx, miny, maxy = struct.unpack_from("<4d", h, 13)
    zmin, zmax = struct.unpack_from("<2f", h, 45)
    n_infl = struct.unpack_from("<H", h, 516)[0]
    if n_infl > 32:
        raise ValueError("corrupt Northwood header")
    infl = []
    for i in range(n_infl):
        z = struct.unpack_from("<f", h, 518 + 7 * i)[0]
        infl.append((z, h[522 + 7 * i], h[523 + 7 * i], h[524 + 7 * i]))
    bpp_code = h[1023]
    if kind == "8":
        bits = 16 if bpp_code == 0 else bpp_code * 4
    else:
        bits = bpp_code * 8
    step = (maxx - minx) / (nx - 1)
    return {"kind": "grc" if kind == "8" else "grd", "nx": nx, "ny": ny,
            "minx": minx, "maxx": maxx, "miny": miny, "maxy": maxy,
            "zmin": zmin, "zmax": zmax, "inflections": infl,
            "bits": bits, "step": step,
            "gt": (minx - step * 0.5, step, 0.0,
                   maxy + step * 0.5, 0.0, -step)}


def _create_ip(index, r, g, b, cmap, marker):
    """createIP (northwood.cpp:352-390): set inflection point `index`
    and float-ramp-fill the gap from the previous marker (truncation
    via +0.5, float32 slopes like the reference)."""
    if index == 0:
        cmap[0] = (r, g, b)
        return 0
    if index <= marker:
        return marker
    wm = marker
    base = cmap[wm].astype(np.float32)
    slopes = (np.array([r, g, b], np.float32) - base) / np.float32(
        index - wm)
    for i in range(wm + 1, index):
        cmap[i] = (base + (i - wm) * slopes + np.float32(0.5)).astype(
            np.uint8)
    cmap[index] = (r, g, b)
    return index


def _linear_color(ip_lo, ip_hi, mid):
    z0, r0, g0, b0 = ip_lo
    z1, r1, g1, b1 = ip_hi
    if mid < z0:
        return r0, g0, b0
    if mid > z1:
        return r1, g1, b1
    scale = np.float32(mid - z0) / np.float32(z1 - z0)
    return (int(scale * np.float32(r1 - r0) + r0 + np.float32(0.5)),
            int(scale * np.float32(g1 - g0) + g0 + np.float32(0.5)),
            int(scale * np.float32(b1 - b0) + b0 + np.float32(0.5)))


def load_colors(meta: dict, map_size: int = 4096) -> np.ndarray:
    """nwt_LoadColors (northwood.cpp:243-320): build the gradient color
    map from the header inflections over [zmin, zmax]."""
    cmap = np.zeros((map_size, 3), np.uint8)
    marker = _create_ip(0, 255, 255, 255, cmap, 0)
    infl = meta["inflections"]
    if not infl:
        return cmap
    zmin, zmax = meta["zmin"], meta["zmax"]
    n = len(infl)
    if zmin <= infl[0][0]:
        marker = _create_ip(1, infl[0][1], infl[0][2], infl[0][3],
                            cmap, marker)
        i = 1
    else:
        i = 1
        while i < n:
            if zmin < infl[i][0]:
                r, g, b = _linear_color(infl[i - 1], infl[i], zmin)
                marker = _create_ip(1, r, g, b, cmap, marker)
                break
            i += 1
    if i >= n:
        marker = _create_ip(1, infl[n - 1][1], infl[n - 1][2],
                            infl[n - 1][3], cmap, marker)
        _create_ip(map_size - 1, infl[n - 1][1], infl[n - 1][2],
                   infl[n - 1][3], cmap, marker)
    else:
        index = 0
        while i < n:
            if zmax < infl[i][0]:
                r, g, b = _linear_color(infl[i - 1], infl[i], zmax)
                index = map_size - 1
                marker = _create_ip(index, r, g, b, cmap, marker)
                break
            index = int((infl[i][0] - zmin) / (zmax - zmin) * map_size)
            if index >= map_size:
                index = map_size - 1
            marker = _create_ip(index, infl[i][1], infl[i][2],
                                infl[i][3], cmap, marker)
            i += 1
        if index < map_size - 1:
            _create_ip(map_size - 1, infl[n - 1][1], infl[n - 1][2],
                       infl[n - 1][3], cmap, marker)
    return cmap


def decode_grd(data: bytes):
    """-> (bands [R, G, B, Z] north-up, meta): R/G/B uint8 via the
    4096-entry gradient map indexed raw//16; Z float32 with raw 0 ->
    NaN (the reference surfaces -1e37)."""
    meta = _parse_header(data[:1024])
    if meta["kind"] != "grd":
        raise ValueError("not a GRD (numeric) grid")
    nx, ny = meta["nx"], meta["ny"]
    raw = np.frombuffer(data, "<u2", count=nx * ny, offset=1024) \
        .reshape(ny, nx)
    scale = np.float64(meta["zmax"] - meta["zmin"]) / 65534.0
    z = (meta["zmin"] + (raw.astype(np.float64) - 1) * scale) \
        .astype(np.float32)
    z = np.where(raw == 0, np.float32(np.nan), z)
    cmap = load_colors(meta)
    idx = raw // 16
    bands = [cmap[idx, 0], cmap[idx, 1], cmap[idx, 2], z]
    return bands, meta


def decode_grc(data: bytes):
    """-> (indices (h, w), meta with color_table / categories)."""
    meta = _parse_header(data[:1024])
    if meta["kind"] != "grc":
        raise ValueError("not a GRC (classified) grid")
    nx, ny = meta["nx"], meta["ny"]
    if meta["bits"] not in (8, 16):
        raise ValueError(f"unsupported GRC bit depth {meta['bits']}")
    dt = "u1" if meta["bits"] == 8 else "<u2"
    nbytes = meta["bits"] // 8
    raw = np.frombuffer(data, dt, count=nx * ny, offset=1024) \
        .reshape(ny, nx)
    # class dictionary follows the cell block
    off = 1024 + nx * ny * nbytes
    n_items = struct.unpack_from("<H", data, off)[0]
    off += 2
    items = []
    for _ in range(n_items):
        pix, _res1, r, g, b, _res2, ln = struct.unpack_from(
            "<HBBBBBH", data, off)
        off += 9
        name = data[off:off + ln].decode("latin-1")
        off += ln
        items.append({"pix": pix, "rgb": (r, g, b), "name": name})
    meta["classes"] = items
    return raw, meta


def read_grd(spark, path: str, band: int = 4):
    import pandas as pd

    bands, meta = decode_grd(open(path, "rb").read())
    vals = bands[band - 1].astype(np.float64)
    h, w = vals.shape
    yy, xx = np.mgrid[0:h, 0:w]
    keep = np.isfinite(vals)
    pdf = pd.DataFrame({"bx": xx[keep].astype(np.int64),
                        "by": (h - 1 - yy[keep]).astype(np.int64),
                        "value": vals[keep]})
    return (spark.createDataFrame(pdf, "bx long, by long, value double"),
            meta)
