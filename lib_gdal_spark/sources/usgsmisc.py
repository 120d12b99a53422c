"""USGS/GRASS miscellany: CTG LULC grids, DOQ2, GRASS ASCII grids.

- CTG (frmts/ctg/ctgdataset.cpp): USGS Land Use composite theme grid —
  five 80-char header records (rows@0:10, cols@20:10, cell size@35:5,
  UTM zone@50:5 on record 1; NW corner easting/northing at record 4
  offsets 40/50; TITLE record 5), then 80-char data records of
  zone + cell-center easting/northing + SIX int fields (>= 2e9 -> 0)
  scattered into the grid by (center - cell/2 - NW) / cellsize
  (:284-330). gt = (NW - cell/2 style per :95-100's GetGeoTransform —
  the corner-adjusted NW origin). Band 1 is the LULC code (nodata 0).
- DOQ2 (frmts/raw/doq2dataset.cpp): BEGIN_USGS_DOQ_HEADER 80-char
  records; SAMPLES_AND_LINES, BYTE_COUNT skip, XY_ORIGIN +
  HORIZONTAL_RESOLUTION -> gt (origins are the UL pixel corner,
  :133-138), BAND_ORGANIZATION BIP with BAND_CONTENT-counted Byte
  bands at stride nbands (:381-400); all other records become
  metadata with '*' tokens dropped and quoted strings preserved.
- GRASS ASCII grid (frmts/aaigrid GRASSASCIIDataset): north/south/
  east/west + rows/cols header, whitespace values; gt spans the
  stated extent.
"""

from __future__ import annotations

import re
import shlex

import numpy as np

CTG_BAND_DESCRIPTIONS = [
    "Land Use and Land Cover Code", "Political units Code",
    "Census county subdivisions and SMSA tracts Code",
    "Hydrologic units Code", "Federal land ownership Code",
    "State land ownership Code"]


def read_ctg_grid(path: str) -> dict:
    with open(path, "rb") as f:
        data = f.read().decode("ascii", "replace")
    if len(data) < 400:
        raise ValueError("CTG: header too short")
    hdr = data[:400]
    nrows = int(hdr[0:10])
    ncols = int(hdr[20:30])
    cell = int(hdr[35:40])
    zone = int(hdr[50:55])
    if not (0 < cell < 10000 and 0 < zone <= 60):
        raise ValueError("CTG: invalid cell size or UTM zone")
    nw_e = int(hdr[3 * 80 + 40:3 * 80 + 50])
    nw_n = int(hdr[3 * 80 + 50:3 * 80 + 60])
    title = hdr[4 * 80:5 * 80].strip()
    bands = np.zeros((6, nrows, ncols), np.int64)
    pos = 400
    while pos + 80 <= len(data):
        line = data[pos:pos + 80]
        pos += 80
        if not line.strip():
            continue
        if int(line[0:3]) != zone:
            raise ValueError("CTG: unexpected UTM zone in data record")
        x = int(line[3:11]) - cell // 2
        y = int(line[11:19]) + cell // 2
        dx, dy = x - nw_e, nw_n - y
        if dx < 0 or dx % cell or dy < 0 or dy % cell:
            raise ValueError("CTG: unexpected cell coordinates")
        cx, cy = dx // cell, dy // cell
        if cx >= ncols or cy >= nrows:
            raise ValueError("CTG: cell out of range")
        for i in range(6):
            v = int(line[20 + 10 * i:30 + 10 * i])
            bands[i, cy, cx] = 0 if v >= 2000000000 else v
    return {"width": ncols, "height": nrows, "bands": 6,
            "values": bands.astype(np.float64), "cell_size": cell,
            "utm_zone": zone, "title": title, "nodata": 0.0,
            "band_descriptions": CTG_BAND_DESCRIPTIONS,
            "gt": (float(nw_e - cell // 2), float(cell), 0.0,
                   float(nw_n + cell // 2), 0.0, -float(cell))}


def read_doq2_grid(path: str) -> dict:
    with open(path, "rb") as f:
        data = f.read()
    text = data.decode("latin-1")
    if not text.startswith("BEGIN_USGS_DOQ_HEADER"):
        raise ValueError("not a DOQ2 file")
    meta: dict[str, str] = {}
    nx = ny = skip = 0
    ulx = uly = xdim = 0.0
    nbands = 0
    bpp = 1
    org = None
    pos = text.find("\n") + 1
    while pos < len(text):
        eol = text.find("\n", pos)
        line = text[pos:eol if eol > 0 else None].rstrip("\r")
        pos = eol + 1 if eol > 0 else len(text)
        if line.startswith("END_USGS_DOQ_HEADER"):
            break
        try:
            toks = shlex.split(line)
        except ValueError:
            toks = line.split()
        if len(toks) < 2:
            break
        key = toks[0]
        if key == "SAMPLES_AND_LINES" and len(toks) >= 3:
            nx, ny = int(toks[1]), int(toks[2])
        elif key == "BYTE_COUNT":
            skip = int(toks[1])
        elif key == "XY_ORIGIN" and len(toks) >= 3:
            ulx, uly = float(toks[1]), float(toks[2])
        elif key == "HORIZONTAL_RESOLUTION":
            xdim = float(toks[1])
        elif key == "BAND_ORGANIZATION":
            org = toks[1]
        elif key == "BAND_CONTENT":
            nbands += 1
        elif key == "BITS_PER_PIXEL":
            bpp = int(toks[1]) // 8
        elif key in ("HORIZONTAL_COORDINATE_SYSTEM", "COORDINATE_ZONE",
                     "HORIZONTAL_UNITS", "HORIZONTAL_DATUM"):
            meta[key] = toks[1]
        else:
            meta[key] = " ".join(t for t in toks[1:] if t != "*")
    if nbands < 2:
        nbands = bpp
    pixstride = bpp * nbands if nbands >= 2 else bpp
    if org not in (None, "BIP", "BIL", "BSQ", "SINGLE", "SINGLE FILE"):
        raise NotImplementedError(f"DOQ2 organization {org!r}")
    linebytes = pixstride * nx
    bands = []
    for b in range(nbands):
        arr = np.zeros((ny, nx), np.float64)
        for row in range(ny):
            start = skip + row * linebytes + b
            chunk = data[start:start + nx * pixstride:pixstride]
            arr[row, :len(chunk)] = np.frombuffer(
                bytes(chunk), "u1", len(chunk))
            if len(chunk) < nx:
                break
        bands.append(arr)
    return {"width": nx, "height": ny, "bands": nbands,
            "values": np.stack(bands), "metadata": meta,
            "gt": (ulx, xdim, 0.0, uly, 0.0, -xdim)}


def read_grass_ascii_grid(path: str) -> dict:
    with open(path) as f:
        text = f.read()
    kv = {}
    lines = text.splitlines()
    body_start = 0
    for i, ln in enumerate(lines):
        m = re.match(r"\s*(north|south|east|west|rows|cols|null)\s*:"
                     r"\s*(\S+)", ln)
        if m:
            kv[m.group(1)] = m.group(2)
            body_start = i + 1
        else:
            break
    if "rows" not in kv or "north" not in kv:
        raise ValueError("not a GRASS ASCII grid")
    nrows, ncols = int(kv["rows"]), int(kv["cols"])
    north, south = float(kv["north"]), float(kv["south"])
    east, west = float(kv["east"]), float(kv["west"])
    toks = " ".join(lines[body_start:]).split()
    null = kv.get("null", "*")
    vals = np.array([np.nan if t == null else float(t)
                     for t in toks[:nrows * ncols]], np.float64)
    vals = np.pad(vals, (0, nrows * ncols - len(vals)),
                  constant_values=np.nan).reshape(nrows, ncols)
    return {"width": ncols, "height": nrows, "values": vals,
            "gt": (west, (east - west) / ncols, 0.0, north, 0.0,
                   -(north - south) / nrows)}
