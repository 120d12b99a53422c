"""Small single-purpose grid readers: JDEM, GSC Geogrid, PCI .aux.

- JDEM (frmts/jdem/jdemdataset.cpp): Japanese DEM "mem" files — a
  1011-byte ASCII-digit header (xsize@23:3, ysize@26:3, packed-DMS
  corner angles DDDMMSS/10000 at 29/36/43/50), then per-row records of
  `header6 + row#3 + 5-digit fields` scaled by 0.1 (:140-189); the
  geotransform spans LL->UR corners (:225-243).
- GSC Geogrid (frmts/raw/gscdataset.cpp): Fortran-style records with
  4-byte length markers; record 1 int32 header (reclen, nx, ny,
  reclen==nx*4 sniff with bytes 12..15 == 02 00 00 00), record 2
  eight float32s giving (xsize, ysize, x0, _, _, y0) -> gt
  (:151-174); float32 rows at reclen*2+4 with per-row 8-byte framing;
  nodata -1.0000000150474662e+30.
- PCI .aux (frmts/raw/pauxdataset.cpp): AuxilaryTarget names the raw
  file; RawDefinition "nx ny nbands"; ChanDefinition-N "type offset
  pixoff lineoff [Swapped|Unswapped]" with 8U/16U/16S/32R types
  ("Swapped" = little-endian, :643-688); UpLeftX/Y + LoRightX/Y give
  the geotransform.
"""

from __future__ import annotations

import os
import struct

import numpy as np

GSC_NODATA = -1.0000000150474662199e+30


def read_loslas_grid(path: str) -> dict:
    """NOAA LOS/LAS/GEO datum-shift grid (frmts/raw/loslasdataset.cpp):
    int32 LE dims at offsets 64/68, float32 min_lon/delta_lon/min_lat/
    delta_lat at 76; records of nx*4+4 bytes with a 4-byte prefix,
    stored SOUTH-first (the raster reads bottom-up, :237-244); gt =
    (min_lon - dlon/2, dlon, 0, min_lat + (ny-0.5)*dlat, 0, -dlat).
    Band meaning by extension: .los = longitude offset (positive
    west), .las = latitude offset, .geo = geoid undulation."""
    with open(path, "rb") as f:
        data = f.read()
    nx, ny = struct.unpack_from("<ii", data, 64)
    if not (0 < nx < 100000 and 0 < ny < 100000):
        raise ValueError("LOSLAS: implausible dimensions")
    min_lon, dlon, min_lat, dlat = struct.unpack_from("<4f", data, 76)
    reclen = nx * 4 + 4
    vals = np.empty((ny, nx), np.float64)
    for r in range(ny):
        # raster row r = file record ny-1-r (records are S-first);
        # record r's payload starts after its 4-byte prefix
        off = (ny - r) * reclen + 4
        chunk = data[off:off + nx * 4]
        chunk = chunk + b"\x00" * (nx * 4 - len(chunk))
        vals[r] = np.frombuffer(chunk, "<f4", nx)
    ext = os.path.splitext(path)[1].lower()
    desc = {".los": "Longitude Offset (arc seconds)",
            ".las": "Latitude Offset (arc seconds)",
            ".geo": "Geoid undulation (meters)"}.get(ext, "")
    gt = (min_lon - dlon * 0.5, float(dlon), 0.0,
          min_lat + (ny - 0.5) * dlat, 0.0, -1.0 * dlat)
    return {"width": nx, "height": ny, "values": vals, "gt": gt,
            "description": desc}


def read_jdem_grid(path: str) -> dict:
    with open(path, "rb") as f:
        data = f.read()
    hdr = data[:1011].decode("ascii", "replace")

    def field(off, width):
        return int(hdr[off:off + width])

    def angle(off):
        v = field(off, 7)
        return v // 10000 + (v // 100 % 100) / 60.0 + (v % 100) / 3600.0

    nx = field(23, 3)
    ny = field(26, 3)
    ll_lat, ll_lon = angle(29), angle(36)
    ur_lat, ur_lon = angle(43), angle(50)
    recsize = nx * 5 + 9 + 2
    vals = np.empty((ny, nx), np.float64)
    for row in range(ny):
        rec = data[1011 + recsize * row:1011 + recsize * (row + 1)] \
            .decode("ascii", "replace")
        if rec[:6] != hdr[:6]:
            raise ValueError("JDEM scanline corrupt")
        if int(rec[6:9]) != row + 1:
            raise ValueError("JDEM scanline out of order")
        for i in range(nx):
            # float32 staging matches the reference's float math
            vals[row, i] = np.float32(int(rec[9 + 5 * i:14 + 5 * i])
                                      * np.float32(0.1))
    gt = (ll_lon, (ur_lon - ll_lon) / nx, 0.0,
          ur_lat, 0.0, -1 * (ur_lat - ll_lat) / ny)
    return {"width": nx, "height": ny, "values": vals, "gt": gt}


def read_gsc_grid(path: str) -> dict:
    with open(path, "rb") as f:
        data = f.read()
    if data[12:16] != b"\x02\x00\x00\x00":
        raise ValueError("not a GSC Geogrid file")
    reclen, nx, ny = struct.unpack_from("<iii", data, 0)
    if reclen != nx * 4 or nx < 1 or ny < 1:
        raise ValueError("GSC: inconsistent header")
    reclen += 8  # record length markers
    hdr = struct.unpack_from("<8f", data, reclen + 12)
    gt = (hdr[2], hdr[0], 0.0, hdr[5], 0.0, -hdr[1])
    vals = np.empty((ny, nx), np.float64)
    base = reclen * 2 + 4
    for row in range(ny):
        off = base + row * reclen
        chunk = data[off:off + nx * 4]
        chunk = chunk + b"\x00" * (nx * 4 - len(chunk))
        vals[row] = np.frombuffer(chunk, "<f4", nx)
    return {"width": nx, "height": ny, "values": vals, "gt": gt,
            "nodata": GSC_NODATA}


_PAUX_TYPES = {"8U": ("u1", 1), "16U": ("u2", 2), "16S": ("i2", 2),
               "32R": ("f4", 4)}


def read_paux_grid(path: str) -> dict:
    """path: the .aux file (or the raw file with a sibling .aux)."""
    if not path.lower().endswith(".aux"):
        # the reference tries <name>.aux then the extension-replaced
        # sibling
        if os.path.exists(path + ".aux"):
            path = path + ".aux"
        else:
            path = os.path.splitext(path)[0] + ".aux"
    with open(path, encoding="latin-1") as f:
        lines = [ln.rstrip("\n") for ln in f]
    kv = {}
    for ln in lines:
        if ":" in ln:
            k, v = ln.split(":", 1)
            kv[k.strip()] = v.strip()
    if "AuxilaryTarget" not in kv or "RawDefinition" not in kv:
        raise ValueError("not a PAux description file")
    raw_path = os.path.join(os.path.dirname(path) or ".",
                            os.path.basename(kv["AuxilaryTarget"]))
    nx, ny, nbands = (int(t) for t in kv["RawDefinition"].split()[:3])
    with open(raw_path, "rb") as f:
        raw = f.read()
    bands = []
    metas = []
    for b in range(1, nbands + 1):
        toks = kv.get(f"ChanDefinition-{b}", "").split()
        if len(toks) < 4:
            continue
        typ, off, pixoff, lineoff = toks[0], int(toks[1]), int(toks[2]), \
            int(toks[3])
        le = len(toks) < 5 or toks[4] == "Swapped"
        dts, isz = _PAUX_TYPES.get(typ, ("u1", 1))
        dt = ("<" if le else ">") + dts
        arr = np.empty((ny, nx), np.float64)
        for row in range(ny):
            start = off + row * lineoff
            if pixoff == isz:
                arr[row] = np.frombuffer(raw, dt, nx, start)
            else:
                arr[row] = [
                    np.frombuffer(raw, dt, 1, start + i * pixoff)[0]
                    for i in range(nx)]
        bands.append(arr)
        metas.append({"type": typ, "little_endian": le})
    gt = (0.0, 1.0, 0.0, 0.0, 0.0, -1.0)
    if "UpLeftX" in kv and "LoRightX" in kv:
        ulx, uly = float(kv["UpLeftX"]), float(kv["UpLeftY"])
        lrx, lry = float(kv["LoRightX"]), float(kv["LoRightY"])
        gt = (ulx, (lrx - ulx) / nx, 0.0, uly, 0.0, (lry - uly) / ny)
    return {"width": nx, "height": ny, "bands": len(bands),
            "values": np.stack(bands), "gt": gt, "band_meta": metas,
            "header": kv}
