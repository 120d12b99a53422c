"""FARSITE v.4 landscape (.lcp) reader.

Reference: frmts/raw/lcpdataset.cpp — a 7316-byte little-endian
header: crown/ground flags at 0/4 (21 = present, giving 5/7/8/10
bands), latitude at 8, per-slot class blocks of 412 bytes from 44
(min/max/num-classes int32 + up to 100 class values), unit shorts at
4224 + 2*slot, dims at 4164/4168, E/W/N/S doubles at 4172..4196, cell
sizes at 4208/4216, linear-unit int at 4204, per-slot file names (256
chars) from 4244, description at 6804. Data from 7316: Int16
pixel-interleaved (BIP) across the bands. Band order: Elevation,
Slope, Aspect, Fuel model, Canopy cover [, Canopy height, Canopy base
height, Canopy bulk density][, Duff, Coarse woody]; without crown
fuels the ground-fuel bands keep their fixed header slots (8, 9).
The geotransform is (West, cellX, 0, North, 0, -cellY). Read-only.
"""

from __future__ import annotations

import struct

import numpy as np

_SLOTS = ["ELEVATION", "SLOPE", "ASPECT", "FUEL_MODEL", "CANOPY_COV",
          "CANOPY_HT", "CB_HT", "CB_DENSITY", "DUFF", "CWD"]
_UNIT_NAMES = {
    "ELEVATION": {0: "Meters", 1: "Feet"},
    "SLOPE": {0: "Degrees", 1: "Percent"},
    "ASPECT": {0: "Grass categories/slope index", 1: "Azimuth degrees",
               2: "Azimuth degrees"},
    "CANOPY_COV": {0: "Categories (0-4)", 1: "Percent"},
}


def read_lcp_grid(path: str) -> dict:
    with open(path, "rb") as f:
        data = f.read()
    if len(data) < 7316:
        raise ValueError("LCP: file shorter than the 7316-byte header")

    def i32(off):
        return struct.unpack_from("<i", data, off)[0]

    def u16(off):
        return struct.unpack_from("<H", data, off)[0]

    def f64(off):
        return struct.unpack_from("<d", data, off)[0]

    crown = i32(0) - 20
    ground = i32(4) - 20
    if crown not in (0, 1) or ground not in (0, 1):
        raise ValueError("LCP: bad crown/ground flags")
    slots = list(range(5))
    if crown:
        slots += [5, 6, 7]
    if ground:
        slots += [8, 9]
    nbands = len(slots)
    nx, ny = i32(4164), i32(4168)
    east, west = f64(4172), f64(4180)
    north, south = f64(4188), f64(4196)
    cellx, celly = f64(4208), f64(4216)
    unit = i32(4204)
    lat = i32(8)
    desc = data[6804:7315].split(b"\x00")[0].decode("latin-1")
    band_meta = []
    for slot in slots:
        name = _SLOTS[slot]
        base = 44 + slot * 412
        nclass = i32(base + 8)
        meta = {
            "name": name,
            "unit": u16(4224 + 2 * slot),
            "min": i32(base), "max": i32(base + 4),
            "num_classes": nclass,
            "file": data[4244 + 256 * slot:4244 + 256 * slot + 256]
            .split(b"\x00")[0].decode("latin-1"),
        }
        if 0 < nclass <= 100:
            # the reference scans nclass+1 entries and keeps those in
            # [min, max] (:457-471)
            meta["values"] = [
                v for v in (i32(base + 12 + 4 * k)
                            for k in range(nclass + 1))
                if meta["min"] <= v <= meta["max"]]
        nm = _UNIT_NAMES.get(name, {})
        if meta["unit"] in nm:
            meta["unit_name"] = nm[meta["unit"]]
        band_meta.append(meta)
    px = np.frombuffer(data, "<i2", nx * ny * nbands, 7316) \
        .reshape(ny, nx, nbands)
    bands = np.ascontiguousarray(px.transpose(2, 0, 1)) \
        .astype(np.float64)
    return {"width": nx, "height": ny, "bands": nbands,
            "values": bands, "band_meta": band_meta,
            "gt": (west, cellx, 0.0, north, 0.0, -celly),
            "latitude": lat,
            "linear_unit": {0: "Meters", 1: "Feet"}.get(unit),
            "description": desc,
            "crown_fuels": bool(crown), "ground_fuels": bool(ground)}
