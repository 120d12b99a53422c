"""NRCan Geoid BYN (.byn/.err) vertical datum grid codec.

Reference: frmts/raw/byndataset.cpp/.h — an 80-byte LITTLE-ENDIAN
header (buffer2header offsets :459-485): South/North/West/East int32
arc-seconds, DLat/DLon int16, Global/Type int16, Factor float64,
SizeOf int16 (2 = Int16, 4 = Int32 data), VDatum int16, Descrip/
SubType/Datum/Ellipsoid/ByteOrder/Scale int16, Wo/GM float64,
TideSys/Realiz int16, Epoch float32, PtType int16. Scale == 1
multiplies boundaries and spacings by 1000 (:203-216); raster size is
X = int((E - W + 1)/DLon + 1), Y = int((N - S + 1)/DLat + 1) (:287-297)
with the half-cell N-up geotransform (:309-314). Data rows start at
byte 80, top-down (row 0 = north), endianness from ByteOrder (1 = LE).
Band nodata is 32767 for Int16 and 9999*Factor for Int32 (:79); scale
is 1/Factor (:88) — the DataFrame view exposes RAW integers (what
GDALChecksumImage checksums) plus the factor in meta. Wo..Epoch may
carry garbage (0xCC markers) in real datasets; like the reference,
those fields are read but never validated (:188-200, disabled block).
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_LAT = 90 * 3600 * 2
_MAX_LON = 180 * 3600 * 2
_SCALE = 1000

_HDR = struct.Struct("<iiiihhhhdhh4xhhhhhhddhhfh2x")
assert _HDR.size == 80
_FIELDS = ("south", "north", "west", "east", "dlat", "dlon", "global_",
           "type", "factor", "sizeof", "vdatum", "descrip", "subtype",
           "datum", "ellipsoid", "byteorder", "scale", "wo", "gm",
           "tidesys", "realiz", "epoch", "pttype")


def read_byn_grid(path: str) -> dict:
    """Driver-side parse -> header fields + {width, height, gt, values
    (H, W) int raw N-up, dtype, nodata} (geoid lattices are small)."""
    with open(path, "rb") as f:
        data = f.read()
    if len(data) < 80:
        raise ValueError("BYN: file shorter than the 80-byte header")
    h = dict(zip(_FIELDS, _HDR.unpack(data[:80])))
    if not (0 <= h["global_"] <= 1 and 0 <= h["type"] <= 9
            and h["sizeof"] in (2, 4) and 0 <= h["vdatum"] <= 3
            and 0 <= h["descrip"] <= 3 and 0 <= h["subtype"] <= 9
            and 0 <= h["datum"] <= 1 and 0 <= h["ellipsoid"] <= 7
            and 0 <= h["byteorder"] <= 1 and 0 <= h["scale"] <= 1):
        raise ValueError("BYN: header field out of range")
    lim_lat = _MAX_LAT // _SCALE if h["scale"] == 1 else _MAX_LAT
    lim_lon = _MAX_LON // _SCALE if h["scale"] == 1 else _MAX_LON
    if (abs(h["south"] - h["dlat"] // 2) > lim_lat
            or abs(h["north"] + h["dlat"] // 2) > lim_lat
            or abs(h["west"] - h["dlon"] // 2) > lim_lon
            or abs(h["east"] + h["dlon"] // 2) > lim_lon):
        raise ValueError("BYN: boundaries out of range")
    mult = _SCALE if h["scale"] == 1 else 1
    s, n = h["south"] * mult, h["north"] * mult
    w, e = h["west"] * mult, h["east"] * mult
    dlat, dlon = h["dlat"] * mult, h["dlon"] * mult
    if dlat == 0 or dlon == 0:
        raise ValueError("BYN: zero spacing")
    width = int((e - w + 1.0) / dlon + 1.0)
    height = int((n - s + 1.0) / dlat + 1.0)
    en = "<" if h["byteorder"] == 1 else ">"
    dt = en + ("i2" if h["sizeof"] == 2 else "i4")
    vals = np.frombuffer(data, dtype=dt, count=width * height,
                         offset=80).reshape(height, width)
    h.update({
        "width": width, "height": height,
        "values": vals.astype(np.int64),
        "dtype": "Int16" if h["sizeof"] == 2 else "Int32",
        "nodata": 32767.0 if h["sizeof"] == 2 else 9999.0 * h["factor"],
        "gt": ((w - dlon / 2.0) / 3600.0, dlon / 3600.0, 0.0,
               (n + dlat / 2.0) / 3600.0, 0.0, -1 * dlat / 3600.0),
    })
    return h


def read_byn(spark, path: str):
    """-> (cells DataFrame (bx, by, value), meta): RAW integer values,
    nodata cells absent, by increasing northward."""
    import pandas as pd

    g = read_byn_grid(path)
    h, w = g["height"], g["width"]
    by, bx = np.mgrid[0:h, 0:w]
    v = g["values"].ravel()
    keep = v != int(g["nodata"]) if float(g["nodata"]).is_integer() \
        else np.ones(len(v), bool)
    pdf = pd.DataFrame({
        "bx": bx.ravel()[keep].astype(np.int64),
        "by": (h - 1 - by).ravel()[keep].astype(np.int64),
        "value": v[keep].astype(np.float64)})
    meta = {k: g[k] for k in ("width", "height", "gt", "dtype", "nodata",
                              "factor", "vdatum")}
    return spark.createDataFrame(pdf), meta


def write_byn(path: str, values, *, south, north, west, east, dlat, dlon,
              factor=1000.0, sizeof=2, byteorder=1, scale=0, vdatum=1,
              global_=0, type=1, descrip=0, subtype=0, datum=0,
              ellipsoid=0, wo=0.0, gm=0.0, tidesys=0, realiz=0,
              epoch=0.0, pttype=0) -> str:
    """values: (H, W) int array, N-up (row 0 = north); boundaries and
    spacings in the header's own units (pre-Scale)."""
    arr = np.asarray(values)
    hdr = _HDR.pack(south, north, west, east, dlat, dlon, global_, type,
                    factor, sizeof, vdatum, descrip, subtype, datum,
                    ellipsoid, byteorder, scale, wo, gm, tidesys, realiz,
                    epoch, pttype)
    en = "<" if byteorder == 1 else ">"
    dt = en + ("i2" if sizeof == 2 else "i4")
    with open(path, "wb") as f:
        f.write(hdr)
        f.write(np.ascontiguousarray(arr, dtype=dt).tobytes())
    return path
