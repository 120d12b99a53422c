"""ZMap ASCII grid, KRO and ACE2 codecs.

Three more reference single-file formats as pure-NumPy codecs:

- ZMap Plus — frmts/zmap/zmapdataset.cpp: '!' comment lines, then three
  CSV header lines (@name,GRID,valuesPerLine / fieldSize,nodata,,
  decimals,1 / rows,cols,minX,maxX,minY,maxY), a dummy line, '@', then
  COLUMN-MAJOR fixed-width values (each column top-to-bottom, lines
  wrap mid-column — the reader consumes the stream with a carry queue,
  zmapdataset.cpp:134-198). A field without '.' is an int scaled by
  10^decimals (:183). Writer mirrors CreateCopy: fieldSize 20,
  4 values/line, 7 decimals, right-justified, EOL at end of column
  (:604-698); pixel-is-area georeferencing (corner coords).
- KRO — frmts/raw/krodataset.cpp: "KRO\\x01" + big-endian u32
  width/height/depth/compCount header (20 bytes), big-endian
  pixel-interleaved raw body; depth 8/16/32 = Byte/UInt16/Float32.
- ACE2 — frmts/raw/ace2dataset.cpp: headerless body; the FILENAME
  (30S120W_5M.ACE2) carries the southwest corner, the _5M/_30S/_9S/_3S
  suffix (or the byte length) the tile size; _CONF_/_QUALITY_/_SOURCE_
  variants are Int16, else Float32 (little-endian); geotransform
  (lon, ps, 0, lat + n*ps, 0, -ps) (:319-324). Read-only, like the
  reference.
"""

from __future__ import annotations

import os
import re
import struct

import numpy as np

# -------------------------------------------------------------------- ZMap


def decode_zmap(text: str):
    """-> (values (h, w) float64 north-up with NaN at nodata, meta)."""
    lines = text.splitlines()
    i = 0
    while i < len(lines) and lines[i].startswith("!"):
        i += 1
    hdr1 = lines[i].split(",")
    if not hdr1[0].startswith("@"):
        raise ValueError("not a ZMap payload")
    if len(hdr1) != 3 or "GRID" not in hdr1[1].upper():
        raise ValueError("not a ZMap GRID file")
    values_per_line = int(hdr1[2])
    hdr2 = lines[i + 1].split(",")
    field_size = int(hdr2[0])
    nodata = float(hdr2[1])
    decimals = int(hdr2[3])
    if int(hdr2[4]) != 1:
        raise ValueError("unsupported ZMap column number")
    hdr3 = lines[i + 2].split(",")
    nrows, ncols = int(hdr3[0]), int(hdr3[1])
    minx, maxx = float(hdr3[2]), float(hdr3[3])
    miny, maxy = float(hdr3[4]), float(hdr3[5])
    i += 3
    # skip the dummy line, then require the '@' terminator
    i += 1
    if not lines[i].startswith("@"):
        raise ValueError("malformed ZMap header")
    i += 1
    exp = 10.0 ** decimals
    vals = []
    need = nrows * ncols
    for line in lines[i:]:
        if len(vals) >= need:
            break
        if len(line) % field_size != 0:
            raise ValueError(
                f"ZMap line length {len(line)} not a multiple of "
                f"{field_size}")
        n = len(line) // field_size
        if n > values_per_line:
            raise ValueError("too many values on a ZMap line")
        for k in range(n):
            f = line[k * field_size:(k + 1) * field_size]
            vals.append(float(f) if "." in f else int(f) * exp)
    if len(vals) < need:
        raise ValueError("short ZMap value stream")
    # column-major: each run of nrows values is one column, top-down
    arr = np.asarray(vals[:need], np.float64).reshape(ncols, nrows).T
    arr = np.where(arr == nodata, np.nan, arr)
    gt = (minx, (maxx - minx) / ncols, 0.0, maxy, 0.0,
          -(maxy - miny) / nrows)
    return arr, {"width": ncols, "height": nrows, "gt": gt,
                 "nodata": nodata, "decimals": decimals,
                 "field_size": field_size}


def _zmap_field(v: float, width: int, decimals: int) -> str:
    s = f"%.{decimals}f" % v
    if len(s) > width:
        s = (f"%.{decimals}g" % v).replace("e", "E")
    return s.rjust(width)


def encode_zmap(vals: np.ndarray, gt, nodata: float = 1.0e30) -> str:
    """CreateCopy twin (zmapdataset.cpp:595-698): NaN -> nodata,
    column-major stream, EOL at end of every column."""
    nrows, ncols = vals.shape
    fs, vpl, dec = 20, 4, 7
    out = ["!", "! Created by lib_gdal_spark.", "!",
           f"@GRID FILE, GRID, {vpl}",
           "%10d," % fs + _zmap_field(nodata, fs, dec) + ","
           + " " * 10 + "," + "%10d," % dec + "%10d" % 1,
           "%10d," % nrows + "%10d," % ncols
           + _zmap_field(gt[0], 14, 7) + ","
           + _zmap_field(gt[0] + gt[1] * ncols, 14, 7) + ","
           + _zmap_field(gt[3] + gt[5] * nrows, 14, 7) + ","
           + _zmap_field(gt[3], 14, 7),
           "0.0, 0.0, 0.0", "@"]
    body = np.where(np.isnan(vals), nodata, vals)
    for c in range(ncols):
        col = body[:, c]
        line = []
        for j in range(nrows):
            line.append(_zmap_field(float(col[j]), fs, dec))
            if len(line) == vpl:
                out.append("".join(line))
                line = []
        if line:
            out.append("".join(line))
    return "\n".join(out) + "\n"


def read_zmap(spark, path: str):
    from .gridpack import _cells_df

    vals, meta = decode_zmap(open(path, encoding="latin-1").read())
    return _cells_df(spark, vals), meta


def write_zmap(cells, path: str, width: int, height: int, gt,
               nodata: float = 1.0e30) -> str:
    from .gridpack import _cells_to_array

    vals = _cells_to_array(cells, width, height, np.nan)
    open(path, "w").write(encode_zmap(vals, gt, nodata=nodata))
    return path


# --------------------------------------------------------------------- KRO

_KRO_DTYPES = {8: ">u1", 16: ">u2", 32: ">f4"}


def decode_kro(data: bytes):
    """-> (bands list of (h, w) arrays top-down=north-up, meta)."""
    if data[:4] != b"KRO\x01":
        raise ValueError("not a KRO payload")
    w, h, depth, ncomp = struct.unpack(">4i", data[4:20])
    if depth not in _KRO_DTYPES:
        raise ValueError(f"unhandled KRO depth {depth}")
    dt = np.dtype(_KRO_DTYPES[depth])
    arr = np.frombuffer(data, dt, count=w * h * ncomp, offset=20) \
        .reshape(h, w, ncomp)
    bands = [arr[:, :, k].copy() for k in range(ncomp)]
    return bands, {"width": w, "height": h, "depth": depth,
                   "bands": ncomp}


def encode_kro(bands) -> bytes:
    """bands: list of equally-shaped (h, w) arrays (u1/u2/f4)."""
    b0 = np.asarray(bands[0])
    h, w = b0.shape
    kind = b0.dtype
    depth = {1: 8, 2: 16, 4: 32}[kind.itemsize]
    dt = np.dtype(_KRO_DTYPES[depth])
    # byte-swap AFTER stacking: np.stack normalizes its inputs to the
    # native byte order, silently undoing a pre-stack astype('>u2')
    px = np.stack([np.asarray(b) for b in bands], axis=2).astype(dt)
    return (b"KRO\x01" + struct.pack(">4i", w, h, depth, len(bands))
            + px.tobytes())


def read_kro(spark, path: str, band: int = 1):
    from .gridpack import _cells_df

    bands, meta = decode_kro(open(path, "rb").read())
    return _cells_df(spark, bands[band - 1].astype(np.float64)), meta


# -------------------------------------------------------------------- ACE2

_ACE2_SIZES = {"_5M": (180, 5.0 / 60), "_30S": (1800, 30.0 / 3600),
               "_9S": (6000, 9.0 / 3600), "_3S": (18000, 3.0 / 3600)}


def decode_ace2(data: bytes, filename: str):
    """-> (values (h, w) float64 north-up, meta); the filename carries
    the georeferencing (45N015E_5M.ACE2)."""
    base = os.path.basename(filename)
    if base.lower().endswith(".gz"):
        import gzip

        data = gzip.decompress(data)
        base = base[:-3]
    if not base.upper().endswith(".ACE2"):
        raise ValueError("not an ACE2 filename")
    m = re.match(r"^(\d{2})([NSns])(\d{3})([EWew])", base)
    if not m:
        raise ValueError(f"unparseable ACE2 filename {base!r}")
    lat = int(m.group(1)) * (1 if m.group(2).upper() == "N" else -1)
    lon = int(m.group(3)) * (1 if m.group(4).upper() == "E" else -1)
    int16 = any(tag in base for tag in ("_CONF_", "_QUALITY_",
                                        "_SOURCE_"))
    dt = np.dtype("<i2" if int16 else "<f4")
    n = None
    for tag, (size, ps) in _ACE2_SIZES.items():
        if tag in base:
            n, psize = size, ps
            break
    if n is None:
        n = int(round((len(data) // dt.itemsize) ** 0.5))
        if n * n * dt.itemsize != len(data):
            raise ValueError("cannot infer ACE2 tile size")
        psize = 15.0 / n  # 15-degree tiles
    vals = np.frombuffer(data, dt, count=n * n).astype(np.float64) \
        .reshape(n, n)
    gt = (float(lon), psize, 0.0, lat + n * psize, 0.0, -psize)
    return vals, {"width": n, "height": n, "gt": gt,
                  "dtype": "int16" if int16 else "float32",
                  "sw_lat": lat, "sw_lon": lon}


def read_ace2(spark, path: str):
    from .gridpack import _cells_df

    vals, meta = decode_ace2(open(path, "rb").read(), path)
    return _cells_df(spark, vals), meta
