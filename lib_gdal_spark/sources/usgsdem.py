"""USGS ASCII DEM raster source (the classic 1024-byte-record format).

Reference semantics (studied, re-expressed — no code copied):
frmts/usgsdem/usgsdemdataset.cpp —
- data-start ladder (LoadFromFile:584-666): free-form ints at 864
  decide old (864) vs new format; new format probes 1024, then the
  undocumented 893 (39109h1.dem), then the 918 variant
  (fema06-140cm), plus the 1025-byte newline-terminated record
  variant (#5007: data[1024] and data[2049] are both '\\n').
- header fields at fixed offsets: coord system + zone at 156, ground/
  vertical units at 528, corners at 546 (SW NW NE SE as 24-char
  Fortran D-floats), dx/dy/vres at 816 (12-char), profile count at
  858, horizontal datum code at 890 (new format).
- projected grids (UTM/state-plane/unknown) expand the y extent
  modulo dy and anchor x on the FIRST profile's x-start; geographic
  grids convert arc-seconds to degrees (:790-833). Both give
  gt = (x0 - dx/2, dx, 0, ymax + dy/2, 0, -dy).
- profiles are COLUMNS (IReadBlock:350-520): per profile the B-record
  ints (row#, col#, npoints, ncols), doubles (x-start, y-start,
  elev-offset, zmin, zmax), then npoints ints; value = nElev * vres +
  offset as float32, Int16 output clamps/truncates; -32767 stays
  nodata; geographic y-starts are arc-seconds. With 1024-byte records
  the cursor realigns to the next 1024 boundary after each profile
  (junk trailing values tolerated — issue #583).
- Int16 when vertical unit is meters and vres >= 1, else Float32.

Decodes all seven reference fixtures to their autotest checksums
(53864 / 61424 / 39443 / 10659 / 56679 / 61078 / 14172).

Spark-first: sequential ASCII record stream — whole-file driver-side
parse (the AAIGrid contract), distributed (bx, by, value) cell-table
output with nodata cells dropped.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import SparkSession

NODATA = -32767


def _dfloat(s: bytes) -> float:
    t = s.decode("ascii", "replace").replace("D", "E").strip()
    return float(t) if t else 0.0


class _Cursor:
    """Free-form tokenizer with the reference's exact semantics."""

    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def read_int(self) -> tuple[int, bool]:
        b, n = self.buf, len(self.buf)
        p = self.pos
        while p < n and b[p: p + 1].isspace():
            p += 1
        if p >= n:
            self.pos = p
            return 0, False
        c = b[p]
        sign, val = 1, 0
        if c == 0x2D:
            sign = -1
        elif c == 0x2B:
            sign = 1
        elif 0x30 <= c <= 0x39:
            val = c - 0x30
        else:
            self.pos = p
            return 0, False
        p += 1
        while p < n and 0x30 <= b[p] <= 0x39:
            val = val * 10 + (b[p] - 0x30)
            p += 1
        self.pos = p
        return sign * val, True

    def read_fixed_double(self, nchars: int) -> tuple[float, bool]:
        if self.pos + nchars > len(self.buf):
            return 0.0, False
        v = _dfloat(self.buf[self.pos: self.pos + nchars])
        self.pos += nchars
        return v, True

    def align(self, block: int) -> None:
        self.pos = (self.pos + block - 1) // block * block


def decode_usgsdem(buf: bytes) -> tuple[np.ndarray, dict]:
    """-> (grid (ny, nx) float64 top-down with NODATA fill, meta)."""
    # ---- data-start ladder
    cur = _Cursor(buf, 864)
    r, _ = cur.read_int()
    c, _ = cur.read_int()
    new_format = cur.pos >= 1024 or r != 1 or c != 1
    if new_format:
        cur = _Cursor(buf, 1024)
        i, _ = cur.read_int()
        j, _ = cur.read_int()
        if i == 1 and j in (0, 1):
            start = 1024
            if (len(buf) > 2050 and buf[1024] == 0x0A
                    and buf[2049] == 0x0A):
                start = 1025
        else:
            cur = _Cursor(buf, 893)
            i, _ = cur.read_int()
            j, _ = cur.read_int()
            if i == 1 and j == 1:
                start = 893
            else:
                cur = _Cursor(buf, 918)
                i, _ = cur.read_int()
                j, _ = cur.read_int()
                if i == 1 and j == 1:
                    start = 918
                else:
                    raise ValueError("not a USGS DEM file")
    else:
        start = 864

    coord_sys, _ = _Cursor(buf, 156).read_int()
    zcur = _Cursor(buf, 156)
    coord_sys, _ = zcur.read_int()
    utm_zone, _ = zcur.read_int()
    ucur = _Cursor(buf, 528)
    gunit, _ = ucur.read_int()
    vunit, _ = ucur.read_int()

    rescur = _Cursor(buf, 816)
    dx, _ = rescur.read_fixed_double(12)
    dy, _ = rescur.read_fixed_double(12)
    vres, _ = rescur.read_fixed_double(12)
    if dy == 0:
        raise ValueError("USGSDEM: zero y resolution")
    is_float = (vunit == 1 or vres < 1.0)

    ccur = _Cursor(buf, 546)
    corners = []
    for _i in range(4):  # SW NW NE SE
        x, _ = ccur.read_fixed_double(24)
        y, _ = ccur.read_fixed_double(24)
        corners.append((x, y))
    ymin = min(corners[0][1], corners[3][1])
    ymax = max(corners[1][1], corners[2][1])
    xmin = min(corners[0][0], corners[1][0])

    pcur = _Cursor(buf, 858)
    nprofiles, _ = pcur.read_int()

    datum = None
    if new_format:
        datum = buf[890:892].decode("ascii", "replace").strip()

    geographic = coord_sys not in (1, 2, -9999)
    if not geographic:
        ymin = math.floor(ymin / dy) * dy
        ymax = math.ceil(ymax / dy) * dy
        d = _Cursor(buf, start)
        for _i in range(4):
            d.read_int()
        x_start, _ = d.read_fixed_double(24)
        gt = (x_start - dx / 2.0, dx, 0.0, ymax + dy / 2.0, 0.0, -dy)
    else:
        gt = ((xmin - dx / 2.0) / 3600.0, dx / 3600.0, 0.0,
              (ymax + dy / 2.0) / 3600.0, 0.0, -dy / 3600.0)
    ny = int((ymax - ymin) / dy + 1.5)
    nx = nprofiles

    arr = np.full((ny, nx), float(NODATA), dtype=np.float64)
    d = _Cursor(buf, start)
    y_min_center = gt[3] + (ny - 0.5) * gt[5]
    for i in range(nx):
        _rowno, ok = d.read_int()
        if ok:
            _colno, ok = d.read_int()
        npoints, ok = d.read_int() if ok else (0, ok)
        if ok:
            _ncols, ok = d.read_int()
        if ok:
            _xs, ok = d.read_fixed_double(24)
        ystart, ok = d.read_fixed_double(24) if ok else (0.0, ok)
        elev_off, ok = d.read_fixed_double(24) if ok else (0.0, ok)
        if ok:
            _zmin, ok = d.read_fixed_double(24)
        if ok:
            _zmax, ok = d.read_fixed_double(24)
        if not ok:
            raise ValueError(f"USGSDEM: truncated profile {i}")
        if geographic:
            ystart /= 3600.0
        lygap = int((y_min_center - ystart) / gt[5] + 0.5)
        for j in range(lygap, npoints + lygap):
            iy = ny - j - 1
            nelev, ok = d.read_int()
            if not ok:
                raise ValueError(f"USGSDEM: truncated profile {i}")
            if iy < 0 or iy >= ny or nelev == NODATA:
                continue
            v = float(np.float32(nelev * vres + elev_off))
            if not is_float:
                # GInt16 clamp/trunc rule (IReadBlock:486-494)
                v = (-32768.0 if v < -32768 else
                     32767.0 if v > 32767 else float(math.trunc(v)))
            arr[iy, i] = v
        if start == 1024:
            d.align(1024)
    return arr, {"nx": nx, "ny": ny, "geotransform": gt,
                 "nodata": float(NODATA), "datum": datum,
                 "coord_system": coord_sys, "utm_zone": utm_zone,
                 "vertical_unit": ("ft" if vunit == 1 else "m"),
                 "ground_unit": gunit,
                 "dtype": "float32" if is_float else "int16"}


def read_usgsdem(spark: SparkSession, path: str):
    """-> (cells DataFrame (bx, by, value), meta); nodata dropped,
    by increases upward (the AAIGrid cell-table contract)."""
    with open(path, "rb") as f:
        arr, meta = decode_usgsdem(f.read())
    ny, nx = arr.shape
    rows = [(c, ny - 1 - r, float(arr[r, c]))
            for r in range(ny) for c in range(nx)
            if arr[r, c] != NODATA]
    return (spark.createDataFrame(rows, "bx long, by long, value double"),
            meta)
