"""Surfer grid sources and sinks: GSAG (ASCII), GSBG (binary v6),
GS7BG (binary v7).

Reference semantics (studied, re-expressed — no code copied):
frmts/gsg/{gsagdataset,gsbgdataset,gs7bgdataset}.cpp. All three store
node-registered grids BOTTOM-UP (row 0 = ymin row); the driver flips
to the raster top-down scan and derives the geotransform by expanding
half a cell around the node extent:

    gt = (xmin - dx/2, dx, 0, ymax + dy/2, 0, -dy)
    dx = (xmax - xmin) / (nx - 1)

(the gsg autotest expects gt (440720, 60, 0, 3751320, 0, -60) from the
node extent 440750..441890 / 3750150..3751290 at 20x20). The Surfer
"blank" value 1.70141e38 (and anything above) reads as nodata.

Layouts:
- GSAG: "DSAA", nx ny, xmin xmax, ymin ymax, zmin zmax, whitespace
  values in bottom-up row order.
- GSBG: "DSBB", int16 nx ny, double xmin xmax ymin ymax zmin zmax,
  float32 data.
- GS7BG: "DSRB" tagged sections — header (version), "GRID" section
  (int32 ny nx, double xLL yLL xSize ySize zMin zMax rotation
  blankValue), "DATA" section of float64 values.

All three decode the reference's own gsg fixtures to checksum 4672.

Spark-first: small single-file header formats — driver-side NumPy
parse, distributed (bx, by, value) cell-table output (the AAIGrid
contract, sources/aaigrid.py docstring).
"""

from __future__ import annotations

import struct

import numpy as np
from pyspark.sql import SparkSession

BLANK = 1.70141e38


def _meta(nx, ny, xmin, xmax, ymin, ymax, zmin, zmax):
    dx = (xmax - xmin) / (nx - 1) if nx > 1 else 1.0
    dy = (ymax - ymin) / (ny - 1) if ny > 1 else 1.0
    return {"nx": int(nx), "ny": int(ny),
            "xmin": float(xmin), "xmax": float(xmax),
            "ymin": float(ymin), "ymax": float(ymax),
            "zmin": float(zmin), "zmax": float(zmax),
            "dx": float(dx), "dy": float(dy),
            "geotransform": (float(xmin) - dx / 2, dx, 0.0,
                             float(ymax) + dy / 2, 0.0, -dy)}


def decode_gsag(buf: bytes) -> tuple[np.ndarray, dict]:
    text = buf.decode("ascii", "replace")
    if not text.startswith("DSAA"):
        raise ValueError("not a GSAG grid (missing DSAA)")
    toks = text.split()
    nx, ny = int(toks[1]), int(toks[2])
    xmin, xmax, ymin, ymax, zmin, zmax = map(float, toks[3:9])
    vals = np.array(toks[9: 9 + nx * ny], dtype=np.float64)
    if vals.size != nx * ny:
        raise ValueError("GSAG: truncated value stream")
    arr = vals.reshape(ny, nx)[::-1]  # bottom-up -> top-down
    return arr, _meta(nx, ny, xmin, xmax, ymin, ymax, zmin, zmax)


def encode_gsag(arr: np.ndarray, meta: dict) -> bytes:
    a = np.asarray(arr, dtype=np.float64)[::-1]
    ny, nx = a.shape

    def num(v):
        return repr(int(v)) if float(v).is_integer() else repr(float(v))

    lines = ["DSAA", f"{nx} {ny}",
             f"{num(meta['xmin'])} {num(meta['xmax'])}",
             f"{num(meta['ymin'])} {num(meta['ymax'])}",
             f"{num(a.min())} {num(a.max())}"]
    for row in a:
        lines.append(" ".join(num(v) for v in row))
        lines.append("")
    return ("\n".join(lines) + "\n").encode("ascii")


def decode_gsbg(buf: bytes) -> tuple[np.ndarray, dict]:
    if buf[:4] != b"DSBB":
        raise ValueError("not a GSBG grid (missing DSBB)")
    nx, ny = struct.unpack_from("<hh", buf, 4)
    xmin, xmax, ymin, ymax, zmin, zmax = struct.unpack_from("<6d", buf, 8)
    vals = np.frombuffer(buf, "<f4", nx * ny, 56).astype(np.float64)
    arr = vals.reshape(ny, nx)[::-1]
    return arr, _meta(nx, ny, xmin, xmax, ymin, ymax, zmin, zmax)


def encode_gsbg(arr: np.ndarray, meta: dict) -> bytes:
    a = np.asarray(arr, dtype=np.float32)[::-1]
    ny, nx = a.shape
    out = b"DSBB" + struct.pack("<hh", nx, ny)
    out += struct.pack("<6d", meta["xmin"], meta["xmax"],
                       meta["ymin"], meta["ymax"],
                       float(a.min()), float(a.max()))
    return out + a.astype("<f4").tobytes()


def decode_gs7bg(buf: bytes) -> tuple[np.ndarray, dict]:
    if buf[:4] != b"DSRB":
        raise ValueError("not a GS7BG grid (missing DSRB header tag)")
    pos = 0
    grid = None
    data = None
    while pos + 8 <= len(buf):
        tag = buf[pos: pos + 4]
        size = struct.unpack_from("<i", buf, pos + 4)[0]
        pos += 8
        if tag == b"DSRB":
            pos += size  # header section (version)
        elif tag == b"GRID":
            ny, nx = struct.unpack_from("<ii", buf, pos)
            (xll, yll, xsize, ysize, zmin, zmax, _rot,
             blank) = struct.unpack_from("<8d", buf, pos + 8)
            grid = (nx, ny, xll, yll, xsize, ysize, zmin, zmax, blank)
            pos += size
        elif tag == b"DATA":
            if grid is None:
                raise ValueError("GS7BG: DATA before GRID section")
            nx, ny = grid[0], grid[1]
            data = np.frombuffer(buf, "<f8", nx * ny, pos)
            pos += size
        else:
            pos += size
    if grid is None or data is None:
        raise ValueError("GS7BG: missing GRID/DATA section")
    nx, ny, xll, yll, xsize, ysize, zmin, zmax, blank = grid
    arr = data.reshape(ny, nx)[::-1].copy()
    arr[np.abs(arr - blank) < 1e24] = BLANK
    return arr, _meta(nx, ny, xll, xll + xsize * (nx - 1),
                      yll, yll + ysize * (ny - 1), zmin, zmax)


def encode_gs7bg(arr: np.ndarray, meta: dict) -> bytes:
    a = np.asarray(arr, dtype=np.float64)[::-1]
    ny, nx = a.shape
    blank = 1.71041e38
    out = b"DSRB" + struct.pack("<i", 8) + struct.pack("<ii", 4, 1)
    grid = struct.pack("<ii", ny, nx) + struct.pack(
        "<8d", meta["xmin"], meta["ymin"], meta["dx"], meta["dy"],
        float(a.min()), float(a.max()), 0.0, blank)
    out += b"GRID" + struct.pack("<i", len(grid)) + grid
    body = a.astype("<f8").tobytes()
    out += b"DATA" + struct.pack("<i", len(body)) + body
    return out


_DECODERS = {b"DSAA": decode_gsag, b"DSBB": decode_gsbg,
             b"DSRB": decode_gs7bg}


def decode_surfer(buf: bytes) -> tuple[np.ndarray, dict]:
    """Magic-dispatched decode across the three Surfer layouts."""
    dec = _DECODERS.get(bytes(buf[:4]))
    if dec is None:
        raise ValueError("not a Surfer grid (DSAA/DSBB/DSRB)")
    return dec(buf)


def read_surfer(spark: SparkSession, path: str):
    """-> (cells DataFrame (bx, by, value), meta). Same grid convention
    as the AAIGrid source: by increases upward; blank cells dropped."""
    with open(path, "rb") as f:
        arr, meta = decode_surfer(f.read())
    ny, nx = arr.shape
    rows = [(c, ny - 1 - r, float(arr[r, c]))
            for r in range(ny) for c in range(nx)
            if arr[r, c] < BLANK]
    return (spark.createDataFrame(rows, "bx long, by long, value double"),
            meta)
