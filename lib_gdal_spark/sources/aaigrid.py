"""Arc/Info ASCII grid (.grd/.asc) codec.

Reference: frmts/aaigrid/aaigriddataset.cpp — a 5/6-line header
(ncols/nrows/xllcorner/yllcorner/cellsize[/NODATA_value]) followed by
row-major values, row 0 at the TOP. The repo's grid convention has `by`
increasing upward, so raster row r maps to by = nrows - 1 - r; nodata
cells become ABSENT rows (the engine's nodata discipline).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession


def read_aaigrid(spark: SparkSession, path: str):
    """-> (cells DataFrame (bx, by, value), meta dict). Driver-side parse
    (single small text file by format construction), distributed output."""
    meta: dict = {}
    data_lines = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            key = parts[0].lower()
            if key in ("ncols", "nrows"):
                meta[key] = int(parts[1])
            elif key in ("xllcorner", "yllcorner", "cellsize", "nodata_value",
                         "xllcenter", "yllcenter", "dx", "dy"):
                # the reference driver also accepts xllcenter/yllcenter
                # (cell-center origin) and dx/dy (anisotropic cell size)
                # headers — frmts/aaigrid/aaigriddataset.cpp ParseHeader
                meta[key] = float(parts[1])
            else:
                data_lines.append(line)
    # normalize alternate header forms to the corner/cellsize convention
    if "dx" in meta:
        if "dy" not in meta:
            raise ValueError("aaigrid: dx header without dy")
        meta.setdefault("cellsize", meta["dx"])
    csx = meta.get("dx", meta.get("cellsize", 1.0))
    csy = meta.get("dy", meta.get("cellsize", 1.0))
    if "xllcenter" in meta:
        meta["xllcorner"] = meta["xllcenter"] - csx / 2.0
    if "yllcenter" in meta:
        meta["yllcorner"] = meta["yllcenter"] - csy / 2.0
    grid = np.loadtxt(data_lines, dtype=np.float64, ndmin=2)
    nrows, ncols = meta["nrows"], meta["ncols"]
    assert grid.shape == (nrows, ncols), (grid.shape, meta)
    nodata = meta.get("nodata_value")
    rows = []
    for r in range(nrows):
        for c in range(ncols):
            v = float(grid[r, c])
            if nodata is not None and v == nodata:
                continue
            rows.append((c, nrows - 1 - r, v))
    return (spark.createDataFrame(rows, "bx long, by long, value double"),
            meta)


def write_aaigrid(cells: DataFrame, path: str, meta: dict | None = None,
                  nodata: float = -9999.0) -> dict:
    """(bx, by, value) -> .grd file; absent cells become NODATA_value.
    The grid window is the cell table's bbox unless meta provides
    ncols/nrows. Returns the header actually written."""
    got = {(r.bx, r.by): r.value for r in cells.collect()}
    if not got:
        raise ValueError("empty cell table")
    xs = [k[0] for k in got]
    ys = [k[1] for k in got]
    x0, y0 = min(xs), min(ys)
    meta = dict(meta or {})
    ncols = meta.get("ncols", max(xs) - x0 + 1)
    nrows = meta.get("nrows", max(ys) - y0 + 1)
    hdr = {
        "ncols": ncols, "nrows": nrows,
        "xllcorner": meta.get("xllcorner", float(x0)),
        "yllcorner": meta.get("yllcorner", float(y0)),
        "cellsize": meta.get("cellsize", 1.0),
        "nodata_value": meta.get("nodata_value", nodata),
    }
    with open(path, "w") as f:
        f.write(f"ncols        {hdr['ncols']}\n"
                f"nrows        {hdr['nrows']}\n"
                f"xllcorner    {hdr['xllcorner']:.12f}\n"
                f"yllcorner    {hdr['yllcorner']:.12f}\n"
                f"cellsize     {hdr['cellsize']:.12f}\n"
                f"NODATA_value {hdr['nodata_value']:g}\n")
        for r in range(nrows):
            by = nrows - 1 - r + y0
            f.write(" ".join(
                f"{got.get((x0 + c, by), hdr['nodata_value']):g}"
                for c in range(ncols)) + "\n")
    return hdr
