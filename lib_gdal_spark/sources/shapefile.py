"""Minimal ESRI Shapefile (.shp + .dbf) reader — pure Python/NumPy.

The reference ships a full OGR driver (ogr/ogrsf_frmts/shape); this
source exists to read the reference's OWN vector fixtures (ogrlineref's
path.shp/mstones.shp and friends) without any dependency. Supported
shapes: Point (1), PolyLine (3), Polygon (5), MultiPoint (8) plus their
Z/M variants' XY subset; attributes: dBASE III C/N/F/D fields.

Layout per the public ESRI Shapefile Technical Description (July 1998):
100-byte big-endian header, per-record 8-byte big-endian header followed
by little-endian shape payload; .dbf is standard dBASE III.
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame, SparkSession


def read_shp(path: str) -> list[dict]:
    """-> [{type, points | parts}] in file order. PolyLine/Polygon yield
    `parts`: list of [(x, y), ...] rings/paths."""
    buf = open(path, "rb").read()
    code = struct.unpack_from(">i", buf, 0)[0]
    if code != 9994:
        raise ValueError(f"not a shapefile (code {code})")
    flen = struct.unpack_from(">i", buf, 24)[0] * 2
    out = []
    pos = 100
    while pos < flen:
        _, clen = struct.unpack_from(">ii", buf, pos)
        rec = buf[pos + 8 : pos + 8 + clen * 2]
        pos += 8 + clen * 2
        st = struct.unpack_from("<i", rec, 0)[0]
        base = st % 10  # Z (+10) and M (+20) variants share the XY head
        if st == 0:
            out.append({"type": 0})
        elif base == 1:
            x, y = struct.unpack_from("<2d", rec, 4)
            out.append({"type": 1, "points": [(x, y)]})
        elif base in (3, 5):
            nparts, npts = struct.unpack_from("<2i", rec, 36)
            starts = list(struct.unpack_from(f"<{nparts}i", rec, 44))
            pts_off = 44 + 4 * nparts
            flat = struct.unpack_from(f"<{2 * npts}d", rec, pts_off)
            pts = [(flat[2 * i], flat[2 * i + 1]) for i in range(npts)]
            bounds = starts + [npts]
            parts = [pts[bounds[i]:bounds[i + 1]] for i in range(nparts)]
            out.append({"type": base, "parts": parts})
        elif base == 8:
            npts = struct.unpack_from("<i", rec, 36)[0]
            flat = struct.unpack_from(f"<{2 * npts}d", rec, 40)
            out.append({"type": 8, "points": [
                (flat[2 * i], flat[2 * i + 1]) for i in range(npts)]})
        else:
            raise NotImplementedError(f"shape type {st}")
    return out


def read_dbf(path: str) -> list[dict]:
    """-> one dict per record (deleted records skipped); N/F -> float,
    D kept as text, C stripped."""
    buf = open(path, "rb").read()
    nrec, hsize, rsize = struct.unpack_from("<iHH", buf, 4)
    fields = []
    off = 32
    while buf[off] != 0x0D:
        name = buf[off : off + 11].split(b"\0")[0].decode("ascii")
        ftype = chr(buf[off + 11])
        flen = buf[off + 16]
        fields.append((name, ftype, flen))
        off += 32
    out = []
    for i in range(nrec):
        rec = buf[hsize + i * rsize : hsize + (i + 1) * rsize]
        if not rec or rec[0:1] == b"*":
            continue
        row = {}
        p = 1
        for name, ftype, flen in fields:
            raw = rec[p : p + flen].decode("ascii", "replace").strip()
            p += flen
            if ftype in ("N", "F"):
                # dBASE writes '*' fill for NULL numerics
                try:
                    row[name] = float(raw) if raw else None
                except ValueError:
                    row[name] = None
            else:
                row[name] = raw
        out.append(row)
    return out


def read_shapefile(path: str) -> list[dict]:
    """.shp + sibling .dbf -> [{**attrs, "geom": shape-dict}]."""
    geoms = read_shp(path)
    base = path[:-4] if path.lower().endswith(".shp") else path
    try:
        attrs = read_dbf(base + ".dbf")
    except OSError:
        attrs = [{} for _ in geoms]
    return [{**a, "geom": g} for a, g in zip(attrs, geoms)]


def read_points_df(spark: SparkSession, path: str) -> DataFrame:
    """Point shapefile -> DataFrame (fid, x, y, <attrs...>)."""
    rows = []
    feats = read_shapefile(path)
    keys = sorted({k for f in feats for k in f if k != "geom"})
    for fid, f in enumerate(feats):
        x, y = f["geom"]["points"][0]
        rows.append((fid, x, y, *[f.get(k) for k in keys]))
    schema = "fid long, x double, y double" + "".join(
        f", {k} double" if isinstance(feats[0].get(k), float) else
        f", {k} string" for k in keys)
    return spark.createDataFrame(rows, schema)
