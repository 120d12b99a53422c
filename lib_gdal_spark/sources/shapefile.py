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


def _shp_geom_payload(g: dict) -> tuple[bytes, tuple]:
    """Geometry dict (reader's shape) -> (record payload, bbox).
    Empty parts/points collapse to a Null shape (type 0) — the spec's
    convention for absent geometry, and what read_shp can itself parse
    out of an nparts=0 record."""
    t = g["type"]
    if t == 0 or (t in (3, 5) and not g.get("parts")) \
            or (t in (1, 8) and not g.get("points")):
        return struct.pack("<i", 0), None
    if t == 1:
        x, y = g["points"][0]
        return struct.pack("<i2d", 1, x, y), (x, y, x, y)
    if t in (3, 5):
        parts = g["parts"]
        pts = [p for part in parts for p in part]
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        bbox = (min(xs), min(ys), max(xs), max(ys))
        starts, acc = [], 0
        for part in parts:
            starts.append(acc)
            acc += len(part)
        payload = struct.pack("<i4d2i", t, *bbox, len(parts), len(pts))
        payload += struct.pack(f"<{len(parts)}i", *starts)
        payload += struct.pack(f"<{2 * len(pts)}d",
                               *[c for p in pts for c in p])
        return payload, bbox
    if t == 8:
        pts = g["points"]
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        bbox = (min(xs), min(ys), max(xs), max(ys))
        payload = struct.pack("<i4di", 8, *bbox, len(pts))
        payload += struct.pack(f"<{2 * len(pts)}d",
                               *[c for p in pts for c in p])
        return payload, bbox
    raise NotImplementedError(f"shape type {t}")


def write_shapefile(feats: list[dict], path: str) -> None:
    """Round-trip twin of read_shapefile: [{**attrs, "geom": dict}] ->
    .shp + .shx + .dbf (ESRI TechDesc layout; dBASE III attributes).

    Field mapping mirrors the reader: float/int attrs -> N(24,15) (the
    reference OGR shapefile driver's default numeric width/precision,
    ogrshapelayer defaults — 15 significant digits, so exact for ints
    < 2^49 and repr-roundtrip for most but not all doubles), str -> C
    (width = max value length). dBASE limits apply: field names
    ASCII-ize and truncate to 10 chars, colliding truncations uniquify
    with a numeric suffix (the OGR driver "laundering" behavior), and
    string None degrades to '' on read-back (dBASE has no string null;
    numeric None round-trips via the '*' fill). All non-null geometries
    must share one shape type (the format's contract) — mixed layers
    raise. Single-file assembly runs driver-side — shapefiles are a
    dimension-sized sidecar format here (the reference writes one
    serial file too); corpus-scale outputs use parquet/CSV.
    """
    base = path[:-4] if path.lower().endswith(".shp") else path
    geoms = [f["geom"] for f in feats]
    kinds = {g["type"] for g in geoms
             if g["type"] != 0 and (g.get("parts") or g.get("points"))}
    if len(kinds) > 1:
        raise ValueError(
            f"shapefiles hold ONE shape type; got {sorted(kinds)}")
    payloads = []
    bbox = None
    stype = next(iter(kinds)) if kinds else 0
    for g in geoms:
        payload, b = _shp_geom_payload(g)
        payloads.append(payload)
        if b is not None:
            bbox = b if bbox is None else (
                min(bbox[0], b[0]), min(bbox[1], b[1]),
                max(bbox[2], b[2]), max(bbox[3], b[3]))
    bbox = bbox or (0.0, 0.0, 0.0, 0.0)

    def header(flen_words: int) -> bytes:
        return (struct.pack(">i5i i", 9994, 0, 0, 0, 0, 0, flen_words)
                + struct.pack("<2i", 1000, stype)
                + struct.pack("<8d", bbox[0], bbox[1], bbox[2], bbox[3],
                              0.0, 0.0, 0.0, 0.0))

    shp_body = b""
    shx_body = b""
    offset_words = 50  # header = 100 bytes
    for i, payload in enumerate(payloads):
        clen = len(payload) // 2
        shp_body += struct.pack(">2i", i + 1, clen) + payload
        shx_body += struct.pack(">2i", offset_words, clen)
        offset_words += 4 + clen
    with open(base + ".shp", "wb") as f:
        f.write(header((100 + len(shp_body)) // 2) + shp_body)
    with open(base + ".shx", "wb") as f:
        f.write(header((100 + len(shx_body)) // 2) + shx_body)

    # ---- .dbf ----
    keys = sorted({k for f in feats for k in f if k != "geom"})
    # dBASE names: ASCII, max 10 chars; uniquify truncation collisions
    # (OGR-style laundering) so no attribute is silently dropped
    names, seen = {}, set()
    for k in keys:
        base10 = k.encode("ascii", "replace").decode("ascii")[:10] or "F"
        cand, i = base10, 1
        while cand.upper() in seen:
            suf = str(i)
            cand = base10[:10 - len(suf)] + suf
            i += 1
        seen.add(cand.upper())
        names[k] = cand
    fields = []  # (key, name, type, width)
    for k in keys:
        vals = [f.get(k) for f in feats]
        if all(v is None or isinstance(v, (int, float)) for v in vals):
            fields.append((k, names[k], "N", 24))
        else:
            w = max([len(str(v)) for v in vals if v is not None] or [1])
            fields.append((k, names[k], "C", min(max(w, 1), 254)))
    rsize = 1 + sum(w for _, _, _, w in fields)
    hsize = 32 + 32 * len(fields) + 1
    out = bytearray()
    out += struct.pack("<4B", 0x03, 99, 1, 1)  # dBASE III, Y2K-era stamp
    out += struct.pack("<iHH", len(feats), hsize, rsize)
    out += b"\x00" * 20
    for _k, name, ftype, w in fields:
        out += name.encode("ascii")[:10].ljust(11, b"\x00")
        out += ftype.encode("ascii") + b"\x00" * 4
        out += bytes([w, 15 if ftype == "N" else 0]) + b"\x00" * 14
    out += b"\x0d"
    for f in feats:
        out += b" "
        for k, name, ftype, w in fields:
            v = f.get(k)
            if v is None:
                cell = b"*" * w if ftype == "N" else b" " * w
            elif ftype == "N":
                cell = f"%{w}.15g" % float(v)
                cell = cell.encode("ascii")[:w].rjust(w)
            else:
                cell = str(v).encode("ascii", "replace")[:w].ljust(w)
            out += cell
    out += b"\x1a"
    with open(base + ".dbf", "wb") as f:
        f.write(bytes(out))
