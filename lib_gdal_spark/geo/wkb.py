"""Minimal WKB codec (little-endian) for Point / LineString / Polygon /
MultiPolygon.

The reference's wire format for geometry is WKB (ogr/ogr_wkb.cpp; type codes
ogr/ogr_core.h:408-444). Spark has no geometry type, so geometry columns in
this engine are ``binary`` WKB + materialized envelope doubles
(xmin/ymin/xmax/ymax) for Catalyst-side bbox predicates and parquet min/max
row-group skipping.

Only the 2-D little-endian subset needed by the fixtures is implemented.
"""

from __future__ import annotations

import struct

import numpy as np

WKB_POINT = 1
WKB_LINESTRING = 2
WKB_POLYGON = 3
WKB_MULTIPOINT = 4
WKB_MULTILINESTRING = 5
WKB_MULTIPOLYGON = 6
WKB_COLLECTION = 7
_LE = 1


def encode_point(x: float, y: float) -> bytes:
    return struct.pack("<BIdd", _LE, WKB_POINT, x, y)


def _encode_ring(ring) -> bytes:
    r = np.asarray(ring, dtype=np.float64)
    if len(r) == 0 or (r[0] != r[-1]).any():  # close the ring
        r = np.vstack([r, r[:1]])
    return struct.pack("<I", len(r)) + r.astype("<f8").tobytes()


def encode_linestring(pts) -> bytes:
    r = np.asarray(pts, dtype=np.float64)
    return struct.pack("<BII", _LE, WKB_LINESTRING, len(r)) + r.astype("<f8").tobytes()


def encode_polygon(rings: list) -> bytes:
    out = struct.pack("<BII", _LE, WKB_POLYGON, len(rings))
    for ring in rings:
        out += _encode_ring(ring)
    return out


def encode_multipolygon(polys: list) -> bytes:
    out = struct.pack("<BII", _LE, WKB_MULTIPOLYGON, len(polys))
    for rings in polys:
        out += encode_polygon(rings)
    return out


def encode_multipoint(pts) -> bytes:
    r = np.asarray(pts, dtype=np.float64)
    out = struct.pack("<BII", _LE, WKB_MULTIPOINT, len(r))
    for x, y in r:
        out += encode_point(float(x), float(y))
    return out


def encode_multilinestring(lines) -> bytes:
    out = struct.pack("<BII", _LE, WKB_MULTILINESTRING, len(lines))
    for pts in lines:
        out += encode_linestring(pts)
    return out


def encode_collection(parts: list[bytes]) -> bytes:
    """parts: already-encoded WKB sub-geometries (nested per spec)."""
    return struct.pack("<BII", _LE, WKB_COLLECTION, len(parts)) + b"".join(parts)


def _decode_ring(buf: bytes, off: int):
    (n,) = struct.unpack_from("<I", buf, off)
    off += 4
    pts = np.frombuffer(buf, dtype="<f8", count=2 * n, offset=off).reshape(n, 2)
    return pts.copy(), off + 16 * n


def _decode_at(buf: bytes, off: int):
    """Decode one geometry at `off` -> (kind, data, next_off)."""
    byte_order, gtype = struct.unpack_from("<BI", buf, off)
    if byte_order != _LE:
        raise NotImplementedError("big-endian WKB not supported")
    off += 5
    if gtype == WKB_POINT:
        x, y = struct.unpack_from("<dd", buf, off)
        return "point", (x, y), off + 16
    if gtype == WKB_LINESTRING:
        pts, off = _decode_ring(buf, off)
        return "linestring", pts, off
    if gtype == WKB_POLYGON:
        (nrings,) = struct.unpack_from("<I", buf, off)
        off += 4
        rings = []
        for _ in range(nrings):
            ring, off = _decode_ring(buf, off)
            rings.append(ring)
        return "polygon", rings, off
    if gtype in (WKB_MULTIPOINT, WKB_MULTILINESTRING, WKB_MULTIPOLYGON,
                 WKB_COLLECTION):
        (n,) = struct.unpack_from("<I", buf, off)
        off += 4
        subs = []
        for _ in range(n):
            kind, data, off = _decode_at(buf, off)
            subs.append((kind, data))
        if gtype == WKB_MULTIPOINT:
            return "multipoint", np.array([d for _, d in subs],
                                          dtype=np.float64), off
        if gtype == WKB_MULTILINESTRING:
            return "multilinestring", [d for _, d in subs], off
        if gtype == WKB_MULTIPOLYGON:
            assert all(k == "polygon" for k, _ in subs)
            return "multipolygon", [d for _, d in subs], off
        return "collection", subs, off
    raise NotImplementedError(f"wkb geometry type {gtype}")


def decode(buf: bytes):
    """Decode WKB -> ("point", (x, y)) | ("polygon", [rings]) |
    ("multipolygon", [[rings], ...]) | ("linestring", pts) |
    ("multipoint", pts) | ("multilinestring", [pts, ...]) |
    ("collection", [(kind, data), ...])."""
    kind, data, _ = _decode_at(buf, 0)
    return kind, data
