"""Minimal WKB codec (little-endian) for Point / LineString / Polygon /
MultiPolygon, 2-D and Z (2.5-D) variants.

The reference's wire format for geometry is WKB (ogr/ogr_wkb.cpp; type codes
ogr/ogr_core.h:408-444). Spark has no geometry type, so geometry columns in
this engine are ``binary`` WKB + materialized envelope doubles
(xmin/ymin/xmax/ymax) for Catalyst-side bbox predicates and parquet min/max
row-group skipping.

Type-code normalization replays OGRReadWKBGeometryType
(ogr/ogrutils.cpp:2050-2215): the old-style OGC/PostGIS 2.5-D bit
0x80000000 (wkb25DBitInternalUse, ogr/ogr_p.h:55), the M bit 0x40000000,
the "Z flag in the 2nd byte" legacy form 0x8000 (:2178 — the reference's
own 3d_broken_* fixtures), and the ISO SQL/MM +1000 (Z) / +2000 (M) /
+3000 (ZM) ladders. M ordinates are parsed (so the byte layout stays
correct) but not retained — the engine's geometry model is 2-D + optional
Z. Encoders emit GDAL's default wkbVariantOldOgc form: base type with the
0x80000000 bit when Z is present.

Only little-endian buffers are supported (documented guard below).
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
# ISO SQL/MM curve & surface ladder (ogr/ogr_core.h:415-436)
WKB_CIRCULARSTRING = 8
WKB_COMPOUNDCURVE = 9
WKB_CURVEPOLYGON = 10
WKB_MULTICURVE = 11
WKB_MULTISURFACE = 12
WKB_POLYHEDRALSURFACE = 15
WKB_TIN = 16
WKB_TRIANGLE = 17
_LE = 1
_Z_BIT = 0x80000000


def _ztype(base: int, z: bool) -> int:
    return base | _Z_BIT if z else base


def _has3(arr) -> bool:
    a = np.asarray(arr, dtype=np.float64)
    return a.ndim == 2 and a.shape[1] >= 3


def encode_point(x: float, y: float, z: float | None = None) -> bytes:
    if z is None:
        return struct.pack("<BIdd", _LE, WKB_POINT, x, y)
    return struct.pack("<BIddd", _LE, _ztype(WKB_POINT, True), x, y, z)


def _encode_ring(ring) -> bytes:
    r = np.asarray(ring, dtype=np.float64)
    if len(r) == 0 or (r[0] != r[-1]).any():  # close the ring
        r = np.vstack([r, r[:1]])
    return struct.pack("<I", len(r)) + r.astype("<f8").tobytes()


def encode_linestring(pts) -> bytes:
    r = np.asarray(pts, dtype=np.float64)
    t = _ztype(WKB_LINESTRING, _has3(r))
    return struct.pack("<BII", _LE, t, len(r)) + r.astype("<f8").tobytes()


def encode_polygon(rings: list) -> bytes:
    z = any(_has3(ring) for ring in rings)
    out = struct.pack("<BII", _LE, _ztype(WKB_POLYGON, z), len(rings))
    for ring in rings:
        out += _encode_ring(ring)
    return out


def encode_multipolygon(polys: list) -> bytes:
    z = any(_has3(ring) for rings in polys for ring in rings)
    out = struct.pack("<BII", _LE, _ztype(WKB_MULTIPOLYGON, z), len(polys))
    for rings in polys:
        out += encode_polygon(rings)
    return out


def encode_multipoint(pts) -> bytes:
    r = np.asarray(pts, dtype=np.float64)
    z = _has3(r)
    out = struct.pack("<BII", _LE, _ztype(WKB_MULTIPOINT, z), len(r))
    for p in r:
        out += encode_point(*(float(v) for v in p[: (3 if z else 2)]))
    return out


def encode_multilinestring(lines) -> bytes:
    z = any(_has3(pts) for pts in lines)
    out = struct.pack("<BII", _LE, _ztype(WKB_MULTILINESTRING, z),
                      len(lines))
    for pts in lines:
        out += encode_linestring(pts)
    return out


def encode_collection(parts: list[bytes]) -> bytes:
    """parts: already-encoded WKB sub-geometries (nested per spec). The
    collection header carries the Z bit when any member does (the
    reference's 3d_1.wkb layout: 0x80000007 wrapping 0x80000001 members)."""
    z = any(len(p) >= 5
            and (struct.unpack_from("<I", p, 1)[0] & _Z_BIT) for p in parts)
    return (struct.pack("<BII", _LE, _ztype(WKB_COLLECTION, z), len(parts))
            + b"".join(parts))


def encode_circularstring(pts) -> bytes:
    r = np.asarray(pts, dtype=np.float64)
    t = _ztype(WKB_CIRCULARSTRING, _has3(r))
    return struct.pack("<BII", _LE, t, len(r)) + r.astype("<f8").tobytes()


def _encode_container(base: int, parts: list[bytes]) -> bytes:
    z = any(len(p) >= 5
            and (struct.unpack_from("<I", p, 1)[0] & _Z_BIT) for p in parts)
    return (struct.pack("<BII", _LE, _ztype(base, z), len(parts))
            + b"".join(parts))


def encode_compoundcurve(parts: list[bytes]) -> bytes:
    """parts: already-encoded WKB curves (linestring/circularstring)."""
    return _encode_container(WKB_COMPOUNDCURVE, parts)


def encode_curvepolygon(rings: list[bytes]) -> bytes:
    """rings: already-encoded WKB ring curves (linestring /
    circularstring / compoundcurve) — the ISO layout nests full
    geometries, unlike the bare rings of a plain polygon."""
    return _encode_container(WKB_CURVEPOLYGON, rings)


def encode_multicurve(parts: list[bytes]) -> bytes:
    return _encode_container(WKB_MULTICURVE, parts)


def encode_multisurface(parts: list[bytes]) -> bytes:
    return _encode_container(WKB_MULTISURFACE, parts)


def encode_triangle(rings: list) -> bytes:
    r0 = np.asarray(rings[0], dtype=np.float64)
    t = _ztype(WKB_TRIANGLE, _has3(r0))
    return (struct.pack("<BII", _LE, t, len(rings))
            + b"".join(_encode_ring(r) for r in rings))


def encode_polyhedralsurface(polys: list, tin: bool = False) -> bytes:
    """polys: list of rings-lists; each patch is encoded as a full
    nested polygon (triangle for TIN) geometry."""
    enc = encode_triangle if tin else encode_polygon
    parts = [enc(rings) for rings in polys]
    return _encode_container(WKB_TIN if tin else WKB_POLYHEDRALSURFACE,
                             parts)


def encode_geometry(kind: str, data) -> bytes:
    """Encode any decoded (kind, data) structure back to WKB — the
    inverse of decode() for every kind this codec understands."""
    if kind == "point":
        return encode_point(*data)
    if kind == "linestring":
        return encode_linestring(data)
    if kind == "polygon":
        return encode_polygon(data)
    if kind == "multipoint":
        return encode_multipoint(data)
    if kind == "multilinestring":
        return encode_multilinestring(data)
    if kind == "multipolygon":
        return encode_multipolygon(data)
    if kind == "collection":
        return encode_collection([encode_geometry(k, d) for k, d in data])
    if kind == "circularstring":
        return encode_circularstring(data)
    if kind == "compoundcurve":
        return encode_compoundcurve(
            [encode_geometry(k, d) for k, d in data])
    if kind == "curvepolygon":
        rings = []
        for r in data:
            if isinstance(r, tuple) and len(r) == 2 and isinstance(r[0], str):
                rings.append(encode_geometry(*r))
            else:
                rings.append(encode_linestring(r))
        return encode_curvepolygon(rings)
    if kind == "multicurve":
        return encode_multicurve([encode_geometry(k, d) for k, d in data])
    if kind == "multisurface":
        return encode_multisurface([encode_geometry(k, d) for k, d in data])
    if kind == "triangle":
        return encode_triangle(data)
    if kind in ("polyhedralsurface", "tin"):
        return encode_polyhedralsurface(data, tin=(kind == "tin"))
    raise NotImplementedError(f"encode kind {kind}")


def _normalize_type(raw: int) -> tuple[int, bool, bool]:
    """OGRReadWKBGeometryType's flag/ladder normalization ->
    (base_type, has_z, has_m). ogr/ogrutils.cpp:2068-2215."""
    has_z = False
    has_m = False
    t = int(raw)
    if t & 0x40000000:          # PostGIS M bit
        t &= ~0x40000000
        has_m = True
    if t & _Z_BIT:              # old-style OGC/PostGIS 2.5D bit
        t &= 0x000000FF
        has_z = True
    if t & (_Z_BIT >> 16):      # Z flag in the 2nd byte (:2178)
        t &= 0x000000FF
        has_z = True
    if 1000 < t <= 1017:        # ISO Z
        t -= 1000
        has_z = True
    elif 2000 < t <= 2017:      # ISO M
        t -= 2000
        has_m = True
    elif 3000 < t <= 3017:      # ISO ZM
        t -= 3000
        has_z = True
        has_m = True
    return t, has_z, has_m


def _decode_pts(buf: bytes, off: int, dims: int):
    (n,) = struct.unpack_from("<I", buf, off)
    off += 4
    pts = np.frombuffer(buf, dtype="<f8", count=dims * n,
                        offset=off).reshape(n, dims)
    return pts.copy(), off + 8 * dims * n


def _decode_at(buf: bytes, off: int, keep_z: bool):
    """Decode one geometry at `off` -> (kind, data, has_z, next_off)."""
    byte_order, raw = struct.unpack_from("<BI", buf, off)
    if byte_order != _LE:
        raise NotImplementedError("big-endian WKB not supported")
    off += 5
    gtype, has_z, has_m = _normalize_type(raw)
    dims = 2 + (1 if has_z else 0) + (1 if has_m else 0)
    ncols = 3 if (has_z and keep_z) else 2
    if gtype == WKB_POINT:
        vals = struct.unpack_from(f"<{dims}d", buf, off)
        return "point", tuple(vals[:ncols]), has_z, off + 8 * dims
    if gtype == WKB_LINESTRING:
        pts, off = _decode_pts(buf, off, dims)
        return "linestring", pts[:, :ncols], has_z, off
    if gtype in (WKB_POLYGON, WKB_TRIANGLE):
        (nrings,) = struct.unpack_from("<I", buf, off)
        off += 4
        rings = []
        for _ in range(nrings):
            ring, off = _decode_pts(buf, off, dims)
            rings.append(ring[:, :ncols])
        return ("polygon" if gtype == WKB_POLYGON else "triangle",
                rings, has_z, off)
    if gtype == WKB_CIRCULARSTRING:
        pts, off = _decode_pts(buf, off, dims)
        return "circularstring", pts[:, :ncols], has_z, off
    if gtype in (WKB_COMPOUNDCURVE, WKB_CURVEPOLYGON, WKB_MULTICURVE,
                 WKB_MULTISURFACE, WKB_POLYHEDRALSURFACE, WKB_TIN):
        # all carry a count of FULL nested WKB geometries (the ISO layout:
        # compound-curve components, curve-polygon rings, multi-curve /
        # multi-surface members, polyhedral patches — ogr/ogr_wkb.cpp)
        (n,) = struct.unpack_from("<I", buf, off)
        off += 4
        subs = []
        any_z = has_z
        for _ in range(n):
            kind, data, sub_z, off = _decode_at(buf, off, keep_z)
            any_z = any_z or sub_z
            subs.append((kind, data))
        name = {WKB_COMPOUNDCURVE: "compoundcurve",
                WKB_CURVEPOLYGON: "curvepolygon",
                WKB_MULTICURVE: "multicurve",
                WKB_MULTISURFACE: "multisurface",
                WKB_POLYHEDRALSURFACE: "polyhedralsurface",
                WKB_TIN: "tin"}[gtype]
        if gtype in (WKB_POLYHEDRALSURFACE, WKB_TIN):
            # patches are plain polygons/triangles: keep rings-lists only
            # (matches the engine's multipolygon shape after linearize)
            return name, [d for _, d in subs], any_z, off
        return name, subs, any_z, off
    if gtype in (WKB_MULTIPOINT, WKB_MULTILINESTRING, WKB_MULTIPOLYGON,
                 WKB_COLLECTION):
        (n,) = struct.unpack_from("<I", buf, off)
        off += 4
        subs = []
        any_z = has_z
        for _ in range(n):
            kind, data, sub_z, off = _decode_at(buf, off, keep_z)
            any_z = any_z or sub_z
            subs.append((kind, data))
        if gtype == WKB_MULTIPOINT:
            # mixed 2-D/Z members: pad to z=0 (the reference's promotion
            # rule when a 2-D point joins a 3-D aggregate)
            w = max((len(d) for _, d in subs), default=2)
            return "multipoint", np.array(
                [tuple(d) + (0.0,) * (w - len(d)) for _, d in subs],
                dtype=np.float64), any_z, off
        if gtype == WKB_MULTILINESTRING:
            return "multilinestring", [d for _, d in subs], any_z, off
        if gtype == WKB_MULTIPOLYGON:
            assert all(k == "polygon" for k, _ in subs)
            return "multipolygon", [d for _, d in subs], any_z, off
        return "collection", subs, any_z, off
    raise NotImplementedError(f"wkb geometry type {raw}")


def decode(buf: bytes):
    """Decode WKB -> ("point", (x, y)) | ("polygon", [rings]) |
    ("multipolygon", [[rings], ...]) | ("linestring", pts) |
    ("multipoint", pts) | ("multilinestring", [pts, ...]) |
    ("collection", [(kind, data), ...]).

    Z/M inputs are accepted (both the 0x80000000-flag and ISO +1000
    encodings); the extra ordinates are dropped here so every planar
    consumer keeps its 2-column contract — use decode_z when Z matters."""
    kind, data, _, _ = _decode_at(buf, 0, keep_z=False)
    return kind, data


def decode_z(buf: bytes):
    """Decode WKB keeping Z -> (kind, data, has_z). Point data is
    (x, y, z); linestring/ring arrays have 3 columns when has_z."""
    kind, data, has_z, _ = _decode_at(buf, 0, keep_z=True)
    return kind, data, has_z
