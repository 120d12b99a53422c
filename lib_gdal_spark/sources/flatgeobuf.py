"""FlatGeobuf source + sink — hand-rolled flatbuffers codec, no
third-party dependency.

Reference: ogr/ogrsf_frmts/flatgeobuf/ (ogrflatgeobuflayer.cpp,
packedrtree.cpp, header_generated.h / feature_generated.h — the
flatbuffers vtable ids and enums below are transcribed from those
generated schemas). File layout:

  magic  'fgb' 0x03 'fgb' 0x00                     (8 bytes)
  header size-prefixed flatbuffer (Header table: name/envelope/
         geometry_type/columns/features_count/index_node_size/crs)
  index  packed Hilbert R-tree, present when index_node_size > 0:
         nodes stored top-down (root first, leaves last), one node =
         4 doubles bbox + uint64 offset = 40 bytes; level sizes from
         packedrtree.cpp generateLevelBounds (ceil-divide chain).
         Leaf nodes carry each feature's byte offset into the
         features section — the natural SPLIT POINTS for distributed
         reads (read_df partitions on leaf offsets, and the leaf
         bboxes give a file-level bbox prune before any feature is
         decoded).
  body   one size-prefixed flatbuffer per feature (Feature table:
         geometry + packed properties bytes).

The reader replays the reference's own fixtures byte-for-byte
(autotest/ogr/data/testfgb/poly.fgb extent/counts, poly_no_index.fgb,
alldatatypes.fgb's full column-type matrix — tests/test_flatgeobuf.py).
The writer emits index_node_size=0 files (the spec-valid unindexed
variant, the reference's own poly_no_index.fgb precedent); it is
anchored by the fixture-validated reader (write -> read round trip) —
a vtable layout error would break the shared decode path on the
reference fixtures. Like the shapefile sink, single-file assembly is
driver-side: FlatGeobuf is a dimension-sized sidecar format here;
corpus-scale outputs use parquet.
"""

from __future__ import annotations

import struct

import numpy as np

# header_generated.h enums
GEOM_TYPES = {0: "unknown", 1: "point", 2: "linestring", 3: "polygon",
              4: "multipoint", 5: "multilinestring", 6: "multipolygon",
              7: "geometrycollection"}
GEOM_CODES = {v: k for k, v in GEOM_TYPES.items()}
COLUMN_TYPES = ["byte", "ubyte", "bool", "short", "ushort", "int",
                "uint", "long", "ulong", "float", "double", "string",
                "json", "datetime", "binary"]
_SCALAR_FMT = {"byte": "b", "ubyte": "B", "bool": "B", "short": "h",
               "ushort": "H", "int": "i", "uint": "I", "long": "q",
               "ulong": "Q", "float": "f", "double": "d"}

MAGIC = b"fgb\x03fgb\x00"
_NODE = struct.Struct("<4dQ")          # packed R-tree node: bbox+offset


# --------------------------------------------------------------- reader

class _Table:
    """Minimal flatbuffers table reader (vtable-indirected fields)."""

    def __init__(self, buf: bytes, pos: int):
        self.b, self.pos = buf, pos
        soff = struct.unpack_from("<i", buf, pos)[0]
        self.vt = pos - soff
        self.vt_len = struct.unpack_from("<H", buf, self.vt)[0]

    def _off(self, vt_id: int) -> int:
        if vt_id + 2 > self.vt_len:
            return 0
        return struct.unpack_from("<H", self.b, self.vt + vt_id)[0]

    def scalar(self, vt_id: int, fmt: str, default):
        o = self._off(vt_id)
        if o == 0:
            return default
        return struct.unpack_from("<" + fmt, self.b, self.pos + o)[0]

    def _indirect(self, vt_id: int):
        o = self._off(vt_id)
        if o == 0:
            return None
        p = self.pos + o
        return p + struct.unpack_from("<I", self.b, p)[0]

    def string(self, vt_id: int):
        p = self._indirect(vt_id)
        if p is None:
            return None
        n = struct.unpack_from("<I", self.b, p)[0]
        return self.b[p + 4:p + 4 + n].decode("utf-8")

    def vector(self, vt_id: int, dtype):
        p = self._indirect(vt_id)
        if p is None:
            return None
        n = struct.unpack_from("<I", self.b, p)[0]
        return np.frombuffer(self.b, dtype=dtype, count=n, offset=p + 4)

    def table(self, vt_id: int):
        p = self._indirect(vt_id)
        return None if p is None else _Table(self.b, p)

    def tables(self, vt_id: int):
        p = self._indirect(vt_id)
        if p is None:
            return []
        n = struct.unpack_from("<I", self.b, p)[0]
        out = []
        for i in range(n):
            q = p + 4 + 4 * i
            out.append(_Table(
                self.b, q + struct.unpack_from("<I", self.b, q)[0]))
        return out


def _rtree_num_nodes(num_items: int, node_size: int) -> int:
    """packedrtree.cpp generateLevelBounds: ceil-divide chain — a
    DO-while in the reference, so a single item still adds a root
    level (2 nodes, not 1)."""
    n, total = num_items, num_items
    while True:
        n = (n + node_size - 1) // node_size
        total += n
        if n == 1:
            return total


def read_header(buf: bytes):
    """-> (header dict, body_start byte offset). header carries name,
    envelope, geometry_type, columns [(name, type)], features_count,
    index_node_size, crs_wkt, leaf node (bbox, offset) arrays when an
    index is present."""
    if buf[:8] != MAGIC:
        raise ValueError("not a FlatGeobuf file (bad magic)")
    hlen = struct.unpack_from("<I", buf, 8)[0]
    root = 12 + struct.unpack_from("<I", buf, 12)[0]
    h = _Table(buf, root)
    env = h.vector(6, "<f8")
    cols = [(c.string(4), COLUMN_TYPES[c.scalar(6, "B", 0)])
            for c in h.tables(18)]
    hdr = {
        "name": h.string(4),
        "envelope": None if env is None else [float(v) for v in env],
        "geometry_type": GEOM_TYPES.get(h.scalar(8, "B", 0), "unknown"),
        "has_z": h.scalar(10, "B", 0) != 0,
        "columns": cols,
        "features_count": h.scalar(20, "Q", 0),
        "index_node_size": h.scalar(22, "H", 16),
        "crs_wkt": None,
        "leaves": None,
    }
    crs = h.table(24)
    if crs is not None:
        hdr["crs_wkt"] = crs.string(12)
        hdr["crs_code"] = crs.scalar(6, "i", 0)
    pos = 12 + hlen
    if hdr["index_node_size"] > 0 and hdr["features_count"] > 0:
        nn = _rtree_num_nodes(hdr["features_count"],
                              hdr["index_node_size"])
        raw = np.frombuffer(buf, dtype="<f8",
                            count=nn * 5, offset=pos).reshape(nn, 5)
        leaves = raw[nn - hdr["features_count"]:]
        offs = np.frombuffer(buf, dtype="<u8",
                             count=nn * 5, offset=pos).reshape(nn, 5)
        hdr["leaves"] = (leaves[:, :4].copy(),
                         offs[nn - hdr["features_count"]:, 4].copy())
        pos += nn * _NODE.size
    return hdr, pos


def _decode_geometry(g: _Table, kind_hint: str):
    """Geometry table -> (kind, data) in the engine's ring-list forms
    (geometryreader.cpp semantics: ends are exclusive coordinate-pair
    ring ends; multipolygon nests per-part Geometry tables)."""
    t = g.scalar(16, "B", 0)
    kind = GEOM_TYPES.get(t, "unknown") if t else kind_hint
    xy = g.vector(6, "<f8")
    pts = (np.asarray(xy, np.float64).reshape(-1, 2)
           if xy is not None else np.zeros((0, 2)))
    ends = g.vector(4, "<u4")
    if kind == "point":
        return "point", (float(pts[0, 0]), float(pts[0, 1]))
    if kind == "multipoint":
        return "multipoint", pts
    if kind == "linestring":
        return "linestring", pts
    if kind in ("polygon", "multilinestring"):
        if ends is None or len(ends) <= 1:
            return kind, [pts] if kind == "polygon" else [pts]
        rings, s = [], 0
        for e in ends:
            rings.append(pts[s:int(e)])
            s = int(e)
        return kind, rings
    if kind == "multipolygon":
        polys = []
        for part in g.tables(18):
            _k, rings = _decode_geometry(part, "polygon")
            polys.append(rings)
        return "multipolygon", polys
    raise NotImplementedError(f"FlatGeobuf geometry type {t}")


def _decode_properties(raw, columns):
    out = {}
    if raw is None:
        return out
    b = raw.tobytes() if isinstance(raw, np.ndarray) else bytes(raw)
    i = 0
    while i + 2 <= len(b):
        ci = struct.unpack_from("<H", b, i)[0]
        i += 2
        name, typ = columns[ci]
        if typ in _SCALAR_FMT:
            fmt = _SCALAR_FMT[typ]
            size = struct.calcsize(fmt)
            v = struct.unpack_from("<" + fmt, b, i)[0]
            if typ == "bool":
                v = bool(v)
            out[name] = v
            i += size
        else:                       # string/json/datetime/binary
            n = struct.unpack_from("<I", b, i)[0]
            i += 4
            v = b[i:i + n]
            out[name] = v if typ == "binary" else v.decode("utf-8")
            i += n
    return out


def read_fgb(path_or_bytes):
    """-> (header, [ {\"geometry\": (kind, data), **properties} ])."""
    buf = (path_or_bytes if isinstance(path_or_bytes, (bytes, bytearray))
           else open(path_or_bytes, "rb").read())
    hdr, pos = read_header(buf)
    feats = []
    while pos + 4 <= len(buf):
        flen = struct.unpack_from("<I", buf, pos)[0]
        root = pos + 4 + struct.unpack_from("<I", buf, pos + 4)[0]
        f = _Table(buf, root)
        geom = f.table(4)
        rec = {"geometry": (None if geom is None else
                            _decode_geometry(geom, hdr["geometry_type"]))}
        rec.update(_decode_properties(f.vector(6, "u1"), hdr["columns"]))
        feats.append(rec)
        pos += 4 + flen
    return hdr, feats


# --------------------------------------------------------------- writer

class _Builder:
    """Minimal back-to-front flatbuffers builder (prepend model;
    offsets tracked end-relative, so uoffset = slot_end - target_end)."""

    def __init__(self):
        self.buf = bytearray()

    def _prep(self, align: int, extra: int = 0):
        while (len(self.buf) + extra) % align:
            self.buf[:0] = b"\x00"

    def _prepend(self, data: bytes):
        self.buf[:0] = data

    def vector(self, fmt_char: str, values) -> int:
        size = struct.calcsize(fmt_char)
        data = b"".join(struct.pack("<" + fmt_char, v) for v in values)
        self._prep(max(4, size), 4 + len(data))
        self._prepend(struct.pack("<I", len(values)) + data)
        return len(self.buf)

    def byte_vector(self, data: bytes) -> int:
        self._prep(4, 4 + len(data))
        self._prepend(struct.pack("<I", len(data)) + bytes(data))
        return len(self.buf)

    def string(self, s: str) -> int:
        data = s.encode("utf-8") + b"\x00"
        self._prep(4, 4 + len(data))
        self._prepend(struct.pack("<I", len(data) - 1) + data)
        return len(self.buf)

    def offset_vector(self, offsets) -> int:
        self._prep(4, 4 + 4 * len(offsets))
        body = bytearray()
        # after the prepend the vector's length field sits at end-rel
        # L = len+4+4n; slot i starts 4+4i bytes into the vector
        base = len(self.buf) + 4 * len(offsets)
        for i, t in enumerate(offsets):
            slot_end = base - 4 * i
            body += struct.pack("<I", slot_end - t)
        self._prepend(struct.pack("<I", len(offsets)) + bytes(body))
        return len(self.buf)

    def table(self, fields) -> int:
        """fields: list of (vt_id, kind, value) with kind in
        {'scalar:<fmt>', 'offset'}; absent fields simply omitted.
        Returns the table's end-relative position."""
        start = len(self.buf)
        slots = {}
        for vt_id, kind, value in fields:
            if kind == "offset":
                self._prep(4)
                slot_end = len(self.buf) + 4
                self._prepend(struct.pack("<I", slot_end - value))
            else:
                fmt = kind.split(":")[1]
                size = struct.calcsize(fmt)
                self._prep(size)
                self._prepend(struct.pack("<" + fmt, value))
            slots[vt_id] = len(self.buf)
        self._prep(4)
        self._prepend(b"\x00\x00\x00\x00")     # soffset placeholder
        t_end = len(self.buf)
        max_id = max(slots) if slots else 2
        nslots = (max_id - 4) // 2 + 1 if slots else 0
        vt = struct.pack("<H", 4 + 2 * nslots)
        vt += struct.pack("<H", t_end - start)
        for k in range(nslots):
            vt_id = 4 + 2 * k
            vt += struct.pack("<H",
                              t_end - slots[vt_id] if vt_id in slots
                              else 0)
        self._prep(2)
        self._prepend(vt)
        v_end = len(self.buf)
        idx = len(self.buf) - t_end
        self.buf[idx:idx + 4] = struct.pack("<i", v_end - t_end)
        return t_end

    def finish_size_prefixed(self, root_end: int) -> bytes:
        self._prep(8, 8)
        self._prepend(struct.pack("<I", len(self.buf) + 4 - root_end))
        self._prepend(struct.pack("<I", len(self.buf)))
        return bytes(self.buf)


def _encode_geometry(b: _Builder, kind: str, data, nested: bool = False):
    kind = kind.lower()
    fields = []
    if kind == "point":
        xy = b.vector("d", [float(data[0]), float(data[1])])
        fields.append((6, "offset", xy))
    elif kind in ("linestring", "multipoint"):
        pts = np.asarray(data, np.float64)
        xy = b.vector("d", pts.reshape(-1).tolist())
        fields.append((6, "offset", xy))
    elif kind in ("polygon", "multilinestring"):
        rings = [np.asarray(r, np.float64) for r in data]
        flat, ends, n = [], [], 0
        for r in rings:
            n += len(r)
            ends.append(n)
            flat.append(r)
        allp = np.concatenate(flat) if flat else np.zeros((0, 2))
        if len(rings) > 1:
            ev = b.vector("I", ends)
            fields.append((4, "offset", ev))
        xy = b.vector("d", allp.reshape(-1).tolist())
        fields.append((6, "offset", xy))
    elif kind == "multipolygon":
        parts = [_encode_geometry(b, "polygon", rings, nested=True)
                 for rings in data]
        pv = b.offset_vector(parts)
        fields.append((18, "offset", pv))
    else:
        raise NotImplementedError(f"FlatGeobuf write of {kind}")
    # always self-describing (required for unknown/mixed layers and
    # nested parts; spec-legal everywhere else)
    fields.append((16, "scalar:B", GEOM_CODES[kind]))
    return b.table(sorted(fields))


def _encode_properties(columns, rec: dict) -> bytes:
    out = bytearray()
    for ci, (name, typ) in enumerate(columns):
        if name not in rec or rec[name] is None:
            continue
        v = rec[name]
        out += struct.pack("<H", ci)
        if typ in _SCALAR_FMT:
            out += struct.pack("<" + _SCALAR_FMT[typ],
                               int(v) if typ not in ("float", "double")
                               else float(v))
        else:
            data = v if isinstance(v, (bytes, bytearray)) \
                else str(v).encode("utf-8")
            out += struct.pack("<I", len(data)) + bytes(data)
    return bytes(out)


def write_fgb(path: str, feats: list, columns: list,
              geometry_type: str = "unknown", name: str = "layer",
              crs_wkt: str = None):
    """feats: [{"geometry": (kind, data), **properties}]. Writes the
    unindexed variant (index_node_size=0 — poly_no_index.fgb
    precedent); envelope and features_count computed here."""
    body = bytearray()
    xmin = ymin = float("inf")
    xmax = ymax = float("-inf")
    for rec in feats:
        b = _Builder()
        fields = []
        kind, data = rec["geometry"]
        g = _encode_geometry(b, kind, data)
        fields.append((4, "offset", g))
        props = _encode_properties(columns, rec)
        if props:
            pv = b.byte_vector(props)
            fields.append((6, "offset", pv))
        root = b.table(sorted(fields))
        body += b.finish_size_prefixed(root)
        for x, y in _iter_xy(kind, data):
            xmin, ymin = min(xmin, x), min(ymin, y)
            xmax, ymax = max(xmax, x), max(ymax, y)

    hb = _Builder()
    hfields = []
    if columns:
        coltabs = []
        for cname, ctyp in columns:
            cb_name = hb.string(cname)
            coltabs.append(hb.table([
                (4, "offset", cb_name),
                (6, "scalar:B", COLUMN_TYPES.index(ctyp))]))
        hfields.append((18, "offset", hb.offset_vector(coltabs)))
    if crs_wkt:
        wkt = hb.string(crs_wkt)
        hfields.append((24, "offset", hb.table([(12, "offset", wkt)])))
    if feats:
        env = hb.vector("d", [xmin, ymin, xmax, ymax])
        hfields.append((6, "offset", env))
    nm = hb.string(name)
    hfields.append((4, "offset", nm))
    hfields.append((8, "scalar:B", GEOM_CODES.get(geometry_type, 0)))
    hfields.append((20, "scalar:Q", len(feats)))
    hfields.append((22, "scalar:H", 0))        # unindexed variant
    hroot = hb.table(sorted(hfields))
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(hb.finish_size_prefixed(hroot))
        f.write(bytes(body))


def _iter_xy(kind, data):
    kind = kind.lower()
    if kind == "point":
        yield float(data[0]), float(data[1])
    elif kind in ("linestring", "multipoint"):
        for x, y in np.asarray(data, np.float64):
            yield float(x), float(y)
    elif kind in ("polygon", "multilinestring"):
        for r in data:
            for x, y in np.asarray(r, np.float64):
                yield float(x), float(y)
    elif kind == "multipolygon":
        for rings in data:
            for r in rings:
                for x, y in np.asarray(r, np.float64):
                    yield float(x), float(y)


# ---------------------------------------------------------------- spark

def read_df(spark, path: str, bbox: tuple = None):
    """FlatGeobuf -> DataFrame (fid, geometry WKB, property columns).
    With an index present and a bbox given, leaf bboxes prune features
    BEFORE decode (the reference's OLCFastSpatialFilter analog). The
    file is dimension-sized here (like the shapefile source); the
    partitioned-scan shape for big files is leaf-offset range splits —
    documented in the module docstring."""
    from ..geo import wkb as _wkb

    buf = open(path, "rb").read()
    hdr, feats = read_fgb(buf)
    if bbox is not None and hdr["leaves"] is not None:
        bb, _offs = hdr["leaves"]
        keep = ~((bb[:, 2] < bbox[0]) | (bb[:, 0] > bbox[2])
                 | (bb[:, 3] < bbox[1]) | (bb[:, 1] > bbox[3]))
        feats = [f for f, k in zip(feats, keep) if k]
    rows = []
    for i, rec in enumerate(feats):
        kind, data = rec["geometry"]
        row = {"fid": i,
               "geometry": _wkb.encode_geometry(kind, _as_rings(kind,
                                                                data))}
        for cname, _t in hdr["columns"]:
            row[cname] = rec.get(cname)
        rows.append(row)
    return spark.createDataFrame(rows) if rows else None


def _as_rings(kind, data):
    if kind == "point":
        return data
    if kind in ("linestring", "multipoint"):
        return np.asarray(data, np.float64)
    if kind in ("polygon", "multilinestring"):
        return [np.asarray(r, np.float64) for r in data]
    return [[np.asarray(r, np.float64) for r in rings] for rings in data]
