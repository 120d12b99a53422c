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
The writer emits either the spec-valid unindexed variant
(index_node_size=0, the reference's own poly_no_index.fgb precedent)
or the full Hilbert-sorted packed-R-tree layout — the sort reproduces
poly.fgb's feature permutation exactly and the written leaf nodes are
byte-identical to the reference file's (tests/test_flatgeobuf.py). It
is anchored by the fixture-validated reader (write -> read round trip)
— a vtable layout error would break the shared decode path on the
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


_HILBERT_MAX = (1 << 16) - 1


def _hilbert_u16(x, y):
    """Hilbert d-index of 16-bit cells — the exact bit-twiddling
    algorithm packedrtree.cpp:74 uses (rawrunprotected hilbert_curves,
    public domain; referenced by the FlatGeobuf spec), vectorized."""
    x = np.asarray(x, np.uint32)
    y = np.asarray(y, np.uint32)
    M = np.uint32(0xFFFF)
    a = x ^ y
    b = M ^ a
    c = M ^ (x | y)
    d = x & (y ^ M)
    A = a | (b >> 1)
    B = (a >> 1) ^ a
    C = ((c >> 1) ^ (b & (d >> 1))) ^ c
    D = ((a & (c >> 1)) ^ (d >> 1)) ^ d
    a, b, c, d = A, B, C, D
    A = (a & (a >> 2)) ^ (b & (b >> 2))
    B = (a & (b >> 2)) ^ (b & ((a ^ b) >> 2))
    C = c ^ ((a & (c >> 2)) ^ (b & (d >> 2)))
    D = d ^ ((b & (c >> 2)) ^ ((a ^ b) & (d >> 2)))
    a, b, c, d = A, B, C, D
    A = (a & (a >> 4)) ^ (b & (b >> 4))
    B = (a & (b >> 4)) ^ (b & ((a ^ b) >> 4))
    C = c ^ ((a & (c >> 4)) ^ (b & (d >> 4)))
    D = d ^ ((b & (c >> 4)) ^ ((a ^ b) & (d >> 4)))
    a, b, c, d = A, B, C, D
    C = C ^ ((a & (c >> 8)) ^ (b & (d >> 8)))
    D = D ^ ((b & (c >> 8)) ^ ((a ^ b) & (d >> 8)))
    a = C ^ (C >> 1)
    b = D ^ (D >> 1)
    i0 = x ^ y
    i1 = b | (M ^ (i0 | a))
    for i in (np.uint32(8), np.uint32(4), np.uint32(2), np.uint32(1)):
        mask = {8: 0x00FF00FF, 4: 0x0F0F0F0F,
                2: 0x33333333, 1: 0x55555555}[int(i)]
        i0 = (i0 | (i0 << i)) & np.uint32(mask)
        i1 = (i1 | (i1 << i)) & np.uint32(mask)
    return (i1 << 1) | i0


def _feat_bbox(rec):
    xs = [x for x, _y in _iter_xy(*rec["geometry"])]
    ys = [y for _x, y in _iter_xy(*rec["geometry"])]
    return min(xs), min(ys), max(xs), max(ys)


def _packed_rtree(leaf_boxes: np.ndarray, offsets: np.ndarray,
                  node_size: int) -> bytes:
    """Packed Hilbert R-tree block (packedrtree.cpp layout): nodes
    top-down, leaves last; parent offset = first-child NODE INDEX,
    leaf offset = feature byte offset (poly.fgb ground truth)."""
    num = len(leaf_boxes)
    # level bounds (top-down storage) per generateLevelBounds
    level_sizes = [num]
    n = num
    while n != 1:
        n = (n + node_size - 1) // node_size
        level_sizes.append(n)
    nn = sum(level_sizes)
    nodes = np.zeros((nn, 4), np.float64)
    offs = np.zeros(nn, np.uint64)
    starts = []
    acc = nn
    for sz in level_sizes:          # bottom-up level start indices
        acc -= sz
        starts.append(acc)
    nodes[starts[0]:starts[0] + num] = leaf_boxes
    offs[starts[0]:starts[0] + num] = offsets
    for lvl in range(len(level_sizes) - 1):
        lo, hi = starts[lvl], starts[lvl] + level_sizes[lvl]
        newpos = starts[lvl + 1]
        pos = lo
        while pos < hi:
            first = pos
            chunk = nodes[pos:min(pos + node_size, hi)]
            nodes[newpos, 0] = chunk[:, 0].min()
            nodes[newpos, 1] = chunk[:, 1].min()
            nodes[newpos, 2] = chunk[:, 2].max()
            nodes[newpos, 3] = chunk[:, 3].max()
            offs[newpos] = first
            newpos += 1
            pos += node_size
    out = bytearray()
    for i in range(nn):
        out += _NODE.pack(nodes[i, 0], nodes[i, 1], nodes[i, 2],
                          nodes[i, 3], int(offs[i]))
    return bytes(out)


def write_fgb(path: str, feats: list, columns: list,
              geometry_type: str = "unknown", name: str = "layer",
              crs_wkt: str = None, index_node_size: int = 0):
    """feats: [{"geometry": (kind, data), **properties}]. With
    index_node_size > 0, features are Hilbert-sorted (the reference
    writer's order — validated by reproducing poly.fgb's permutation
    from poly_no_index.fgb's features) and a packed R-tree is emitted;
    0 writes the spec-valid unindexed variant (poly_no_index.fgb
    precedent). Envelope and features_count computed here."""
    boxes = np.array([_feat_bbox(r) for r in feats], np.float64) \
        if feats else np.zeros((0, 4))
    if feats:
        xmin, ymin = boxes[:, 0].min(), boxes[:, 1].min()
        xmax, ymax = boxes[:, 2].max(), boxes[:, 3].max()
    else:
        xmin = ymin = xmax = ymax = 0.0
    order = np.arange(len(feats))
    if index_node_size > 0 and feats:
        w = max(xmax - xmin, 1e-300)
        h = max(ymax - ymin, 1e-300)
        hx = np.floor(_HILBERT_MAX * ((boxes[:, 0] + boxes[:, 2]) / 2
                                      - xmin) / w).astype(np.uint32)
        hy = np.floor(_HILBERT_MAX * ((boxes[:, 1] + boxes[:, 3]) / 2
                                      - ymin) / h).astype(np.uint32)
        # DESCENDING: packedrtree.cpp hilbertSort compares ha > hb
        order = np.argsort(-_hilbert_u16(hx, hy).astype(np.int64),
                           kind="stable")
        feats = [feats[i] for i in order]
        boxes = boxes[order]

    body = bytearray()
    f_offsets = []
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
        f_offsets.append(len(body))
        body += b.finish_size_prefixed(root)

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
    hfields.append((22, "scalar:H", int(index_node_size)))
    hroot = hb.table(sorted(hfields))
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(hb.finish_size_prefixed(hroot))
        if index_node_size > 0 and feats:
            f.write(_packed_rtree(boxes,
                                  np.asarray(f_offsets, np.uint64),
                                  int(index_node_size)))
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
