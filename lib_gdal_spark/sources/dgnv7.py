"""MicroStation DGN v7 (Intergraph ISFF) vector source.

Reference semantics (studied, re-expressed — no code copied):
ogr/ogrsf_frmts/dgn/ (dgnread.cpp / dgnhelp.cpp / dgnstroke.cpp /
ogrdgnlayer.cpp, plus port/cpl_vax.cpp) —
- elements frame as [level|complex byte, type|deleted byte, u16 word
  count] + words; 0xFFFF ends the file (DGNLoadRawElement).
- int32s are PDP-11 word-swapped: b[2] + b[3]<<8 + b[1]<<24 + b[0]<<16
  (dgnlibp.h:70); doubles are VAX D-floats (word-swapped, exponent
  rebased 129 -> 1023 with 3-bit mantissa shift, cpl_vax.cpp).
- the TCB (type 9) carries dimension, uor_per_subunit (u32 @1116),
  subunits_per_master (@1112) and the global origin (VAX doubles
  @1240): scale = 1/(uor*sub), user coord = uor * scale - origin
  (DGNParseTCB / DGNTransformPoint).
- display header: graphic group @28, attr index @30, properties @32,
  style/weight @34 (bits 0-2 / 3-7), color @35; attribute linkages
  start at attr_index*2+32, each sized 8 (DMRS) or first_byte*2+2;
  linkage type 0x0041 = shape fill, fill color at byte 8
  (DGNGetShapeFillInfo).
- color tables are GROUP_DATA (5) elements at level 1: entry 255 at
  byte 38, entries 0..254 from 41 (DGNParseColorTable).
- geometry: LINE (3) two points @36; LINE_STRING/SHAPE/CURVE
  (4/6/11) u16 count @36, points from 38; ELLIPSE (15) VAX axes
  @36/@44, rotation i32/360000 @52, VAX origin @56/@64, stroked like
  DGNStrokeArc with nPoints = min(90, max(1, sweep/5)+1); TEXT (17)
  font @36, justification @37, size mults i32*scale*6/1000 @38/@42,
  rotation @46, origin i32 pair @50, length-prefixed string @58/@60.
- OGR surface: fields Type/Level/GraphicGroup/ColorIndex/Weight/
  Style/Text; style strings PEN(id:"ogr-pen-0",c:#rrggbb[,w:Npx]),
  BRUSH(fc:#rrggbb,id:"ogr-brush-0") for filled shapes, and
  LABEL(t:"...",c:#rrggbb,s:H.HHHg,f:FONT) with the reference's font
  table (ENGINEERING = id 3) and %.3fg size rule for 0.1 < |h| < 6."""

from __future__ import annotations

import json
import math
import struct

import numpy as np

# MicroStation default color table (dgnhelp.cpp abyDefaultPCT —
# a fixed standard palette, reproduced as data)
_DEFAULT_PCT = [
    (255,255,255), (0,0,255), (0,255,0), (255,0,0), (255,255,0), (255,0,255),
    (255,127,0), (0,255,255), (64,64,64), (192,192,192), (254,0,96), (160,224,0),
    (0,254,160), (128,0,160), (176,176,176), (0,240,240), (240,240,240), (0,0,240),
    (0,240,0), (240,0,0), (240,240,0), (240,0,240), (240,122,0), (0,240,240),
    (240,240,240), (0,0,240), (0,240,0), (240,0,0), (240,240,0), (240,0,240),
    (240,122,0), (0,225,225), (225,225,225), (0,0,225), (0,225,0), (225,0,0),
    (225,225,0), (225,0,225), (225,117,0), (0,225,225), (225,225,225), (0,0,225),
    (0,225,0), (225,0,0), (225,225,0), (225,0,225), (225,117,0), (0,210,210),
    (210,210,210), (0,0,210), (0,210,0), (210,0,0), (210,210,0), (210,0,210),
    (210,112,0), (0,210,210), (210,210,210), (0,0,210), (0,210,0), (210,0,0),
    (210,210,0), (210,0,210), (210,112,0), (0,195,195), (195,195,195), (0,0,195),
    (0,195,0), (195,0,0), (195,195,0), (195,0,195), (195,107,0), (0,195,195),
    (195,195,195), (0,0,195), (0,195,0), (195,0,0), (195,195,0), (195,0,195),
    (195,107,0), (0,180,180), (180,180,180), (0,0,180), (0,180,0), (180,0,0),
    (180,180,0), (180,0,180), (180,102,0), (0,180,180), (180,180,180), (0,0,180),
    (0,180,0), (180,0,0), (180,180,0), (180,0,180), (180,102,0), (0,165,165),
    (165,165,165), (0,0,165), (0,165,0), (165,0,0), (165,165,0), (165,0,165),
    (165,97,0), (0,165,165), (165,165,165), (0,0,165), (0,165,0), (165,0,0),
    (165,165,0), (165,0,165), (165,97,0), (0,150,150), (150,150,150), (0,0,150),
    (0,150,0), (150,0,0), (150,150,0), (150,0,150), (150,92,0), (0,150,150),
    (150,150,150), (0,0,150), (0,150,0), (150,0,0), (150,150,0), (150,0,150),
    (150,92,0), (0,135,135), (135,135,135), (0,0,135), (0,135,0), (135,0,0),
    (135,135,0), (135,0,135), (135,87,0), (0,135,135), (135,135,135), (0,0,135),
    (0,135,0), (135,0,0), (135,135,0), (135,0,135), (135,87,0), (0,120,120),
    (120,120,120), (0,0,120), (0,120,0), (120,0,0), (120,120,0), (120,0,120),
    (120,82,0), (0,120,120), (120,120,120), (0,0,120), (0,120,0), (120,0,0),
    (120,120,0), (120,0,120), (120,82,0), (0,105,105), (105,105,105), (0,0,105),
    (0,105,0), (105,0,0), (105,105,0), (105,0,105), (105,77,0), (0,105,105),
    (105,105,105), (0,0,105), (0,105,0), (105,0,0), (105,105,0), (105,0,105),
    (105,77,0), (0,90,90), (90,90,90), (0,0,90), (0,90,0), (90,0,0),
    (90,90,0), (90,0,90), (90,72,0), (0,90,90), (90,90,90), (0,0,90),
    (0,90,0), (90,0,0), (90,90,0), (90,0,90), (90,72,0), (0,75,75),
    (75,75,75), (0,0,75), (0,75,0), (75,0,0), (75,75,0), (75,0,75),
    (75,67,0), (0,75,75), (75,75,75), (0,0,75), (0,75,0), (75,0,0),
    (75,75,0), (75,0,75), (75,67,0), (0,60,60), (60,60,60), (0,0,60),
    (0,60,0), (60,0,0), (60,60,0), (60,0,60), (60,62,0), (0,60,60),
    (60,60,60), (0,0,60), (0,60,0), (60,0,0), (60,60,0), (60,0,60),
    (60,62,0), (0,45,45), (45,45,45), (0,0,45), (0,45,0), (45,0,0),
    (45,45,0), (45,0,45), (45,57,0), (0,45,45), (45,45,45), (0,0,45),
    (0,45,0), (45,0,0), (45,45,0), (45,0,45), (45,57,0), (0,30,30),
    (30,30,30), (0,0,30), (0,30,0), (30,0,0), (30,30,0), (30,0,30),
    (30,52,0), (0,30,30), (30,30,30), (0,0,30), (0,30,0), (30,0,0),
    (30,30,0), (30,0,30), (192,192,192), (28,0,100),
]

_FONTS = {0: "STANDARD", 1: "WORKING", 2: "FANCY", 3: "ENGINEERING",
          4: "NEWZERO", 5: "STENCEL", 6: "USTN_FANCY",
          7: "COMPRESSED", 8: "STENCEQ", 10: "hand", 11: "ARCH",
          12: "ARCHB", 22: "ISOFRACTIONS", 23: "ITALICS", 24: "ISO30",
          26: "GREEK", 27: "ISOREC", 28: "Isoeq"}


def _i32(b, o):
    v = b[o + 2] + (b[o + 3] << 8) + (b[o + 1] << 24) + (b[o] << 16)
    return v - (1 << 32) if v >= (1 << 31) else v


def _u16le(b, o):
    return b[o] + b[o + 1] * 256


def vax_double(b: bytes, o: int) -> float:
    """VAX D-float (as stored in DGN, little-endian words) -> IEEE."""
    src = b[o:o + 8]
    dest = bytes([src[2], src[3], src[0], src[1],
                  src[6], src[7], src[4], src[5]])
    # dest holds (hi_word_bytes, lo_word_bytes) per cpl_vax layout
    hi = struct.unpack("<I", dest[0:4])[0]
    lo = struct.unpack("<I", dest[4:8])[0]
    sign = hi & 0x80000000
    exponent = (hi >> 23) & 0xFF
    if exponent:
        exponent = exponent - 129 + 1023
    rndbits = lo & 0x7
    lo = (lo >> 3) & 0x1FFFFFFF | ((hi << 29) & 0xFFFFFFFF)
    if rndbits:
        lo |= 1
    hi = (hi >> 3) & 0x000FFFFF | (exponent << 20) | sign
    return struct.unpack("<d", struct.pack("<II", lo & 0xFFFFFFFF,
                                           hi & 0xFFFFFFFF))[0]


class _Dgn:
    def __init__(self, data: bytes):
        self.data = data
        self.scale = 1.0
        self.origin = (0.0, 0.0, 0.0)
        self.dimension = 2
        self.color_table = None

    def transform(self, x, y):
        return (x * self.scale - self.origin[0],
                y * self.scale - self.origin[1])

    def color(self, idx):
        if not 0 <= idx <= 255:
            return None
        if self.color_table is None:
            return _DEFAULT_PCT[idx]
        return tuple(int(v) for v in self.color_table[idx])


def _elements(data: bytes):
    off = 0
    n = len(data)
    while off + 4 <= n:
        if data[off] == 0xFF and data[off + 1] == 0xFF:
            return
        nwords = _u16le(data, off + 2)
        total = nwords * 2 + 4
        if off + total > n:
            return
        yield off, data[off:off + total]
        off += total


def _attr_linkages(elem: bytes):
    """Yield (link_type, raw bytes) for each attribute linkage."""
    if len(elem) < 36:
        return
    props = _u16le(elem, 32)
    if not props & 0x0800:  # DGNPF_ATTRIBUTES (dgnlib.h:688)
        return
    attr_index = _u16le(elem, 30)
    off = attr_index * 2 + 32
    attr = elem[off:]
    pos = 0
    while pos + 4 <= len(attr):
        if attr[pos] == 0 and attr[pos + 1] in (0, 0x80):
            size = 8
            ltype = 0
        elif attr[pos + 1] & 0x10:
            size = attr[pos] * 2 + 2
            ltype = attr[pos + 2] + attr[pos + 3] * 256
        else:
            return
        if size <= 4 or pos + size > len(attr):
            return
        yield ltype, attr[pos:pos + size]
        pos += size


def parse_dgn(data: bytes):
    """-> list of feature dicts (the OGR layer model: Type/Level/
    ColorIndex/Weight/Style fields, geometry, style string)."""
    dgn = _Dgn(data)
    feats = []
    for off, elem in _elements(data):
        etype = elem[1] & 0x7F
        level = elem[0] & 0x3F
        deleted = bool(elem[1] & 0x80)
        if deleted:
            continue
        if etype == 9:  # TCB
            if len(elem) >= 1264:
                dgn.dimension = 3 if elem[1214] & 0x40 else 2
                sub = _i32(elem, 1112) & 0xFFFFFFFF
                uor = _i32(elem, 1116) & 0xFFFFFFFF
                ox = vax_double(elem, 1240)
                oy = vax_double(elem, 1248)
                oz = vax_double(elem, 1256)
                if uor and sub:
                    dgn.scale = 1.0 / (uor * sub)
                    dgn.origin = (ox / (uor * sub), oy / (uor * sub),
                                  oz / (uor * sub))
            continue
        if etype == 5 and level == 1:  # color table
            ct = np.zeros((256, 3), np.uint8)
            ct[255] = tuple(elem[38:41])
            flat = np.frombuffer(elem[41:41 + 765], np.uint8)
            ct[: len(flat) // 3] = flat[: (len(flat) // 3) * 3] \
                .reshape(-1, 3)
            dgn.color_table = ct
            continue
        core = {"Type": etype, "Level": level,
                "GraphicGroup": _u16le(elem, 28) if len(elem) > 29
                else 0,
                "Style": elem[34] & 0x7 if len(elem) > 34 else 0,
                "Weight": (elem[34] & 0xF8) >> 3 if len(elem) > 34
                else 0,
                "ColorIndex": elem[35] if len(elem) > 35 else 0}
        rgb = dgn.color(core["ColorIndex"])
        pen = 'PEN(id:"ogr-pen-0"'
        if rgb:
            pen += ",c:#%02x%02x%02x" % rgb
        if core["Weight"] > 1:
            pen += ",w:%dpx" % core["Weight"]
        pen += ")"
        pntsize = dgn.dimension * 4

        if etype == 3 and len(elem) >= 52:  # LINE
            pts = [dgn.transform(_i32(elem, 36), _i32(elem, 40)),
                   dgn.transform(_i32(elem, 36 + pntsize),
                                 _i32(elem, 40 + pntsize))]
            feats.append({**core, "kind": "linestring", "pts": pts,
                          "style": pen})
        elif etype in (4, 6, 11):  # LINE_STRING / SHAPE / CURVE
            count = _u16le(elem, 36)
            pts = []
            for i in range(count):
                o = 38 + i * pntsize
                if o + 8 > len(elem):
                    break
                pts.append(dgn.transform(_i32(elem, o),
                                         _i32(elem, o + 4)))
            if etype == 6:
                style = pen
                for ltype, raw in _attr_linkages(elem):
                    if ltype == 0x0041 and len(raw) >= 9:
                        fill = dgn.color(raw[8])
                        if fill:
                            style = ('BRUSH(fc:#%02x%02x%02x,'
                                     'id:"ogr-brush-0")' % fill)
                        break
                feats.append({**core, "kind": "polygon", "pts": pts,
                              "style": style})
            else:
                feats.append({**core, "kind": "linestring",
                              "pts": pts, "style": pen})
        elif etype in (15, 16) and len(elem) >= 72:  # ELLIPSE / ARC
            primary = vax_double(elem, 36) * dgn.scale
            secondary = vax_double(elem, 44) * dgn.scale
            if etype == 15:
                startang, sweep = 0.0, 360.0
                rot = _i32(elem, 52) / 360000.0
                ox = vax_double(elem, 56)
                oy = vax_double(elem, 64)
            else:
                startang = _i32(elem, 36) / 360000.0
                sweep = _i32(elem, 40) / 360000.0 or 360.0
                primary = vax_double(elem, 44) * dgn.scale
                secondary = vax_double(elem, 52) * dgn.scale
                rot = _i32(elem, 60) / 360000.0
                ox = vax_double(elem, 64)
                oy = vax_double(elem, 72)
            cx, cy = dgn.transform(ox, oy)
            npts = int(max(1.0, abs(sweep) / 5.0) + 1.0)
            npts = min(npts, 90)
            pts = []
            step = sweep / (npts - 1) if npts > 1 else 0.0
            rotr = math.radians(rot)
            for i in range(npts):
                ang = math.radians(startang + step * i)
                ex = primary * math.cos(ang)
                ey = secondary * math.sin(ang)
                pts.append((ex * math.cos(rotr) - ey * math.sin(rotr)
                            + cx,
                            ex * math.sin(rotr) + ey * math.cos(rotr)
                            + cy))
            feats.append({**core, "kind": "linestring", "pts": pts,
                          "style": pen})
        elif etype == 17:  # TEXT
            if dgn.dimension == 2:
                num_chars = elem[58]
                height = _i32(elem, 42) * dgn.scale * 6.0 / 1000.0
                rot = _i32(elem, 46) / 360000.0
                x, y = dgn.transform(_i32(elem, 50), _i32(elem, 54))
                text_off = 60
            else:
                num_chars = elem[74]
                height = _i32(elem, 42) * dgn.scale * 6.0 / 1000.0
                rot = 0.0
                x, y = dgn.transform(_i32(elem, 62), _i32(elem, 66))
                text_off = 76
            font = elem[36]
            text = elem[text_off:text_off + num_chars] \
                .decode("latin-1")
            label = 'LABEL(t:"%s"' % text
            if rgb:
                label += ",c:#%02x%02x%02x" % rgb
            if abs(height) >= 6.0:
                label += ",s:%dg" % int(height)
            elif abs(height) > 0.1:
                label += ",s:%.3fg" % height
            else:
                label += ",s:%.12fg" % height
            label += ",f:%s" % _FONTS.get(font, f"MstnFont{font}")
            if rot != 0.0:
                label += ",a:%d" % int(rot + 0.5)
            label += ")"
            feats.append({**core, "kind": "point", "pts": [(x, y)],
                          "style": label, "Text": text})
    return feats


def read_dgn(spark, path: str):
    """Spark face -> feature DataFrame (fid, Type, Level, kind, wkb,
    bbox, style, properties JSON)."""
    import pandas as pd

    from ..geo import wkb as wkbmod
    from ..session import ship_package

    ship_package(spark)
    files = spark.read.format("binaryFile").load(path).select("content")
    schema = ("fid long, kind string, wkb binary, xmin double, "
              "ymin double, xmax double, ymax double, style string, "
              "properties string")

    def parse(batches):
        for pdf in batches:
            rows = []
            for blob in pdf["content"]:
                for fid, f in enumerate(parse_dgn(bytes(blob)),
                                        start=1):
                    pts = np.asarray(f["pts"], np.float64)
                    if f["kind"] == "point":
                        wkb = wkbmod.encode_point(pts[0, 0],
                                                  pts[0, 1])
                    elif f["kind"] == "polygon":
                        wkb = wkbmod.encode_polygon([pts])
                    else:
                        wkb = wkbmod.encode_linestring(pts)
                    props = {k: v for k, v in f.items()
                             if k not in ("pts", "kind", "style")}
                    rows.append((fid, f["kind"], wkb,
                                 float(pts[:, 0].min()),
                                 float(pts[:, 1].min()),
                                 float(pts[:, 0].max()),
                                 float(pts[:, 1].max()),
                                 f["style"], json.dumps(props)))
            yield pd.DataFrame(rows, columns=[
                "fid", "kind", "wkb", "xmin", "ymin", "xmax", "ymax",
                "style", "properties"])

    return files.mapInPandas(parse, schema=schema)
