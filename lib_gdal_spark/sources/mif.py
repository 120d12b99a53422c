"""MapInfo MIF/MID vector source and sink (the interchange format).

Reference semantics (studied, re-expressed — no code copied):
ogr/ogrsf_frmts/mitab/mitab_feature_mif.cpp + mitab_utils.cpp —
- geometry keywords: Point / Line / Pline [MULTIPLE] / Region / Rect /
  RoundRect / Ellipse / Arc / Text / MultiPoint / Collection / None,
  with style clauses (Pen/Brush/Symbol/Font/Smooth/Center/Spacing/
  Justify/Angle/Label) trailing until the next feature keyword.
- curved shapes stroke EXACTLY like TABGenerateArc
  (mitab_utils.cpp:TABGenerateArc): numPoints samples at step
  (end-start)/(numPoints-1), then the last point DUPLICATED; Ellipse
  = 180 points over 2pi (mitab_feature_mif.cpp:1456), Arc =
  max(2, |end-start|/2 + 1) points (:1619-1630), RoundRect = four
  45-point corner arcs counterclockwise from the lower-left
  (:1301-1310), each ring closed with TABCloseRing.
- Text geometry is the rotation-adjusted lower-left corner point
  (:1878-1906): for 0<angle<90 it is (xmin + height*sin, ymin).
- multi-section Regions organize into polygon-with-holes /
  multipolygon by ring containment (OGRGeometryFactory::
  organizePolygons METHOD=DEFAULT semantics).
- MID attributes: Delimiter-separated, quotes doubled inside quoted
  strings; Columns declare Char(n)/Integer/Smallint/Float/
  Decimal(w,p)/Date/Logical types. A .mif without .mid reads with
  empty attributes (#5141).

OGR style-string synthesis (PEN(...)/BRUSH(...) render strings) is
out of scope — the raw MIF style clauses are preserved verbatim in a
`style` column instead; geometry and attributes replay the
all_geoms.mif.golden.csv WKT expectations exactly.

Spark-first: single-ASCII-file interchange format with a paired
sidecar — driver-side parse (the AAIGrid/shapefile sidecar contract),
distributed feature-table output in the engine's WKB + envelope
schema.
"""

from __future__ import annotations

import json
import math
import re

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from ..geo import wkb as wkbmod

FEATURE_SCHEMA = ("fid long, kind string, wkb binary, xmin double, "
                  "ymin double, xmax double, ymax double, "
                  "style string, properties string")

_STYLE_WORDS = ("PEN", "BRUSH", "SYMBOL", "FONT", "SMOOTH", "CENTER",
                "SPACING", "JUSTIFY", "ANGLE", "LABEL")
_FEATURE_WORDS = ("POINT", "LINE", "PLINE", "REGION", "RECT",
                  "ROUNDRECT", "ELLIPSE", "ARC", "TEXT", "MULTIPOINT",
                  "COLLECTION", "NONE")


def _tokenize(line: str) -> list[str]:
    """Whitespace tokenizer honouring double-quoted strings
    (CSLTokenizeString2 CSLT_HONOURSTRINGS)."""
    out, cur, inq = [], "", False
    for c in line:
        if c == '"':
            inq = not inq
            continue
        if not inq and c in " \t":
            if cur:
                out.append(cur)
                cur = ""
        else:
            cur += c
    if cur:
        out.append(cur)
    return out


def generate_arc(num_points: int, cx: float, cy: float, rx: float,
                 ry: float, a0: float, a1: float) -> np.ndarray:
    """TABGenerateArc: numPoints samples + the last one duplicated."""
    if a1 < a0:
        a1 += 2.0 * math.pi
    step = (a1 - a0) / (num_points - 1.0)
    ang = a0 + np.arange(num_points, dtype=np.float64) * step
    pts = np.column_stack([cx + rx * np.cos(ang), cy + ry * np.sin(ang)])
    return np.vstack([pts, pts[-1:]])


def _close_ring(pts: np.ndarray) -> np.ndarray:
    if len(pts) and (pts[0] != pts[-1]).any():
        return np.vstack([pts, pts[:1]])
    return pts


def _point_in_ring(x: float, y: float, ring: np.ndarray) -> bool:
    xs, ys = ring[:-1, 0], ring[:-1, 1]
    xe, ye = ring[1:, 0], ring[1:, 1]
    straddles = (ys > y) != (ye > y)
    with np.errstate(divide="ignore", invalid="ignore"):
        xcross = (xe - xs) * (y - ys) / (ye - ys) + xs
    cross = straddles & (x < xcross)
    return bool(np.sum(cross) % 2)


def _point_on_ring_boundary(x: float, y: float, ring: np.ndarray) -> bool:
    """OGRLinearRing::isPointOnRingBoundary re-expression
    (ogrlinearring.cpp:533): exact-zero cross product + projection
    within the segment."""
    for i in range(1, len(ring)):
        dx1, dy1 = x - ring[i, 0], y - ring[i, 1]
        dx2, dy2 = x - ring[i - 1, 0], y - ring[i - 1, 1]
        if dx1 * dy2 - dx2 * dy1 == 0:
            if dx1 == dx2 and dy1 == dy2:
                continue
            sx = ring[i, 0] - ring[i - 1, 0]
            sy = ring[i, 1] - ring[i - 1, 1]
            proj = dx2 * sx + dy2 * sy
            if 0 <= proj <= sx * sx + sy * sy:
                return True
    return False


def _ring_contains_ring(outer: np.ndarray, inner: np.ndarray) -> bool:
    """organizePolygons' DEFAULT containment walk
    (ogrgeometryfactory.cpp:2060): the outer ENVELOPE must contain the
    inner envelope, then walk inner's vertices — on-boundary points are
    inconclusive (advance), a strictly-inside point decides True, an
    outside point decides False; if every vertex sits on the boundary,
    repeat with segment midpoints."""
    if not (outer[:, 0].min() <= inner[:, 0].min()
            and outer[:, 0].max() >= inner[:, 0].max()
            and outer[:, 1].min() <= inner[:, 1].min()
            and outer[:, 1].max() >= inner[:, 1].max()):
        return False
    prev = None
    all_on_boundary = True
    for k in range(len(inner)):
        x, y = float(inner[k, 0]), float(inner[k, 1])
        if prev is not None and x == prev[0] and y == prev[1]:
            continue
        if _point_on_ring_boundary(x, y, outer):
            prev = (x, y)
            continue
        all_on_boundary = False
        return _point_in_ring(x, y, outer)
    if all_on_boundary and len(inner) > 3:
        prev = (float(inner[0, 0]), float(inner[0, 1]))
        for k in range(1, len(inner)):
            x, y = float(inner[k, 0]), float(inner[k, 1])
            if x == prev[0] and y == prev[1]:
                continue
            mx, my = (x + prev[0]) / 2.0, (y + prev[1]) / 2.0
            if not _point_on_ring_boundary(mx, my, outer):
                return _point_in_ring(mx, my, outer)
            prev = (x, y)
    return False


def organize_polygons(rings: list[np.ndarray]):
    """organizePolygons METHOD=DEFAULT re-expression: containment
    depth decides shells (even) vs holes (odd, assigned to their
    smallest containing shell)."""
    n = len(rings)
    if n == 1:
        return ("polygon", [rings[0]])
    areas = [abs(float(np.sum(
        r[:-1, 0] * r[1:, 1] - r[1:, 0] * r[:-1, 1])) / 2.0)
        for r in rings]
    depth = [0] * n
    container = [-1] * n
    for i in range(n):
        best = -1
        for j in range(n):
            if i == j or areas[j] <= areas[i]:
                continue
            if _ring_contains_ring(rings[j], rings[i]):
                depth[i] += 1
                if best < 0 or areas[j] < areas[best]:
                    best = j
        container[i] = best
    polys = {}
    for i in range(n):
        if depth[i] % 2 == 0:
            polys[i] = [rings[i]]
    for i in range(n):
        if depth[i] % 2 == 1:
            # hole: attach to the smallest containing SHELL
            j = container[i]
            while j >= 0 and depth[j] % 2 == 1:
                j = container[j]
            if j in polys:
                polys[j].append(rings[i])
    plist = list(polys.values())
    if len(plist) == 1:
        return ("polygon", plist[0])
    return ("multipolygon", plist)


class _Lines:
    def __init__(self, lines: list[str]):
        self.lines = lines
        self.i = 0

    def next(self) -> str | None:
        while self.i < len(self.lines):
            ln = self.lines[self.i]
            self.i += 1
            if ln.strip():
                return ln
        return None

    def peek(self) -> str | None:
        j = self.i
        while j < len(self.lines):
            if self.lines[j].strip():
                return self.lines[j]
            j += 1
        return None


def _is_feature_line(line: str) -> bool:
    t = line.strip().split()
    return bool(t) and t[0].upper() in _FEATURE_WORDS


def _read_styles(lines: _Lines) -> list[str]:
    """Consume trailing style clauses until the next feature line."""
    styles = []
    while True:
        nxt = lines.peek()
        if nxt is None or _is_feature_line(nxt):
            return styles
        first = nxt.strip().split()[0].upper().split("(")[0]
        if first not in _STYLE_WORDS and not first.startswith(
                tuple(w for w in _STYLE_WORDS)):
            return styles
        styles.append(lines.next().strip())


def _read_xy_block(lines: _Lines, n: int) -> np.ndarray:
    pts = np.empty((n, 2), dtype=np.float64)
    for i in range(n):
        tok = re.split(r"[ \t,]+", lines.next().strip())
        pts[i] = (float(tok[0]), float(tok[1]))
    return pts


def _parse_geometry(lines: _Lines, first: str):
    """One geometry block -> (kind, data) or None (the NONE keyword).
    Style clauses after the block are read separately."""
    tok = _tokenize(first.strip())
    kw = tok[0].upper()
    if kw == "NONE":
        return None
    if kw == "POINT":
        return ("point", (float(tok[1]), float(tok[2])))
    if kw == "LINE":
        return ("linestring",
                np.array([[float(tok[1]), float(tok[2])],
                          [float(tok[3]), float(tok[4])]]))
    if kw == "PLINE":
        multiple, nsec, npts = False, 1, None
        if len(tok) == 1:
            npts = int(lines.next())
        elif len(tok) == 2:
            npts = int(tok[1])
        elif len(tok) >= 3 and tok[1].upper().startswith("MULTIPLE"):
            multiple = True
            nsec = int(tok[2])
            npts = int(tok[3]) if len(tok) >= 4 else int(lines.next())
        if not multiple:
            return ("linestring", _read_xy_block(lines, npts))
        secs = []
        for j in range(nsec):
            if j != 0:
                npts = int(lines.next())
            secs.append(_read_xy_block(lines, npts))
        return ("multilinestring", secs)
    if kw == "REGION":
        nsec = int(tok[1]) if len(tok) == 2 else 0
        rings = []
        for _j in range(nsec):
            npts = int(lines.next())
            rings.append(_close_ring(_read_xy_block(lines, npts)))
        if not rings:
            return None
        return organize_polygons(rings)
    if kw in ("RECT", "ROUNDRECT"):
        x0, y0, x1, y1 = (float(v) for v in tok[1:5])
        xmin, xmax = min(x0, x1), max(x0, x1)
        ymin, ymax = min(y0, y1), max(y0, y1)
        if kw == "ROUNDRECT":
            if len(tok) >= 6:
                rr = float(tok[5]) / 2.0
            else:
                rr = float(_tokenize(lines.next().strip())[0]) / 2.0
            rx = min(rr, (xmax - xmin) / 2.0)
            ry = min(rr, (ymax - ymin) / 2.0)
            if rx != 0.0 and ry != 0.0:
                ring = np.vstack([
                    generate_arc(45, xmin + rx, ymin + ry, rx, ry,
                                 math.pi, 3 * math.pi / 2),
                    generate_arc(45, xmax - rx, ymin + ry, rx, ry,
                                 3 * math.pi / 2, 2 * math.pi),
                    generate_arc(45, xmax - rx, ymax - ry, rx, ry,
                                 0.0, math.pi / 2),
                    generate_arc(45, xmin + rx, ymax - ry, rx, ry,
                                 math.pi / 2, math.pi)])
                return ("polygon", [_close_ring(ring)])
        ring = np.array([[xmin, ymin], [xmax, ymin], [xmax, ymax],
                         [xmin, ymax], [xmin, ymin]])
        return ("polygon", [ring])
    if kw == "ELLIPSE":
        x0, y0, x1, y1 = (float(v) for v in tok[1:5])
        cx, cy = (x0 + x1) / 2.0, (y0 + y1) / 2.0
        rx, ry = abs(x1 - x0) / 2.0, abs(y1 - y0) / 2.0
        ring = _close_ring(
            generate_arc(180, cx, cy, rx, ry, 0.0, 2.0 * math.pi))
        return ("polygon", [ring])
    if kw == "ARC":
        x0, y0, x1, y1 = (float(v) for v in tok[1:5])
        if len(tok) == 7:
            a0, a1 = float(tok[5]), float(tok[6])
        else:
            t2 = _tokenize(lines.next().strip())
            a0, a1 = float(t2[0]), float(t2[1])
        cx, cy = (x0 + x1) / 2.0, (y0 + y1) / 2.0
        rx, ry = abs(x1 - x0) / 2.0, abs(y1 - y0) / 2.0
        if a1 < a0:
            npts = max(2, int(abs((a1 + 360.0 - a0) / 2.0) + 1))
        else:
            npts = max(2, int(abs((a1 - a0) / 2.0) + 1))
        return ("linestring",
                generate_arc(npts, cx, cy, rx, ry,
                             a0 * math.pi / 180.0, a1 * math.pi / 180.0))
    if kw == "TEXT":
        if len(tok) >= 2:
            pass  # text string on the same line
        else:
            lines.next()  # text string alone on the next line
        t2 = _tokenize(lines.next().strip())
        xmin, ymin, xmax, ymax = (float(v) for v in t2[:4])
        xmin, xmax = min(xmin, xmax), max(xmin, xmax)
        ymin, ymax = min(ymin, ymax), max(ymin, ymax)
        height = ymax - ymin
        angle = 0.0
        # peek style clauses for Angle before computing the anchor
        save = lines.i
        while True:
            nxt = lines.peek()
            if nxt is None or _is_feature_line(nxt):
                break
            t3 = nxt.strip().split()
            if t3 and t3[0].upper() == "ANGLE" and len(t3) >= 2:
                angle = float(t3[1])
            w = t3[0].upper().split("(")[0] if t3 else ""
            if w not in _STYLE_WORDS:
                break
            lines.next()
        lines.i = save
        s, c = math.sin(angle * math.pi / 180.0), \
            math.cos(angle * math.pi / 180.0)
        if s > 0.0 and c > 0.0:
            px, py = xmin + height * s, ymin
        elif s > 0.0 and c < 0.0:
            px, py = xmax, ymin - height * c
        elif s < 0.0 and c < 0.0:
            px, py = xmax + height * s, ymax
        else:
            px, py = xmin, ymax - height * s
        return ("point", (px, py))
    if kw == "MULTIPOINT":
        n = int(tok[1]) if len(tok) >= 2 else int(lines.next())
        return ("multipoint", _read_xy_block(lines, n))
    if kw == "COLLECTION":
        n = int(tok[1])
        subs = []
        for _j in range(n):
            sub_first = lines.next()
            g = _parse_geometry(lines, sub_first)
            if g is not None:
                subs.append(g)
        return ("collection", subs)
    raise ValueError(f"MIF: unknown geometry keyword {kw!r}")


_TYPE_RE = re.compile(r"^(\w+)")


def _col_type(decl: str) -> str:
    base = _TYPE_RE.match(decl).group(1).lower()
    if base in ("integer", "smallint", "largeint"):
        return "Integer"
    if base in ("float", "decimal"):
        return "Real"
    if base == "logical":
        return "Logical"
    return "String"


def _typed(v: str, t: str):
    if v == "" or v is None:
        return None
    if t == "Integer":
        return int(v)
    if t == "Real":
        return float(v)
    if t == "Logical":
        return v.upper().startswith("T")
    return v


def _split_mid_line(line: str, delim: str) -> list[str]:
    out, cur, inq = [], "", False
    i = 0
    while i < len(line):
        c = line[i]
        if c == '"':
            if inq and i + 1 < len(line) and line[i + 1] == '"':
                cur += '"'  # doubled quote
                i += 2
                continue
            inq = not inq
        elif c == delim and not inq:
            out.append(cur)
            cur = ""
        else:
            cur += c
        i += 1
    out.append(cur)
    return out


def parse_mif(mif: bytes, mid: bytes | None = None):
    """-> (columns [(name, Integer|Real|String|Logical)], rows in
    FEATURE_SCHEMA order)."""
    text = mif.decode("latin-1")
    lines = _Lines(text.splitlines())
    delim = "\t"
    columns: list[tuple[str, str]] = []
    # ---- header
    while True:
        ln = lines.next()
        if ln is None:
            raise ValueError("MIF: missing Data section")
        t = ln.strip().split()
        kw = t[0].upper()
        if kw == "DELIMITER":
            m = re.search(r'"(.*)"', ln)
            if m and m.group(1):
                delim = m.group(1)
        elif kw == "COLUMNS":
            ncol = int(t[1])
            for _i in range(ncol):
                cl = lines.next().strip()
                name, decl = cl.split(None, 1)
                columns.append((name, _col_type(decl)))
        elif kw == "DATA":
            break
    # ---- geometry stream
    geoms = []
    while True:
        ln = lines.next()
        if ln is None:
            break
        if not _is_feature_line(ln):
            continue
        g = _parse_geometry(lines, ln)
        styles = _read_styles(lines)
        geoms.append((g, styles))
    # ---- attributes
    attrs: list[dict] = []
    if mid is not None and columns:
        names = [n for n, _t in columns]
        types = [t for _n, t in columns]
        for ln in mid.decode("latin-1").splitlines():
            if not ln.strip():
                continue
            vals = _split_mid_line(ln.rstrip("\r\n"), delim)
            attrs.append({n: _typed(v, t) for n, t, v
                          in zip(names, types, vals)})
    rows = []
    for i, (g, styles) in enumerate(geoms):
        props = attrs[i] if i < len(attrs) else {}
        pj = json.dumps(props, sort_keys=True, separators=(",", ":"))
        sj = json.dumps(styles, separators=(",", ":"))
        if g is None:
            rows.append((i, None, None, None, None, None, None, sj, pj))
            continue
        kind, data = g
        wkb = wkbmod.encode_geometry(kind, data)
        flat = _flat(kind, data)
        rows.append((i, kind, wkb,
                     float(flat[:, 0].min()), float(flat[:, 1].min()),
                     float(flat[:, 0].max()), float(flat[:, 1].max()),
                     sj, pj))
    return columns, rows


def _flat(kind, data) -> np.ndarray:
    if kind == "point":
        return np.asarray([data[:2]], dtype=np.float64)
    if kind in ("linestring", "multipoint"):
        return np.asarray(data, dtype=np.float64)[:, :2]
    if kind in ("polygon", "multilinestring"):
        return np.vstack([np.asarray(r)[:, :2] for r in data])
    if kind == "multipolygon":
        return np.vstack([np.asarray(r)[:, :2] for p in data for r in p])
    return np.vstack([_flat(k, d) for k, d in data])


def read_mif(spark: SparkSession, path: str) -> DataFrame:
    """path to the .mif; the paired .mid loads when present (#5141:
    absent .mid -> empty attributes). Driver-side parse (paired-
    sidecar ASCII format), distributed feature table out."""
    import os

    with open(path, "rb") as f:
        mif = f.read()
    mid = None
    for ext in (".mid", ".MID"):
        p = os.path.splitext(path)[0] + ext
        if os.path.exists(p):
            with open(p, "rb") as f:
                mid = f.read()
            break
    _cols, rows = parse_mif(mif, mid)
    return spark.createDataFrame(rows, FEATURE_SCHEMA)


# --------------------------------------------------------------- writer

def _num(v: float) -> str:
    s = repr(float(v))
    return s[:-2] if s.endswith(".0") else s


def _mif_geometry(kind, data) -> str:
    if kind == "point":
        return f"Point {_num(data[0])} {_num(data[1])}\n"
    if kind == "linestring":
        a = np.asarray(data)
        if len(a) == 2:
            return (f"Line {_num(a[0, 0])} {_num(a[0, 1])} "
                    f"{_num(a[1, 0])} {_num(a[1, 1])}\n")
        out = f"Pline {len(a)}\n"
        return out + "".join(f"{_num(x)} {_num(y)}\n"
                             for x, y in a[:, :2])
    if kind == "multilinestring":
        out = f"Pline Multiple {len(data)}\n"
        for seg in data:
            a = np.asarray(seg)
            out += f"  {len(a)}\n"
            out += "".join(f"{_num(x)} {_num(y)}\n" for x, y in a[:, :2])
        return out
    if kind == "polygon":
        rings = list(data)
        out = f"Region {len(rings)}\n"
        for r in rings:
            a = _close_ring(np.asarray(r))
            out += f"  {len(a)}\n"
            out += "".join(f"{_num(x)} {_num(y)}\n" for x, y in a[:, :2])
        return out
    if kind == "multipolygon":
        rings = [r for p in data for r in p]
        return _mif_geometry("polygon", rings)
    if kind == "multipoint":
        a = np.asarray(data)
        return (f"MultiPoint {len(a)}\n"
                + "".join(f"{_num(x)} {_num(y)}\n" for x, y in a[:, :2]))
    if kind == "collection":
        out = f"Collection {len(data)}\n"
        return out + "".join(_mif_geometry(k, d) for k, d in data)
    raise NotImplementedError(f"MIF export of {kind}")


_MIF_TYPES = {"Integer": "Integer", "Real": "Float",
              "String": "Char (254)", "Logical": "Logical"}


def write_mif(path: str, columns, features,
              delimiter: str = ",") -> None:
    """columns: [(name, Integer|Real|String|Logical)]; features:
    [{"geom": (kind, data)|None, "fields": {...}}]. Writes the .mif
    and the paired .mid."""
    import os

    out = ("Version 300\nCharset \"Neutral\"\n"
           f"Delimiter \"{delimiter}\"\n")
    out += f"Columns {len(columns)}\n"
    for n, t in columns:
        out += f"  {n} {_MIF_TYPES.get(t, 'Char (254)')}\n"
    out += "Data\n\n"
    mid = ""
    for feat in features:
        g = feat.get("geom")
        out += _mif_geometry(*g) if g is not None else "None\n"
        out += "\n"
        vals = []
        for n, t in columns:
            v = feat.get("fields", {}).get(n)
            if v is None:
                vals.append('""' if t == "String" else "")
            elif t == "String":
                vals.append('"' + str(v).replace('"', '""') + '"')
            elif t == "Logical":
                vals.append("T" if v else "F")
            else:
                vals.append(_num(v) if t == "Real" else str(int(v)))
        mid += delimiter.join(vals) + "\n"
    with open(path, "w", encoding="latin-1") as f:
        f.write(out)
    if columns:
        with open(os.path.splitext(path)[0] + ".mid", "w",
                  encoding="latin-1") as f:
            f.write(mid)
