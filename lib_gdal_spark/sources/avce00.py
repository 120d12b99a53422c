"""Arc/Info E00 (AVCE00) vector coverage source.

Reference semantics (studied, re-expressed — no code copied):
ogr/ogrsf_frmts/avc/ (avc_e00parse.cpp, ogravclayer.cpp,
ogravce00layer.cpp) —
- an exported coverage is a stream of sections: EXP header, ARC
  (id, userid, fnode, tnode, lpoly, rpoly, nvertices + vertex pairs),
  LAB (valueid, polyid, x, y + a duplicate-point box line), PAL
  (narcs + bbox, then arcId/fnode/adjPoly triplets — negative arcId
  means the arc bounds this polygon on its right), CNT, TOL/SIN
  (skipped), PRJ (..~ lines until EOP), IFO attribute tables (until
  EOI), EOS. Records terminate with an id of -1.
- coordinates parse as plain doubles from the %E text (the binary AVC
  twin would be float32 — the autotest's two WKT variants pin the
  difference; ogr_avc.py:141-146).
- layers (ogravclayer.cpp:55-135): ARC -> LineString with
  UserId/FNODE_/TNODE_/LPOLY_/RPOLY_; PAL -> Polygon with an ArcIds
  list, the ring assembled from the arcs by ENDPOINT MATCHING with
  auto-reverse starting from the first listed arc in stored direction
  (OGRBuildPolygonFromEdges bBestEffort, ogravce00layer.cpp:328), the
  universe polygon (first record) skipped; LAB -> Point with
  ValueId/PolyId; CNT -> Point with LabelIds.
- IFO tables: header `NAME [XX] nf nf width nrec`; field-def lines
  (name 16 chars + numeric codes whose 7th number is the type: 60/40
  float -> 14-char %E14.7 cells (24 for double), 50 integer -> 11
  (6 when size 2), 20 char -> `size` chars); records wrap at 80
  columns mid-field, so physical lines pad to 80 and concatenate
  before slicing. The .PAT table joins to LAB (point coverages) and
  PAL (polygon coverages) by record order; AAT's
  FNODE#/TNODE#/LPOLY#/RPOLY# duplicates are skipped like the
  reference (ogravclayer.cpp:541).

Spark face: one task per FILE, features as (layer, fid, kind, wkb,
bbox, properties JSON) — the GML/GMT house shape."""

from __future__ import annotations

import json
import re

import numpy as np
import pandas as pd

from ..geo import wkb as wkbmod

FEATURE_SCHEMA = ("layer string, fid long, kind string, wkb binary, "
                  "xmin double, ymin double, xmax double, ymax double, "
                  "properties string")
_COLS = ["layer", "fid", "kind", "wkb", "xmin", "ymin", "xmax", "ymax",
         "properties"]

_NUM_RE = re.compile(r"[-+]?\d+\.?\d*(?:[EeDd][-+]?\d+)?")


class _Stream:
    """Number stream over section lines (records wrap lines freely)."""

    def __init__(self, lines, start):
        self.lines = lines
        self.i = start
        self.buf: list[str] = []

    def _fill(self):
        while not self.buf and self.i < len(self.lines):
            self.buf = _NUM_RE.findall(self.lines[self.i])
            self.i += 1

    def ints(self, n):
        return [int(float(self.next())) for _ in range(n)]

    def floats(self, n):
        return [float(self.next().replace("D", "E").replace("d", "e"))
                for _ in range(n)]

    def next(self):
        self._fill()
        if not self.buf:
            raise ValueError("short E00 stream")
        return self.buf.pop(0)


def parse_e00_text(text: str) -> dict:
    lines = text.splitlines()
    if not lines or not lines[0].startswith("EXP"):
        raise ValueError("not an E00 payload")
    if lines[0].split()[1] not in ("0", "1"):
        pass
    out = {"arcs": {}, "arc_order": [], "labs": [], "pals": [],
           "cnts": [], "tables": {}, "prj": None}
    i = 1
    n = len(lines)
    while i < n:
        line = lines[i]
        tok = line.split()
        key = tok[0] if tok else ""
        if key == "EOS" or key == "EXP":
            break
        if key == "ARC" and len(tok) == 2:
            i = _parse_arcs(lines, i + 1, out)
        elif key == "LAB" and len(tok) == 2:
            i = _parse_labs(lines, i + 1, out)
        elif key == "PAL" and len(tok) == 2:
            i = _parse_pals(lines, i + 1, out)
        elif key == "CNT" and len(tok) == 2:
            i = _parse_cnts(lines, i + 1, out)
        elif key == "PRJ" and len(tok) == 2:
            j = i + 1
            prj = []
            while j < n and lines[j].strip() != "EOP":
                if lines[j].strip() != "~":
                    prj.append(lines[j].rstrip())
                j += 1
            out["prj"] = "\n".join(prj)
            i = j + 1
        elif key == "IFO" and len(tok) == 2:
            i = _parse_ifo(lines, i + 1, out)
        else:
            i += 1
    return out


def _parse_arcs(lines, i, out):
    s = _Stream(lines, i)
    while True:
        hdr = s.ints(7)
        if hdr[0] == -1:
            break
        aid, userid, fnode, tnode, lpoly, rpoly, nv = hdr
        pts = np.asarray(s.floats(2 * nv), np.float64).reshape(nv, 2)
        out["arcs"][aid] = {"userid": userid, "fnode": fnode,
                            "tnode": tnode, "lpoly": lpoly,
                            "rpoly": rpoly, "pts": pts}
        out["arc_order"].append(aid)
    return s.i


def _parse_labs(lines, i, out):
    s = _Stream(lines, i)
    while True:
        vid = s.ints(1)[0]
        if vid == -1:
            s.floats(3)  # terminator remainder
            break
        polyid = s.ints(1)[0]
        x, y = s.floats(2)
        s.floats(4)  # duplicate-point box
        out["labs"].append({"valueid": vid, "polyid": polyid,
                            "x": x, "y": y})
    return s.i


def _parse_pals(lines, i, out):
    s = _Stream(lines, i)
    while True:
        narcs = s.ints(1)[0]
        if narcs == -1:
            s.ints(6)
            break
        box = s.floats(4)
        trips = s.ints(3 * narcs)
        arcids = [trips[3 * k] for k in range(narcs)]
        out["pals"].append({"arcids": arcids, "box": box})
    return s.i


def _parse_cnts(lines, i, out):
    s = _Stream(lines, i)
    while True:
        nlab = s.ints(1)[0]
        if nlab == -1:
            s.ints(6)
            break
        x, y = s.floats(2)
        ids = s.ints(nlab)
        out["cnts"].append({"x": x, "y": y, "labelids": ids})
    return s.i


def _field_width(size: int, ftype: int) -> int:
    if ftype in (60, 40):
        return 24 if size == 8 else 14
    if ftype == 50:
        return 6 if size == 2 else 11
    if ftype == 10:
        return 8
    return size  # 20 = char


def _parse_ifo(lines, i, out):
    n = len(lines)
    while i < n:
        line = lines[i]
        if line.strip() == "EOI":
            return i + 1
        tok = line.split()
        if not tok:
            i += 1
            continue
        # table header: NAME [XX] nf nf width nrec
        name = tok[0]
        rest = [t for t in tok[1:] if t != "XX"]
        if len(rest) < 4:
            i += 1
            continue
        nfields, _nf2, _w, nrec = (int(rest[0]), int(rest[1]),
                                   int(rest[2]), int(rest[3]))
        i += 1
        fields = []
        for _ in range(nfields):
            fl = lines[i]
            fname = fl[:16].strip()
            nums = [int(v) for v in re.findall(r"-?\d+", fl[16:])]
            size, ftype = nums[0], nums[6]
            fields.append((fname, size, ftype,
                           _field_width(size, ftype)))
            i += 1
        total = sum(f[3] for f in fields)
        nlines = max(1, (total + 79) // 80)
        records = []
        for _ in range(nrec):
            raw = "".join(lines[i + k].ljust(80)
                          for k in range(nlines))[:total]
            i += nlines
            rec = {}
            off = 0
            for fname, _size, ftype, width in fields:
                cell = raw[off:off + width]
                off += width
                if ftype in (60, 40):
                    try:
                        rec[fname] = float(cell)
                    except ValueError:
                        rec[fname] = None
                elif ftype == 50:
                    try:
                        rec[fname] = int(cell)
                    except ValueError:
                        rec[fname] = None
                else:
                    rec[fname] = cell.strip()
            records.append(rec)
        out["tables"][name] = {"fields": [f[0] for f in fields],
                               "records": records}
    return i


def _ring_from_arcs(arcids, arcs):
    """Endpoint-matching assembly with auto-reverse, first listed arc
    in stored direction (OGRBuildPolygonFromEdges bBestEffort)."""
    edges = []
    for aid in arcids:
        a = arcs.get(abs(aid))
        if a is None or len(a["pts"]) == 0:
            continue
        edges.append(a["pts"])
    if not edges:
        return None
    ring = [edges[0]]
    used = [False] * len(edges)
    used[0] = True
    end = tuple(edges[0][-1])
    for _ in range(len(edges) - 1):
        hit = False
        for k, e in enumerate(edges):
            if used[k]:
                continue
            if tuple(e[0]) == end:
                ring.append(e)
                end = tuple(e[-1])
                used[k] = True
                hit = True
                break
            if tuple(e[-1]) == end:
                ring.append(e[::-1])
                end = tuple(e[0])
                used[k] = True
                hit = True
                break
        if not hit:
            break
    pts = [ring[0]]
    for e in ring[1:]:
        pts.append(e[1:])
    return np.vstack(pts)


def coverage_features(cov: dict):
    """Parsed coverage -> list of feature rows (the OGR layer model)."""
    rows = []
    tables = cov["tables"]
    pat = next((t for nm, t in tables.items()
                if nm.upper().endswith(".PAT")), None)
    aat = next((t for nm, t in tables.items()
                if nm.upper().endswith(".AAT")), None)
    skip_aat = {"FNODE#", "TNODE#", "LPOLY#", "RPOLY#"}

    for fid, aid in enumerate(cov["arc_order"], start=1):
        a = cov["arcs"][aid]
        props = {"UserId": a["userid"], "FNODE_": a["fnode"],
                 "TNODE_": a["tnode"], "LPOLY_": a["lpoly"],
                 "RPOLY_": a["rpoly"]}
        if aat and fid - 1 < len(aat["records"]):
            props.update({k: v for k, v in
                          aat["records"][fid - 1].items()
                          if k.upper() not in skip_aat})
        pts = a["pts"]
        rows.append(("ARC", fid, "linestring",
                     wkbmod.encode_linestring(pts),
                     float(pts[:, 0].min()), float(pts[:, 1].min()),
                     float(pts[:, 0].max()), float(pts[:, 1].max()),
                     json.dumps(props)))

    has_pal = bool(cov["pals"])
    for k, pal in enumerate(cov["pals"]):
        if k == 0:
            continue  # universe polygon
        ring = _ring_from_arcs(pal["arcids"], cov["arcs"])
        if ring is None:
            continue
        props = {"ArcIds": pal["arcids"]}
        if pat and k < len(pat["records"]):
            props.update(pat["records"][k])
        rows.append(("PAL", k + 1, "polygon",
                     wkbmod.encode_polygon([ring]),
                     float(ring[:, 0].min()), float(ring[:, 1].min()),
                     float(ring[:, 0].max()), float(ring[:, 1].max()),
                     json.dumps(props)))

    for k, lab in enumerate(cov["labs"]):
        props = {"ValueId": lab["valueid"], "PolyId": lab["polyid"]}
        if not has_pal and pat and k < len(pat["records"]):
            props.update(pat["records"][k])
        rows.append(("LAB", k + 1, "point",
                     wkbmod.encode_point(lab["x"], lab["y"]),
                     lab["x"], lab["y"], lab["x"], lab["y"],
                     json.dumps(props)))

    for k, cnt in enumerate(cov["cnts"]):
        rows.append(("CNT", k + 1, "point",
                     wkbmod.encode_point(cnt["x"], cnt["y"]),
                     cnt["x"], cnt["y"], cnt["x"], cnt["y"],
                     json.dumps({"LabelIds": cnt["labelids"]})))
    return rows


def parse_e00_bytes(blob: bytes):
    return coverage_features(
        parse_e00_text(blob.decode("latin-1")))


def read_e00(spark, path: str):
    """E00 file(s) -> feature DataFrame; one task per file."""
    from ..session import ship_package

    ship_package(spark)
    files = spark.read.format("binaryFile").load(path).select("content")

    def parse(batches):
        for pdf in batches:
            rows = []
            for blob in pdf["content"]:
                rows.extend(parse_e00_bytes(bytes(blob)))
            yield pd.DataFrame(rows, columns=_COLS)

    return files.mapInPandas(parse, schema=FEATURE_SCHEMA)
