"""IHO S-57 ENC (electronic navigational chart) vector source.

Reference semantics (studied, re-expressed — no code copied):
ogr/ogrsf_frmts/s57/ (s57reader.cpp / ogrs57layer.cpp) over the
engine's own ISO 8211 reader (sources/iso8211.py) —
- DSPM carries COMF/SOMF: lon/lat = XCOO/YCOO / COMF, sounding =
  VE3D / SOMF.
- vector records (VRID, RCNM 110 isolated node / 120 connected node /
  130 edge) hold SG2D/SG3D coordinates and VRPT pointers (5-byte
  NAME = RCNM u8 + RCID u32le; an edge's two VRPT entries are its
  start and end connected nodes).
- feature records (FRID, RCNM 100) carry PRIM (1 point / 2 line /
  3 area), OBJL, the FOID identity (AGEN/FIDN/FIDS -> the 16-hex
  LNAM), ATTF/NATF attribute lists (ATTL code -> acronym via the
  published S-57 attribute catalogue) and FSPT spatial pointers
  (NAME + ORNT/USAG/MASK; ORNT 2 reverses the edge).
- geometry assembly: point features read their node's SG2D/SG3D
  (soundings become MultiPoint Z); line features concatenate
  start-node + SG2D + end-node per edge in FSPT order; area features
  chain the same edge runs into closed rings (exterior USAG 1 first).
- layers are the dataset's OBJL classes in ascending code order named
  by the catalogue acronym, with the DSID header first — exactly the
  autotest's expected layer table (ogr_s57.py:47-61)."""

from __future__ import annotations

import json

import numpy as np

from .iso8211 import parse_ddf
from .s57tables import ATTRIBUTES, OBJECT_CLASSES


def _name(raw: bytes):
    return raw[0], int.from_bytes(raw[1:5], "little")


def parse_s57(data: bytes) -> dict:
    """-> {dsid, comf, somf, layers: {acronym: [feature dicts]}}."""
    _fields, recs = parse_ddf(data)
    # NATF text is UCS-2LE when the dataset's NALL is 2 — re-parse
    # with the 2-byte terminator rule (GDAL's lexical-level handling)
    for r in recs[:3]:
        if "DSSI" in r and r["DSSI"][0].get("NALL") == 2:
            _fields, recs = parse_ddf(data, ucs2_tags={"NATF"})
            break
    comf = 1.0
    somf = 1.0
    dsid = None
    nodes = {}
    edges = {}
    feats = []
    for r in recs:
        if "DSID" in r:
            dsid = dict(r["DSID"][0])
            if "DSSI" in r:
                dsid.update(r["DSSI"][0])
        if "DSPM" in r:
            comf = float(r["DSPM"][0].get("COMF", 1) or 1)
            somf = float(r["DSPM"][0].get("SOMF", 1) or 1)
        if "VRID" in r:
            vr = r["VRID"][0]
            key = (vr["RCNM"], vr["RCID"])
            pts = []
            for g in r.get("SG2D", []):
                pts.append((g["XCOO"], g["YCOO"], None))
            for g in r.get("SG3D", []):
                pts.append((g["XCOO"], g["YCOO"], g["VE3D"]))
            vrpt = [( _name(g["NAME"]), g.get("ORNT", 1))
                    for g in r.get("VRPT", [])]
            nodes[key] = {"pts": pts, "vrpt": vrpt}
            if vr["RCNM"] == 130:
                edges[vr["RCID"]] = nodes[key]
        if "FRID" in r:
            fr = r["FRID"][0]
            foid = r.get("FOID", [{}])[0]
            attrs = {}
            for src, natl in ((r.get("ATTF", []), False),
                              (r.get("NATF", []), True)):
                for g in src:
                    acr = ATTRIBUTES.get(g["ATTL"],
                                         (f"ATTL{g['ATTL']}", "A"))
                    val = g["ATVL"]
                    if acr[1] == "L":  # list attribute
                        val = str(val).split(",")
                    attrs[acr[0]] = val
            fspt = [{"name": _name(g["NAME"]), "ornt": g.get("ORNT", 1),
                     "usag": g.get("USAG", 1), "mask": g.get("MASK", 1)}
                    for g in r.get("FSPT", [])]
            lnam = "%04X%08X%04X" % (foid.get("AGEN", 0),
                                     foid.get("FIDN", 0),
                                     foid.get("FIDS", 0))
            feats.append({"RCID": fr["RCID"], "PRIM": fr["PRIM"],
                          "OBJL": fr["OBJL"], "GRUP": fr.get("GRUP"),
                          "AGEN": foid.get("AGEN"),
                          "FIDN": foid.get("FIDN"),
                          "FIDS": foid.get("FIDS"), "LNAM": lnam,
                          "attrs": attrs, "fspt": fspt})

    def node_pts(key):
        v = nodes.get(key)
        return v["pts"] if v else []

    def edge_polyline(rcid, ornt):
        e = edges.get(rcid)
        if e is None:
            return []
        pts = []
        vrpt = e["vrpt"]
        if vrpt:
            pts.extend(node_pts(vrpt[0][0]))
        pts.extend(e["pts"])
        if len(vrpt) > 1:
            pts.extend(node_pts(vrpt[1][0]))
        if ornt == 2:
            pts = pts[::-1]
        return pts

    layers = {}
    for f in feats:
        acr = OBJECT_CLASSES.get(f["OBJL"], f"OBJL{f['OBJL']}")
        geom = None
        kind = None
        if f["PRIM"] == 1:
            pts = []
            for sp in f["fspt"]:
                pts.extend(node_pts(sp["name"]))
            if pts and pts[0][2] is not None:
                kind = "multipoint_z"
                geom = [(x / comf, y / comf, z / somf)
                        for x, y, z in pts]
            elif pts:
                kind = "point"
                x, y, _ = pts[0]
                geom = (x / comf, y / comf)
        elif f["PRIM"] == 2:
            parts = []
            for sp in f["fspt"]:
                rcnm, rcid = sp["name"]
                if rcnm != 130:
                    continue
                poly = edge_polyline(rcid, sp["ornt"])
                if poly:
                    parts.append([(x / comf, y / comf)
                                  for x, y, _z in poly])
            # merge consecutive edges that chain end-to-start
            merged = []
            for p in parts:
                if merged and merged[-1][-1] == p[0]:
                    merged[-1].extend(p[1:])
                else:
                    merged.append(list(p))
            if len(merged) == 1:
                kind, geom = "linestring", merged[0]
            elif merged:
                kind, geom = "multilinestring", merged
        elif f["PRIM"] == 3:
            # ring assembly by endpoint matching from the first edge's
            # STORED direction (OGRBuildPolygonFromEdges semantics —
            # ORNT is not consulted for areas), exterior (USAG != 2)
            # edges first
            def assemble(edges_pts):
                rings = []
                used = [False] * len(edges_pts)
                for s in range(len(edges_pts)):
                    if used[s] or not edges_pts[s]:
                        continue
                    ring = list(edges_pts[s])
                    used[s] = True
                    progress = True
                    while progress and ring[0] != ring[-1]:
                        progress = False
                        for j, e in enumerate(edges_pts):
                            if used[j] or not e:
                                continue
                            if e[0] == ring[-1]:
                                ring.extend(e[1:])
                            elif e[-1] == ring[-1]:
                                ring.extend(e[-2::-1])
                            else:
                                continue
                            used[j] = True
                            progress = True
                            break
                    rings.append(ring)
                return rings

            ext = []
            holes = []
            for sp in f["fspt"]:
                rcnm, rcid = sp["name"]
                if rcnm != 130:
                    continue
                poly = [(x / comf, y / comf) for x, y, _z in
                        edge_polyline(rcid, 1)]
                (holes if sp["usag"] == 2 else ext).append(poly)
            rings = assemble(ext) + assemble(holes)
            if rings:
                kind, geom = "polygon", rings
        out = dict(f)
        out.pop("fspt")
        out["kind"] = kind
        out["geom"] = geom
        layers.setdefault(acr, []).append(out)

    ordered = {}
    if dsid is not None:
        ordered["DSID"] = [dict(dsid, kind=None, geom=None)]
    for objl in sorted({f["OBJL"] for f in feats}):
        acr = OBJECT_CLASSES.get(objl, f"OBJL{objl}")
        ordered[acr] = layers.get(acr, [])
    return {"dsid": dsid, "comf": comf, "somf": somf,
            "layers": ordered}


def read_s57(spark, path: str):
    """Spark face -> feature DataFrame (layer, rcid, lnam, objl, kind,
    wkb, bbox, properties JSON)."""
    import pandas as pd

    from ..geo import wkb as wkbmod
    from ..session import ship_package

    ship_package(spark)
    files = spark.read.format("binaryFile").load(path).select("content")
    schema = ("layer string, rcid long, lnam string, objl int, "
              "kind string, wkb binary, xmin double, ymin double, "
              "xmax double, ymax double, properties string")

    def parse(batches):
        for pdf in batches:
            rows = []
            for blob in pdf["content"]:
                parsed = parse_s57(bytes(blob))
                for layer, fl in parsed["layers"].items():
                    if layer == "DSID":
                        continue
                    for f in fl:
                        if f["geom"] is None:
                            continue
                        if f["kind"] == "point":
                            wkb = wkbmod.encode_point(*f["geom"])
                            xs = [f["geom"][0]]
                            ys = [f["geom"][1]]
                        elif f["kind"] == "multipoint_z":
                            a = np.asarray(f["geom"], np.float64)
                            wkb = wkbmod.encode_multipoint(a)
                            xs, ys = a[:, 0], a[:, 1]
                        elif f["kind"] == "linestring":
                            a = np.asarray(f["geom"], np.float64)
                            wkb = wkbmod.encode_linestring(a)
                            xs, ys = a[:, 0], a[:, 1]
                        elif f["kind"] == "multilinestring":
                            wkb = wkbmod.encode_multilinestring(
                                [np.asarray(p, np.float64)
                                 for p in f["geom"]])
                            xs = [x for p in f["geom"] for x, _ in p]
                            ys = [y for p in f["geom"] for _, y in p]
                        else:
                            wkb = wkbmod.encode_polygon(
                                [np.asarray(r, np.float64)
                                 for r in f["geom"]])
                            xs = [x for r in f["geom"] for x, _ in r]
                            ys = [y for r in f["geom"] for _, y in r]
                        props = {"AGEN": f["AGEN"], "GRUP": f["GRUP"],
                                 **f["attrs"]}
                        rows.append((layer, f["RCID"], f["LNAM"],
                                     f["OBJL"], f["kind"], wkb,
                                     float(min(xs)), float(min(ys)),
                                     float(max(xs)), float(max(ys)),
                                     json.dumps(props)))
            yield pd.DataFrame(rows, columns=[
                "layer", "rcid", "lnam", "objl", "kind", "wkb",
                "xmin", "ymin", "xmax", "ymax", "properties"])

    return files.mapInPandas(parse, schema=schema)
