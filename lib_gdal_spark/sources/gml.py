"""GML vector source and sink (GML 2/3 simple features, GFS-less).

Reference semantics (studied, re-expressed — no code copied):
ogr/ogrsf_frmts/gml/ (gmlreader.cpp / gmlpropertydefn.cpp /
ogrgmldatasource.cpp) —
- layers discover from featureMember / featureMembers / member
  children of the FeatureCollection root: the member's child element
  name (namespace prefix stripped) is the layer (ionic_wfs.gml ->
  "GEM", rnf_eg.gml -> "RoadSegment", bom.gml -> "CartographicText").
- fields are the feature's simple-content children; without a .gfs /
  .xsd the driver type-scans values exactly like
  GMLPropertyDefn::AnalysePropertyValue — all-integer -> Integer,
  numeric -> Real, else String (ogr_gml.py test 7 expects
  Real/Integer/String for test_point.gml).
- the fid/gml:id attribute carries the feature id; OGR derives the
  numeric FID from its trailing digits when unique (test 6's four
  prefix variants).
- geometry: first child containing a gml geometry element. GML2
  coordinates (decimal/cs/ts attributes) AND GML3 pos/posList
  (srsDimension) both parse; Polygon rings via outerBoundaryIs/
  innerBoundaryIs (GML2) or exterior/interior (GML3); Multi* via
  *Member(s) wrappers; MultiSurface/MultiCurve read as MultiPolygon/
  MultiLineString like the reference's default
  (GML_READ_MODE/ConvertToLinear paths).
- UTF-8 BOM tolerated (test 4).

The writer emits the reference's GML2 default shape: an
ogr:FeatureCollection with gml:featureMember children, fields as
ogr:-namespaced simple elements, geometry under
ogr:geometryProperty (ogrgmldatasource.cpp CreateLayer/WriteFeature
layout) — round-trips through this reader and through the KML-style
number formatting.

Spark-first: whole-document XML — one task per FILE (binaryFile ->
Arrow-batched mapInPandas), parallel across files; typed property
values live in a `properties` JSON column (Spark scans have fixed
schemas; `get_json_object` + CAST recovers typed columns, the HSTORE
pattern used across the engine).
"""

from __future__ import annotations

import json
import re
import xml.etree.ElementTree as ET

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..geo import wkb as wkbmod
from ..geo.wkt import _fmt

FEATURE_SCHEMA = ("layer string, gml_id string, fid long, kind string, "
                  "wkb binary, xmin double, ymin double, xmax double, "
                  "ymax double, properties string")

_COLS = ["layer", "gml_id", "fid", "kind", "wkb",
         "xmin", "ymin", "xmax", "ymax", "properties"]

_GEOM_TAGS = {"Point", "LineString", "Polygon", "MultiPoint",
              "MultiLineString", "MultiPolygon", "MultiSurface",
              "MultiCurve", "MultiGeometry", "Curve", "Surface",
              "LinearRing", "Box", "Envelope"}

def _is_member(tag: str) -> bool:
    """featureMember / featureMembers / member, plus application-
    schema members like osgb's cartographicMember (bom.gml)."""
    return (tag in ("member", "members")
            or tag.endswith("Member") or tag.endswith("Members"))


def _tag(el) -> str:
    t = el.tag
    return t.rsplit("}", 1)[1] if "}" in t else t


def _parse_coordinates(el) -> np.ndarray:
    """<gml:coordinates> with decimal/cs/ts attributes."""
    dec = el.attrib.get("decimal", ".")
    cs = el.attrib.get("cs", ",")
    ts = el.attrib.get("ts", " ")
    text = (el.text or "").strip()
    if not text:
        return np.empty((0, 2))
    pts = []
    for tok in re.split(r"\s+" if ts.isspace() else re.escape(ts), text):
        if not tok:
            continue
        parts = tok.split(cs)
        if len(parts) < 2:
            continue
        if dec != ".":
            parts = [p.replace(dec, ".") for p in parts]
        pts.append([float(p) for p in parts[:3]])
    width = max(len(p) for p in pts)
    return np.asarray([p + [0.0] * (width - len(p)) for p in pts],
                      dtype=np.float64)


def _parse_poslist(el, default_dim=2) -> np.ndarray:
    vals = np.array((el.text or "").split(), dtype=np.float64)
    dim = int(el.attrib.get("srsDimension", default_dim))
    if vals.size % dim:
        raise ValueError("GML posList length not divisible by dimension")
    return vals.reshape(-1, dim)


def _coords_of(el) -> np.ndarray | None:
    """Coordinate payload of a primitive geometry element."""
    for ch in el:
        t = _tag(ch)
        if t == "coordinates":
            return _parse_coordinates(ch)
        if t == "posList":
            return _parse_poslist(ch)
        if t == "pos":
            v = np.array((ch.text or "").split(), dtype=np.float64)
            return v.reshape(1, -1)
        if t == "coord":  # GML2 <coord><X>..</X><Y>..</Y></coord>
            kv = {_tag(c): float(c.text) for c in ch}
            return np.asarray(
                [[kv.get("X", 0.0), kv.get("Y", 0.0)]
                 + ([kv["Z"]] if "Z" in kv else [])])
    return None


def _ring_of(boundary) -> np.ndarray | None:
    for ch in boundary:
        if _tag(ch) == "LinearRing":
            return _coords_of(ch)
    return None


def parse_geometry(el):
    """gml geometry element -> (kind, data) in the geo/wkb decode
    convention, or None."""
    t = _tag(el)
    if t == "Point":
        c = _coords_of(el)
        if c is None or not len(c):
            return None
        return ("point", tuple(float(v) for v in c[0]))
    if t in ("LineString", "LinearRing"):
        c = _coords_of(el)
        return None if c is None else ("linestring", c)
    if t == "Curve":  # GML3 <Curve><segments><LineStringSegment>
        pts = []
        for seg_holder in el:
            if _tag(seg_holder) != "segments":
                continue
            for seg in seg_holder:
                c = _coords_of(seg)
                if c is not None and len(c):
                    pts.append(c)
        if not pts:
            return None
        out = [pts[0]]
        for p in pts[1:]:  # segments share endpoints
            out.append(p[1:] if np.array_equal(p[0], out[-1][-1]) else p)
        return ("linestring", np.vstack(out))
    if t in ("Polygon", "PolygonPatch"):
        outer, inners = None, []
        for ch in el:
            ct = _tag(ch)
            if ct in ("outerBoundaryIs", "exterior"):
                outer = _ring_of(ch)
            elif ct in ("innerBoundaryIs", "interior"):
                r = _ring_of(ch)
                if r is not None:
                    inners.append(r)
        if outer is None:
            return None
        return ("polygon", [outer] + inners)
    if t == "Surface":
        polys = []
        for holder in el:
            if _tag(holder) != "patches":
                continue
            for patch in holder:
                g = parse_geometry(patch)
                if g is not None:
                    polys.append(g[1])
        if not polys:
            return None
        if len(polys) == 1:
            return ("polygon", polys[0])
        return ("multipolygon", polys)
    if t in ("MultiPoint", "MultiLineString", "MultiPolygon",
             "MultiSurface", "MultiCurve", "MultiGeometry"):
        subs = []
        for ch in el:
            ct = _tag(ch)
            if ct.endswith("Member"):
                for g in ch:
                    sub = parse_geometry(g)
                    if sub is not None:
                        subs.append(sub)
            elif ct.endswith("Members"):
                for g in ch:
                    sub = parse_geometry(g)
                    if sub is not None:
                        subs.append(sub)
        if not subs:
            return None
        kinds = {k for k, _ in subs}
        if t == "MultiPoint" and kinds == {"point"}:
            return ("multipoint", np.asarray([d for _, d in subs]))
        if kinds == {"linestring"}:
            return ("multilinestring", [d for _, d in subs])
        if kinds <= {"polygon", "multipolygon"}:
            flat = []
            for k, d in subs:
                flat.extend([d] if k == "polygon" else d)
            return ("multipolygon", flat)
        return ("collection", subs)
    return None


def _find_geometry(feature):
    """First geometry in the feature: either a direct gml child or a
    property element wrapping one (nested search, ticket #3680)."""
    for ch in feature:
        if _tag(ch) in _GEOM_TAGS:
            g = parse_geometry(ch)
            if g is not None:
                return g
        else:
            for sub in ch.iter():
                if sub is ch:
                    continue
                if _tag(sub) in _GEOM_TAGS:
                    g = parse_geometry(sub)
                    if g is not None:
                        return g
    return None


def _flat_coords(kind, data) -> np.ndarray:
    if kind == "point":
        return np.asarray([data[:2]], dtype=np.float64)
    if kind in ("linestring", "multipoint"):
        return np.asarray(data, dtype=np.float64)[:, :2]
    if kind in ("polygon", "multilinestring"):
        return np.vstack([np.asarray(r)[:, :2] for r in data])
    if kind == "multipolygon":
        return np.vstack([np.asarray(r)[:, :2] for p in data for r in p])
    return np.vstack([_flat_coords(k, d) for k, d in data])


_INT_RE = re.compile(r"^[+-]?\d+$")
_REAL_RE = re.compile(r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$")


def infer_type(values) -> str:
    """GMLPropertyDefn::AnalysePropertyValue type scan: Integer if
    every value is an integer literal, Real if numeric, else String."""
    kind = "Integer"
    for v in values:
        if v is None:
            continue
        s = v.strip()
        if _INT_RE.match(s):
            continue
        if _REAL_RE.match(s):
            kind = "Real" if kind != "String" else "String"
        else:
            return "String"
    return kind


def _typed(val: str, kind: str):
    if val is None:
        return None
    if kind == "Integer":
        return int(val.strip())
    if kind == "Real":
        return float(val.strip())
    return val


def _collect_fields(el, fields: list, vals: dict,
                    depth: int = 0) -> None:
    """Simple-content leaves -> fields, recursing into non-geometry
    property containers so nested leaves surface by their own name
    (ticket #3680: bom.gml's textRendering/anchorPosition reads as
    field "anchorPosition")."""
    for ch in el:
        t = _tag(ch)
        if t in _GEOM_TAGS:
            continue
        if len(ch) > 0:
            if not any(_tag(s) in _GEOM_TAGS for s in ch.iter()
                       if s is not ch):
                _collect_fields(ch, fields, vals, depth + 1)
            continue
        if ch.text is None or not ch.text.strip():
            continue
        if t not in fields:
            fields.append(t)
        vals[t] = ch.text.strip()


_XSD_TYPES = {"string": "String", "integer": "Integer",
              "int": "Integer", "long": "Integer", "short": "Integer",
              "decimal": "Real", "double": "Real", "float": "Real",
              "boolean": "Integer", "date": "String",
              "dateTime": "String"}


def parse_xsd_types(xsd: bytes) -> dict[str, str]:
    """Sidecar .xsd -> {field: Integer|Real|String} from xs:element
    declarations (the reference resolves field types from the schema
    before falling back to the value scan — test_point.xsd makes
    "str" a String even though every value is an integer literal,
    ogr_gml.py test 7)."""
    root = ET.fromstring(xsd)
    out = {}
    for el in root.iter():
        if not _tag(el) == "element":
            continue
        name = el.attrib.get("name")
        if not name:
            continue
        t = el.attrib.get("type", "")
        base = t.split(":")[-1]
        if base in _XSD_TYPES:
            out[name] = _XSD_TYPES[base]
        else:
            for r in el.iter():
                if _tag(r) == "restriction":
                    rb = r.attrib.get("base", "").split(":")[-1]
                    if rb in _XSD_TYPES:
                        out[name] = _XSD_TYPES[rb]
                elif _tag(r) == "fractionDigits":
                    if r.attrib.get("value") not in (None, "0"):
                        out[name] = "Real"
    return out


def parse_gml_layers(data: bytes,
                     xsd: bytes | None = None
                     ) -> list[tuple[str, list[tuple]]]:
    """GML document -> [(layer, rows)] with per-layer field-type
    inference (overridden by a sidecar .xsd when given). Raises
    ValueError on malformed XML."""
    if data[:3] == b"\xef\xbb\xbf":  # UTF-8 BOM (test 4)
        data = data[3:]
    try:
        root = ET.fromstring(data)
    except ET.ParseError as exc:
        raise ValueError(f"malformed GML: {exc}") from exc

    feats_by_layer: dict[str, list] = {}
    order: list[str] = []
    for member in root:
        if not _is_member(_tag(member)):
            continue
        for feature in member:
            lname = _tag(feature)
            if lname not in feats_by_layer:
                feats_by_layer[lname] = []
                order.append(lname)
            feats_by_layer[lname].append(feature)

    out = []
    for lname in order:
        feats = feats_by_layer[lname]
        # ---- field scan (names in first-seen order, simple content)
        fields: list[str] = []
        raw: list[dict] = []
        for f in feats:
            vals = {}
            _collect_fields(f, fields, vals)
            raw.append(vals)
        xsd_types = parse_xsd_types(xsd) if xsd else {}
        types = {n: xsd_types.get(
            n, infer_type([v.get(n) for v in raw])) for n in fields}
        rows = []
        used_fids = set()
        for i, f in enumerate(feats):
            gid = (f.attrib.get("fid") or f.attrib.get("gml_id")
                   or next((v for k, v in f.attrib.items()
                            if k.endswith("}id") or k == "id"), None))
            m = re.search(r"(\d+)$", gid or "")
            fid = int(m.group(1)) if m else i
            while fid in used_fids:  # sequential fallback (test 6's
                fid = fid + 1        # colliding-suffix variants)
            used_fids.add(fid)
            props = {n: _typed(raw[i].get(n), types[n]) for n in fields
                     if n in raw[i]}
            pj = json.dumps(props, sort_keys=True, separators=(",", ":"))
            g = _find_geometry(f)
            if g is None:
                rows.append((lname, gid, fid, None, None,
                             None, None, None, None, pj))
                continue
            kind, gdata = g
            wkb = wkbmod.encode_geometry(kind, gdata)
            flat = _flat_coords(kind, gdata)
            rows.append((lname, gid, fid, kind, wkb,
                         float(flat[:, 0].min()), float(flat[:, 1].min()),
                         float(flat[:, 0].max()), float(flat[:, 1].max()),
                         pj))
        out.append((lname, rows))
    return out


def parse_gml_bytes(data: bytes) -> list[tuple]:
    return [r for _, rows in parse_gml_layers(data) for r in rows]


def layer_field_types(data: bytes) -> dict[str, dict[str, str]]:
    """{layer: {field: Integer|Real|String}} — the GFS-less type scan
    surface (ogr_gml.py test 7)."""
    if data[:3] == b"\xef\xbb\xbf":
        data = data[3:]
    root = ET.fromstring(data)
    acc: dict[str, dict[str, list]] = {}
    for member in root:
        if not _is_member(_tag(member)):
            continue
        for feature in member:
            lv = acc.setdefault(_tag(feature), {})
            fields, vals = [], {}
            _collect_fields(feature, fields, vals)
            for n, v in vals.items():
                lv.setdefault(n, []).append(v)
    return {ln: {f: infer_type(vs) for f, vs in fv.items()}
            for ln, fv in acc.items()}


def read_gml(spark: SparkSession, path: str) -> DataFrame:
    """GML file(s) -> feature DataFrame; one task per file."""
    from ..session import ship_package

    ship_package(spark)
    files = spark.read.format("binaryFile").load(path).select("content")

    def parse(batches):
        for pdf in batches:
            rows = []
            for blob in pdf["content"]:
                rows.extend(parse_gml_bytes(bytes(blob)))
            yield pd.DataFrame(rows, columns=_COLS)

    return files.mapInPandas(parse, schema=FEATURE_SCHEMA)


# --------------------------------------------------------------- writer

def _coords_text(pts) -> str:
    a = np.asarray(pts, dtype=np.float64)
    return " ".join(",".join(_fmt(v) for v in p) for p in a)


def geometry_to_gml(kind: str, data) -> str:
    """(kind, data) -> GML2 geometry element (the reference writer's
    default flavor)."""
    if kind == "point":
        return ("<gml:Point><gml:coordinates>"
                + _coords_text([data])
                + "</gml:coordinates></gml:Point>")
    if kind == "linestring":
        return ("<gml:LineString><gml:coordinates>"
                + _coords_text(data)
                + "</gml:coordinates></gml:LineString>")
    if kind == "polygon":
        rings = list(data)
        out = "<gml:Polygon>"
        if rings:
            out += ("<gml:outerBoundaryIs><gml:LinearRing>"
                    "<gml:coordinates>" + _coords_text(rings[0])
                    + "</gml:coordinates></gml:LinearRing>"
                    "</gml:outerBoundaryIs>")
            for r in rings[1:]:
                out += ("<gml:innerBoundaryIs><gml:LinearRing>"
                        "<gml:coordinates>" + _coords_text(r)
                        + "</gml:coordinates></gml:LinearRing>"
                        "</gml:innerBoundaryIs>")
        return out + "</gml:Polygon>"
    if kind == "multipoint":
        return ("<gml:MultiPoint>" + "".join(
            "<gml:pointMember>" + geometry_to_gml("point", tuple(p))
            + "</gml:pointMember>" for p in data) + "</gml:MultiPoint>")
    if kind == "multilinestring":
        return ("<gml:MultiLineString>" + "".join(
            "<gml:lineStringMember>" + geometry_to_gml("linestring", l)
            + "</gml:lineStringMember>" for l in data)
            + "</gml:MultiLineString>")
    if kind == "multipolygon":
        return ("<gml:MultiPolygon>" + "".join(
            "<gml:polygonMember>" + geometry_to_gml("polygon", p)
            + "</gml:polygonMember>" for p in data)
            + "</gml:MultiPolygon>")
    if kind == "collection":
        return ("<gml:MultiGeometry>" + "".join(
            "<gml:geometryMember>" + geometry_to_gml(k, d)
            + "</gml:geometryMember>" for k, d in data)
            + "</gml:MultiGeometry>")
    raise NotImplementedError(f"GML export of {kind}")


def _xesc(s) -> str:
    return (str(s).replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;"))


def gml_document(layers) -> str:
    """layers: [(name, features)] with features
    [{"geom": (kind, data)|None, "fields": {...}}] -> ogr-flavored
    GML2 FeatureCollection (the reference writer's default frame)."""
    out = ('<?xml version="1.0" encoding="utf-8" ?>\n'
           '<ogr:FeatureCollection\n'
           '     xmlns:xsi="http://www.w3.org/2001/'
           'XMLSchema-instance"\n'
           '     xmlns:ogr="http://ogr.maptools.org/"\n'
           '     xmlns:gml="http://www.opengis.net/gml">\n')
    for lname, feats in layers:
        for i, feat in enumerate(feats):
            out += "  <gml:featureMember>\n"
            out += f'    <ogr:{lname} fid="{lname}.{i}">\n'
            geom = feat.get("geom")
            if geom is not None:
                out += ("      <ogr:geometryProperty>"
                        + geometry_to_gml(*geom)
                        + "</ogr:geometryProperty>\n")
            for k, v in feat.get("fields", {}).items():
                if v is None:
                    continue
                out += (f"      <ogr:{k}>{_xesc(v)}</ogr:{k}>\n")
            out += f"    </ogr:{lname}>\n"
            out += "  </gml:featureMember>\n"
    return out + "</ogr:FeatureCollection>\n"


def write_gml(path: str, layers) -> None:
    with open(path, "w", encoding="utf-8") as f:
        f.write(gml_document(layers))
