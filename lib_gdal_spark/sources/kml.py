"""KML vector source and sink (the reference's "old" KML driver).

Reference semantics (studied, re-expressed — no code copied):
- reader: ogr/ogrsf_frmts/kml/kml.cpp (expat handlers; per-line
  leading-whitespace strip of element content :402-476; coordinates
  tokenized on whitespace :384-420; unhandled child elements of
  name/description are re-serialized INTO the parent content with
  explicit end tags :495-503 — hence ``<br></br>`` in the
  description_with_xml.kml expectation), kmlvector.cpp:24-58 (node
  classes: container = kml/Folder/Document, feature container =
  Placemark + non-conformant Multi*, feature = Point/LineString/
  Polygon, rest = LinearRing/boundaries), kmlnode.cpp:488-690
  (geometry construction: first coordinate tuple for Point, outer/
  inner boundary rings for Polygon, recursive MultiGeometry) and
  ogrkmldatasource.cpp:146-232 (layer discovery + "Layer #N" /
  "name (#N)" naming).
- writer: ogrkmldatasource.cpp (document frame ``<Document
  id="root_doc">``), ogrkmllayer.cpp:220-298 (Schema/SimpleField),
  :307-560 (Folder per layer, ``Placemark id="layer.N"``, name /
  description elements, remaining fields as SchemaData SimpleData),
  ogr2kmlgeometry.cpp (geometry elements; a coordinate tuple is the
  WKT number pair/triple with spaces replaced by commas, tuples
  joined by single spaces).

Layer model (matches the reference's autotest expectations in
autotest/ogr/ogr_kml.py): every kml/Folder/Document element with at
least one direct Placemark child is a layer; when the file carries NO
geometry at all (hasOnlyEmpty, ogrkmldatasource.cpp:146) named empty
Folders are kept as layers too. A Placemark yields a feature iff it
has a geometry element (an empty ``<Point/>`` still counts — the
reference builds an empty OGRPoint for it; a Placemark with no
geometry element is skipped by GetNextFeature).

Spark-first recast: KML is a whole-document XML format — one task per
FILE (binaryFile -> Arrow-batched mapInPandas), parallel across files
exactly like sources/geojson.py's whole-file path; the distributed
sink writes one self-contained KML document per partition. The
single-file sink is driver-side assembly (the dimension-sized sidecar
contract, sources/shapefile.py docstring).

Output schema (engine geometry convention + KML's fixed field model):

    layer string, fid long, name string, description string,
    kind string, wkb binary, xmin double, ymin double,
    xmax double, ymax double, properties string
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

FEATURE_SCHEMA = ("layer string, fid long, name string, "
                  "description string, kind string, wkb binary, "
                  "xmin double, ymin double, xmax double, ymax double, "
                  "properties string")

_COLS = ["layer", "fid", "name", "description", "kind", "wkb",
         "xmin", "ymin", "xmax", "ymax", "properties"]

_CONTAINERS = {"kml", "Folder", "Document"}
_GEOM_TAGS = {"Point", "LineString", "Polygon", "MultiGeometry",
              "MultiPolygon", "MultiLineString", "MultiPoint"}


def _tag(el) -> str:
    """Element tag with any namespace / prefix stripped."""
    t = el.tag
    if "}" in t:
        t = t.rsplit("}", 1)[1]
    return t


def _content(el) -> str | None:
    """Element content with the reference's whitespace rule: leading
    whitespace of every line removed, blank lines dropped, lines
    joined with \\n (kml.cpp:422-476). Child elements (description
    HTML) are re-serialized inline with explicit end tags and
    attributes (kml.cpp:495-503 semantics)."""
    if el is None:
        return None
    parts = []
    if el.text:
        parts.append(el.text)
    for ch in el:
        parts.append(_serialize_inline(ch))
        if ch.tail:
            parts.append(ch.tail)
    s = "".join(parts)
    # the expat dataHandler concatenates every chunk (text + inline
    # child tags) into ONE content string (kml.cpp:516-538), so the
    # end-of-element normalization applies to mixed content too
    if not s:
        return ""
    if "\n" not in s and "\r" not in s and not s[0].isspace():
        return s
    lines = [ln.lstrip(" \t") for ln in re.split(r"[\r\n]", s)]
    return "\n".join(ln for ln in lines if ln)


def _xml_escape(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;"))


def _serialize_inline(el) -> str:
    t = _tag(el)
    attrs = "".join(f' {k}="{v}"' for k, v in el.attrib.items())
    inner = _xml_escape(el.text) if el.text else ""
    for ch in el:
        inner += _serialize_inline(ch)
        if ch.tail:
            inner += _xml_escape(ch.tail)
    return f"<{t}{attrs}>{inner}</{t}>"


def _parse_coords(text: str | None) -> np.ndarray:
    """Coordinate string -> (n, 2|3) array. Tuples are whitespace-
    separated ``lon,lat[,alt]`` (kml.cpp:384-420 tokenizer — tabs and
    newlines all split; a tuple missing lat is dropped)."""
    pts, has_z = [], False
    for tok in (text or "").split():
        parts = tok.split(",")
        if len(parts) < 2:
            continue
        try:
            x, y = float(parts[0]), float(parts[1])
        except ValueError:
            continue
        z = 0.0
        if len(parts) >= 3 and parts[2] != "":
            try:
                z = float(parts[2])
                has_z = True
            except ValueError:
                z = 0.0
        pts.append((x, y, z))
    if not pts:
        return np.empty((0, 2), dtype=np.float64)
    a = np.asarray(pts, dtype=np.float64)
    return a if has_z else a[:, :2]


def _find_child(el, tag: str):
    for ch in el:
        if _tag(ch) == tag:
            return ch
    return None


def _ring_from_boundary(bound) -> np.ndarray | None:
    """outerBoundaryIs/innerBoundaryIs -> ring coords (first child's
    coordinates, kmlnode.cpp:556-566: the FIRST child is taken)."""
    kids = list(bound)
    if not kids:
        return None
    coor = _find_child(kids[0], "coordinates")
    if coor is None:
        return None
    r = _parse_coords(coor.text)
    return r if len(r) else None


def geometry_from_element(el):
    """KML geometry element -> (kind, data) in the geo/wkb decode
    convention, or None when the element is not a geometry. Empty
    geometry elements return (kind, None) — a feature with a NULL
    geometry payload (the reference's empty OGRPoint/OGRPolygon)."""
    t = _tag(el)
    if t == "Point":
        coor = _find_child(el, "coordinates")
        pts = _parse_coords(coor.text if coor is not None else None)
        if len(pts) == 0:
            return ("point", None)
        return ("point", tuple(float(v) for v in pts[0]))
    if t == "LineString":
        pts = []
        for coor in el:
            if _tag(coor) == "coordinates":
                c = _parse_coords(coor.text)
                if len(c):
                    pts.append(c)
        if not pts:
            return ("linestring", None)
        width = max(p.shape[1] for p in pts)
        pts = [np.column_stack([p, np.zeros(len(p))])
               if p.shape[1] < width else p for p in pts]
        return ("linestring", np.vstack(pts))
    if t == "Polygon":
        outer = None
        for ch in el:
            if _tag(ch) == "outerBoundaryIs" and len(ch):
                outer = _ring_from_boundary(ch)
        if outer is None:
            return ("polygon", None)
        rings = [outer]
        for ch in el:
            if _tag(ch) == "innerBoundaryIs":
                r = _ring_from_boundary(ch)
                if r is not None:
                    rings.append(r)
        return ("polygon", rings)
    if t in ("MultiGeometry", "MultiPolygon", "MultiLineString",
             "MultiPoint"):
        subs = []
        for ch in el:
            g = geometry_from_element(ch)
            if g is not None and g[1] is not None:
                subs.append(g)
        if not subs:
            return ("collection", None)
        kinds = {k for k, _ in subs}
        if kinds == {"point"}:
            return ("multipoint", np.asarray([d for _, d in subs]))
        if kinds == {"linestring"}:
            return ("multilinestring", [d for _, d in subs])
        if kinds == {"polygon"}:
            return ("multipolygon", [d for _, d in subs])
        return ("collection", subs)
    return None


def _flat_coords(kind: str, data) -> np.ndarray:
    if kind == "point":
        return np.asarray([data[:2]], dtype=np.float64)
    if kind in ("linestring", "multipoint"):
        return np.asarray(data, dtype=np.float64)[:, :2]
    if kind in ("polygon", "multilinestring"):
        return np.vstack([np.asarray(r)[:, :2] for r in data])
    if kind == "multipolygon":
        return np.vstack([np.asarray(r)[:, :2]
                          for p in data for r in p])
    return np.vstack([_flat_coords(k, d) for k, d in data])


def _placemark_row(layer: str, fid: int, pm) -> tuple | None:
    """Placemark -> row, or None when it has no geometry element
    (GetNextFeature's skip — geometry-less placemarks never surface,
    so emptylayers.kml / folder_with_subfolder_placemark.kml count 0
    features)."""
    geom = None
    for ch in pm:
        if _tag(ch) in _GEOM_TAGS:
            geom = geometry_from_element(ch)
            if geom is not None:
                break
    if geom is None:
        return None
    # missing name/description read as "" — the reference's string
    # fields default to the empty string (ogr_kml.py attributes_2/4)
    name = _content(_find_child(pm, "name")) or ""
    desc = _content(_find_child(pm, "description")) or ""
    props = {}
    ext = _find_child(pm, "ExtendedData")
    if ext is not None:
        holders = [ext] + [ch for ch in ext if _tag(ch) == "SchemaData"]
        for holder in holders:
            for d in holder:
                dt = _tag(d)
                if dt == "SimpleData" and "name" in d.attrib:
                    props[d.attrib["name"]] = (d.text or "")
                elif dt == "Data" and "name" in d.attrib:
                    v = _find_child(d, "value")
                    props[d.attrib["name"]] = (
                        v.text or "") if v is not None else ""
    kind, data = geom
    if data is None:
        return (layer, fid, name, desc, kind, None,
                None, None, None, None,
                json.dumps(props, sort_keys=True, separators=(",", ":")))
    wkb = wkbmod.encode_geometry(kind, data)
    flat = _flat_coords(kind, data)
    return (layer, fid, name, desc, kind, wkb,
            float(flat[:, 0].min()), float(flat[:, 1].min()),
            float(flat[:, 0].max()), float(flat[:, 1].max()),
            json.dumps(props, sort_keys=True, separators=(",", ":")))


def _has_any_geometry(root) -> bool:
    for el in root.iter():
        if _tag(el) in ("Point", "LineString", "Polygon", "LinearRing"):
            return True
    return False


def parse_kml_layers(data: bytes) -> list[tuple[str, list[tuple]]]:
    """One KML document -> [(layer_name, feature_rows)] — layer
    discovery per ogrkmldatasource.cpp:146-232. Raises ValueError on
    malformed XML (truncated.kml / junk_content_after_valid_doc.kml —
    the reference errors on both)."""
    try:
        root = ET.fromstring(data)
    except ET.ParseError as exc:
        raise ValueError(f"malformed KML: {exc}") from exc

    keep_empty = not _has_any_geometry(root)
    layers: list[tuple[str, list]] = []
    seen: dict[str, int] = {}
    counter = [0]

    def layer_name(container) -> str:
        nm = _content(_find_child(container, "name")) or ""
        if not nm:
            nm = f"Layer #{counter[0]}"
        n = seen.get(nm, 0)
        seen[nm] = n + 1
        return nm if n == 0 else f"{nm} (#{n + 1})"

    def walk(el):
        if _tag(el) not in _CONTAINERS:
            return
        pms = [ch for ch in el if _tag(ch) == "Placemark"]
        is_layer = bool(pms)
        if not is_layer and keep_empty and _tag(el) == "Folder" \
                and len(el) > 0 \
                and not any(_tag(ch) in _CONTAINERS for ch in el):
            is_layer = True  # named empty Folder (emptylayers.kml)
        if is_layer:
            layers.append((layer_name(el), pms))
            counter[0] += 1
        for ch in el:
            walk(ch)

    walk(root)
    out = []
    for lname, pms in layers:
        rows, fid = [], 0
        for pm in pms:
            r = _placemark_row(lname, fid, pm)
            if r is not None:
                rows.append(r)
                fid += 1
        out.append((lname, rows))
    return out


def parse_kml_bytes(data: bytes) -> list[tuple]:
    """One KML document -> flat feature rows (the Spark reader's
    per-file kernel)."""
    return [r for _, rows in parse_kml_layers(data) for r in rows]


def read_kml(spark: SparkSession, path: str) -> DataFrame:
    """KML file(s) -> feature DataFrame. One task per file
    (binaryFile), parallel across files — the same whole-document
    constraint as sources/geojson.py's read_geojson."""
    from ..session import ship_package

    ship_package(spark)
    files = spark.read.format("binaryFile").load(path).select("content")

    def parse(batches):
        for pdf in batches:
            rows = []
            for blob in pdf["content"]:
                rows.extend(parse_kml_bytes(bytes(blob)))
            yield pd.DataFrame(rows, columns=_COLS)

    return files.mapInPandas(parse, schema=FEATURE_SCHEMA)


# --------------------------------------------------------------- writer

def _kml_coord(pt) -> str:
    """One coordinate tuple: WKT numbers, spaces -> commas
    (ogr2kmlgeometry.cpp:34-118 MakeKMLCoordinate; the [-180,180] /
    [-90,90] clamps apply to write-time output)."""
    x, y = float(pt[0]), float(pt[1])
    if 180 < x < 180 + 1e-8:
        x = 180.0
    elif -180 - 1e-8 < x < -180:
        x = -180.0
    if 90 < y < 90 + 1e-8:
        y = 90.0
    elif -90 - 1e-8 < y < -90:
        y = -90.0
    if len(pt) >= 3:
        return f"{_fmt(x)},{_fmt(y)},{_fmt(float(pt[2]))}"
    return f"{_fmt(x)},{_fmt(y)}"


def _coord_list(pts) -> str:
    a = np.asarray(pts, dtype=np.float64)
    return ("<coordinates>"
            + " ".join(_kml_coord(p) for p in a)
            + "</coordinates>")


def geometry_to_kml(kind: str, data) -> str:
    """(kind, data) -> KML geometry element string
    (ogr2kmlgeometry.cpp:150-392 element layout)."""
    if data is None:
        return {"point": "<Point/>", "linestring": "<LineString/>",
                "polygon": "<Polygon/>"}.get(kind, "<MultiGeometry/>")
    if kind == "point":
        return f"<Point>{_coord_list([data])}</Point>"
    if kind == "linestring":
        return f"<LineString>{_coord_list(data)}</LineString>"
    if kind == "polygon":
        out = "<Polygon>"
        rings = list(data)
        if rings:
            out += ("<outerBoundaryIs><LinearRing>"
                    + _coord_list(rings[0])
                    + "</LinearRing></outerBoundaryIs>")
            for r in rings[1:]:
                out += ("<innerBoundaryIs><LinearRing>" + _coord_list(r)
                        + "</LinearRing></innerBoundaryIs>")
        return out + "</Polygon>"
    if kind == "multipoint":
        subs = [geometry_to_kml("point", tuple(p)) for p in data]
    elif kind == "multilinestring":
        subs = [geometry_to_kml("linestring", l) for l in data]
    elif kind == "multipolygon":
        subs = [geometry_to_kml("polygon", p) for p in data]
    elif kind == "collection":
        subs = [geometry_to_kml(k, d) for k, d in data]
    else:
        raise NotImplementedError(f"KML export of {kind}")
    return "<MultiGeometry>" + "".join(subs) + "</MultiGeometry>"


_KML_TYPES = {"int": "int", "float": "float", "string": "string"}


def _schema_block(layer: str, fields) -> str:
    out = f'<Schema name="{layer}" id="{layer}">\n'
    for fname, ftype in fields:
        kt = _KML_TYPES.get(ftype, "string")
        out += (f'\t<SimpleField name="{fname}" type="{kt}">'
                f"</SimpleField>\n")
    return out + "</Schema>\n"


def _placemark_block(layer: str, n: int, feat: dict, fields,
                     name_field: str, desc_field: str) -> str:
    out = f'  <Placemark id="{layer}.{n}">\n'
    vals = feat.get("fields", {})
    nm = vals.get(name_field)
    if nm is not None:
        out += f"    <name>{_xml_escape(str(nm).lstrip())}</name>\n"
    ds = vals.get(desc_field)
    if ds is not None:
        out += (f"    <description>{_xml_escape(str(ds).lstrip())}"
                "</description>\n")
    others = [(fn, ft) for fn, ft in fields
              if fn not in (name_field, desc_field)
              and vals.get(fn) is not None]
    if others:
        out += f'\t<ExtendedData><SchemaData schemaUrl="#{layer}">\n'
        for fn, ft in others:
            raw = str(vals[fn]).lstrip()
            if ft != "float":
                raw = _xml_escape(raw)
            out += (f'\t\t<SimpleData name="{fn}">{raw}'
                    "</SimpleData>\n")
        out += "\t</SchemaData></ExtendedData>\n"
    geom = feat.get("geom")
    if geom is not None:
        out += "      " + geometry_to_kml(*geom) + "\n"
    return out + "  </Placemark>\n"


def kml_document(layers, name_field: str = "Name",
                 desc_field: str = "description") -> str:
    """layers: [(layer_name, fields, features)] -> full KML document
    text. fields: [(name, 'int'|'float'|'string')]; features:
    [{"geom": (kind, data)|None, "fields": {...}}]. Byte-layout
    matches the reference writer at line granularity (the autotest
    compare_output contract — ogr_kml.py:534-540 strips indentation):
    single layer -> Schema then Folder (ogrkmllayer.cpp:325-334);
    several layers -> Folders in order, deferred Schemas at the end
    (the two_layers golden)."""
    head = ('<?xml version="1.0" encoding="utf-8" ?>\n'
            '<kml xmlns="http://www.opengis.net/kml/2.2">\n'
            '<Document id="root_doc">\n')
    body = ""
    deferred = ""
    single = len(layers) == 1
    for lname, fields, feats in layers:
        schema = _schema_block(lname, fields) if fields and feats else ""
        if schema and single:
            body += schema
        elif schema:
            deferred += schema
        body += f"<Folder><name>{lname}</name>\n"
        for i, feat in enumerate(feats):
            body += _placemark_block(lname, i + 1, feat, fields,
                                     name_field, desc_field)
        body += "</Folder>\n"
    return head + body + deferred + "</Document></kml>"


def write_kml(path: str, layers, name_field: str = "Name",
              desc_field: str = "description") -> None:
    """Single-file sink (driver-side assembly — KML is one XML
    document, the same sidecar-shaped contract as write_shapefile)."""
    with open(path, "w", encoding="utf-8") as f:
        f.write(kml_document(layers, name_field, desc_field))


def write_kml_parts(df: DataFrame, out_dir: str,
                    layer: str = "layer") -> None:
    """Distributed sink: one self-contained KML document per
    partition (part-NNNN.kml), features carried as (kind from `kind`,
    geometry from `wkb`, Name/description columns when present).
    Scales with partition count; `coalesce(1)` upstream for a single
    file."""
    import os

    from ..session import ship_package

    ship_package(df.sparkSession)
    cols = df.columns

    def fmt(iterator):
        import uuid
        for pdf in iterator:
            feats = []
            for _, row in pdf.iterrows():
                kd = wkbmod.decode(bytes(row["wkb"])) \
                    if row.get("wkb") is not None else None
                fields = {}
                if "name" in cols and row.get("name") is not None:
                    fields["Name"] = row["name"]
                if "description" in cols \
                        and row.get("description") is not None:
                    fields["description"] = row["description"]
                feats.append({"geom": kd, "fields": fields})
            doc = kml_document([(layer, [("Name", "string"),
                                         ("description", "string")],
                                 feats)])
            name = f"part-{uuid.uuid4().hex[:12]}.kml"
            with open(os.path.join(out_dir, name), "w",
                      encoding="utf-8") as f:
                f.write(doc)
            yield pd.DataFrame({"n": [len(feats)]})

    os.makedirs(out_dir, exist_ok=True)
    df.mapInPandas(fmt, schema="n long").collect()
