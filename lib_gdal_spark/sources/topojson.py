"""TopoJSON vector source.

Reference semantics (studied, re-expressed — no code copied):
ogr/ogrsf_frmts/geojson/ogrtopojsonreader.cpp + the TopoJSON driver's
autotest matrix (autotest/ogr/ogr_topojson.py):
- `objects` may be an ARRAY or a DICT. A GeometryCollection with an
  `id` (array form) or its dict KEY (dict form) becomes its own layer
  carrying its member geometries; every other valid geometry object
  lands in the catch-all layer "TopoJSON" with fields (id, name).
- an object is a FEATURE only when its geometry payload key
  (`coordinates` for Point/MultiPoint, `arcs` otherwise) is present
  AND a JSON array; any malformed payload inside (null arcs, bad
  indexes, short points) degrades to the typed EMPTY geometry —
  topojson1's junk matrix enumerates exactly which inputs skip vs
  go empty.
- quantized topologies (a `transform` member) delta-decode arcs:
  position[k] = translate + scale * cumsum(deltas); point coordinates
  apply the same affine WITHOUT accumulation. Non-quantized arcs are
  absolute (topojson3).
- a negative arc index n refers to arc ~n (= -1-n) REVERSED;
  consecutive arcs share endpoints, so every arc after the first
  drops its first position.
- `id` stringifies (id 1 reads as "1"); `properties.name` likewise
  ("name": 0 reads as "0").

Spark-first: whole-document JSON — one task per FILE (binaryFile ->
mapInPandas); EMPTY geometries carry their kind with a NULL wkb.
"""

from __future__ import annotations

import json
import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..geo import wkb as wkbmod

FEATURE_SCHEMA = ("layer string, fid long, id string, name string, "
                  "kind string, wkb binary, xmin double, ymin double, "
                  "xmax double, ymax double, properties string")

_COLS = ["layer", "fid", "id", "name", "kind", "wkb",
         "xmin", "ymin", "xmax", "ymax", "properties"]

_KINDS = {"Point": "point", "LineString": "linestring",
          "Polygon": "polygon", "MultiPoint": "multipoint",
          "MultiLineString": "multilinestring",
          "MultiPolygon": "multipolygon"}


def _loads_tolerant(data: bytes):
    text = data.decode("utf-8", "replace")
    try:
        return json.loads(text)
    except json.JSONDecodeError:
        # the reference's json-c parser tolerates trailing commas
        # (topojson1.topojson carries them); strip and retry
        return json.loads(re.sub(r",(\s*[\]}])", r"\1", text))


class _Arcs:
    def __init__(self, topo: dict):
        self.raw = topo.get("arcs") or []
        t = topo.get("transform")
        self.scale = t["scale"] if isinstance(t, dict) else None
        self.translate = t["translate"] if isinstance(t, dict) else None
        self._cache: dict[int, np.ndarray | None] = {}

    def _decode(self, i: int) -> np.ndarray | None:
        if i in self._cache:
            return self._cache[i]
        out = None
        if 0 <= i < len(self.raw) and isinstance(self.raw[i], list) \
                and len(self.raw[i]) > 0:
            ok = all(isinstance(p, list) and len(p) >= 2
                     and all(isinstance(v, (int, float)) for v in p[:2])
                     for p in self.raw[i])
            if ok:
                a = np.asarray([[p[0], p[1]] for p in self.raw[i]],
                               dtype=np.float64)
                if self.scale is not None:
                    a = np.cumsum(a, axis=0)
                    a = a * np.asarray(self.scale) \
                        + np.asarray(self.translate)
                out = a
        self._cache[i] = out
        return out

    def chain(self, indexes) -> np.ndarray | None:
        """Arc index list -> joined position list (negative = ~n
        reversed; subsequent arcs drop their shared first point)."""
        if not isinstance(indexes, list) or not indexes:
            return None
        parts = []
        for n in indexes:
            if not isinstance(n, int) or isinstance(n, bool):
                return None
            a = self._decode(n if n >= 0 else -1 - n)
            if a is None:
                return None
            if n < 0:
                a = a[::-1]
            parts.append(a if not parts else a[1:])
        return np.vstack(parts)

    def point(self, coords) -> tuple[float, float] | None:
        if not isinstance(coords, list) or len(coords) < 2 \
                or not all(isinstance(v, (int, float))
                           and not isinstance(v, bool)
                           for v in coords[:2]):
            return None
        x, y = float(coords[0]), float(coords[1])
        if self.scale is not None:
            x = x * self.scale[0] + self.translate[0]
            y = y * self.scale[1] + self.translate[1]
        return (x, y)


def _geometry(obj: dict, arcs: _Arcs):
    """object -> (kind, data|None) or None when not a feature at all
    (missing / non-array payload)."""
    t = obj.get("type")
    if t not in _KINDS:
        return None
    kind = _KINDS[t]
    key = "coordinates" if t in ("Point", "MultiPoint") else "arcs"
    payload = obj.get(key)
    if not isinstance(payload, list):
        return None
    if t == "Point":
        p = arcs.point(payload)
        return (kind, p)
    if t == "MultiPoint":
        pts = [arcs.point(c) for c in payload]
        if not pts or any(p is None for p in pts):
            return (kind, None)
        return (kind, np.asarray(pts, dtype=np.float64))
    if t == "LineString":
        return (kind, arcs.chain(payload))
    if t == "MultiLineString":
        lines = [arcs.chain(ring) for ring in payload]
        if not lines or any(l is None for l in lines):
            return (kind, None)
        return (kind, lines)
    if t == "Polygon":
        rings = [arcs.chain(ring) if isinstance(ring, list) else None
                 for ring in payload]
        if not rings or any(r is None for r in rings):
            return (kind, None)
        return (kind, rings)
    if t == "MultiPolygon":
        polys = []
        for poly in payload:
            if not isinstance(poly, list) or not poly:
                return (kind, None)
            rings = [arcs.chain(ring) if isinstance(ring, list)
                     else None for ring in poly]
            if any(r is None for r in rings):
                return (kind, None)
            polys.append(rings)
        if not polys:
            return (kind, None)
        return (kind, polys)
    return None


def _flat(kind, data) -> np.ndarray:
    if kind == "point":
        return np.asarray([data[:2]], dtype=np.float64)
    if kind in ("linestring", "multipoint"):
        return np.asarray(data, dtype=np.float64)[:, :2]
    if kind in ("polygon", "multilinestring"):
        return np.vstack([np.asarray(r)[:, :2] for r in data])
    return np.vstack([np.asarray(r)[:, :2] for p in data for r in p])


def _feature_row(layer: str, fid: int, obj: dict, arcs: _Arcs):
    g = _geometry(obj, arcs)
    if g is None:
        return None
    oid = obj.get("id")
    oid = None if oid is None else str(oid)
    props = obj.get("properties")
    props = props if isinstance(props, dict) else {}
    if oid is None and "id" in props and props["id"] is not None:
        oid = str(props["id"])
    name = props.get("name")
    name = None if name is None else str(name)
    pj = json.dumps(props, sort_keys=True, separators=(",", ":"),
                    default=str)
    kind, data = g
    if data is None:
        return (layer, fid, oid, name, kind, None,
                None, None, None, None, pj)
    wkb = wkbmod.encode_geometry(kind, data)
    flat = _flat(kind, data)
    return (layer, fid, oid, name, kind, wkb,
            float(flat[:, 0].min()), float(flat[:, 1].min()),
            float(flat[:, 0].max()), float(flat[:, 1].max()), pj)


def parse_topojson_layers(data: bytes) -> list[tuple[str, list]]:
    """Topology document -> [(layer, rows)]."""
    topo = _loads_tolerant(data)
    if not isinstance(topo, dict) or topo.get("type") != "Topology":
        raise ValueError("not a TopoJSON Topology document")
    arcs = _Arcs(topo)
    objects = topo.get("objects")
    named: list[tuple[str, list]] = []
    catch_all: list = []

    def handle(obj, key=None):
        if not isinstance(obj, dict):
            return
        if obj.get("type") == "GeometryCollection":
            geoms = obj.get("geometries")
            lname = key if key is not None else obj.get("id")
            if not isinstance(geoms, list) or not geoms \
                    or lname is None:
                return
            rows = []
            for g in geoms:
                if isinstance(g, dict):
                    r = _feature_row(str(lname), len(rows), g, arcs)
                    if r is not None:
                        rows.append(r)
            named.append((str(lname), rows))
        else:
            r = _feature_row("TopoJSON", len(catch_all), obj, arcs)
            if r is not None:
                catch_all.append(r)

    if isinstance(objects, list):
        for obj in objects:
            handle(obj)
    elif isinstance(objects, dict):
        for key, obj in objects.items():
            handle(obj, key)
    out = named
    if catch_all:
        out = named + [("TopoJSON", catch_all)]
    return out


def parse_topojson_bytes(data: bytes) -> list[tuple]:
    return [r for _n, rows in parse_topojson_layers(data)
            for r in rows]


def read_topojson(spark: SparkSession, path: str) -> DataFrame:
    """TopoJSON file(s) -> feature DataFrame; one task per file."""
    from ..session import ship_package

    ship_package(spark)
    files = spark.read.format("binaryFile").load(path).select("content")

    def parse(batches):
        for pdf in batches:
            rows = []
            for blob in pdf["content"]:
                rows.extend(parse_topojson_bytes(bytes(blob)))
            yield pd.DataFrame(rows, columns=_COLS)

    return files.mapInPandas(parse, schema=FEATURE_SCHEMA)
