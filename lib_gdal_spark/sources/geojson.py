"""GeoJSON / GeoJSONSeq vector source and sink.

Reference: the GeoJSON driver family
(/root/reference/ogr/ogrsf_frmts/geojson/ — ogrgeojsondataource.cpp et
al.): RFC 7946 FeatureCollections plus the GeoJSONSeq variant (one
Feature per line, optionally RS/0x1e-prefixed per RFC 8142 — the
streaming form the reference exposes as a separate driver).

Spark-first recast:
- **GeoJSONSeq is the scale path**: `spark.read.text` line-splits the
  input across executors, so a 100 TB feature stream parses fully in
  parallel; each line is an independent JSON document (stdlib json
  inside an Arrow-batched mapInPandas — no JVM-side schema inference
  fight with the heterogeneous `coordinates` nesting).
- **Plain GeoJSON** (one FeatureCollection per file) is inherently a
  whole-document format: read via `binaryFile`, one task per FILE —
  parallel across files, sequential within one (documented; the
  reference has the same constraint, it streams the file on one core).

Output schema (the engine's geometry convention — WKB binary + the
materialized envelope doubles used for Catalyst bbox predicates and
parquet min/max skipping, geo/wkb.py docstring):

    fid long, kind string, wkb binary,
    xmin double, ymin double, xmax double, ymax double,
    properties string   -- canonical JSON (sorted keys) for
                        -- get_json_object extraction (HSTORE pattern)

fid: the feature's "id" member when integer-valued, else null (the seq
form has no document order to number by — the reference's FID-less
behavior); the whole-file reader numbers features 0..n-1 in document
order per file.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..geo import wkb as wkbmod

FEATURE_SCHEMA = ("fid long, kind string, wkb binary, xmin double, "
                  "ymin double, xmax double, ymax double, properties string")

_RS = "\x1e"


def geometry_to_wkb(geom: dict) -> tuple[str, bytes, np.ndarray]:
    """GeoJSON geometry object -> (kind, wkb, flat (n,2) coords)."""
    t = geom["type"]
    c = geom.get("coordinates")
    if t == "Point":
        pts = np.asarray([c], dtype=np.float64)
        return "point", wkbmod.encode_point(float(c[0]), float(c[1])), pts
    if t == "LineString":
        pts = np.asarray(c, dtype=np.float64)
        return "linestring", wkbmod.encode_linestring(pts), pts
    if t == "Polygon":
        rings = [np.asarray(r, dtype=np.float64) for r in c]
        return "polygon", wkbmod.encode_polygon(rings), np.vstack(rings)
    if t == "MultiPoint":
        pts = np.asarray(c, dtype=np.float64)
        return "multipoint", wkbmod.encode_multipoint(pts), pts
    if t == "MultiLineString":
        lines = [np.asarray(l, dtype=np.float64) for l in c]
        return ("multilinestring", wkbmod.encode_multilinestring(lines),
                np.vstack(lines))
    if t == "MultiPolygon":
        polys = [[np.asarray(r, dtype=np.float64) for r in p] for p in c]
        flat = np.vstack([r for p in polys for r in p])
        return "multipolygon", wkbmod.encode_multipolygon(polys), flat
    if t == "GeometryCollection":
        parts, flats = [], []
        for sub in geom["geometries"]:
            _, w, f = geometry_to_wkb(sub)
            parts.append(w)
            flats.append(f)
        return ("collection", wkbmod.encode_collection(parts),
                np.vstack(flats) if flats else np.empty((0, 2)))
    raise NotImplementedError(f"GeoJSON geometry type {t!r}")


def _feature_row(feat: dict, fid=None):
    geom = feat.get("geometry")
    if geom is None:
        return None
    kind, wkb, flat = geometry_to_wkb(geom)
    fx = feat.get("id", fid)
    fx = int(fx) if isinstance(fx, (int, np.integer)) and not isinstance(
        fx, bool) else (fid if isinstance(fid, int) else None)
    props = json.dumps(feat.get("properties") or {}, sort_keys=True,
                       separators=(",", ":"))
    return (fx, kind, wkb,
            float(flat[:, 0].min()), float(flat[:, 1].min()),
            float(flat[:, 0].max()), float(flat[:, 1].max()), props)


_COLS = ["fid", "kind", "wkb", "xmin", "ymin", "xmax", "ymax", "properties"]


def _parse_lines(batches):
    """Shared GeoJSONSeq line-parse closure (batch + streaming)."""
    for pdf in batches:
        rows = []
        for line in pdf["value"]:
            s = line.lstrip(_RS).strip()
            if not s:
                continue
            obj = json.loads(s)
            if obj.get("type") == "FeatureCollection":  # tolerated mix
                rows.extend(r for f in obj["features"]
                            if (r := _feature_row(f)) is not None)
            else:
                r = _feature_row(obj)
                if r is not None:
                    rows.append(r)
        yield pd.DataFrame(rows, columns=_COLS)


def read_geojson_seq(spark: SparkSession, path: str) -> DataFrame:
    """GeoJSONSeq (newline-delimited Features, optional RS prefix) ->
    feature DataFrame. Fully distributed: text line-split, Arrow-batched
    stdlib-json parse."""
    from ..session import ship_package

    ship_package(spark)  # the parse closure imports this module on workers
    return spark.read.text(path).mapInPandas(_parse_lines,
                                             schema=FEATURE_SCHEMA)


def read_geojson_seq_stream(spark: SparkSession, path: str) -> DataFrame:
    """Structured-Streaming twin of read_geojson_seq: readStream.text
    over a directory new GeoJSONSeq files land in (the crawl-ingest
    shape — the reference's driver streams the same format one feature
    at a time, ogrgeojsonseq 'sequence' semantics). Same parse closure,
    same feature schema; compose with watermarks / stateful dedup
    downstream (streaming/stateful.py)."""
    from ..session import ship_package

    ship_package(spark)
    return spark.readStream.text(path).mapInPandas(_parse_lines,
                                                   schema=FEATURE_SCHEMA)


def read_geojson(spark: SparkSession, path: str) -> DataFrame:
    """Whole-file FeatureCollection(s) -> feature DataFrame; fid is the
    0-based document order within each file. One task per file
    (binaryFile) — parallel across files."""
    from ..session import ship_package

    ship_package(spark)
    files = spark.read.format("binaryFile").load(path) \
        .select("content")

    def parse(batches):
        for pdf in batches:
            rows = []
            for blob in pdf["content"]:
                obj = json.loads(bytes(blob).decode("utf-8"))
                feats = (obj["features"]
                         if obj.get("type") == "FeatureCollection"
                         else [obj])
                for i, f in enumerate(feats):
                    r = _feature_row(f, fid=i)
                    if r is not None:
                        rows.append(r)
            yield pd.DataFrame(rows, columns=_COLS)

    return files.mapInPandas(parse, schema=FEATURE_SCHEMA)


def _wkb_to_geometry(kind: str, buf: bytes) -> dict:
    k, data = wkbmod.decode(bytes(buf))
    if k == "point":
        return {"type": "Point", "coordinates": [data[0], data[1]]}
    if k == "linestring":
        return {"type": "LineString", "coordinates": data.tolist()}
    if k == "polygon":
        return {"type": "Polygon",
                "coordinates": [r.tolist() for r in data]}
    if k == "multipoint":
        return {"type": "MultiPoint", "coordinates": data.tolist()}
    if k == "multilinestring":
        return {"type": "MultiLineString",
                "coordinates": [l.tolist() for l in data]}
    if k == "multipolygon":
        return {"type": "MultiPolygon",
                "coordinates": [[r.tolist() for r in p] for p in data]}
    if k == "collection":
        return {"type": "GeometryCollection",
                "geometries": [_wkb_to_geometry(sk, _reencode(sk, sd))
                               for sk, sd in data]}
    raise NotImplementedError(k)


def _reencode(kind: str, data) -> bytes:
    if kind == "point":
        return wkbmod.encode_point(*data)
    if kind == "linestring":
        return wkbmod.encode_linestring(data)
    if kind == "polygon":
        return wkbmod.encode_polygon(data)
    if kind == "multipoint":
        return wkbmod.encode_multipoint(data)
    if kind == "multilinestring":
        return wkbmod.encode_multilinestring(data)
    if kind == "multipolygon":
        return wkbmod.encode_multipolygon(data)
    raise NotImplementedError(kind)


def write_geojson_seq(df: DataFrame, path: str) -> None:
    """Feature DataFrame (FEATURE_SCHEMA subset: kind, wkb, properties,
    optional fid) -> GeoJSONSeq part files (the distributed sink shape;
    `coalesce(1)` upstream for a single file)."""
    from ..session import ship_package

    ship_package(df.sparkSession)
    has_fid = "fid" in df.columns
    cols = ["kind", "wkb", "properties"] + (["fid"] if has_fid else [])

    def fmt(batches):
        for pdf in batches:
            out = []
            for row in pdf[cols].itertuples(index=False):
                feat = {"type": "Feature",
                        "geometry": _wkb_to_geometry(row.kind, row.wkb),
                        "properties": json.loads(row.properties)
                        if row.properties else {}}
                if has_fid and row.fid is not None and not pd.isna(row.fid):
                    feat["id"] = int(row.fid)
                out.append(json.dumps(feat, sort_keys=True,
                                      separators=(",", ":")))
            yield pd.DataFrame({"value": out})

    df.select(*cols).mapInPandas(fmt, schema="value string") \
        .write.mode("overwrite").text(path)
