"""GPX vector source and sink (GPS exchange format).

Reference semantics (studied, re-expressed — no code copied):
- reader: ogr/ogrsf_frmts/gpx/ogrgpxlayer.cpp (five fixed layers —
  waypoints / routes / tracks / route_points / track_points — with the
  GPX 1.1 field sets; routes stroke their rtept chain to a LINESTRING,
  tracks their trkseg chains to a MULTILINESTRING with point-less
  segments dropped: autotest expects MULTILINESTRING EMPTY for both
  the no-trkseg and the empty-trkseg track, ogr_gpx.py:146-162;
  link1_*/link2_* expose the first two <link> children).
- writer: ogrgpxlayer.cpp:1161-1640 — wpt/rte/trk elements must be
  written in that order; route_points/track_points rows GROUP into
  rte/trkseg elements on route_fid / (track_fid, track_seg_id)
  changes, taking <name> from the group's FIRST row (the
  ogr_gpx_8_ref.txt byte-golden); coordinates format through
  OGRFormatDouble (%.15f with trailing zeros trimmed, at least one
  decimal kept — "49.0"); indent layout per the PrintLine/AddIdent
  calls (rtept at 2 spaces, trkpt at 4, trkpt ele at 8).

Spark-first recast: whole-document XML — one task per FILE
(binaryFile -> Arrow-batched mapInPandas), parallel across files; the
five layers are five DataFrame shapes over the same parse. Extension
elements land in a `properties` JSON column instead of dynamic
columns (Spark schemas are fixed per scan).
"""

from __future__ import annotations

import json
import xml.etree.ElementTree as ET

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..geo import wkb as wkbmod

# GPX 1.1 wpt children surfaced as fields (ogrgpxlayer.cpp field
# definitions; ele/magvar/geoidheight/hdop/vdop/pdop/ageofdgpsdata are
# doubles, sat/dgpsid ints, the rest strings)
_WPT_DOUBLE = ["ele", "magvar", "geoidheight", "hdop", "vdop", "pdop",
               "ageofdgpsdata"]
_WPT_INT = ["sat", "dgpsid"]
_WPT_STR = ["time", "name", "cmt", "desc", "src", "sym", "type", "fix"]
_LINKS = ["link1_href", "link1_text", "link1_type",
          "link2_href", "link2_text", "link2_type"]

_RTE_STR = ["name", "cmt", "desc", "src", "type"]
_RTE_INT = ["number"]

_POINT_COLS = (_WPT_DOUBLE + _WPT_INT + _WPT_STR + _LINKS)
_LINE_COLS = (_RTE_STR + _RTE_INT + _LINKS)


def _schema(prefix_cols: list[tuple[str, str]]) -> str:
    parts = [f"{n} {t}" for n, t in prefix_cols]
    for c in _WPT_DOUBLE:
        parts.append(f"{c} double")
    for c in _WPT_INT:
        parts.append(f"{c} long")
    for c in _WPT_STR + _LINKS:
        parts.append(f"{c} string")
    parts += ["wkb binary", "xmin double", "ymin double",
              "xmax double", "ymax double", "properties string"]
    return ", ".join(parts)


def _line_schema(prefix_cols: list[tuple[str, str]]) -> str:
    parts = [f"{n} {t}" for n, t in prefix_cols]
    for c in _RTE_STR:
        parts.append(f"{c} string")
    for c in _RTE_INT:
        parts.append(f"{c} long")
    for c in _LINKS:
        parts.append(f"{c} string")
    parts += ["wkb binary", "xmin double", "ymin double",
              "xmax double", "ymax double", "properties string"]
    return ", ".join(parts)


LAYER_SCHEMAS = {
    "waypoints": _schema([("wpt_id", "long")]),
    "route_points": _schema([("route_fid", "long"),
                             ("route_point_id", "long")]),
    "track_points": _schema([("track_fid", "long"),
                             ("track_seg_id", "long"),
                             ("track_seg_point_id", "long")]),
    "routes": _line_schema([("route_fid", "long")]),
    "tracks": _line_schema([("track_fid", "long")]),
}

LAYERS = tuple(LAYER_SCHEMAS)


def _tag(el) -> str:
    t = el.tag
    return t.rsplit("}", 1)[1] if "}" in t else t


def _children(el):
    return {(_tag(c)): c for c in el}


def _point_fields(el) -> tuple[list, dict]:
    """wpt/rtept/trkpt children -> ordered field values + extensions."""
    vals = []
    kids = [(c, _tag(c)) for c in el]
    by = {}
    links = []
    ext = {}
    for c, t in kids:
        if t == "link":
            links.append(c)
        elif t == "extensions":
            for e in c:
                ext[_tag(e)] = (e.text or "").strip()
        else:
            by.setdefault(t, c)
    for c in _WPT_DOUBLE:
        v = by.get(c)
        vals.append(float(v.text) if v is not None and v.text else None)
    for c in _WPT_INT:
        v = by.get(c)
        vals.append(int(v.text) if v is not None and v.text else None)
    for c in _WPT_STR:
        v = by.get(c)
        vals.append(v.text if v is not None else None)
    for i in range(2):
        if i < len(links):
            lk = links[i]
            lc = _children(lk)
            vals += [lk.attrib.get("href"),
                     lc["text"].text if "text" in lc else None,
                     lc["type"].text if "type" in lc else None]
        else:
            vals += [None, None, None]
    return vals, ext


def _line_fields(el) -> tuple[list, dict]:
    vals = []
    by = {}
    links = []
    ext = {}
    for c in el:
        t = _tag(c)
        if t == "link":
            links.append(c)
        elif t == "extensions":
            for e in c:
                ext[_tag(e)] = (e.text or "").strip()
        elif t not in by:
            by[t] = c
    for c in _RTE_STR:
        v = by.get(c)
        vals.append(v.text if v is not None else None)
    for c in _RTE_INT:
        v = by.get(c)
        vals.append(int(v.text) if v is not None and v.text else None)
    for i in range(2):
        if i < len(links):
            lk = links[i]
            lc = _children(lk)
            vals += [lk.attrib.get("href"),
                     lc["text"].text if "text" in lc else None,
                     lc["type"].text if "type" in lc else None]
        else:
            vals += [None, None, None]
    return vals, ext


def _latlon(el) -> tuple[float, float]:
    return float(el.attrib["lat"]), float(el.attrib["lon"])


def _pt_row(prefix, el):
    lat, lon = _latlon(el)
    vals, ext = _point_fields(el)
    wkb = wkbmod.encode_point(lon, lat)
    return (list(prefix) + vals
            + [wkb, lon, lat, lon, lat,
               json.dumps(ext, sort_keys=True, separators=(",", ":"))])


def parse_gpx_bytes(data: bytes) -> dict[str, list]:
    """One GPX document -> {layer: rows} (the Spark reader kernel)."""
    root = ET.fromstring(data)
    out = {k: [] for k in LAYERS}

    wpt_id = 0
    rte_id = 0
    trk_id = 0
    for el in root:
        t = _tag(el)
        if t == "wpt":
            out["waypoints"].append(_pt_row([wpt_id], el))
            wpt_id += 1
        elif t == "rte":
            pts = []
            pid = 0
            for ch in el:
                if _tag(ch) == "rtept":
                    out["route_points"].append(
                        _pt_row([rte_id, pid], ch))
                    lat, lon = _latlon(ch)
                    pts.append((lon, lat))
                    pid += 1
            vals, ext = _line_fields(el)
            arr = np.asarray(pts, dtype=np.float64) if pts else \
                np.empty((0, 2))
            wkb = wkbmod.encode_linestring(arr)
            env = ([float(arr[:, 0].min()), float(arr[:, 1].min()),
                    float(arr[:, 0].max()), float(arr[:, 1].max())]
                   if len(arr) else [None] * 4)
            out["routes"].append(
                [rte_id] + vals + [wkb] + env
                + [json.dumps(ext, sort_keys=True,
                              separators=(",", ":"))])
            rte_id += 1
        elif t == "trk":
            segs = []
            seg_id = 0
            for ch in el:
                if _tag(ch) != "trkseg":
                    continue
                pts = []
                pid = 0
                for p in ch:
                    if _tag(p) == "trkpt":
                        out["track_points"].append(
                            _pt_row([trk_id, seg_id, pid], p))
                        lat, lon = _latlon(p)
                        pts.append((lon, lat))
                        pid += 1
                if pts:  # point-less trkseg dropped (ogr_gpx.py:158)
                    segs.append(np.asarray(pts, dtype=np.float64))
                seg_id += 1
            vals, ext = _line_fields(el)
            wkb = wkbmod.encode_multilinestring(segs)
            if segs:
                flat = np.vstack(segs)
                env = [float(flat[:, 0].min()), float(flat[:, 1].min()),
                       float(flat[:, 0].max()), float(flat[:, 1].max())]
            else:
                env = [None] * 4
            out["tracks"].append(
                [trk_id] + vals + [wkb] + env
                + [json.dumps(ext, sort_keys=True,
                              separators=(",", ":"))])
            trk_id += 1
    return out


def read_gpx(spark: SparkSession, path: str,
             layer: str = "waypoints") -> DataFrame:
    """GPX file(s) -> one of the five fixed layers as a DataFrame.
    One task per file (binaryFile), parallel across files."""
    if layer not in LAYER_SCHEMAS:
        raise ValueError(f"unknown GPX layer {layer!r}; "
                         f"expected one of {LAYERS}")
    from ..session import ship_package

    ship_package(spark)
    files = spark.read.format("binaryFile").load(path).select("content")
    schema = LAYER_SCHEMAS[layer]
    cols = [c.strip().split()[0] for c in schema.split(",")]

    def parse(batches):
        for pdf in batches:
            rows = []
            for blob in pdf["content"]:
                rows.extend(parse_gpx_bytes(bytes(blob))[layer])
            yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(parse, schema=schema)


# --------------------------------------------------------------- writer

def fmt_double(v) -> str:
    """OGRFormatDouble with '.' separator: %.15f with trailing zeros
    trimmed AND 9/0-run re-rounding, at least one decimal digit kept
    ("49.0"). Python's shortest-roundtrip repr realizes the same
    contract (lossless, no trailing noise) without the run scan."""
    s = repr(float(v))
    return s if "." in s or "e" in s or "n" in s else s + ".0"


def _xesc(s) -> str:
    return (str(s).replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;"))


_HEADER = ('<?xml version="1.0"?>\n'
           '<gpx version="1.1" creator="lib_gdal_spark" '
           'xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance" '
           'xmlns:ogr="http://osgeo.org/gdal" '
           'xmlns="http://www.topografix.com/GPX/1/1" '
           'xsi:schemaLocation="http://www.topografix.com/GPX/1/1 '
           'http://www.topografix.com/GPX/1/1/gpx.xsd">\n')


def _attrs_block(fields: dict, indent: int, skip=()) -> str:
    """Standard GPX fields in schema order at the given indent level
    (WriteFeatureAttributes semantics; links re-assemble from
    link1_*/link2_* triples; unknown keys go to <extensions>)."""
    pad = "  " * indent
    out = ""
    known = set(_WPT_DOUBLE + _WPT_INT + _WPT_STR + _RTE_STR + _RTE_INT)
    order = (_WPT_DOUBLE[:1] + ["time"]
             + [c for c in _WPT_STR if c != "time"]
             + _WPT_DOUBLE[1:] + _WPT_INT + _RTE_INT
             + [c for c in _RTE_STR if c not in _WPT_STR])
    seen = set()
    for c in order:
        if c in seen or c in skip:
            continue
        seen.add(c)
        v = fields.get(c)
        if v is None:
            continue
        if c in _WPT_DOUBLE:
            out += f"{pad}<{c}>{fmt_double(v)}</{c}>\n"
        else:
            out += f"{pad}<{c}>{_xesc(v)}</{c}>\n"
    for i in (1, 2):
        href = fields.get(f"link{i}_href")
        if href is None:
            continue
        line = f'{pad}<link href="{_xesc(href)}">'
        if fields.get(f"link{i}_text") is not None:
            line += f"<text>{_xesc(fields[f'link{i}_text'])}</text>"
        if fields.get(f"link{i}_type") is not None:
            line += f"<type>{_xesc(fields[f'link{i}_type'])}</type>"
        out += line + "</link>\n"
    extras = {k: v for k, v in fields.items()
              if k not in known and not k.startswith("link")
              and k not in skip and v is not None}
    if extras:
        out += f"{pad}<extensions>\n"
        for k, v in extras.items():
            out += f"{pad}  <ogr:{k}>{_xesc(v)}</ogr:{k}>\n"
        out += f"{pad}</extensions>\n"
    return out


def gpx_document(waypoints=(), routes=(), tracks=(),
                 route_points=(), track_points=()) -> str:
    """Feature dicts -> GPX document text. wpt elements first, then
    rte, then trk (the writer's enforced element order,
    ogrgpxlayer.cpp:1358-1369). waypoints: {"lon","lat",fields...};
    routes: {"points": [(lon,lat[,ele])...], fields...}; tracks:
    {"segments": [[(lon,lat[,ele]),...],...], fields...};
    route_points: {"route_fid","route_name",...,"lon","lat"} rows that
    GROUP into rte elements on route_fid change (name from the first
    row of each group — the ogr_gpx_8_ref.txt golden); track_points:
    likewise on (track_fid, track_seg_id)."""
    out = _HEADER
    for w in waypoints:
        out += (f'<wpt lat="{fmt_double(w["lat"])}" '
                f'lon="{fmt_double(w["lon"])}">\n')
        out += _attrs_block(w, 1, skip=("lat", "lon"))
        out += "</wpt>\n"
    for r in routes:
        out += "<rte>\n"
        out += _attrs_block(r, 1, skip=("points",))
        for p in r.get("points", ()):
            out += (f'  <rtept lat="{fmt_double(p[1])}" '
                    f'lon="{fmt_double(p[0])}">\n')
            if len(p) >= 3:
                out += f"    <ele>{fmt_double(p[2])}</ele>\n"
            out += "  </rtept>\n"
        out += "</rte>\n"
    last_rte = None
    for p in route_points:
        fid = p["route_fid"]
        if fid != last_rte:
            if last_rte is not None:
                out += "</rte>\n"
            out += "<rte>\n"
            if p.get("route_name") is not None:
                out += f"  <name>{_xesc(p['route_name'])}</name>\n"
            last_rte = fid
        out += (f'  <rtept lat="{fmt_double(p["lat"])}" '
                f'lon="{fmt_double(p["lon"])}">\n')
        out += _attrs_block(p, 2, skip=("lat", "lon", "route_fid",
                                        "route_name", "route_point_id"))
        out += "  </rtept>\n"
    if last_rte is not None:
        out += "</rte>\n"
    for t in tracks:
        out += "<trk>\n"
        out += _attrs_block(t, 1, skip=("segments",))
        for seg in t.get("segments", ()):
            out += "  <trkseg>\n"
            for p in seg:
                out += (f'    <trkpt lat="{fmt_double(p[1])}" '
                        f'lon="{fmt_double(p[0])}">\n')
                if len(p) >= 3:
                    out += f"        <ele>{fmt_double(p[2])}</ele>\n"
                out += "    </trkpt>\n"
            out += "  </trkseg>\n"
        out += "</trk>\n"
    last_trk = last_seg = None
    for p in track_points:
        fid, seg = p["track_fid"], p.get("track_seg_id", 0)
        if fid != last_trk:
            if last_trk is not None:
                out += "  </trkseg>\n</trk>\n"
            out += "<trk>\n"
            if p.get("track_name") is not None:
                out += f"  <name>{_xesc(p['track_name'])}</name>\n"
            out += "  <trkseg>\n"
            last_trk, last_seg = fid, seg
        elif seg != last_seg:
            out += "  </trkseg>\n  <trkseg>\n"
            last_seg = seg
        out += (f'    <trkpt lat="{fmt_double(p["lat"])}" '
                f'lon="{fmt_double(p["lon"])}">\n')
        out += _attrs_block(p, 3, skip=("lat", "lon", "track_fid",
                                        "track_name", "track_seg_id",
                                        "track_seg_point_id"))
        out += "    </trkpt>\n"
    if last_trk is not None:
        out += "  </trkseg>\n</trk>\n"
    return out + "</gpx>\n"


def write_gpx(path: str, **kwargs) -> None:
    """Single-file sink (driver-side assembly — GPX is one XML
    document; same contract as write_kml)."""
    with open(path, "w", encoding="utf-8") as f:
        f.write(gpx_document(**kwargs))
