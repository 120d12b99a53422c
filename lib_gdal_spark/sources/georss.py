"""GeoRSS (RSS 2.0 / Atom 1.0) vector source + sink.

Reference: ogr/ogrsf_frmts/georss/ — items/entries become features of
a single "georss" layer; element discovery follows the reference's
naming: nested Atom structures flatten with underscores (author ->
author_name/author_uri/author_email), attributes append as elt_attr
(link_rel/link_type/link_href, category_domain, content_type/
content_xml_lang/content_xml_base), and repeated elements count up
from the second occurrence (link2_*, category2, contributor2_name).
Geometries: georss:point/line/polygon hold LAT LON streams (axis
swap on read), georss:box's lat/lon corner pair expands to the
4-vertex polygon, and georss:where wraps GML (parsed with the same
rules as sources/gml.py). RSS pubDate is RFC-822
("Sun, 07 Dec 2008 20:13:00 +0200" -> OGR "2008/12/07 20:13:00+02");
Atom dates are ISO-8601. The WKT twin reproduces OGRMakeWktCoordinate
("2 48" for integral pairs, "2.2 48.0" when mixed).

Replays: ogr_georss.py test_ogr_georss_1/1_atom_ns (the full
atom_field_values table incl. xhtml content payload) and
test_ogr_georss_2 (all four simple-geometry WKTs) in
tests/test_georss.py; the writer round-trips both document shapes.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

import numpy as np

_MONTHS = {m: i + 1 for i, m in enumerate(
    "Jan Feb Mar Apr May Jun Jul Aug Sep Oct Nov Dec".split())}


def _tag(el) -> str:
    t = el.tag
    return t.split("}", 1)[1] if "}" in t else t


def _ns(el) -> str:
    t = el.tag
    return t.split("}", 1)[0][1:] if "}" in t else ""


def _ogr_rfc822(s: str) -> str:
    m = re.match(
        r"\s*(?:\w+,\s*)?(\d+)\s+(\w+)\s+(\d+)\s+(\d+):(\d+)(?::(\d+))?"
        r"\s*([+-]\d{4}|GMT|UT|Z)?", s)
    if not m or m.group(2) not in _MONTHS:
        return s
    day, mon, year = int(m.group(1)), _MONTHS[m.group(2)], int(m.group(3))
    hh, mi, ss = int(m.group(4)), int(m.group(5)), int(m.group(6) or 0)
    tz = m.group(7) or ""
    if tz in ("GMT", "UT", "Z"):
        tzs = "+00"
    elif tz:
        tzs = tz[:3] if tz[3:] == "00" else f"{tz[:3]}:{tz[3:]}"
    else:
        tzs = ""
    return f"{year:04d}/{mon:02d}/{day:02d} {hh:02d}:{mi:02d}:{ss:02d}{tzs}"


def _ogr_iso(s: str) -> str:
    m = re.match(r"\s*(\d{4})-(\d{2})-(\d{2})[T ](\d{2}):(\d{2}):(\d{2})"
                 r"(?:\.\d+)?(Z|[+-]\d{2}:?\d{2})?", s)
    if not m:
        return s
    tz = m.group(7) or ""
    if tz == "Z":
        tzs = "+00"
    elif tz:
        tz = tz.replace(":", "")
        tzs = tz[:3] if tz[3:] == "00" else f"{tz[:3]}:{tz[3:]}"
    else:
        tzs = ""
    return (f"{m.group(1)}/{m.group(2)}/{m.group(3)} "
            f"{m.group(4)}:{m.group(5)}:{m.group(6)}{tzs}")


def _wkt_coord(x: float, y: float) -> str:
    if x == int(x) and y == int(y):
        return f"{int(x)} {int(y)}"

    def f(v):
        s = f"{v:.15g}"
        return s if ("." in s or "e" in s or "E" in s) else s + ".0"

    return f"{f(x)} {f(y)}"


def _wkt(kind: str, pts) -> str:
    a = np.asarray(pts, float).reshape(-1, 2)
    inner = ",".join(_wkt_coord(x, y) for x, y in a)
    if kind == "point":
        return f"POINT ({inner})"
    if kind == "line":
        return f"LINESTRING ({inner})"
    return f"POLYGON (({inner}))"


def _latlon_stream(text: str) -> np.ndarray:
    v = np.array([float(t) for t in text.split()], float).reshape(-1, 2)
    return v[:, ::-1]  # lat lon -> x=lon y=lat


def _gml_geometry(el):
    """georss:where GML subset: Point/LineString/Polygon with
    pos/posList/coordinates (lon-lat order per GML in GeoRSS usage is
    LAT LON too — the reference swaps both)."""
    for g in el.iter():
        t = _tag(g)
        if t == "Point":
            for c in g.iter():
                if _tag(c) in ("pos", "coordinates"):
                    return "point", _latlon_stream(
                        c.text.replace(",", " "))
        elif t == "LineString":
            for c in g.iter():
                if _tag(c) in ("posList", "coordinates"):
                    return "line", _latlon_stream(c.text.replace(",", " "))
        elif t in ("Polygon", "Envelope"):
            if t == "Envelope":
                lo = hi = None
                for c in g.iter():
                    if _tag(c) == "lowerCorner":
                        lo = [float(x) for x in c.text.split()]
                    elif _tag(c) == "upperCorner":
                        hi = [float(x) for x in c.text.split()]
                if lo and hi:
                    return "box", (lo[0], lo[1], hi[0], hi[1])
            for c in g.iter():
                if _tag(c) in ("posList", "coordinates"):
                    return "polygon", _latlon_stream(
                        c.text.replace(",", " "))
    return None


def _box_polygon(latmin, lonmin, latmax, lonmax) -> str:
    pts = [(lonmin, latmin), (lonmin, latmax), (lonmax, latmax),
           (lonmax, latmin), (lonmin, latmin)]
    return _wkt("polygon", pts)


def _serialize_el(el, parent_ns=None) -> str:
    """Serialize with DEFAULT xmlns declarations (OGR's content shape:
    '<div xmlns="http://www.w3.org/1999/xhtml">'), not ET's ns0:."""
    ns, t = _ns(el), _tag(el)
    attrs = ""
    if ns and ns != parent_ns:
        attrs += f' xmlns="{ns}"'
    for k, v in el.attrib.items():
        k = k.split("}", 1)[1] if "}" in k else k
        attrs += f' {k}="{_xesc(v)}"'
    inner = el.text or ""
    for c in el:
        inner += _serialize_el(c, ns) + (c.tail or "")
    return f"<{t}{attrs}>{inner}</{t}>"


def _serialize_children(el) -> str:
    out = ""
    for c in el:
        out += _serialize_el(c, parent_ns=None) + (c.tail or "")
    return out.strip()


def _feature_fields(item, is_atom: bool) -> tuple[dict, str | None]:
    fields: dict = {}
    counts: dict = {}
    wkt = None

    def name_for(base):
        n = counts.get(base, 0) + 1
        counts[base] = n
        return base if n == 1 else f"{base}{n}"

    for el in item:
        t = _tag(el)
        ns = _ns(el)
        if "georss.org" in ns or t in ("point", "line", "polygon", "box",
                                       "where"):
            if t == "point":
                wkt = _wkt("point", _latlon_stream(el.text))
            elif t == "line":
                wkt = _wkt("line", _latlon_stream(el.text))
            elif t == "polygon":
                wkt = _wkt("polygon", _latlon_stream(el.text))
            elif t == "box":
                v = [float(x) for x in el.text.split()]
                wkt = _box_polygon(*v)
            elif t == "where":
                g = _gml_geometry(el)
                if g and g[0] == "box":
                    wkt = _box_polygon(*g[1])
                elif g:
                    wkt = _wkt(g[0], g[1])
            continue
        base = name_for(t)
        kids = list(el)
        if t == "content" and kids:
            # xhtml payload: keep the serialized inner XML
            fields[base] = _serialize_children(el)
        elif kids and is_atom:
            for sub in kids:
                fields[f"{base}_{_tag(sub)}"] = (sub.text or "").strip()
        else:
            text = (el.text or "").strip()
            if text:
                if t in ("pubDate", "lastBuildDate"):
                    text = _ogr_rfc822(text)
                elif t in ("updated", "published") and is_atom:
                    text = _ogr_iso(text)
                fields[base] = text
        for k, v in el.attrib.items():
            k = k.split("}", 1)[1] if "}" in k else k
            key = {"lang": "xml_lang", "base": "xml_base"}.get(k, k)
            fields[f"{base}_{key}"] = v
    return fields, wkt


def parse_georss_bytes(data: bytes) -> list[dict]:
    root = ET.fromstring(data)
    rt = _tag(root)
    feats = []
    if rt == "feed":
        for entry in root:
            if _tag(entry) == "entry":
                fields, wkt = _feature_fields(entry, True)
                feats.append({"fields": fields, "wkt": wkt})
    elif rt == "rss":
        for channel in root:
            if _tag(channel) != "channel":
                continue
            for item in channel:
                if _tag(item) == "item":
                    fields, wkt = _feature_fields(item, False)
                    feats.append({"fields": fields, "wkt": wkt})
    else:
        raise ValueError(f"not a GeoRSS document (root {rt!r})")
    return feats


def read_georss(spark, path: str):
    """-> DataFrame: one row per item/entry, discovered fields as
    string columns (reference field-promotion order) + `wkt`."""
    import pandas as pd

    with open(path, "rb") as f:
        feats = parse_georss_bytes(f.read())
    cols: list[str] = []
    for ft in feats:
        for k in ft["fields"]:
            if k not in cols:
                cols.append(k)
    rows = [{**{c: ft["fields"].get(c) for c in cols},
             "wkt": ft["wkt"], "fid": i}
            for i, ft in enumerate(feats)]
    return spark.createDataFrame(pd.DataFrame(
        rows, columns=["fid"] + cols + ["wkt"]))


def _xesc(s: str) -> str:
    return (str(s).replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;"))


def _geom_tags(wkt: str) -> str:
    from ..geo.wkt import from_wkt

    kind, data = from_wkt(wkt)
    if kind == "point":
        pts = np.asarray(data, float).reshape(-1, 2)
        return (f"    <georss:point>{pts[0][1]:.15g} {pts[0][0]:.15g}"
                f"</georss:point>\n")
    if kind == "linestring":
        body = " ".join(f"{y:.15g} {x:.15g}" for x, y in np.asarray(data))
        return f"    <georss:line>{body}</georss:line>\n"
    if kind == "polygon":
        ring = np.asarray(data[0], float)
        body = " ".join(f"{y:.15g} {x:.15g}" for x, y in ring)
        return f"    <georss:polygon>{body}</georss:polygon>\n"
    raise NotImplementedError(f"GeoRSS write for {kind}")


def _dt_out(v: str, atom: bool) -> str:
    m = re.match(r"(\d{4})/(\d{2})/(\d{2}) (\d{2}):(\d{2}):(\d{2})"
                 r"([+-]\d{2}(?::?\d{2})?)?", v)
    if not m:
        return v
    tz = (m.group(7) or "+00").replace(":", "")
    if len(tz) == 3:
        tz += "00"
    if atom:
        tzs = "Z" if tz == "+0000" else tz[:3] + ":" + tz[3:]
        return (f"{m.group(1)}-{m.group(2)}-{m.group(3)}T"
                f"{m.group(4)}:{m.group(5)}:{m.group(6)}{tzs}")
    from datetime import date

    d = date(int(m.group(1)), int(m.group(2)), int(m.group(3)))
    wd = "Mon Tue Wed Thu Fri Sat Sun".split()[d.weekday()]
    mon = "Jan Feb Mar Apr May Jun Jul Aug Sep Oct Nov Dec" \
        .split()[int(m.group(2)) - 1]
    return (f"{wd}, {int(m.group(3)):02d} {mon} {m.group(1)} "
            f"{m.group(4)}:{m.group(5)}:{m.group(6)} {tz}")


def write_georss(path: str, features: list[dict],
                 fmt: str = "RSS") -> str:
    """features: [{'fields': {...}, 'wkt': ...}]; nested atom fields
    (author_name), attribute fields (link_rel, category_domain) and
    numbered repeats (link2_*) re-assemble into their XML shapes."""
    atom = fmt.upper() == "ATOM"
    out = ['<?xml version="1.0" encoding="UTF-8"?>\n']
    if atom:
        out.append('<feed xmlns="http://www.w3.org/2005/Atom" '
                   'xmlns:georss="http://www.georss.org/georss">\n')
        item_tag = "entry"
    else:
        out.append('<rss version="2.0" '
                   'xmlns:georss="http://www.georss.org/georss">\n'
                   "  <channel>\n    <title>OGR</title>\n"
                   "    <link>.</link>\n"
                   "    <description>OGR</description>\n")
        item_tag = "item"
    ind = "  " if atom else "    "
    for ft in features:
        out.append(f"{ind}<{item_tag}>\n")
        groups: dict = {}
        for key, val in ft["fields"].items():
            if val is None:
                continue
            m = re.match(r"([a-zA-Z]+)(\d*)(?:_(.*))?$", key)
            base, num, sub = m.group(1), m.group(2) or "1", m.group(3)
            groups.setdefault((base, int(num)), {})[sub] = val
        for (base, _num), parts in groups.items():
            attrs = ""
            subels = ""
            text = parts.get(None, "")
            for sub, val in parts.items():
                if sub is None:
                    continue
                if sub in ("rel", "type", "href", "length", "domain"):
                    attrs += f' {sub}="{_xesc(val)}"'
                elif sub == "xml_lang":
                    attrs += f' xml:lang="{_xesc(val)}"'
                elif sub == "xml_base":
                    attrs += f' xml:base="{_xesc(val)}"'
                else:
                    subels += (f"{ind}  <{sub}>{_xesc(val)}"
                               f"</{sub}>\n")
            if base in ("pubDate", "lastBuildDate", "updated",
                        "published") and text:
                text = _dt_out(text, atom and base in ("updated",
                                                       "published"))
            if base == "content" and text:
                body = text  # already serialized xml
            else:
                body = _xesc(text)
            if subels:
                out.append(f"{ind}  <{base}{attrs}>\n{subels}"
                           f"{ind}  </{base}>\n")
            elif body:
                out.append(f"{ind}  <{base}{attrs}>{body}</{base}>\n")
            else:
                out.append(f"{ind}  <{base}{attrs}/>\n")
        if ft.get("wkt"):
            out.append(_geom_tags(ft["wkt"]))
        out.append(f"{ind}</{item_tag}>\n")
    out.append("</feed>\n" if atom else "  </channel>\n</rss>\n")
    with open(path, "w") as f:
        f.write("".join(out))
    return path
