"""WKT codec for Point / LineString / Polygon / MultiPolygon.

The reference's SQL dialect exposes ST_AsText / ST_GeomFromText
(/root/reference/ogr/ogrsf_frmts/sqlite/ogrsqlitesqlfunctions.cpp:723-808,
backed by exportToWkt/importFromWkt in ogr/ogrgeometry.cpp). This module
is the text twin of geo/wkb.py: both sides speak the same decoded
structures — ("point", (x, y)) | ("linestring", pts) |
("polygon", [rings]) | ("multipolygon", [[rings], ...]).

Numbers are emitted with Python's shortest-round-trip float repr (with a
trailing ``.0`` dropped, matching OGR's integer-looking output for whole
coordinates), so to_wkt/from_wkt round-trips bit-exactly. EMPTY and Z/M
geometries are out of scope (the fixture corpus is 2-D).
"""

from __future__ import annotations

import numpy as np


def _fmt(v: float) -> str:
    s = repr(float(v))
    return s[:-2] if s.endswith(".0") else s


def _coords(pts) -> str:
    return ", ".join(f"{_fmt(x)} {_fmt(y)}" for x, y in np.asarray(pts, float))


def to_wkt(kind: str, data) -> str:
    kind = kind.lower()
    if kind == "point":
        x, y = data
        return f"POINT ({_fmt(x)} {_fmt(y)})"
    if kind == "linestring":
        return f"LINESTRING ({_coords(data)})"
    if kind == "polygon":
        rings = ", ".join(f"({_coords(r)})" for r in data)
        return f"POLYGON ({rings})"
    if kind == "multipolygon":
        polys = ", ".join(
            "(" + ", ".join(f"({_coords(r)})" for r in rings) + ")"
            for rings in data
        )
        return f"MULTIPOLYGON ({polys})"
    if kind == "circularstring":
        return f"CIRCULARSTRING ({_coords(data)})"
    if kind == "compoundcurve":
        # linestring components print as bare paren groups, arcs typed
        # (exportToWkt convention, ogr/ogrcompoundcurve.cpp)
        parts = ", ".join(
            f"({_coords(d)})" if k == "linestring" else to_wkt(k, d)
            for k, d in data)
        return f"COMPOUNDCURVE ({parts})"
    if kind == "curvepolygon":
        parts = ", ".join(
            f"({_coords(r[1])})" if (isinstance(r, tuple) and r[0] ==
                                     "linestring")
            else to_wkt(*r) if isinstance(r, tuple) and isinstance(r[0], str)
            else f"({_coords(r)})"
            for r in data)
        return f"CURVEPOLYGON ({parts})"
    if kind == "multicurve":
        parts = ", ".join(
            f"({_coords(d)})" if k == "linestring" else to_wkt(k, d)
            for k, d in data)
        return f"MULTICURVE ({parts})"
    if kind == "multisurface":
        parts = ", ".join(
            "(" + ", ".join(f"({_coords(r)})" for r in d) + ")"
            if k == "polygon" else to_wkt(k, d)
            for k, d in data)
        return f"MULTISURFACE ({parts})"
    if kind == "triangle":
        rings = ", ".join(f"({_coords(r)})" for r in data)
        return f"TRIANGLE ({rings})"
    if kind in ("polyhedralsurface", "tin"):
        polys = ", ".join(
            "(" + ", ".join(f"({_coords(r)})" for r in rings) + ")"
            for rings in data)
        return f"{kind.upper()} ({polys})"
    raise NotImplementedError(f"wkt geometry kind {kind}")


def _parse_group(s: str, i: int):
    """Recursive paren parser: returns (items, next_index) where items are
    nested lists / coordinate strings."""
    assert s[i] == "("
    i += 1
    items: list = []
    buf = ""
    while i < len(s):
        c = s[i]
        if c == "(":
            node, i = _parse_group(s, i)
            label = buf.strip().upper()
            buf = ""
            if label:
                # typed sub-geometry token, e.g. "CIRCULARSTRING (...)"
                items.append((label, node))
            else:
                items.append(node)
        elif c == ")":
            if buf.strip():
                items.append(buf.strip())
            return items, i + 1
        elif c == ",":
            if buf.strip():
                items.append(buf.strip())
            buf = ""
            i += 1
        else:
            buf += c
            i += 1
    raise ValueError("unbalanced parentheses in WKT")


def _pt(tok: str):
    x, y = tok.split()
    return float(x), float(y)


def _ring(items) -> np.ndarray:
    return np.array([_pt(t) for t in items], dtype=np.float64)


def _curve_component(item):
    """One curve component / ring: a typed token ("CIRCULARSTRING", node)
    or a bare paren group (an implicit linestring, the WKT shorthand)."""
    if isinstance(item, tuple):
        label, node = item
        if label == "CIRCULARSTRING":
            return "circularstring", _ring(node)
        if label == "COMPOUNDCURVE":
            return "compoundcurve", [_curve_component(x) for x in node]
        if label == "LINESTRING":
            return "linestring", _ring(node)
        raise NotImplementedError(f"curve component {label}")
    return "linestring", _ring(item)


def from_wkt(text: str):
    """WKT -> the same (kind, data) structures geo/wkb.decode returns."""
    t = text.strip()
    p = t.find("(")
    if p < 0:
        raise NotImplementedError(f"unsupported WKT (EMPTY?): {t[:40]}")
    kind = t[:p].strip().upper()
    items, _ = _parse_group(t, p)
    if kind == "POINT":
        return "point", _pt(items[0])
    if kind == "LINESTRING":
        return "linestring", _ring(items)
    if kind == "POLYGON":
        return "polygon", [_ring(r) for r in items]
    if kind == "MULTIPOLYGON":
        return "multipolygon", [[_ring(r) for r in poly] for poly in items]
    if kind == "CIRCULARSTRING":
        return "circularstring", _ring(items)
    if kind == "COMPOUNDCURVE":
        return "compoundcurve", [_curve_component(x) for x in items]
    if kind == "CURVEPOLYGON":
        return "curvepolygon", [_curve_component(x) for x in items]
    if kind == "MULTICURVE":
        return "multicurve", [_curve_component(x) for x in items]
    if kind == "MULTISURFACE":
        out = []
        for it in items:
            if isinstance(it, tuple) and it[0] == "CURVEPOLYGON":
                out.append(("curvepolygon",
                            [_curve_component(x) for x in it[1]]))
            else:
                out.append(("polygon", [_ring(r) for r in it]))
        return "multisurface", out
    if kind == "TRIANGLE":
        return "triangle", [_ring(r) for r in items]
    if kind in ("POLYHEDRALSURFACE", "TIN"):
        return kind.lower(), [[_ring(r) for r in poly] for poly in items]
    raise NotImplementedError(f"wkt geometry type {kind}")
