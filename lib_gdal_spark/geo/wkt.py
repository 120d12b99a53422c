"""WKT codec for Point / LineString / Polygon / MultiPolygon.

The reference's SQL dialect exposes ST_AsText / ST_GeomFromText
(/root/reference/ogr/ogrsf_frmts/sqlite/ogrsqlitesqlfunctions.cpp:723-808,
backed by exportToWkt/importFromWkt in ogr/ogrgeometry.cpp). This module
is the text twin of geo/wkb.py: both sides speak the same decoded
structures — ("point", (x, y)) | ("linestring", pts) |
("polygon", [rings]) | ("multipolygon", [[rings], ...]).

Numbers are emitted with Python's shortest-round-trip float repr (with a
trailing ``.0`` dropped, matching OGR's integer-looking output for whole
coordinates), so to_wkt/from_wkt round-trips bit-exactly. EMPTY and M geometries are out of scope (the fixture corpus
is 2-D); Z round-trips through the ` Z ` WKT form.
"""

from __future__ import annotations

import numpy as np


def _fmt(v: float) -> str:
    s = repr(float(v))
    return s[:-2] if s.endswith(".0") else s


def _coords(pts) -> str:
    a = np.asarray(pts, float)
    if a.ndim == 2 and a.shape[1] >= 3:
        return ", ".join(f"{_fmt(x)} {_fmt(y)} {_fmt(z)}"
                         for x, y, z in a[:, :3])
    return ", ".join(f"{_fmt(x)} {_fmt(y)}" for x, y in a)


def _has_z(data, kind: str) -> bool:
    """Does any coordinate array in this decoded structure carry Z?"""
    if kind == "point":
        return len(data) >= 3
    try:
        arr = np.asarray(data, float)
        return arr.ndim >= 2 and arr.shape[-1] >= 3
    except (TypeError, ValueError):
        pass
    for item in data:
        if isinstance(item, tuple) and len(item) == 2 \
                and isinstance(item[0], str):
            if _has_z(item[1], item[0]):
                return True
        else:
            try:
                arr = np.asarray(item, float)
                if arr.ndim == 2 and arr.shape[1] >= 3:
                    return True
                if arr.ndim == 3 and arr.shape[2] >= 3:
                    return True
            except (TypeError, ValueError):
                if _has_z(item, "polygon"):
                    return True
    return False


def to_wkt(kind: str, data) -> str:
    kind = kind.lower()
    if kind == "point":
        if len(data) >= 3:
            x, y, z = data[:3]
            return f"POINT Z ({_fmt(x)} {_fmt(y)} {_fmt(z)})"
        x, y = data
        return f"POINT ({_fmt(x)} {_fmt(y)})"
    if kind == "linestring" and _has_z(data, kind):
        return f"LINESTRING Z ({_coords(data)})"
    if kind == "circularstring" and _has_z(data, kind):
        return f"CIRCULARSTRING Z ({_coords(data)})"
    if kind == "polygon" and _has_z(data, kind):
        rings = ", ".join(f"({_coords(r)})" for r in data)
        return f"POLYGON Z ({rings})"
    if kind == "multipolygon" and _has_z(data, kind):
        polys = ", ".join(
            "(" + ", ".join(f"({_coords(r)})" for r in rings) + ")"
            for rings in data)
        return f"MULTIPOLYGON Z ({polys})"
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
    parts = tok.split()
    if len(parts) >= 3:
        return float(parts[0]), float(parts[1]), float(parts[2])
    return float(parts[0]), float(parts[1])


def _ring(items) -> np.ndarray:
    pts = [_pt(t) for t in items]
    if pts and max(len(p) for p in pts) >= 3:
        pts = [p + (0.0,) * (3 - len(p)) for p in pts]
    return np.array(pts, dtype=np.float64)


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
    if kind.endswith(" Z"):
        kind = kind[:-2].strip()
    elif kind.endswith("Z") and len(kind) > 1 and kind[-2] == " ":
        kind = kind[:-1].strip()
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
    if kind == "MULTILINESTRING":
        return "multilinestring", [_ring(l) for l in items]
    if kind == "MULTIPOINT":
        # both spellings: MULTIPOINT (0 1,2 3) and ((0 1),(2 3))
        pts = [(_pt(it[0]) if isinstance(it, list) else _pt(it))
               for it in items]
        import numpy as _np
        return "multipoint", _np.asarray(pts, dtype=float)
    if kind == "GEOMETRYCOLLECTION":
        out = []
        depth = 0
        start = None
        body = t[p + 1:t.rfind(")")]
        i = 0
        while i < len(body):
            c = body[i]
            if start is None and c.isalpha():
                start = i
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0 and start is not None:
                    out.append(from_wkt(body[start:i + 1]))
                    start = None
            i += 1
        return "collection", out
    if kind == "TRIANGLE":
        return "triangle", [_ring(r) for r in items]
    if kind in ("POLYHEDRALSURFACE", "TIN"):
        return kind.lower(), [[_ring(r) for r in poly] for poly in items]
    raise NotImplementedError(f"wkt geometry type {kind}")
