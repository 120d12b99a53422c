"""Geometry-to-geometry distance — the ST_Distance kernel.

Reference: the SQLite dialect's ST_Distance
(/root/reference/ogr/ogrsf_frmts/sqlite/ogrsqlitesqlfunctions.cpp, GEOS
Distance under the hood). For the 2-D point/linestring/polygon subset the
minimum distance between two geometries is attained either at a vertex of
one against a segment of the other (or inside an areal geometry -> 0), so
the exact answer is the min over the two vertex-vs-segments sweeps plus
containment tests — vectorized NumPy, no GEOS dependency.
"""

from __future__ import annotations

import numpy as np

from .pip import point_in_polygon_np


def point_segments_dist_np(px: float, py: float, pts: np.ndarray) -> float:
    """Min distance from (px, py) to the polyline `pts` (n,2)."""
    pts = np.asarray(pts, dtype=np.float64)
    if len(pts) == 1:
        return float(np.hypot(px - pts[0, 0], py - pts[0, 1]))
    a = pts[:-1]
    b = pts[1:]
    d = b - a
    seg2 = (d * d).sum(axis=1)
    seg2 = np.where(seg2 == 0.0, 1.0, seg2)
    t = ((px - a[:, 0]) * d[:, 0] + (py - a[:, 1]) * d[:, 1]) / seg2
    t = np.clip(t, 0.0, 1.0)
    cx = a[:, 0] + t * d[:, 0]
    cy = a[:, 1] + t * d[:, 1]
    return float(np.min(np.hypot(px - cx, py - cy)))


def _boundaries(kind: str, data):
    """Geometry -> list of polylines forming its boundary (or the point)."""
    if kind == "point":
        return [np.array([data], dtype=np.float64)]
    if kind == "linestring":
        return [np.asarray(data, dtype=np.float64)]
    if kind == "polygon":
        return [np.asarray(r, dtype=np.float64) for r in data]
    if kind == "multipolygon":
        return [np.asarray(r, dtype=np.float64)
                for rings in data for r in rings]
    raise NotImplementedError(f"distance: geometry kind {kind}")


def _contains(kind: str, data, x: float, y: float) -> bool:
    if kind == "polygon":
        return bool(point_in_polygon_np(
            np.array([x]), np.array([y]), data)[0])
    if kind == "multipolygon":
        return any(bool(point_in_polygon_np(
            np.array([x]), np.array([y]), rings)[0]) for rings in data)
    return False


def geometry_distance(kind_a: str, data_a, kind_b: str, data_b) -> float:
    """Exact min distance between two 2-D geometries (0 when they touch,
    overlap, or one contains a point of the other)."""
    ba = _boundaries(kind_a, data_a)
    bb = _boundaries(kind_b, data_b)
    # containment: any representative vertex inside the other areal geom
    if _contains(kind_b, data_b, ba[0][0, 0], ba[0][0, 1]):
        return 0.0
    if _contains(kind_a, data_a, bb[0][0, 0], bb[0][0, 1]):
        return 0.0
    best = np.inf
    for pa in ba:
        for pb in bb:
            for (x, y) in pa:
                best = min(best, point_segments_dist_np(float(x), float(y), pb))
            for (x, y) in pb:
                best = min(best, point_segments_dist_np(float(x), float(y), pa))
    return float(best)
