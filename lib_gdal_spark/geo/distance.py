"""Geometry-to-geometry distance — the ST_Distance kernel.

Reference: the SQLite dialect's ST_Distance
(/root/reference/ogr/ogrsf_frmts/sqlite/ogrsqlitesqlfunctions.cpp, GEOS
Distance under the hood). For the 2-D point/linestring/polygon subset the
minimum distance between two non-crossing geometries is attained at a
vertex of one against a segment of the other (or inside an areal geometry
-> 0); boundaries that CROSS without any vertex being nearby are caught by
an explicit segment-segment intersection sweep (-> 0). The exact answer is
therefore: 0 on containment or boundary crossing, else the min over the
two vertex-vs-segments sweeps — vectorized NumPy, no GEOS dependency.
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


def _close_ring(r) -> np.ndarray:
    """Rings may arrive open (no repeated closing vertex); the boundary
    polyline must include the closing edge or crossings through it are
    invisible to the distance/crossing sweep."""
    r = np.asarray(r, dtype=np.float64)
    if len(r) >= 3 and not (r[0] == r[-1]).all():
        r = np.vstack([r, r[:1]])
    return r


def _boundaries(kind: str, data):
    """Geometry -> list of polylines forming its boundary (or the point)."""
    if kind == "point":
        return [np.array([data], dtype=np.float64)]
    if kind == "linestring":
        return [np.asarray(data, dtype=np.float64)]
    if kind == "polygon":
        return [_close_ring(r) for r in data]
    if kind == "multipolygon":
        return [_close_ring(r) for rings in data for r in rings]
    raise NotImplementedError(f"distance: geometry kind {kind}")


def _contains(kind: str, data, x: float, y: float) -> bool:
    if kind == "polygon":
        return bool(point_in_polygon_np(
            np.array([x]), np.array([y]), data)[0])
    if kind == "multipolygon":
        return any(bool(point_in_polygon_np(
            np.array([x]), np.array([y]), rings)[0]) for rings in data)
    return False


def segments_cross_np(pa: np.ndarray, pb: np.ndarray) -> bool:
    """True iff any segment of polyline `pa` properly or improperly
    intersects any segment of polyline `pb` (shared endpoints count).
    Vectorized over the full n*m pair grid with the standard orientation
    test plus the collinear-overlap bounding-box test."""
    pa = np.asarray(pa, dtype=np.float64)
    pb = np.asarray(pb, dtype=np.float64)
    if len(pa) < 2 or len(pb) < 2:
        return False
    a1 = pa[:-1][:, None, :]   # (n,1,2)
    a2 = pa[1:][:, None, :]
    b1 = pb[None, :-1, :]      # (1,m,2)
    b2 = pb[None, 1:, :]

    def cross(o, p, q):
        return ((p[..., 0] - o[..., 0]) * (q[..., 1] - o[..., 1])
                - (p[..., 1] - o[..., 1]) * (q[..., 0] - o[..., 0]))

    d1 = cross(a1, a2, b1)
    d2 = cross(a1, a2, b2)
    d3 = cross(b1, b2, a1)
    d4 = cross(b1, b2, a2)
    proper = (d1 * d2 < 0) & (d3 * d4 < 0)
    if proper.any():
        return True
    # collinear / endpoint-touching: zero cross product AND bbox overlap
    lo_a = np.minimum(a1, a2)
    hi_a = np.maximum(a1, a2)
    lo_b = np.minimum(b1, b2)
    hi_b = np.maximum(b1, b2)
    boxes = ((lo_a[..., 0] <= hi_b[..., 0]) & (lo_b[..., 0] <= hi_a[..., 0])
             & (lo_a[..., 1] <= hi_b[..., 1]) & (lo_b[..., 1] <= hi_a[..., 1]))
    touch = boxes & ((d1 == 0) | (d2 == 0) | (d3 == 0) | (d4 == 0)) & (
        (d1 * d2 <= 0) & (d3 * d4 <= 0))
    return bool(touch.any())


def geometry_distance(kind_a: str, data_a, kind_b: str, data_b) -> float:
    """Exact min distance between two 2-D geometries (0 when they cross,
    touch, overlap, or one contains a point of the other)."""
    ba = _boundaries(kind_a, data_a)
    bb = _boundaries(kind_b, data_b)
    # containment: any representative vertex inside the other areal geom
    if _contains(kind_b, data_b, ba[0][0, 0], ba[0][0, 1]):
        return 0.0
    if _contains(kind_a, data_a, bb[0][0, 0], bb[0][0, 1]):
        return 0.0
    # boundary crossing (e.g. crossing linestrings, plus-shaped polygon
    # overlap) attains distance 0 with no vertex near the other geometry
    for pa in ba:
        for pb in bb:
            if segments_cross_np(pa, pb):
                return 0.0
    best = np.inf
    for pa in ba:
        for pb in bb:
            for (x, y) in pa:
                best = min(best, point_segments_dist_np(float(x), float(y), pb))
            for (x, y) in pb:
                best = min(best, point_segments_dist_np(float(x), float(y), pa))
    return float(best)
