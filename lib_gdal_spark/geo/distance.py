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


def segments_dist3_np(pa: np.ndarray, pb: np.ndarray) -> float:
    """Min 3-D distance between the segment sets of two polylines
    (n,3)/(m,3) — the classic clamped closest-point-of-approach
    algorithm, vectorized over the full segment-pair grid. Zero-length
    segments (degenerate points) are handled by the guarded divisions."""
    pa = np.asarray(pa, dtype=np.float64)
    pb = np.asarray(pb, dtype=np.float64)
    if len(pa) == 1:
        pa = np.vstack([pa, pa])
    if len(pb) == 1:
        pb = np.vstack([pb, pb])
    a1, a2 = pa[:-1, None, :], pa[1:, None, :]     # (n,1,3)
    b1, b2 = pb[None, :-1, :], pb[None, 1:, :]     # (1,m,3)
    u = a2 - a1
    v = b2 - b1
    w = a1 - b1                                    # (n,m,3)
    A = (u * u).sum(-1)
    B = (u * v).sum(-1)
    C = (v * v).sum(-1)
    D = (u * w).sum(-1)
    E = (v * w).sum(-1)
    den = A * C - B * B
    par = den <= 1e-12 * A * C                     # parallel / degenerate
    sN = np.where(par, 0.0, B * E - C * D)
    sD = np.where(par, 1.0, den)
    tN = np.where(par, E, A * E - B * D)
    tD = np.where(par, C, den)
    # clamp s to [0, 1] (recompute t against the clamped endpoint)
    lo = sN < 0.0
    sN = np.where(lo, 0.0, sN)
    tN = np.where(lo, E, tN)
    tD = np.where(lo, C, tD)
    hi = sN > sD
    sN = np.where(hi, sD, sN)
    tN = np.where(hi, E + B, tN)
    tD = np.where(hi, C, tD)
    # clamp t to [0, 1] (recompute s against the clamped endpoint)
    tlo = tN < 0.0
    tN = np.where(tlo, 0.0, tN)
    s2 = np.clip(-D, 0.0, A)
    sN = np.where(tlo, s2, sN)
    sD = np.where(tlo, np.where(A > 0.0, A, 1.0), sD)
    thi = tN > tD
    tN = np.where(thi, tD, tN)
    s3 = np.clip(-D + B, 0.0, A)
    sN = np.where(thi, s3, sN)
    sD = np.where(thi, np.where(A > 0.0, A, 1.0), sD)
    sc = np.where(sD > 0.0, sN / np.where(sD > 0.0, sD, 1.0), 0.0)
    tc = np.where(tD > 0.0, tN / np.where(tD > 0.0, tD, 1.0), 0.0)
    dP = w + sc[..., None] * u - tc[..., None] * v
    return float(np.sqrt((dP * dP).sum(-1)).min())


def _parts3(kind: str, data):
    """Z geometry -> list of (k,3) polylines; points become degenerate
    1-row parts (NOT chained — chaining multipoints would invent
    segments between independent points)."""
    if kind == "point":
        return [np.array([data], dtype=np.float64)]
    if kind == "multipoint":
        return [np.array([p], dtype=np.float64) for p in data]
    if kind == "linestring":
        return [np.asarray(data, dtype=np.float64)]
    if kind == "multilinestring":
        return [np.asarray(p, dtype=np.float64) for p in data]
    return None


def geometry_distance3d(kind_a: str, data_a, has_z_a: bool,
                        kind_b: str, data_b, has_z_b: bool) -> float:
    """OGRGeometry::Distance3D (ogr/ogrgeometry.cpp:3668): -1.0 unless
    BOTH operands carry Z (:3678). Exact 3-D min distance for the
    point/multipoint/linestring/multilinestring subset; areal kinds
    need SFCGAL's triangulated-surface distance in the reference and
    return the no-SFCGAL build's -1.0 here (documented approximation:
    the reference's default build returns -1.0 for EVERY input)."""
    if not (has_z_a and has_z_b):
        return -1.0
    ga = _parts3(kind_a, data_a)
    gb = _parts3(kind_b, data_b)
    if ga is None or gb is None:
        return -1.0
    return min(segments_dist3_np(pa, pb) for pa in ga for pb in gb)
