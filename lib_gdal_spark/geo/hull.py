"""Convex hull (Andrew's monotone chain) and point-buffer kernels.

Reference surface: OGRGeometry::ConvexHull and ::Buffer
(/root/reference/ogr/ogr_geometry.h:560-578), which delegate to GEOS.
Here: monotone chain is exact for the hull; Buffer is implemented for
the point case as the standard n-segments-per-quadrant circle polygon
(GEOS's default quadrant discretization, 8 segments/quadrant -> 32
vertices), which is what the reference emits for point buffers up to
the same discretization choice. Buffering lines/polygons (offsetting
with self-intersection cleanup) stays out of scope without GEOS.
"""

from __future__ import annotations

import math

import numpy as np


def convex_hull_np(pts: np.ndarray) -> np.ndarray:
    """(n, 2) points -> CCW closed hull ring (m, 2), first == last.
    Collinear points on the hull boundary are dropped (GEOS behavior)."""
    pts = np.unique(np.asarray(pts, dtype=np.float64), axis=0)  # sorts x,y
    if len(pts) == 1:
        return np.vstack([pts, pts])
    if len(pts) == 2:
        return np.vstack([pts, pts[:1]])

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    lower: list = []
    for p in pts:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper: list = []
    for p in pts[::-1]:
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    ring = np.array(lower[:-1] + upper[:-1], dtype=np.float64)
    return np.vstack([ring, ring[:1]])


def point_buffer_ring(x: float, y: float, dist: float,
                      quadsegs: int = 8) -> np.ndarray:
    """Closed CCW circle ring approximating the buffer of a point."""
    n = max(1, int(quadsegs)) * 4
    ang = np.arange(n, dtype=np.float64) * (2.0 * math.pi / n)
    ring = np.column_stack([x + dist * np.cos(ang), y + dist * np.sin(ang)])
    return np.vstack([ring, ring[:1]])
