"""Incremental Delaunay triangulation + linear TIN interpolation (NumPy).

Reference: the GDALGridLinear algorithm (/root/reference/alg/gdalgrid.cpp
GGA_Linear + /root/reference/alg/delaunay.c, which wraps qhull) —
scattered points are triangulated once, then each output cell takes the
barycentric-linear value of the triangle containing its center.

This is a dependency-free Bowyer-Watson implementation sized for
BLOCK-LOCAL point sets (the distributed recast in operators/grid.py
triangulates each halo block independently). The per-insertion
circumcircle test and cavity retriangulation are VECTORIZED over the
whole triangle table (NumPy), so the n-point build is ~O(n * T) numpy
ops, not python-loop calls — ~10^4 points per block stay subsecond.
Determinism: callers sort the point set before insertion, so the
triangulation — including how co-circular ties break — depends only on
the SET of points, never on partitioning.
"""

from __future__ import annotations

import numpy as np


def delaunay(pts: np.ndarray) -> np.ndarray:
    """(n, 2) points -> (m, 3) int array of CCW index triangles.

    Duplicate points must be removed by the caller. Degenerate inputs
    (< 3 points, all collinear) return an empty array."""
    pts = np.asarray(pts, dtype=np.float64)
    n = len(pts)
    if n < 3:
        return np.empty((0, 3), dtype=np.int64)
    lo, hi = pts.min(axis=0), pts.max(axis=0)
    c = (lo + hi) / 2.0
    d = float(max(hi[0] - lo[0], hi[1] - lo[1])) * 16.0 + 1.0
    sup = np.array([[c[0] - 2 * d, c[1] - d],
                    [c[0] + 2 * d, c[1] - d],
                    [c[0], c[1] + 2 * d]])
    P = np.vstack([pts, sup])
    tris = np.array([[n, n + 1, n + 2]], dtype=np.int64)
    for i in range(n):
        px, py = P[i]
        T = P[tris]                       # (m, 3, 2)
        ax = T[:, 0, 0] - px
        ay = T[:, 0, 1] - py
        bx = T[:, 1, 0] - px
        by = T[:, 1, 1] - py
        cx = T[:, 2, 0] - px
        cy = T[:, 2, 1] - py
        det = (
            (ax * ax + ay * ay) * (bx * cy - cx * by)
            - (bx * bx + by * by) * (ax * cy - cx * ay)
            + (cx * cx + cy * cy) * (ax * by - bx * ay)
        )
        bad = det > 1e-12                 # inside circumcircle (CCW tris)
        if not bad.any():
            continue
        bad_t = tris[bad]
        tris = tris[~bad]
        # cavity boundary = edges appearing exactly once among bad tris
        e = np.concatenate([bad_t[:, [0, 1]], bad_t[:, [1, 2]],
                            bad_t[:, [2, 0]]])
        e_sorted = np.sort(e, axis=1)
        uniq, idx, cnt = np.unique(e_sorted, axis=0, return_index=True,
                                   return_counts=True)
        boundary = e[idx[cnt == 1]]       # keep ORIGINAL orientation
        new = np.column_stack([
            boundary, np.full(len(boundary), i, dtype=np.int64)])
        # original edge orientation came from CCW triangles, so (a, b, i)
        # is CCW already when the cavity is star-shaped around i; enforce
        # CCW defensively (degenerate slivers)
        A, B, C = P[new[:, 0]], P[new[:, 1]], P[new[:, 2]]
        cw = ((B[:, 0] - A[:, 0]) * (C[:, 1] - A[:, 1])
              - (B[:, 1] - A[:, 1]) * (C[:, 0] - A[:, 0])) < 0
        new[cw] = new[cw][:, [1, 0, 2]]
        tris = np.vstack([tris, new])
    out = tris[(tris < n).all(axis=1)]
    return out


def tin_interpolate(pts: np.ndarray, vals: np.ndarray, tris,
                    qx: np.ndarray, qy: np.ndarray,
                    eps: float = 1e-9) -> np.ndarray:
    """Barycentric-linear interpolation of query points over a TIN.
    Points outside every triangle get NaN (GDALGridLinear's nodata when
    no enclosing triangle exists and no radius fallback is configured)."""
    qx = np.asarray(qx, dtype=np.float64)
    qy = np.asarray(qy, dtype=np.float64)
    out = np.full(len(qx), np.nan)
    tris = np.asarray(tris, dtype=np.int64).reshape(-1, 3)
    if len(tris) == 0 or len(qx) == 0:
        return out
    todo = np.ones(len(qx), dtype=bool)
    for (ia, ib, ic) in tris:
        if not todo.any():
            break
        ax, ay = pts[ia]
        bx, by = pts[ib]
        cx, cy = pts[ic]
        det = (by - cy) * (ax - cx) + (cx - bx) * (ay - cy)
        if abs(det) < 1e-300:
            continue
        l1 = ((by - cy) * (qx - cx) + (cx - bx) * (qy - cy)) / det
        l2 = ((cy - ay) * (qx - cx) + (ax - cx) * (qy - cy)) / det
        l3 = 1.0 - l1 - l2
        inside = todo & (l1 >= -eps) & (l2 >= -eps) & (l3 >= -eps)
        if inside.any():
            out[inside] = (l1[inside] * vals[ia] + l2[inside] * vals[ib]
                           + l3[inside] * vals[ic])
            todo &= ~inside
    return out
