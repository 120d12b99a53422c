"""Line/ring simplification and densification kernels (NumPy).

Reference semantics:
- Simplify: OGRGeometry::Simplify / SimplifyPreserveTopology
  (/root/reference/ogr/ogr_geometry.h:581-583) — Douglas-Peucker with a
  distance tolerance (delegated to GEOS there; native here).
- Segmentize: OGRGeometry::segmentize (ogr_geometry.h:543; impl in
  ogr/ogrcurve.cpp family) — insert vertices so that no segment is longer
  than the given maximum length; existing vertices are preserved.

Both are per-feature local kernels (no neighbors, no shuffle): at engine
level they run inside Arrow pandas UDFs over WKB columns
(functions.register_all: st_simplify / st_segmentize).
"""

from __future__ import annotations

import numpy as np


def segmentize_np(pts: np.ndarray, max_len: float) -> np.ndarray:
    """Insert evenly-spaced points so every segment is <= max_len.

    pts: (n, 2). Matches OGRSimpleCurve::segmentize: each too-long segment
    splits into ceil(len/max_len) equal parts; originals kept."""
    pts = np.asarray(pts, dtype=np.float64)
    if len(pts) < 2:
        return pts.copy()
    out = [pts[:1]]
    for i in range(1, len(pts)):
        a, b = pts[i - 1], pts[i]
        seg = float(np.hypot(*(b - a)))
        n = max(1, int(np.ceil(seg / max_len)))
        if n > 1:
            t = (np.arange(1, n) / n)[:, None]
            out.append(a[None, :] * (1 - t) + b[None, :] * t)
        out.append(b[None, :])
    return np.vstack(out)


def _perp_dist(pts: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Perpendicular distance of pts to segment-line a-b (degenerate a==b
    -> euclidean distance to a)."""
    ab = b - a
    den = float(np.hypot(*ab))
    if den == 0.0:
        return np.hypot(pts[:, 0] - a[0], pts[:, 1] - a[1])
    cross = np.abs(
        ab[0] * (a[1] - pts[:, 1]) - ab[1] * (a[0] - pts[:, 0])
    )
    return cross / den


def douglas_peucker_np(pts: np.ndarray, tolerance: float) -> np.ndarray:
    """Classic Douglas-Peucker: keep points whose removal would move the
    line by more than `tolerance`. Endpoints always kept. Iterative stack
    (no recursion limit); closed rings keep their closure point."""
    pts = np.asarray(pts, dtype=np.float64)
    n = len(pts)
    if n < 3:
        return pts.copy()
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        i0, i1 = stack.pop()
        if i1 - i0 < 2:
            continue
        inner = pts[i0 + 1: i1]
        d = _perp_dist(inner, pts[i0], pts[i1])
        j = int(np.argmax(d))
        if d[j] > tolerance:
            jj = i0 + 1 + j
            keep[jj] = True
            stack.append((i0, jj))
            stack.append((jj, i1))
    return pts[keep]


def _ring_is_simple(ring: np.ndarray) -> bool:
    """No proper self-intersection and no repeated interior vertex
    (closed ring input; adjacent-edge sharing of endpoints is fine)."""
    from .clip import _split_against, _scale_of

    r = np.asarray(ring, dtype=np.float64)
    if len(r) >= 2 and (r[0] == r[-1]).all():
        r = r[:-1]
    if len(r) < 3:
        return False
    if len(np.unique(r, axis=0)) != len(r):
        return False
    edges = np.hstack([r, np.roll(r, -1, axis=0)])
    frags = _split_against(edges, edges, _scale_of(edges), skip_self=True)
    # a simple ring's edges survive self-splitting untouched (endpoint
    # contacts between ADJACENT edges split nothing: t in (0,1) only)
    return len(frags) == len(edges)


def simplify_preserve_topology_np(rings: list, tolerance: float,
                                  max_halvings: int = 8) -> list:
    """OGRGeometry::SimplifyPreserveTopology's CONTRACT (GEOS
    TopologyPreservingSimplifier there — this is an original algorithm
    with the same guarantees, not a port): every output ring is simple
    and non-degenerate, holes stay inside the shell, vertices are a
    subset of the input's.  Method: Douglas-Peucker per ring; if the
    simplified ring self-intersects or collapses, retry with halved
    tolerance (bounded), falling back to the original ring; a hole whose
    representative vertex escapes the simplified shell is kept
    unsimplified."""
    from .pip import point_in_ring_np

    def simp(ring):
        r = np.asarray(ring, dtype=np.float64)
        closed = len(r) >= 2 and (r[0] == r[-1]).all()
        tol = float(tolerance)
        for _ in range(max_halvings + 1):
            out = douglas_peucker_np(r, tol)
            if len(out) >= (4 if closed else 3) and _ring_is_simple(out):
                return out
            tol *= 0.5
        return r.copy()

    if not rings:
        return []
    shell = simp(rings[0])
    sh = shell[:-1] if (shell[0] == shell[-1]).all() else shell
    out = [shell]
    for hole in rings[1:]:
        h = simp(hole)
        hx, hy = np.array([h[0, 0]]), np.array([h[0, 1]])
        out.append(h if point_in_ring_np(hx, hy, sh)[0]
                   else np.asarray(hole, dtype=np.float64).copy())
    return out
