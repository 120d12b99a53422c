"""GCP-based georeferencing: homography fit + application.

Reference: GDALGCPsToHomography / GDALApplyHomography
(/root/reference/alg/gdal_homography.cpp:121-141 — "given a set of GCPs
perform least squares fit as a homography", with coordinate
normalization for stability). The 9-tuple layout matches the reference's
extended geotransform:

    x = (h0 + p*h1 + l*h2) / (h6 + p*h7 + l*h8)
    y = (h3 + p*h4 + l*h5) / (h6 + p*h7 + l*h8)

Fit rules mirror the reference's autotest semantics: 1 GCP -> None;
2 GCPs -> offset+scale only (no rotation); 3 -> exact affine; >= 4 ->
projective DLT least squares with inputs normalized to unit scale (the
reference's stability trick) and h6 fixed to 1 after denormalization.

`apply_homography_cols` is the distributed face: the same rational
expressions as Spark Columns, for georeferencing whole cell tables
inside whole-stage codegen.
"""

from __future__ import annotations

import numpy as np

try:
    from pyspark.sql import functions as F
except Exception:  # pragma: no cover
    F = None


def gcps_to_homography(gcps):
    """gcps: [(pixel, line, X, Y), ...] -> 9-tuple h or None."""
    g = np.asarray(gcps, dtype=np.float64).reshape(-1, 4)
    n = len(g)
    if n < 2:
        return None
    p, l, X, Y = g[:, 0], g[:, 1], g[:, 2], g[:, 3]
    if n == 2:
        dp, dl = p[1] - p[0], l[1] - l[0]
        if dp == 0.0 or dl == 0.0:
            return None
        sx = (X[1] - X[0]) / dp
        sy = (Y[1] - Y[0]) / dl
        return (X[0] - p[0] * sx, sx, 0.0,
                Y[0] - l[0] * sy, 0.0, sy, 1.0, 0.0, 0.0)

    if n >= 4:
        # degenerate-in-one-dimension rejection (gdal_homography.cpp:180)
        for arr in (p, l, X, Y):
            if abs(arr.max() - arr.min()) < 1.0e-12:
                return None

    # normalize source and target to ~unit scale (gdal_homography.cpp:155)
    def norm_params(u, v):
        cu, cv = u.mean(), v.mean()
        s = np.hypot(u - cu, v - cv).mean()
        return cu, cv, (s if s > 0 else 1.0)

    cp, cl, ss = norm_params(p, l)
    cX, cY, st = norm_params(X, Y)
    pn, ln = (p - cp) / ss, (l - cl) / ss
    Xn, Yn = (X - cX) / st, (Y - cY) / st

    if n == 3:
        A = np.column_stack([np.ones(3), pn, ln])
        try:
            hx = np.linalg.solve(A, Xn)
            hy = np.linalg.solve(A, Yn)
        except np.linalg.LinAlgError:
            return None
        hn = (hx[0], hx[1], hx[2], hy[0], hy[1], hy[2], 1.0, 0.0, 0.0)
    else:
        # DLT with h6 = 1: unknowns (h0..h5, h7, h8)
        Z = np.zeros(n)
        O = np.ones(n)
        Ax = np.column_stack([O, pn, ln, Z, Z, Z, -Xn * pn, -Xn * ln])
        Ay = np.column_stack([Z, Z, Z, O, pn, ln, -Yn * pn, -Yn * ln])
        A = np.vstack([Ax, Ay])
        b = np.concatenate([Xn, Yn])
        sol, *_ = np.linalg.lstsq(A, b, rcond=None)
        hn = (sol[0], sol[1], sol[2], sol[3], sol[4], sol[5],
              1.0, sol[6], sol[7])

    # denormalize: x = st*Xn + cX with pn = (p-cp)/ss etc.
    h0, h1, h2, h3, h4, h5, h6, h7, h8 = hn
    d6 = h6 - (h7 * cp + h8 * cl) / ss
    d7, d8 = h7 / ss, h8 / ss
    n0 = st * (h0 - (h1 * cp + h2 * cl) / ss) + cX * d6
    n1 = st * h1 / ss + cX * d7
    n2 = st * h2 / ss + cX * d8
    n3 = st * (h3 - (h4 * cp + h5 * cl) / ss) + cY * d6
    n4 = st * h4 / ss + cY * d7
    n5 = st * h5 / ss + cY * d8
    if d6 == 0.0:
        return None
    h = tuple(float(v / d6) for v in (n0, n1, n2, n3, n4, n5,
                                      d6, d7, d8)) [:6] + (
        1.0, float(d7 / d6), float(d8 / d6))

    if n >= 4:
        # Hour-glass / fold rejection (gdal_homography.cpp:288-318, issue
        # 11618): the fitted homography must map the unit square of the
        # reference's min-max pixel normalization — i.e. the GCP pixel
        # bounding box — to a CONVEX quadrilateral. Checking in final geo
        # space is equivalent: the denormalization is affine, and an
        # affine map flips the sign of both cross products together, so
        # sign(cross12 * cross23) is invariant.
        bx = np.array([p.min(), p.max(), p.max(), p.min()])
        by = np.array([l.min(), l.min(), l.max(), l.max()])
        qx, qy = apply_homography(h, bx, by)
        if not (np.isfinite(qx).all() and np.isfinite(qy).all()):
            return None
        vx, vy = qx - qx[0], qy - qy[0]
        cross12 = vx[1] * vy[2] - vx[2] * vy[1]
        cross23 = vx[2] * vy[3] - vx[3] * vy[2]
        if cross12 * cross23 <= 0.0:
            return None
    return h


def apply_homography(h, p, l):
    """Vectorized NumPy application -> (x, y)."""
    p = np.asarray(p, dtype=np.float64)
    l = np.asarray(l, dtype=np.float64)
    den = h[6] + p * h[7] + l * h[8]
    return ((h[0] + p * h[1] + l * h[2]) / den,
            (h[3] + p * h[4] + l * h[5]) / den)


def apply_homography_cols(h, p, l):
    """Spark Column application -> (x, y) — georeference a cell table
    JVM-side."""
    den = F.lit(h[6]) + p * F.lit(h[7]) + l * F.lit(h[8])
    return ((F.lit(h[0]) + p * F.lit(h[1]) + l * F.lit(h[2])) / den,
            (F.lit(h[3]) + p * F.lit(h[4]) + l * F.lit(h[5])) / den)
