"""GCP-based coordinate transformers: polynomial (order 1-3) and thin
plate spline.

References:
- alg/gdal_crs.cpp (GDALCreateGCPTransformer — the GRASS CRS.C lineage):
  mean-centered source coordinates, the 10-term basis
  [1, e, n, e2, en, n2, e3, e2n, en2, n3] (term() :905-930), exact
  solve when #GCPs equals the term count else normal-equation least
  squares (calccoef :728-788), full Gauss-Jordan with partial pivoting
  (solvemat :950-1018), forward AND inverse fits
  (CRS_compute_georef_equations :680-720), the 2-GCP third-corner
  synthesis (:223-238) and the auto-order rule (:203-210).
- alg/gdal_tps.cpp + alg/thinplatespline.cpp (VizGeorefSpline2D): the
  (n+3)x(n+3) TPS system over mean-centered points with kernel
  k = d2 * log(d2), d2 the SQUARED distance (:175-182), affine rows
  1/x/y, redundant-GCP skip (gdal_tps.cpp:166-199), and forward plus
  reverse splines fitted independently (:218-227).

Both fits are DRIVER-SIDE by design: a transformer is derived from a
GCP list (never from table-scale data) — the reference does the same.
The distributed stage is the APPLICATION:
- polynomial: pure Column arithmetic (``poly.columns(x, y)``), no
  Python, whole-stage codegen;
- TPS: each output needs a dense sum over all n GCP kernels, so
  ``tps.transform_df`` ships the (n+3) coefficient vector to an
  Arrow-batched pandas UDF and evaluates the kernel matrix blockwise in
  NumPy (sub-chunks bound the batch x n distance matrix to ~64 MB).
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column, DataFrame, functions as F

MAXORDER = 3


def _terms(e: np.ndarray, n: np.ndarray, order: int) -> np.ndarray:
    """Column-stacked term() basis, rows = points."""
    cols = [np.ones_like(e), e, n]
    if order >= 2:
        cols += [e * e, e * n, n * n]
    if order >= 3:
        cols += [e * e * e, e * e * n, e * n * n, n * n * n]
    return np.stack(cols, axis=1)


def _solvemat(m: np.ndarray, a: np.ndarray, b: np.ndarray):
    """Transliterated solvemat (gdal_crs.cpp:950-1018): Gauss-Jordan
    with partial pivoting, both RHS vectors eliminated together."""
    m = m.astype(np.float64).copy()
    a = a.astype(np.float64).copy()
    b = b.astype(np.float64).copy()
    nn = len(a)
    for i in range(nn):
        piv_row = i + int(np.argmax(np.abs(m[i:, i])))
        pivot = m[piv_row, i]
        if pivot == 0.0:
            raise ValueError("GCPs are collinear: unsolvable system")
        if piv_row != i:
            m[[i, piv_row]] = m[[piv_row, i]]
            a[[i, piv_row]] = a[[piv_row, i]]
            b[[i, piv_row]] = b[[piv_row, i]]
        for i2 in range(nn):
            if i2 != i:
                factor = m[i2, i] / pivot
                m[i2, i:] -= factor * m[i, i:]
                a[i2] -= factor * a[i]
                b[i2] -= factor * b[i]
    d = np.diag(m)
    return a / d, b / d


def _calccoef(e1, n1, e2, n2, x_mean, y_mean, order):
    """calccoef: exact determination when #points == #terms, else
    normal-equation least squares — both through solvemat."""
    nterms = (order + 1) * (order + 2) // 2
    if len(e1) < nterms:
        raise ValueError(
            f"order {order} needs >= {nterms} GCPs, got {len(e1)}")
    t = _terms(np.asarray(e1) - x_mean, np.asarray(n1) - y_mean, order)
    if len(e1) == nterms:
        return _solvemat(t, np.asarray(e2), np.asarray(n2))
    # normal equations, exactly like calcls (:839-891)
    return _solvemat(t.T @ t, t.T @ np.asarray(e2), t.T @ np.asarray(n2))


class GCPPolynomialTransform:
    """GDALCreateGCPTransformer: polynomial pixel/line <-> geo fit."""

    def __init__(self, gcps, order: int = 0):
        """gcps: iterable of (pixel, line, X, Y). order 0 = the
        reference's auto rule (2 when >= 6 GCPs else 1)."""
        g = [tuple(float(v) for v in p) for p in gcps]
        if order == 0:
            order = 2 if len(g) >= 6 else 1
        if not 1 <= order <= MAXORDER:
            raise ValueError(f"order must be 1..{MAXORDER}, got {order}")
        # 2-GCP opposite-corner third-point synthesis (:223-238)
        if (len(g) == 2 and order == 1 and g[0][2] != g[1][2]
                and g[0][3] != g[1][3]):
            g.append((g[1][0], g[0][1], g[1][2], g[0][3]))
        self.order = order
        px = np.array([p[0] for p in g])
        ln = np.array([p[1] for p in g])
        gx = np.array([p[2] for p in g])
        gy = np.array([p[3] for p in g])
        self.x1_mean = float(px.sum() / len(g))
        self.y1_mean = float(ln.sum() / len(g))
        self.x2_mean = float(gx.sum() / len(g))
        self.y2_mean = float(gy.sum() / len(g))
        self.to_geo_e, self.to_geo_n = _calccoef(
            px, ln, gx, gy, self.x1_mean, self.y1_mean, order)
        self.from_geo_e, self.from_geo_n = _calccoef(
            gx, gy, px, ln, self.x2_mean, self.y2_mean, order)

    @staticmethod
    def _georef(e1, n1, E, N, order):
        """CRS_georef (:611-672) — identical op order to the Column twin."""
        out_e = E[0] + E[1] * e1 + E[2] * n1
        out_n = N[0] + N[1] * e1 + N[2] * n1
        if order >= 2:
            e2, en, n2 = e1 * e1, e1 * n1, n1 * n1
            out_e = out_e + E[3] * e2 + E[4] * en + E[5] * n2
            out_n = out_n + N[3] * e2 + N[4] * en + N[5] * n2
        if order >= 3:
            e2, n2 = e1 * e1, n1 * n1
            e3, e2n, en2, n3 = e1 * e2, e2 * n1, e1 * n2, n1 * n2
            out_e = out_e + E[6] * e3 + E[7] * e2n + E[8] * en2 + E[9] * n3
            out_n = out_n + N[6] * e3 + N[7] * e2n + N[8] * en2 + N[9] * n3
        return out_e, out_n

    def to_geo(self, pixel, line):
        return self._georef(np.asarray(pixel, float) - self.x1_mean,
                            np.asarray(line, float) - self.y1_mean,
                            self.to_geo_e, self.to_geo_n, self.order)

    def to_pixel(self, x, y):
        return self._georef(np.asarray(x, float) - self.x2_mean,
                            np.asarray(y, float) - self.y2_mean,
                            self.from_geo_e, self.from_geo_n, self.order)

    def columns(self, x: Column, y: Column,
                inverse: bool = False) -> tuple[Column, Column]:
        """The distributed application: CRS_georef as pure Column math
        (same op order as the NumPy twin -> bit-identical, and trivially
        repr-injectable into a duckdb oracle)."""
        if inverse:
            E, N = self.from_geo_e, self.from_geo_n
            e1 = x - F.lit(self.x2_mean)
            n1 = y - F.lit(self.y2_mean)
        else:
            E, N = self.to_geo_e, self.to_geo_n
            e1 = x - F.lit(self.x1_mean)
            n1 = y - F.lit(self.y1_mean)
        lits = [F.lit(float(v)) for v in E], [F.lit(float(v)) for v in N]
        return self._georef(e1, n1, lits[0], lits[1], self.order)

    def sql(self, x_expr: str, y_expr: str,
            inverse: bool = False) -> tuple[str, str]:
        """The SAME polynomial as ANSI-SQL text (repr-exact constants),
        for duckdb oracle twins."""
        if inverse:
            E, N = self.from_geo_e, self.from_geo_n
            mx, my = self.x2_mean, self.y2_mean
        else:
            E, N = self.to_geo_e, self.to_geo_n
            mx, my = self.x1_mean, self.y1_mean
        # duckdb lexes bare decimal literals as DECIMAL then casts (double
        # rounding, 1 ulp off for some values — CLAUDE.md trap); e-notation
        # lexes as DOUBLE directly
        def d(v):
            return f"{float(v):.17e}"

        e1 = f"(({x_expr}) - {d(mx)})"
        n1 = f"(({y_expr}) - {d(my)})"
        basis = ["1", e1, n1]
        if self.order >= 2:
            basis += [f"({e1}*{e1})", f"({e1}*{n1})", f"({n1}*{n1})"]
        if self.order >= 3:
            basis += [f"({e1}*({e1}*{e1}))", f"(({e1}*{e1})*{n1})",
                      f"({e1}*({n1}*{n1}))", f"({n1}*({n1}*{n1}))"]

        def fold(C):
            out = d(C[0])
            for c, t in zip(C[1:], basis[1:]):
                out = f"({out} + {d(c)} * {t})"
            return out

        return fold(list(E)), fold(list(N))


class TPSTransform:
    """GDALCreateTPSTransformer: forward + reverse thin plate splines."""

    def __init__(self, gcps):
        g = []
        seen = {}
        for p in gcps:
            p = tuple(float(v) for v in p)
            key = (p[0], p[1])
            if key in seen:
                if seen[key] == (p[2], p[3]):
                    continue  # redundant GCP (gdal_tps.cpp:174-184)
            else:
                seen[key] = (p[2], p[3])
            g.append(p)
        if len(g) < 3:
            raise ValueError("TPS needs >= 3 distinct GCPs")
        px = np.array([p[0] for p in g])
        ln = np.array([p[1] for p in g])
        gx = np.array([p[2] for p in g])
        gy = np.array([p[3] for p in g])
        self._fwd = self._solve(px, ln, gx, gy)
        self._rev = self._solve(gx, gy, px, ln)

    @staticmethod
    def _solve(sx, sy, tx, ty):
        """VizGeorefSpline2D::solve, the general (FULL) case
        (thinplatespline.cpp:545-612): mean-center, (n+3) system with
        kernel d2*log(d2) on squared distances."""
        n = len(sx)
        xm = float(sx.sum() / n)
        ym = float(sy.sum() / n)
        cx = sx - xm
        cy = sy - ym
        # degeneracy guards the reference special-cases (:488-496)
        ssxx = float((cx * cx).sum())
        ssyy = float((cy * cy).sum())
        ssxy = float((cx * cy).sum())
        delx = float(sx.max() - sx.min())
        dely = float(sy.max() - sy.min())
        if ssxx * ssyy == 0.0 or delx < 0.001 * dely or dely < 0.001 * delx \
                or abs(ssxy * ssxy / (ssxx * ssyy)) > 0.99:
            raise ValueError("degenerate / one-dimensional GCP layout "
                             "(the reference falls back to a 1-D "
                             "interpolation mode not supported here)")
        A = np.zeros((n + 3, n + 3))
        A[0, 3:] = 1.0
        A[1, 3:] = cx
        A[2, 3:] = cy
        A[3:, 0] = 1.0
        A[3:, 1] = cx
        A[3:, 2] = cy
        d2 = (cx[:, None] - cx[None, :]) ** 2 \
            + (cy[:, None] - cy[None, :]) ** 2
        with np.errstate(divide="ignore", invalid="ignore"):
            K = np.where(d2 != 0.0, d2 * np.log(np.where(d2 > 0, d2, 1.0)),
                         0.0)
        A[3:, 3:] = K
        rhs = np.zeros((n + 3, 2))
        rhs[3:, 0] = tx
        rhs[3:, 1] = ty
        coef = np.linalg.solve(A, rhs)
        return {"xm": xm, "ym": ym, "cx": cx, "cy": cy, "coef": coef}

    @staticmethod
    def _apply(model, x, y, chunk: int = 2048):
        x = np.asarray(x, float)
        y = np.asarray(y, float)
        coef = model["coef"]
        cx, cy = model["cx"], model["cy"]
        dx = x - model["xm"]
        dy = y - model["ym"]
        out = np.empty((len(x), 2))
        for lo in range(0, len(x), chunk):
            hi = min(lo + chunk, len(x))
            d2 = (dx[lo:hi, None] - cx[None, :]) ** 2 \
                + (dy[lo:hi, None] - cy[None, :]) ** 2
            with np.errstate(divide="ignore", invalid="ignore"):
                k = np.where(d2 != 0.0,
                             d2 * np.log(np.where(d2 > 0, d2, 1.0)), 0.0)
            base = np.stack([np.ones(hi - lo), dx[lo:hi], dy[lo:hi]], axis=1)
            out[lo:hi] = base @ coef[:3] + k @ coef[3:]
        return out[:, 0], out[:, 1]

    def to_geo(self, pixel, line):
        return self._apply(self._fwd, pixel, line)

    def to_pixel(self, x, y):
        return self._apply(self._rev, x, y)

    def transform_df(self, df: DataFrame, x_col: str, y_col: str,
                     inverse: bool = False,
                     out_cols: tuple[str, str] = ("tx", "ty")) -> DataFrame:
        """Distributed application: Arrow-batched pandas UDF over the
        broadcast (n+3)-coefficient model; the kernel matrix is built in
        bounded sub-chunks (2048 x n doubles) inside each batch."""
        from ..session import ship_package

        ship_package(df.sparkSession)
        model = self._rev if inverse else self._fwd
        apply_fn = TPSTransform._apply

        @F.pandas_udf("struct<x: double, y: double>")
        def _tps(xs, ys):
            import pandas as pd

            ox, oy = apply_fn(model, xs.to_numpy(), ys.to_numpy())
            return pd.DataFrame({"x": ox, "y": oy})

        # materialize the struct ONCE, then expand (a struct-field access
        # on the raw UDF column would re-evaluate the UDF per field)
        tmp = df.withColumn("_tps", _tps(F.col(x_col), F.col(y_col)))
        return (tmp.withColumn(out_cols[0], F.col("_tps.x"))
                .withColumn(out_cols[1], F.col("_tps.y")).drop("_tps"))
