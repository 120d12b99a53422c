"""Geolocation-array (GEOLOC) transformer.

Reference: alg/gdalgeoloc.cpp — the last member of the GenImgProj
transformer family (geotransform / GCP polynomial / TPS / RPC /
homography are in gcptransform.py, rpc.py, homography.py). A scene
carries per-node longitude/latitude arrays (possibly subsampled by
PIXEL_STEP/LINE_STEP with PIXEL_OFFSET/LINE_OFFSET, metadata domain
"GEOLOCATION"); the forward transform bilinearly interpolates those
arrays (alg/gdalgeoloc.cpp:393 PixelLineToXY, with the
infinite-extension edge retries and the anti-meridian +-360 shift of
alg/gdalgeoloc.h:72 ShiftGeoX), and the inverse walks from a backmap
initial guess through a ring-spiral search for the forward quad that
contains the target, then solves the exact inverse bilinear
interpolation (alg/gdalgeoloc.cpp:967 GDALInverseBilinearInterpolation,
quadratic in s).

Spark-first shape: the geoloc arrays are a per-scene sidecar (like RPC
coefficients or a GCP matrix) — kilobytes to a few megabytes — so they
broadcast to executors; the page/point table is the distributed side.
Two surfaces:

- a pure-NumPy kernel pair (``forward`` / ``inverse``) used from Arrow
  pandas UDFs, faithful to the reference including nodata, 1-D
  "regular grid" arrays (alg/gdalgeoloc.cpp:1971), edge retries and
  dateline handling;
- a fully relational forward for dense no-nodata grids
  (``geoloc_forward_cells``): the geoloc table is broadcast and each
  point takes FOUR broadcast hash joins (one per corner) — no Exchange
  at all on the point side, so the plan scales to any point count. Its
  float op order matches the NumPy kernel and the duckdb oracle
  term-for-term, so the driver query hashes bit-exactly.

The inverse's backmap is deliberately NOT a bit-faithful replay of
GeoLocGenerateBackMap (alg/gdalgeoloc.cpp:1013): the reference itself
only uses the backmap as an approximate seed when
GDAL_GEOLOC_USE_MAX_ACCURACY is on (the default), then replaces it with
the exact inverse-bilinear solution of the containing quad — any seed
that lands within the spiral radius yields the identical final answer.
We build a simpler scatter+fill seed grid and replicate the refinement
exactly.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass
class GeolocArray:
    """GEOLOCATION metadata + arrays (alg/gdalgeoloc.cpp:1800-1870).

    lon/lat are (H, W) float64, indexed [line, pixel]. The 1-D
    "regular grid" form (X band 1 x W, Y band 1 x H,
    alg/gdalgeoloc.cpp:1942-1974) is expanded by ``from_regular``.
    """

    lon: np.ndarray
    lat: np.ndarray
    pixel_offset: float = 0.0
    pixel_step: float = 1.0
    line_offset: float = 0.0
    line_step: float = 1.0
    #: GEOREFERENCING_CONVENTION: TOP_LEFT_CORNER -> True (offset 0),
    #: PIXEL_CENTER -> False (offset 0.5). gdalgeoloc.cpp:606.
    origin_top_left: bool = True
    #: geographic SRS with lon in [-180,180]: enables ShiftGeoX.
    geographic: bool = False
    nodata: float | None = None
    _backmap: tuple | None = field(default=None, repr=False, compare=False)

    def __post_init__(self):
        self.lon = np.ascontiguousarray(self.lon, dtype=np.float64)
        self.lat = np.ascontiguousarray(self.lat, dtype=np.float64)
        if self.lon.shape != self.lat.shape or self.lon.ndim != 2:
            raise ValueError("lon/lat must be identically-shaped 2-D")

    @classmethod
    def from_regular(cls, lon_per_pixel, lat_per_line, **kw):
        """1-D geoloc bands: lon varies only with pixel, lat only with
        line (alg/gdalgeoloc.cpp:1971 bIsRegularGrid)."""
        lon = np.asarray(lon_per_pixel, np.float64)
        lat = np.asarray(lat_per_line, np.float64)
        return cls(lon=np.tile(lon, (lat.size, 1)),
                   lat=np.repeat(lat, lon.size).reshape(lat.size, lon.size),
                   **kw)

    @property
    def shape(self):
        return self.lon.shape  # (H, W)

    @property
    def conv_offset(self) -> float:
        return 0.0 if self.origin_top_left else 0.5


def _shift_geox(gl: GeolocArray, ref: np.ndarray, x: np.ndarray) -> np.ndarray:
    """alg/gdalgeoloc.h:72 — pull x to ref's side of the anti-meridian."""
    if not gl.geographic:
        return x
    out = np.where((ref < -170.0) & (x > 170.0), x - 360.0, x)
    out = np.where((ref > 170.0) & (out < -170.0), out + 360.0, out)
    return out


def _unshift_geox(gl: GeolocArray, x: np.ndarray) -> np.ndarray:
    """alg/gdalgeoloc.cpp:72 UnshiftGeoX — renormalize to [-180,180]."""
    if not gl.geographic:
        return x
    m = (x > 180.0) | (x < -180.0)
    if not np.any(m):
        return x
    w = np.fmod(x + 180.0, 360.0)
    w = np.where(w < 0, w + 180.0, w - 180.0)
    return np.where(m, w, x)


def _valid(gl: GeolocArray, lx: np.ndarray) -> np.ndarray:
    if gl.nodata is None:
        return np.ones_like(lx, dtype=bool)
    return lx != gl.nodata


def pixel_line_to_xy(gl: GeolocArray, gp, glin):
    """Vectorized PixelLineToXY (alg/gdalgeoloc.cpp:393): geoloc-array
    coordinates (already offset/step adjusted) -> geo X/Y.

    Returns (x, y, ok). Faithful to the two-attempt retry loop: the
    right/bottom-edge retries step one node in, then the main bilinear
    with infinite extension (fraction from the ORIGINAL coordinate, so
    it extrapolates); nodata corners fall through to the 1-D / point
    branches in the reference's order.
    """
    gp = np.asarray(gp, np.float64)
    glin = np.asarray(glin, np.float64)
    H, W = gl.shape
    lon, lat = gl.lon, gl.lat
    iX = np.minimum(np.maximum(0.0, gp), float(W - 1)).astype(np.int64)
    iY = np.minimum(np.maximum(0.0, glin), float(H - 1)).astype(np.int64)
    x = np.full(gp.shape, np.nan)
    y = np.full(gp.shape, np.nan)
    ok = np.ones(gp.shape, dtype=bool)
    done = np.zeros(gp.shape, dtype=bool)

    def g(arr, jj, ii):
        # clipped gather; callers mask out-of-range lanes themselves
        return arr[np.minimum(jj, H - 1), np.minimum(ii, W - 1)]

    for _attempt in range(2):
        act = ~done
        if not np.any(act):
            break
        X00 = g(lon, iY, iX)
        Y00 = g(lat, iY, iX)
        bad = act & ~_valid(gl, X00)
        ok[bad] = False
        done |= bad
        act = act & ~bad
        in_main = act & (iX + 1 < W) & (iY + 1 < H)
        X10 = g(lon, iY, iX + 1)
        X01 = g(lon, iY + 1, iX)
        X11 = g(lon, iY + 1, iX + 1)
        corners_ok = (_valid(gl, X10) & _valid(gl, X01) & _valid(gl, X11))
        main = in_main & corners_ok
        if np.any(main):
            Y10 = g(lat, iY, iX + 1)
            Y01 = g(lat, iY + 1, iX)
            Y11 = g(lat, iY + 1, iX + 1)
            fx = gp - iX
            fy = glin - iY
            X10s = _shift_geox(gl, X00, X10)
            X01s = _shift_geox(gl, X00, X01)
            X11s = _shift_geox(gl, X00, X11)
            # exact reference op order (gdalgeoloc.cpp:444-457)
            xm = ((1.0 - fy) * (X00 + fx * (X10s - X00))
                  + fy * (X01s + fx * (X11s - X01s)))
            ym = ((1.0 - fy) * (Y00 + fx * (Y10 - Y00))
                  + fy * (Y01 + fx * (Y11 - Y01)))
            x[main] = _unshift_geox(gl, xm)[main]
            y[main] = ym[main]
            done |= main
        act = act & ~main
        # retry branches (continue): step inside the grid and re-run
        ra = act & (iX == W - 1) & (iX >= 1) & (iY + 1 < H)
        rb = act & ~ra & (iY == H - 1) & (iY >= 1) & (iX + 1 < W)
        rc = (act & ~ra & ~rb
              & (iX == W - 1) & (iY == H - 1) & (iX >= 1) & (iY >= 1))
        iX = np.where(ra | rc, iX - 1, iX)
        iY = np.where(rb | rc, iY - 1, iY)
        rest = act & ~ra & ~rb & ~rc
        if np.any(rest):
            dmask = rest & (iX + 1 < W) & _valid(gl, g(lon, iY, iX + 1))
            if np.any(dmask):
                fx = gp - iX
                xd = X00 + fx * (_shift_geox(gl, X00, X10) - X00)
                yd = Y00 + fx * (g(lat, iY, iX + 1) - Y00)
                x[dmask] = _unshift_geox(gl, xd)[dmask]
                y[dmask] = yd[dmask]
            emask = (rest & ~dmask & (iY + 1 < H)
                     & _valid(gl, g(lon, iY + 1, iX)))
            if np.any(emask):
                fy = glin - iY
                xe = X00 + fy * (_shift_geox(gl, X00, X01) - X00)
                ye = Y00 + fy * (g(lat, iY + 1, iX) - Y00)
                x[emask] = _unshift_geox(gl, xe)[emask]
                y[emask] = ye[emask]
            fmask = rest & ~dmask & ~emask
            if np.any(fmask):
                x[fmask] = _unshift_geox(gl, X00)[fmask]
                y[fmask] = Y00[fmask]
            done |= rest
    return x, y, ok


def forward(gl: GeolocArray, px, py):
    """Raster pixel/line -> geo X/Y (gdalgeoloc.cpp:611-646 forward
    branch): offset/step to geoloc-array coords, then bilinear."""
    px = np.asarray(px, np.float64)
    py = np.asarray(py, np.float64)
    conv = gl.conv_offset
    gp = (px - gl.pixel_offset) / gl.pixel_step - conv
    gli = (py - gl.line_offset) / gl.line_step - conv
    return pixel_line_to_xy(gl, gp, gli)


def _int_plxy(gl: GeolocArray, ii: np.ndarray, jj: np.ndarray):
    """Integer-corner PixelLineToXY (alg/gdalgeoloc.cpp:530): direct
    array value when in range (nodata-checked), else the double path."""
    H, W = gl.shape
    inr = (ii >= 0) & (ii < W) & (jj >= 0) & (jj < H)
    x = np.empty(ii.shape, np.float64)
    y = np.empty(ii.shape, np.float64)
    ok = np.ones(ii.shape, bool)
    if np.any(inr):
        ic = np.minimum(np.maximum(ii, 0), W - 1)
        jc = np.minimum(np.maximum(jj, 0), H - 1)
        lx = gl.lon[jc, ic]
        ly = gl.lat[jc, ic]
        v = _valid(gl, lx)
        x[inr] = _unshift_geox(gl, lx)[inr]
        y[inr] = ly[inr]
        ok[inr & ~v] = False
    out = ~inr
    if np.any(out):
        xo, yo, oko = pixel_line_to_xy(
            gl, ii.astype(np.float64), jj.astype(np.float64))
        x[out] = xo[out]
        y[out] = yo[out]
        ok[out] = oko[out]
    return x, y, ok


def _build_backmap(gl: GeolocArray):
    """Seed grid for the inverse: scatter every geoloc node's (i, j)
    into a 2x-oversampled geo-extent raster, then fill holes along rows
    and columns. Deterministic (row-major last-write) — and only a
    SEED: the exact inverse-bilinear refinement below makes the final
    answer independent of how this grid was built (see module doc).

    Anti-meridian: a grid that truly crosses the dateline (an adjacent
    node pair jumps >180°) would stretch the extent to ~360° and make
    the seed raster uselessly coarse, so the backmap is built over
    UNWRAPPED longitudes ([0, 360) domain) and ``inverse`` maps its
    query x the same way. (The seam moves to lon 0; like the
    reference's backmap, a full 360° band has a seam somewhere.)"""
    H, W = gl.shape
    vm = _valid(gl, gl.lon)
    wrapped = bool(
        gl.geographic
        and np.any(np.abs(np.diff(np.where(vm, gl.lon, np.nan), axis=1))
                   > 180.0))
    if wrapped:
        gl = GeolocArray(
            lon=np.where(vm & (gl.lon < 0), gl.lon + 360.0, gl.lon),
            lat=gl.lat, nodata=gl.nodata, geographic=False)
    lons = gl.lon[vm]
    lats = gl.lat[vm]
    if lons.size == 0:
        raise ValueError("geoloc array is all-nodata")
    x0, x1 = float(lons.min()), float(lons.max())
    y0, y1 = float(lats.min()), float(lats.max())
    bw = min(4096, max(2, 2 * W))
    bh = min(4096, max(2, 2 * H))
    dx = (x1 - x0) / bw or 1.0
    dy = (y1 - y0) / bh or 1.0
    bi = np.full((bh, bw), np.nan)
    bj = np.full((bh, bw), np.nan)
    jn, in_ = np.nonzero(vm)
    cx = np.clip(((gl.lon[jn, in_] - x0) / dx).astype(np.int64), 0, bw - 1)
    cy = np.clip(((gl.lat[jn, in_] - y0) / dy).astype(np.int64), 0, bh - 1)
    bi[cy, cx] = in_
    bj[cy, cx] = jn

    def _fill_along_rows(a):
        # last-valid-to-the-left, else first-valid-to-the-right
        n = a.shape[1]
        idx = np.where(~np.isnan(a), np.arange(n)[None, :], -1)
        np.maximum.accumulate(idx, axis=1, out=idx)
        left = np.where(idx >= 0,
                        np.take_along_axis(a, np.maximum(idx, 0), 1), np.nan)
        ar = a[:, ::-1]
        ridx = np.where(~np.isnan(ar), np.arange(n)[None, :], -1)
        np.maximum.accumulate(ridx, axis=1, out=ridx)
        right = np.where(ridx >= 0,
                         np.take_along_axis(ar, np.maximum(ridx, 0), 1),
                         np.nan)[:, ::-1]
        a[:] = np.where(np.isnan(left), right, left)

    for arr in (bi, bj):
        _fill_along_rows(arr)        # row fill
        _fill_along_rows(arr.T)      # then column fill (view writes back)
    return (x0, dx, y0, dy, bw, bh, bi, bj, wrapped)


def _backmap(gl: GeolocArray):
    if gl._backmap is None:
        gl._backmap = _build_backmap(gl)
    return gl._backmap


def _spiral_offsets(radius: int):
    """The reference's ring walk (gdalgeoloc.cpp:828-846): r=0 then for
    each r, 8r steps in its exact iter order."""
    out = [(0, 0)]
    for r in range(1, radius + 1):
        for it in range(8 * r):
            if it < 2 * r:
                sx, sy = -r + it, r
            elif it < 4 * r:
                sx, sy = r, r - (it - 2 * r)
            elif it < 6 * r:
                sx, sy = r - (it - 4 * r), -r
            else:
                sx, sy = -r, -r + (it - 6 * r)
            out.append((sx, sy))
    return out


def _point_in_quad(px, py, x0, y0, x1, y1, x2, y2, x3, y3):
    """Even-odd ray cast + on-boundary over the quad ring
    (x0,y0)-(x2,y2)-(x3,y3)-(x1,y1) — the reference's
    isPointInRing || isPointOnRingBoundary (gdalgeoloc.cpp:893)."""
    rx = np.stack([x0, x2, x3, x1, x0])
    ry = np.stack([y0, y2, y3, y1, y0])
    inside = np.zeros(px.shape, bool)
    onb = np.zeros(px.shape, bool)
    for k in range(4):
        ax, ay, bx, by = rx[k], ry[k], rx[k + 1], ry[k + 1]
        cond = (ay > py) != (by > py)
        with np.errstate(divide="ignore", invalid="ignore"):
            t = np.where(cond, (py - ay) / (by - ay), 0.0)
            xi = ax + t * (bx - ax)
        inside ^= cond & (px < xi)
        # boundary: collinear and within the segment bbox
        cross = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
        onb |= ((cross == 0.0)
                & (px >= np.minimum(ax, bx)) & (px <= np.maximum(ax, bx))
                & (py >= np.minimum(ay, by)) & (py <= np.maximum(ay, by)))
    return inside | onb


def _inverse_bilinear(x, y, x0, y0, x1, y1, x2, y2, x3, y3, i, j):
    """Exact inverse bilinear (alg/gdalgeoloc.cpp:967), vectorized.
    Corner naming matches the reference: (x0,y0)=cell origin,
    (x1,y1)=+line, (x2,y2)=+pixel, (x3,y3)=+both. Updates (i, j)."""
    A = (x0 - x) * (y0 - y2) - (y0 - y) * (x0 - x2)
    B = (((x0 - x) * (y1 - y3) - (y0 - y) * (x1 - x3))
         + ((x1 - x) * (y0 - y2) - (y1 - y) * (x0 - x2))) / 2.0
    C = (x1 - x) * (y1 - y3) - (y1 - y) * (x1 - x3)
    denom = A - 2.0 * B + C
    mag = np.abs(A) + np.abs(B) + np.abs(C)
    lin = np.abs(denom) <= 1e-12 * mag
    with np.errstate(divide="ignore", invalid="ignore"):
        s_lin = A / (A - C)
        disc = np.sqrt(np.maximum(B * B - A * C, 0.0))
        s1 = ((A - B) + disc) / np.where(denom == 0, 1.0, denom)
        s2 = ((A - B) - disc) / np.where(denom == 0, 1.0, denom)
    s_quad = np.where((s1 < 0) | (s1 > 1), s2, s1)
    s = np.where(lin, s_lin, s_quad)
    t_dx = (1.0 - s) * (x0 - x2) + s * (x1 - x3)
    t_dy = (1.0 - s) * (y0 - y2) + s * (y1 - y3)
    with np.errstate(divide="ignore", invalid="ignore"):
        di_x = ((1.0 - s) * (x0 - x) + s * (x1 - x)) / t_dx
        di_y = ((1.0 - s) * (y0 - y) + s * (y1 - y)) / t_dy
    use_x = np.abs(t_dx) > 1e-12 * mag
    use_y = ~use_x & (np.abs(t_dy) > 1e-12 * mag)
    i = i + np.where(use_x, di_x, np.where(use_y, di_y, 0.0))
    j = j + s
    return i, j


def inverse(gl: GeolocArray, gx, gy):
    """Geo X/Y -> raster pixel/line (gdalgeoloc.cpp:653-962 inverse
    branch, GDAL_GEOLOC_USE_MAX_ACCURACY=YES path): backmap seed, ring
    spiral for the containing forward quad, exact inverse bilinear.

    Returns (px, py, ok)."""
    gx = np.asarray(gx, np.float64)
    gy = np.asarray(gy, np.float64)
    H, W = gl.shape
    x0b, dxb, y0b, dyb, bw, bh, bi, bj, bwrap = _backmap(gl)
    gxs = np.where(gx < 0, gx + 360.0, gx) if bwrap else gx
    bx = np.clip(((gxs - x0b) / dxb).astype(np.int64), 0, bw - 1)
    by = np.clip(((gy - y0b) / dyb).astype(np.int64), 0, bh - 1)
    seed_i = bi[by, bx]
    seed_j = bj[by, bx]
    seed_i = np.where(np.isnan(seed_i), 0.0, seed_i)
    seed_j = np.where(np.isnan(seed_j), 0.0, seed_j)
    base_i = np.floor(seed_i).astype(np.int64)
    base_j = np.floor(seed_j).astype(np.int64)

    px = np.full(gx.shape, np.nan)
    py = np.full(gx.shape, np.nan)
    done = np.zeros(gx.shape, bool)
    if gl.geographic:
        radius = np.where(np.abs(gy) >= 85.0, 5, 3)
    else:
        radius = np.full(gx.shape, 3, np.int64)
    rmax = int(radius.max()) if radius.size else 3
    for sx, sy in _spiral_offsets(rmax):
        todo = ~done & (max(abs(sx), abs(sy)) <= radius)
        if not np.any(todo):
            continue
        ii = base_i + sx
        jj = base_j + sy
        todo &= ~(ii >= W) & ~(jj >= H)  # gdalgeoloc.cpp:848 skip
        todo &= (ii >= -1) | (jj >= -1)  # gdalgeoloc.cpp:856
        if not np.any(todo):
            continue
        xq0, yq0, ok0 = _int_plxy(gl, ii, jj)
        xq2, yq2, ok2 = _int_plxy(gl, ii + 1, jj)
        xq1, yq1, ok1 = _int_plxy(gl, ii, jj + 1)
        xq3, yq3, ok3 = _int_plxy(gl, ii + 1, jj + 1)
        todo &= ok0 & ok1 & ok2 & ok3
        if not np.any(todo):
            continue
        qx = gx.copy()
        # anti-meridian quad (gdalgeoloc.cpp:868-886): shift all four
        # corners to the negative side, then test both +0 and +360
        wrap = np.zeros(gx.shape, bool)
        if gl.geographic:
            wrap = ((np.abs(xq0) > 170) & (np.abs(xq1) > 170)
                    & (np.abs(xq2) > 170) & (np.abs(xq3) > 170)
                    & ((np.abs(xq1 - xq0) > 180) | (np.abs(xq2 - xq0) > 180)
                       | (np.abs(xq3 - xq0) > 180)))
            for arr in (xq0, xq1, xq2, xq3):
                arr[wrap & (arr > 0)] -= 360.0
        for it in range(2):
            cx0, cx1, cx2, cx3 = (xq0 + 360.0 * it, xq1 + 360.0 * it,
                                  xq2 + 360.0 * it, xq3 + 360.0 * it)
            sel = todo if it == 0 else (todo & wrap)
            if not np.any(sel):
                continue
            hit = sel & _point_in_quad(qx, gy, cx0, yq0, cx1, yq1,
                                       cx2, yq2, cx3, yq3)
            if not np.any(hit):
                continue
            fi, fj = _inverse_bilinear(
                qx, gy, cx0, yq0, cx1, yq1, cx2, yq2, cx3, yq3,
                ii.astype(np.float64), jj.astype(np.float64))
            conv = gl.conv_offset
            px[hit] = ((fi + conv) * gl.pixel_step + gl.pixel_offset)[hit]
            py[hit] = ((fj + conv) * gl.line_step + gl.line_offset)[hit]
            done |= hit
    return px, py, done.copy()


def cells_df(spark, gl: GeolocArray):
    """Quad-corner table for the relational forward: one row per
    geoloc-array cell (gi, gj) carrying its four corner lon/lats.
    Corner naming matches ``_inverse_bilinear`` / the reference
    (gdalgeoloc.cpp:444): 00 = origin, 10 = +pixel, 01 = +line,
    11 = +both. The table is (H-1)*(W-1) rows — kilobytes to a few
    megabytes for real scenes — so callers broadcast it; the point
    side never shuffles.

    Requires a dense, nodata-free, non-anti-meridian grid (the NumPy
    ``forward`` kernel handles those cases)."""
    import pandas as pd

    if gl.nodata is not None and not np.all(_valid(gl, gl.lon)):
        raise ValueError("relational forward requires a nodata-free grid")
    if gl.geographic and (np.abs(np.diff(gl.lon, axis=1)) > 180).any():
        raise ValueError("anti-meridian grids need the NumPy kernel")
    H, W = gl.shape
    jj, ii = np.meshgrid(np.arange(H - 1), np.arange(W - 1), indexing="ij")
    pdf = pd.DataFrame({
        "gi": ii.ravel().astype(np.int64),
        "gj": jj.ravel().astype(np.int64),
        "x00": gl.lon[:-1, :-1].ravel(), "y00": gl.lat[:-1, :-1].ravel(),
        "x10": gl.lon[:-1, 1:].ravel(), "y10": gl.lat[:-1, 1:].ravel(),
        "x01": gl.lon[1:, :-1].ravel(), "y01": gl.lat[1:, :-1].ravel(),
        "x11": gl.lon[1:, 1:].ravel(), "y11": gl.lat[1:, 1:].ravel(),
    })
    return spark.createDataFrame(pdf)


def forward_cells(points, cells, gl: GeolocArray, px="px", py="py"):
    """Fully relational forward transform (main bilinear branch of
    gdalgeoloc.cpp:444-457 only): broadcast-join each point to its
    containing cell and evaluate the bilinear in the reference's exact
    op order. Points whose geoloc coordinates fall outside
    [0, W-1) x [0, H-1) are dropped by the inner join (the NumPy
    kernel's edge retries / extrapolation cover those).

    Adds ``geo_x`` / ``geo_y``; preserves the point columns. The only
    join is broadcast-hash on the (small) cell table — zero Exchange
    on the point side, so the plan scales to any point count."""
    from pyspark.sql import functions as F

    conv = float(gl.conv_offset)
    gp = (F.col(px) - gl.pixel_offset) / gl.pixel_step - conv
    gli = (F.col(py) - gl.line_offset) / gl.line_step - conv
    pts = points.withColumn("_gp", gp).withColumn("_gl", gli)
    pts = (pts.withColumn("_gi", F.floor("_gp").cast("long"))
              .withColumn("_gj", F.floor("_gl").cast("long")))
    fx = F.col("_gp") - F.col("_gi")
    fy = F.col("_gl") - F.col("_gj")
    joined = pts.join(F.broadcast(cells),
                      (pts["_gi"] == cells["gi"]) & (pts["_gj"] == cells["gj"]))
    x00, x10, x01, x11 = (F.col(c) for c in ("x00", "x10", "x01", "x11"))
    y00, y10, y01, y11 = (F.col(c) for c in ("y00", "y10", "y01", "y11"))
    gx = ((F.lit(1.0) - fy) * (x00 + fx * (x10 - x00))
          + fy * (x01 + fx * (x11 - x01)))
    gy = ((F.lit(1.0) - fy) * (y00 + fx * (y10 - y00))
          + fy * (y01 + fx * (y11 - y01)))
    keep = [c for c in points.columns]
    return joined.select(*keep, gx.alias("geo_x"), gy.alias("geo_y"))


def roundtrip_cells(points, cells, gl: GeolocArray, px="px", py="py"):
    """Forward + exact inverse bilinear, fully relationally: the
    broadcast cell join of ``forward_cells`` computes (geo_x, geo_y),
    then the SAME row's corners feed the reference's exact
    inverse-bilinear solve (alg/gdalgeoloc.cpp:967
    GDALInverseBilinearInterpolation, quadratic in s) in Column math —
    corner naming 0=origin, 1=+line, 2=+pixel, 3=+both — recovering
    (px_rec, py_rec). This is the refinement step the NumPy ``inverse``
    applies after its spiral search; here the containing quad is the
    joined cell, so no search is needed and the whole chain is one
    broadcast join + column expressions (zero point-side Exchange).

    The op order is the bit-for-bit template shared with the duckdb
    oracle (division guards via CASE so no lane divides by ~0 in
    either engine; sqrt is correctly rounded IEEE in both)."""
    from pyspark.sql import functions as F

    conv = float(gl.conv_offset)
    gp = (F.col(px) - gl.pixel_offset) / gl.pixel_step - conv
    gli = (F.col(py) - gl.line_offset) / gl.line_step - conv
    pts = points.withColumn("_gp", gp).withColumn("_gl", gli)
    pts = (pts.withColumn("_gi", F.floor("_gp").cast("long"))
              .withColumn("_gj", F.floor("_gl").cast("long")))
    fx = F.col("_gp") - F.col("_gi")
    fy = F.col("_gl") - F.col("_gj")
    joined = pts.join(F.broadcast(cells),
                      (pts["_gi"] == cells["gi"]) & (pts["_gj"] == cells["gj"]))
    x00, x10, x01, x11 = (F.col(c) for c in ("x00", "x10", "x01", "x11"))
    y00, y10, y01, y11 = (F.col(c) for c in ("y00", "y10", "y01", "y11"))
    gx = ((F.lit(1.0) - fy) * (x00 + fx * (x10 - x00))
          + fy * (x01 + fx * (x11 - x01)))
    gy = ((F.lit(1.0) - fy) * (y00 + fx * (y10 - y00))
          + fy * (y01 + fx * (y11 - y01)))
    j2 = joined.withColumn("geo_x", gx).withColumn("geo_y", gy)
    gxc, gyc = F.col("geo_x"), F.col("geo_y")
    # exact inverse bilinear, reference op order (gdalgeoloc.cpp:967)
    A = (x00 - gxc) * (y00 - y10) - (y00 - gyc) * (x00 - x10)
    B = (((x00 - gxc) * (y01 - y11) - (y00 - gyc) * (x01 - x11))
         + ((x01 - gxc) * (y00 - y10) - (y01 - gyc) * (x00 - x10))) / 2.0
    C = (x01 - gxc) * (y01 - y11) - (y01 - gyc) * (x01 - x11)
    j2 = (j2.withColumn("_A", A).withColumn("_B", B).withColumn("_C", C))
    A, B, C = F.col("_A"), F.col("_B"), F.col("_C")
    denom = A - 2.0 * B + C
    mag = F.abs(A) + F.abs(B) + F.abs(C)
    lin = F.abs(denom) <= 1e-12 * mag
    s_lin = A / F.when(lin, A - C).otherwise(F.lit(1.0))
    disc = F.sqrt(F.greatest(B * B - A * C, F.lit(0.0)))
    dsafe = F.when(lin, F.lit(1.0)).otherwise(denom)
    s1 = ((A - B) + disc) / dsafe
    s2 = ((A - B) - disc) / dsafe
    s_quad = F.when((s1 < 0) | (s1 > 1), s2).otherwise(s1)
    j2 = j2.withColumn("_s", F.when(lin, s_lin).otherwise(s_quad))
    s = F.col("_s")
    t_dx = (F.lit(1.0) - s) * (x00 - x10) + s * (x01 - x11)
    t_dy = (F.lit(1.0) - s) * (y00 - y10) + s * (y01 - y11)
    use_x = F.abs(t_dx) > 1e-12 * mag
    use_y = (~use_x) & (F.abs(t_dy) > 1e-12 * mag)
    di_x = (((F.lit(1.0) - s) * (x00 - gxc) + s * (x01 - gxc))
            / F.when(use_x, t_dx).otherwise(F.lit(1.0)))
    di_y = (((F.lit(1.0) - s) * (y00 - gyc) + s * (y01 - gyc))
            / F.when(use_y, t_dy).otherwise(F.lit(1.0)))
    fi = (F.col("_gi").cast("double")
          + F.when(use_x, di_x).otherwise(
              F.when(use_y, di_y).otherwise(F.lit(0.0))))
    fj = F.col("_gj").cast("double") + s
    px_rec = (fi + conv) * gl.pixel_step + gl.pixel_offset
    py_rec = (fj + conv) * gl.line_step + gl.line_offset
    keep = [c for c in points.columns]
    return j2.select(*keep, gxc.alias("geo_x"), gyc.alias("geo_y"),
                     px_rec.alias("px_rec"), py_rec.alias("py_rec"))


def transform_df(df, gl: GeolocArray, x_col: str, y_col: str,
                 inverse: bool = False,
                 out_cols: tuple = ("tx", "ty", "t_ok")):
    """Distributed application of the NumPy kernels (the general path:
    nodata, edge retries, anti-meridian, spiral-search inverse — cases
    the relational ``forward_cells`` refuses). The geoloc arrays are a
    per-scene sidecar (kilobytes to a few MB), broadcast inside the
    Arrow pandas UDF closure exactly like the TPS/RPC appliers; the
    point side never shuffles. The inverse's backmap is built once per
    executor on first batch (cached on the GeolocArray)."""
    from pyspark.sql import functions as F

    from ..session import ship_package

    ship_package(df.sparkSession)
    fn = globals()["inverse" if inverse else "forward"]
    gl_ref = gl

    @F.pandas_udf("struct<x: double, y: double, ok: boolean>")
    def _geoloc(xs, ys):
        import pandas as pd

        ox, oy, ok = fn(gl_ref, xs.to_numpy(np.float64),
                        ys.to_numpy(np.float64))
        return pd.DataFrame({"x": ox, "y": oy, "ok": ok})

    # materialize the struct ONCE, then expand (a struct-field access
    # on the raw UDF column would re-evaluate the UDF per field)
    tmp = df.withColumn("_glc", _geoloc(F.col(x_col), F.col(y_col)))
    return (tmp.withColumn(out_cols[0], F.col("_glc.x"))
               .withColumn(out_cols[1], F.col("_glc.y"))
               .withColumn(out_cols[2], F.col("_glc.ok"))
               .drop("_glc"))


def suggested_warp_output(gl: GeolocArray, in_w: int, in_h: int):
    """GDALSuggestedWarpOutput2 for a bare geoloc transformer
    (alg/gdaltransformer.cpp:342): border samples through the forward
    transform at the reference's step rule (:449 min(W,H)/50 clamped
    20..100), PLUS the geoloc-array extreme points (:899 — the special
    case autotest gcore/geoloc.py test_geoloc_bounds pins: the array
    min/max must bound the output even when no border sample lands on
    them), pixel size = diagonal / hypot(W, H), size rounded +0.5.
    The right/bottom border-fit shrink loops (:1140) and the
    anti-meridian sign-discontinuity vote are not replayed (rare
    adjustments, documented).

    Returns (geotransform 6-tuple, pixels, lines)."""
    nsteps = int(min(in_w, in_h) / 50 + 0.5)
    nsteps = min(100, max(20, nsteps))
    ratios = np.arange(nsteps + 1, dtype=np.float64) / nsteps
    ratios[-1] = 1.0
    px = np.concatenate([ratios * in_w, ratios * in_w,
                         np.zeros(nsteps + 1),
                         np.full(nsteps + 1, float(in_w))])
    py = np.concatenate([np.zeros(nsteps + 1),
                         np.full(nsteps + 1, float(in_h)),
                         ratios * in_h, ratios * in_h])
    gx, gy, ok = forward(gl, px, py)
    xs = gx[ok & np.isfinite(gx)]
    ys = gy[ok & np.isfinite(gy)]
    vm = _valid(gl, gl.lon)
    lon_v = gl.lon[vm]
    lat_v = gl.lat[vm]
    # the four array extremes, each with its companion coordinate
    ext_x = [lon_v.min(), lon_v.max(),
             float(gl.lon[vm][np.argmin(lat_v)]),
             float(gl.lon[vm][np.argmax(lat_v)])]
    ext_y = [float(gl.lat[vm][np.argmin(lon_v)]),
             float(gl.lat[vm][np.argmax(lon_v)]),
             lat_v.min(), lat_v.max()]
    minx = min(float(xs.min()), *map(float, ext_x))
    maxx = max(float(xs.max()), *map(float, ext_x))
    miny = min(float(ys.min()), *map(float, ext_y))
    maxy = max(float(ys.max()), *map(float, ext_y))
    diag = float(np.hypot(maxx - minx, maxy - miny))
    psize = diag / float(np.hypot(in_w, in_h))
    pixels = int((maxx - minx) / psize + 0.5)
    lines = int((maxy - miny) / psize + 0.5)
    gt = (minx, psize, 0.0, maxy, 0.0, -psize)
    return gt, pixels, lines


def warp_geoloc(src_cells, gl: GeolocArray, dst_gt, dst_w: int,
                dst_h: int, value_col: str = "value"):
    """gdalwarp through a GEOLOCATION transformer (the warp path of
    autotest gcore/geoloc.py): each destination pixel center maps
    through the exact inverse (spiral + inverse bilinear — no backmap
    approximation, i.e. the GDAL_GEOLOC_USE_MAX_ACCURACY result without
    the approx-transformer's scanline interpolation, which this
    re-expression intentionally skips) to a source pixel, sampled
    nearest-neighbor from the (bx, by, value) cell table.

    Distributed shape: the dst grid is generated relationally, the
    inverse runs in one Arrow batch kernel (geoloc sidecar broadcast in
    the closure), and the source lookup is one equi-join on (bx, by).

    Returns (bx, by, value) over the destination grid (misses absent,
    like nodata)."""
    from pyspark.sql import functions as F

    spark = src_cells.sparkSession
    g0, g1, _g2, g3, _g4, g5 = (float(v) for v in dst_gt)
    dst = (spark.range(int(dst_w) * int(dst_h))
           .select((F.col("id") % dst_w).cast("int").alias("bx"),
                   (F.col("id") / dst_w).cast("int").alias("by")))
    dst = dst.withColumn("_gx", g0 + (F.col("bx") + 0.5) * g1) \
             .withColumn("_gy", g3 + (F.col("by") + 0.5) * g5)
    inv = transform_df(dst, gl, "_gx", "_gy", inverse=True,
                       out_cols=("_px", "_py", "_ok"))
    inv = (inv.filter(F.col("_ok"))
           .withColumn("_sx", F.floor("_px").cast("int"))
           .withColumn("_sy", F.floor("_py").cast("int")))
    src = src_cells.select(F.col("bx").alias("_sx"),
                           F.col("by").alias("_sy"),
                           F.col(value_col).alias("value"))
    return (inv.join(src, ["_sx", "_sy"])
            .select("bx", "by", "value"))


def transform_geolocations(gl: GeolocArray, fwd):
    """TransformGeolocations (autotest/alg/transformgeoloc.py:55 —
    gdal.Transformer.TransformGeolocations): apply a coordinate
    transform to the geoloc arrays in place, returning a NEW
    GeolocArray whose lon/lat hold the projected X/Y."""
    x, y = fwd(gl.lon.ravel(), gl.lat.ravel())
    return GeolocArray(
        lon=np.asarray(x, np.float64).reshape(gl.shape),
        lat=np.asarray(y, np.float64).reshape(gl.shape),
        pixel_offset=gl.pixel_offset, pixel_step=gl.pixel_step,
        line_offset=gl.line_offset, line_step=gl.line_step,
        origin_top_left=gl.origin_top_left, geographic=False,
        nodata=gl.nodata)
