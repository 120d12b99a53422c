"""S2 cell index: lat/lng -> 64-bit Hilbert cell ids, vectorized NumPy.

The north-star pipeline geocodes pages to discrete cells before the
polygon join and the kNN ring search; alongside the WebMercator XYZ grid
(geo/mercator.py) this module provides the S2 curve — the cube-face
Hilbert indexing published in the s2geometry design docs (quadratic
cell projection, 30 subdivision levels, 3-bit face + 60-bit position +
trailing-1 id layout). Everything here is re-derived from that public
design; the reference repo itself ships no S2 code (its closest analog
is the tiling grid of gdal2tiles, `/root/reference/swig/python/
gdal-utils/osgeo_utils/gdal2tiles.py:139` GlobalMercator), so this file
cites the published S2 layout rather than reference lines.

Layout of a cell id (uint64, interpreted two's-complement as int64 for
Spark/duckdb whose only 64-bit integer is signed):

    [face:3][Hilbert position: 2*level bits][1][zeros]

Design notes for the oracle twin (CLAUDE.md op whitelist):
- lat/lng -> xyz needs sin/cos: measured BIT-EXACT between NumPy and
  duckdb on this host (tests/test_s2.py pins it on the live query
  inputs) — the engine computes trig in NumPy inside an Arrow UDF,
  never in the JVM, so both engines share libm.
- everything downstream is +-*/ / sqrt / floor / integer bit math: the
  quadratic uv->st transform is sqrt-only and the Hilbert automaton is
  a 16-entry integer table, both exactly expressible in SQL (the duckdb
  twin runs the same automaton as a recursive CTE).
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 30
MAX_SIZE = 1 << MAX_LEVEL  # ij range per face at level 30

# Hilbert automaton base tables (public S2 design: s2cell_id layout).
# Orientation o is 2 bits: bit0 = swap axes, bit1 = invert bits.
_IJ_TO_POS = np.array(
    [[0, 1, 3, 2],
     [0, 3, 1, 2],
     [2, 3, 1, 0],
     [2, 1, 3, 0]], dtype=np.int64)
_POS_TO_IJ = np.array(
    [[0, 1, 3, 2],
     [0, 2, 3, 1],
     [3, 2, 0, 1],
     [3, 1, 0, 2]], dtype=np.int64)
_POS_TO_ORIENT = np.array([1, 0, 0, 3], dtype=np.int64)

# flattened (o*4 + ij2) -> pos and next orientation, for vectorized steps
_ENC_POS = _IJ_TO_POS.reshape(-1)
_ENC_NEXT_O = np.array(
    [o ^ int(_POS_TO_ORIENT[p]) for o in range(4) for p in _IJ_TO_POS[o]],
    dtype=np.int64)
# flattened (o*4 + pos) -> ij2 and next orientation, for decode
_DEC_IJ = _POS_TO_IJ.reshape(-1)
_DEC_NEXT_O = np.array(
    [o ^ int(_POS_TO_ORIENT[p]) for o in range(4) for p in range(4)],
    dtype=np.int64)

# Minimum angular width of a level-0 cell under the quadratic projection
# (published S2 metric kMinWidth = 2*sqrt(2)/3); used as the st->angle
# lower bound when certifying ring-search coverage.
MIN_WIDTH_DERIV = 2.0 * np.sqrt(2.0) / 3.0


def latlng_to_xyz(lat_deg, lng_deg):
    """Degrees -> unit-sphere xyz. np.radians is a single multiply by
    pi/180, matching duckdb's radians() bit-for-bit on this host."""
    lat = np.radians(np.asarray(lat_deg, np.float64))
    lng = np.radians(np.asarray(lng_deg, np.float64))
    cl = np.cos(lat)
    return cl * np.cos(lng), cl * np.sin(lng), np.sin(lat)


def xyz_to_face_uv(x, y, z):
    """Cube face (0..5) + (u, v) in [-1, 1] for unit vectors.

    Face = axis of the largest |component| (ties broken x, then y — the
    published LargestAbsComponent order), +3 when that component is
    negative; per-face (u, v) follow the canonical S2 table.
    """
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    z = np.asarray(z, np.float64)
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    axis = np.where(ax > ay, np.where(ax > az, 0, 2),
                    np.where(ay > az, 1, 2))
    comp = np.choose(axis, [x, y, z])
    face = np.where(comp >= 0, axis, axis + 3).astype(np.int64)
    u = np.empty_like(x)
    v = np.empty_like(x)
    with np.errstate(divide="ignore", invalid="ignore"):
        for f, (ue, ve) in enumerate([
                (lambda: y / x, lambda: z / x),      # face 0: +x
                (lambda: -x / y, lambda: z / y),     # face 1: +y
                (lambda: -x / z, lambda: -y / z),    # face 2: +z
                (lambda: z / x, lambda: y / x),      # face 3: -x
                (lambda: z / y, lambda: -x / y),     # face 4: -y
                (lambda: -y / z, lambda: -x / z)]):  # face 5: -z
            m = face == f
            if m.any():
                u[m] = ue()[m]
                v[m] = ve()[m]
    return face, u, v


def face_uv_to_xyz(face, u, v):
    """Inverse of xyz_to_face_uv (un-normalized direction vector)."""
    face = np.asarray(face, np.int64)
    u = np.asarray(u, np.float64)
    v = np.asarray(v, np.float64)
    one = np.ones_like(u)
    xyz_by_face = [
        (one, u, v),          # 0: +x
        (-u, one, v),         # 1: +y
        (-u, -v, one),        # 2: +z
        (-one, -v, -u),       # 3: -x
        (v, -one, -u),        # 4: -y
        (v, u, -one)]         # 5: -z
    x = np.empty_like(u)
    y = np.empty_like(u)
    z = np.empty_like(u)
    for f, (xe, ye, ze) in enumerate(xyz_by_face):
        m = face == f
        if m.any():
            x[m], y[m], z[m] = xe[m], ye[m], ze[m]
    return x, y, z


def uv_to_st(u):
    """Quadratic projection (sqrt-only — oracle-whitelist-safe)."""
    u = np.asarray(u, np.float64)
    with np.errstate(invalid="ignore"):
        # np.where evaluates both branches; the inactive branch's sqrt
        # of a negative is discarded
        return np.where(u >= 0, 0.5 * np.sqrt(1.0 + 3.0 * u),
                        1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u))


def st_to_uv(s):
    s = np.asarray(s, np.float64)
    return np.where(s >= 0.5,
                    (1.0 / 3.0) * (4.0 * s * s - 1.0),
                    (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s)))


def st_to_ij(s):
    """st in [0,1] -> leaf-cell ij in [0, 2^30)."""
    return np.clip(np.floor(np.asarray(s, np.float64) * MAX_SIZE),
                   0, MAX_SIZE - 1).astype(np.int64)


def hilbert_pos(face, i, j, level: int):
    """Hilbert curve position (2*level bits) of the level-`level` cell
    containing leaf (i, j): run the automaton over the top `level` bit
    pairs. Vectorized across rows; the loop is over levels only."""
    face = np.asarray(face, np.int64)
    i = np.asarray(i, np.int64)
    j = np.asarray(j, np.int64)
    o = face & 1
    pos = np.zeros(np.broadcast(face, i).shape, dtype=np.uint64)
    for k in range(MAX_LEVEL - 1, MAX_LEVEL - 1 - level, -1):
        ij2 = ((i >> k) & 1) * 2 + ((j >> k) & 1)
        idx = o * 4 + ij2
        pos = (pos << np.uint64(2)) | _ENC_POS[idx].astype(np.uint64)
        o = _ENC_NEXT_O[idx]
    return pos, o


def cell_id(face, i, j, level: int = MAX_LEVEL):
    """uint64 S2 cell id at `level` for the cell containing leaf (i,j)."""
    pos, _ = hilbert_pos(face, i, j, level)
    shift = np.uint64(2 * (MAX_LEVEL - level) + 1)
    fid = np.asarray(face, np.int64).astype(np.uint64) << np.uint64(61)
    return fid | (pos << shift) | (np.uint64(1) << (shift - np.uint64(1)))


def cell_id_from_latlng(lat_deg, lng_deg, level: int = MAX_LEVEL):
    """lat/lng degrees -> uint64 cell id at `level` (the hot-path
    composition used by the Arrow UDF)."""
    x, y, z = latlng_to_xyz(lat_deg, lng_deg)
    face, u, v = xyz_to_face_uv(x, y, z)
    i = st_to_ij(uv_to_st(u))
    j = st_to_ij(uv_to_st(v))
    return cell_id(face, i, j, level)


def level_of(ids):
    """Level of each cell id (position of the trailing set bit)."""
    ids = np.asarray(ids, np.uint64)
    lsb = ids & (~ids + np.uint64(1))
    # trailing-zero count via float64 exponent is unsafe past 2^52; use
    # a de-Bruijn-free loop over the 61 possible lsb positions instead
    tz = np.zeros(ids.shape, dtype=np.int64)
    v = lsb
    for shift in (32, 16, 8, 4, 2, 1):
        big = (v >> np.uint64(shift)) != 0
        tz = np.where(big, tz + shift, tz)
        v = np.where(big, v >> np.uint64(shift), v)
    return MAX_LEVEL - (tz >> 1)


def parent_id(ids, level: int):
    """Ancestor at `level` (caller guarantees level <= cell level):
    (id & -lsb) | lsb in uint64 arithmetic."""
    ids = np.asarray(ids, np.uint64)
    lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))
    return (ids & (~lsb + np.uint64(1))) | lsb


def token(ids):
    """Canonical hex token: 16 hex digits, trailing zeros stripped."""
    ids = np.atleast_1d(np.asarray(ids, np.uint64))
    return np.array([format(int(v), "016x").rstrip("0") or "X"
                     for v in ids.tolist()], dtype=object)


def decode(ids, level: int):
    """Cell id at known `level` -> (face, i, j) of the cell's MINIMUM
    leaf corner (i.e. top-`level` bits, lower bits zero)."""
    ids = np.asarray(ids, np.uint64)
    face = (ids >> np.uint64(61)).astype(np.int64)
    shift = np.uint64(2 * (MAX_LEVEL - level) + 1)
    pos = ids >> shift  # 2*level bits
    o = face & 1
    i = np.zeros(ids.shape, dtype=np.int64)
    j = np.zeros(ids.shape, dtype=np.int64)
    for k in range(level - 1, -1, -1):
        p = ((pos >> np.uint64(2 * k)) & np.uint64(3)).astype(np.int64)
        idx = o * 4 + p
        ij2 = _DEC_IJ[idx]
        i = (i << 1) | (ij2 >> 1)
        j = (j << 1) | (ij2 & 1)
        o = _DEC_NEXT_O[idx]
    sh = MAX_LEVEL - level
    return face, i << sh, j << sh


def cell_center_latlng(ids, level: int):
    """Cell center (lat, lng) in degrees."""
    face, i, j = decode(ids, level)
    if level == MAX_LEVEL:
        s = (i + 0.5) / MAX_SIZE
        t = (j + 0.5) / MAX_SIZE
    else:
        half = (1 << (MAX_LEVEL - level)) >> 1
        s = (i + half) / MAX_SIZE
        t = (j + half) / MAX_SIZE
    x, y, z = face_uv_to_xyz(face, st_to_uv(s), st_to_uv(t))
    n = np.sqrt(x * x + y * y + z * z)
    lat = np.degrees(np.arcsin(z / n))
    lng = np.degrees(np.arctan2(y, x))
    return lat, lng


def from_face_ij_wrap(face, i, j):
    """Leaf cell for possibly out-of-range (i, j) — wraps across the
    cube edge like the published FromFaceIJWrap: clamp one step past
    the face, project LINEARLY to (u, v), hop through xyz to the owning
    face, and re-discretize. Arithmetic only (ratios + comparisons)."""
    face = np.asarray(face, np.int64)
    i = np.clip(np.asarray(i, np.int64), -1, MAX_SIZE)
    j = np.clip(np.asarray(j, np.int64), -1, MAX_SIZE)
    scale = 1.0 / MAX_SIZE
    limit = np.nextafter(1.0, 2.0)
    u = np.clip(scale * (2.0 * (i - MAX_SIZE // 2) + 1.0), -limit, limit)
    v = np.clip(scale * (2.0 * (j - MAX_SIZE // 2) + 1.0), -limit, limit)
    x, y, z = face_uv_to_xyz(face, u, v)
    nf, nu, nv = xyz_to_face_uv(x, y, z)
    ni = np.clip(np.floor(0.5 * (nu + 1.0) * MAX_SIZE),
                 0, MAX_SIZE - 1).astype(np.int64)
    nj = np.clip(np.floor(0.5 * (nv + 1.0) * MAX_SIZE),
                 0, MAX_SIZE - 1).astype(np.int64)
    return nf, ni, nj


def edge_neighbors(ids, level: int):
    """The 4 edge neighbors of each cell at the same level, wrapping
    across cube faces. Returns an (n, 4) uint64 array (down, right, up,
    left in ij terms)."""
    face, i, j = decode(ids, level)
    size = 1 << (MAX_LEVEL - level)
    out = np.empty(np.asarray(ids).shape + (4,), dtype=np.uint64)
    for col, (di, dj) in enumerate([(0, -size), (size, 0),
                                    (0, size), (-size, 0)]):
        ni, nj = i + di, j + dj
        inside = ((ni >= 0) & (ni < MAX_SIZE) & (nj >= 0) & (nj < MAX_SIZE))
        nf = face.copy()
        wi, wj = ni.copy(), nj.copy()
        if (~inside).any():
            wf, wwi, wwj = from_face_ij_wrap(
                face[~inside], ni[~inside], nj[~inside])
            nf[~inside] = wf
            wi[~inside] = wwi
            wj[~inside] = wwj
        out[..., col] = cell_id(nf, wi, wj, level)
    return out


def to_signed(ids):
    """uint64 -> two's-complement int64 (Spark/duckdb BIGINT view)."""
    return np.ascontiguousarray(np.asarray(ids, np.uint64)).view(np.int64)


def from_signed(ids):
    """int64 BIGINT view -> uint64."""
    return np.ascontiguousarray(np.asarray(ids, np.int64)).view(np.uint64)
