"""Polygon boolean algebra: intersection / union / difference /
symmetric difference, plus Buffer, MakeValid and cascaded union — the
GEOS-backed slice of the reference's geometry API.

Reference surface (all delegated to GEOS there, re-implemented from
scratch here):
- OGRGeometry::Intersection / Union / Difference / SymDifference
  (ogr/ogrgeometry.cpp:4560+, each a GEOS*_r call)
- OGRGeometry::Buffer(dist, nQuadSegs=30) (ogr/ogr_geometry.h:565,
  ogrgeometry.cpp:4498 -> GEOSBuffer_r)
- OGRGeometry::MakeValid (ogr/ogr_geometry.h:430; GEOS "structure"
  method = even-odd reinterpretation of self-intersecting rings)
- OGRGeometry::UnionCascaded (ogr/ogr_geometry.h:573)

This is NOT a port of GEOS's overlay-ng: the execution shape here is a
per-row NumPy kernel invoked from Arrow pandas UDFs over millions of
small geometries (admin polygons, buffered features), so the algorithm
optimizes for uniformity and small constant factors over asymptotics:

1. SPLIT — every boundary edge of A is subdivided at its intersections
   with B's edges (proper crossings, endpoint touches, and collinear
   overlaps), and vice versa; edge pairs are intersected vectorized
   (one NumPy pass per edge against all opposing edges).
2. CLASSIFY — a fragment lies on the result boundary iff the result
   region covers exactly one of its two sides.  Sides are sampled at
   midpoint +- eps * unit-normal and membership is plain boolean algebra
   on even-odd point-in-polygon tests (inA <op> inB).  This one rule
   subsumes all the classic special cases (shared edges, tangencies,
   holes) — degeneracies cost tolerance (eps = 1e-9 * coordinate scale,
   documented below), not code paths.
3. STITCH — kept fragments are oriented region-on-the-left and chained
   end-to-start (leftmost-turn rule at junctions of degree > 2), which
   makes shells come out CCW and holes CW by construction; each hole is
   attached to the smallest enclosing shell.

Tolerance contract: features (edge lengths, gaps, sliver widths) smaller
than ~1e-9 of the coordinate magnitude may be merged or dropped; within
that tolerance results are exact region algebra.  GEOS instead uses a
snap-rounding noder — same class of guarantee, different constant.

MakeValid reuses the same machinery with B = the polygon itself: edges
split against their own edge set, membership = even-odd of the original
rings — i.e. the GEOS METHOD=STRUCTURE semantics (autotest
ogr/ogr_geom.py test_ogr_geom_makevalid: bowtie -> two triangles).
"""

from __future__ import annotations

import numpy as np

from .pip import point_in_ring_np

_OPS = {
    "intersection": lambda a, b: a & b,
    "union": lambda a, b: a | b,
    "difference": lambda a, b: a & ~b,
    "symdifference": lambda a, b: a ^ b,
}


# ---------------------------------------------------------------------------
# normalization


def as_polys(kind: str, data) -> list:
    """Decoded (kind, data) -> list of polygons, each a list of (n, 2)
    open rings (closing vertex and zero-length edges dropped)."""
    kind = kind.lower()
    if kind == "polygon":
        polys = [data]
    elif kind == "multipolygon":
        polys = data
    else:
        raise NotImplementedError(f"boolean ops need areal input, got {kind}")
    out = []
    for rings in polys:
        nr = []
        for r in rings:
            r = np.asarray(r, dtype=np.float64)
            if len(r) >= 2 and (r[0] == r[-1]).all():
                r = r[:-1]
            keep = np.any(r != np.roll(r, 1, axis=0), axis=1)
            r = r[keep]
            if len(r) >= 3:
                nr.append(r)
        if nr:
            out.append(nr)
    return out


def _edges_of(polys: list) -> np.ndarray:
    """(n, 4) array of boundary edges [x0 y0 x1 y1] over all rings."""
    segs = []
    for rings in polys:
        for r in rings:
            segs.append(np.hstack([r, np.roll(r, -1, axis=0)]))
    if not segs:
        return np.empty((0, 4), dtype=np.float64)
    return np.vstack(segs)


def _scale_of(*edge_sets) -> float:
    m = 1.0
    for e in edge_sets:
        if len(e):
            m = max(m, float(np.abs(e).max()))
    return m


def _membership(polys: list):
    """Even-odd membership test over all rings of all member polygons
    (the same rule geo/pip.point_in_polygon_np applies per polygon)."""
    rings = [r for rings in polys for r in rings]

    def inside(px: np.ndarray, py: np.ndarray) -> np.ndarray:
        out = np.zeros(np.shape(px), dtype=bool)
        for r in rings:
            out ^= point_in_ring_np(px, py, r)
        return out

    return inside


# ---------------------------------------------------------------------------
# split


def _split_against(edges: np.ndarray, others: np.ndarray, scale: float,
                   skip_self: bool = False) -> np.ndarray:
    """Subdivide each edge at its intersections with `others`.

    Returns an (m, 4) fragment array.  Proper crossings use the exact
    parametric solve; collinear overlaps project the other edge's
    endpoints onto this edge.  skip_self excludes index-equal pairs (for
    MakeValid, where edges split against their own set).
    """
    if len(edges) == 0:
        return edges
    frags = []
    tol_cross = 1e-12 * scale * scale   # cross products scale as length^2
    q0 = others[:, 0:2]
    q1 = others[:, 2:4]
    s = q1 - q0
    for i, e in enumerate(edges):
        p0 = e[0:2]
        r = e[2:4] - p0
        L2 = float(r @ r)
        qp = q0 - p0
        denom = r[0] * s[:, 1] - r[1] * s[:, 0]
        t_num = qp[:, 0] * s[:, 1] - qp[:, 1] * s[:, 0]
        u_num = qp[:, 0] * r[1] - qp[:, 1] * r[0]
        nz = np.abs(denom) > tol_cross
        if skip_self:
            nz = nz.copy()
            nz[i] = False
        ts = [np.array([0.0, 1.0])]
        if nz.any():
            t = t_num[nz] / denom[nz]
            u = u_num[nz] / denom[nz]
            ok = (t > 0.0) & (t < 1.0) & (u >= 0.0) & (u <= 1.0)
            ts.append(t[ok])
        col = (~nz) & (np.abs(u_num) <= tol_cross)
        if skip_self:
            col[i] = False
        if col.any():
            for q in (q0[col], q1[col]):
                tq = ((q - p0) @ r) / L2
                ts.append(tq[(tq > 0.0) & (tq < 1.0)])
        tv = np.concatenate(ts)
        tv.sort()
        # merge parameter values closer than fp noise
        keep = np.empty(len(tv), dtype=bool)
        keep[0] = True
        keep[1:] = np.diff(tv) > 1e-12
        tv = tv[keep]
        if tv[-1] != 1.0:
            tv = np.append(tv, 1.0)
        a = p0 + np.outer(tv[:-1], r)
        b = p0 + np.outer(tv[1:], r)
        frags.append(np.hstack([a, b]))
    return np.vstack(frags)


# ---------------------------------------------------------------------------
# classify + stitch


def _resolve(frags: np.ndarray, region, scale: float) -> list:
    """Fragments + region predicate -> list of polygons [shell, holes..].

    Keeps fragments whose two sides disagree on region membership,
    oriented region-on-the-left, then stitches rings (leftmost-turn) and
    nests CW holes inside their smallest CCW shell.
    """
    if len(frags) == 0:
        return []
    d = frags[:, 2:4] - frags[:, 0:2]
    ln = np.hypot(d[:, 0], d[:, 1])
    ok = ln > 1e-12 * scale
    frags, d, ln = frags[ok], d[ok], ln[ok]
    if len(frags) == 0:
        return []
    eps = 1e-9 * scale
    mid = (frags[:, 0:2] + frags[:, 2:4]) * 0.5
    nx, ny = -d[:, 1] / ln, d[:, 0] / ln
    lx, ly = mid[:, 0] + eps * nx, mid[:, 1] + eps * ny
    rx, ry = mid[:, 0] - eps * nx, mid[:, 1] - eps * ny
    left_in = region(lx, ly)
    right_in = region(rx, ry)
    keep = left_in != right_in
    frags = frags[keep]
    flip = right_in[keep]
    flipped = frags[flip][:, [2, 3, 0, 1]]
    frags = np.vstack([frags[~flip], flipped])

    # dedupe identical oriented fragments (collinear overlaps yield one
    # copy from each input boundary)
    q = 1e-11 * scale
    key = np.round(frags / q).astype(np.int64)
    _, first = np.unique(key, axis=0, return_index=True)
    frags = frags[np.sort(first)]
    key = key[np.sort(first)]

    # stitch: out-adjacency keyed on quantized start point. Lookups
    # scan the 3x3 neighboring quanta: the SAME crossing point is
    # computed twice (once per split direction) and the two doubles can
    # straddle a quantization boundary — a 1-ulp pair then got distinct
    # keys, the chain dead-ended, and a real ring was silently dropped
    # (hit ~1e-4 per ring at the sf1.0 volume probe: geom_overlay pairs
    # 30177/130809). Distinct vertices sit thousands of quanta apart,
    # so the widened lookup cannot merge different points.
    starts: dict = {}
    for i, k in enumerate(key):
        starts.setdefault((k[0], k[1]), []).append(i)

    def _succs(kx, ky, used):
        out = []
        for ddx in (-1, 0, 1):
            for ddy in (-1, 0, 1):
                for j in starts.get((kx + ddx, ky + ddy), ()):
                    if not used[j]:
                        out.append(j)
        return out

    used = np.zeros(len(frags), dtype=bool)
    rings = []
    for i0 in range(len(frags)):
        if used[i0]:
            continue
        chain = [i0]
        used[i0] = True
        guard = 0
        while guard <= len(frags):
            guard += 1
            cur = frags[chain[-1]]
            ek = (key[chain[-1]][2], key[chain[-1]][3])
            cands = _succs(ek[0], ek[1], used)
            if not cands:
                break
            if len(cands) == 1:
                nxt = cands[0]
            else:
                # leftmost turn: maximize CCW angle from incoming dir
                vin = cur[2:4] - cur[0:2]
                ang_in = np.arctan2(vin[1], vin[0])
                best, best_a = cands[0], -10.0
                for j in cands:
                    vout = frags[j][2:4] - frags[j][0:2]
                    a = np.arctan2(vout[1], vout[0]) - ang_in + np.pi
                    a = a - 2 * np.pi * np.floor(a / (2 * np.pi))
                    if a > best_a:
                        best, best_a = j, a
                nxt = best
            chain.append(nxt)
            used[nxt] = True
            # ring closes when the end returns to the start — same
            # 1-ulp straddle tolerance as the successor lookup
            if (abs(int(key[nxt][2]) - int(key[chain[0]][0])) <= 1
                    and abs(int(key[nxt][3]) - int(key[chain[0]][1])) <= 1):
                rings.append(frags[chain][:, 0:2])
                chain = []
                break
        # open chain (tolerance casualty): drop silently

    shells, holes = [], []
    for r in rings:
        x, y = r[:, 0], r[:, 1]
        a2 = float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))
        if abs(a2) <= (1e-12 * scale) ** 2:
            continue
        (shells if a2 > 0 else holes).append((abs(a2) * 0.5, r))
    shells.sort(key=lambda t: t[0])
    polys = [[s[1]] for s in shells]
    for _, h in holes:
        px, py = np.array([h[0, 0]]), np.array([h[0, 1]])
        for i, (_, srng) in enumerate(shells):   # smallest-first
            if point_in_ring_np(px, py, srng)[0]:
                polys[i].append(h)
                break
    return polys


def _result_kind(polys: list):
    if not polys:
        return "polygon", []
    if len(polys) == 1:
        return "polygon", [np.vstack([r, r[:1]]) for r in polys[0]]
    return "multipolygon", [[np.vstack([r, r[:1]]) for r in rings]
                            for rings in polys]


# ---------------------------------------------------------------------------
# public API


def overlay(kind_a: str, data_a, kind_b: str, data_b, op: str):
    """Binary boolean op on areal geometries -> (kind, data).

    op: 'intersection' | 'union' | 'difference' | 'symdifference'.
    Inputs must be valid (non-self-intersecting) polygons or
    multipolygons; run make_valid first otherwise.  Empty results come
    back as ("polygon", []).
    """
    fn = _OPS[op]
    pa = as_polys(kind_a, data_a)
    pb = as_polys(kind_b, data_b)
    ea, eb = _edges_of(pa), _edges_of(pb)
    scale = _scale_of(ea, eb)
    in_a, in_b = _membership(pa), _membership(pb)

    def region(px, py):
        return fn(in_a(px, py), in_b(px, py))

    if len(eb) == 0:
        frags = ea
    elif len(ea) == 0:
        frags = eb
    else:
        frags = np.vstack([_split_against(ea, eb, scale),
                           _split_against(eb, ea, scale)])
    return _result_kind(_resolve(frags, region, scale))


def overlay_multi(kind_a: str, data_a, kind_b: str, data_b, ops):
    """Several boolean ops on ONE pair sharing the expensive work: the
    edge split and membership classification run once, only the cheap
    region predicate + ring stitch differ per op.  -> {op: (kind, data)},
    bit-identical to separate overlay() calls (fragments are
    deterministic and _resolve never mutates its input)."""
    pa = as_polys(kind_a, data_a)
    pb = as_polys(kind_b, data_b)
    ea, eb = _edges_of(pa), _edges_of(pb)
    scale = _scale_of(ea, eb)
    in_a, in_b = _membership(pa), _membership(pb)
    if len(eb) == 0:
        frags = ea
    elif len(ea) == 0:
        frags = eb
    else:
        frags = np.vstack([_split_against(ea, eb, scale),
                           _split_against(eb, ea, scale)])
    out = {}
    for op in ops:
        fn = _OPS[op]

        def region(px, py, fn=fn):
            return fn(in_a(px, py), in_b(px, py))

        out[op] = _result_kind(_resolve(frags, region, scale))
    return out


def make_valid(kind: str, data):
    """The reference's MakeValid(METHOD=STRUCTURE) semantics
    (autotest/ogr/ogr_geom.py test_ogr_geom_makevalid[_structure]):
    shells resolve by even-odd parity (bowtie -> two triangles) and
    holes SUBTRACT from the shell area — a hole leaking outside its
    shell notches the shell, it does not become area (the
    ((0 0,0 10,10 10,10 0)),(5 5,15 10,15 0) case -> the notched
    heptagon, not an extra triangle)."""
    polys = as_polys(kind, data)
    shells = [[rings[0]] for rings in polys]
    holes = [[r] for rings in polys for r in rings[1:]]
    edges = _edges_of(polys)
    scale = _scale_of(edges)
    frags = _split_against(edges, edges, scale, skip_self=True)
    in_shell = _membership(shells)
    in_hole = _membership(holes)

    def region(px, py):
        return in_shell(px, py) & ~in_hole(px, py)

    rk, rd = _result_kind(_resolve(frags, region, scale))
    if kind.lower() == "multipolygon" and rk == "polygon" and rd:
        return "multipolygon", [rd]   # the reference keeps multi-ness
    return rk, rd


def union_all(geoms: list):
    """Cascaded union (OGRGeometry::UnionCascaded): left fold of
    pairwise union over decoded (kind, data) geometries.  The Spark-side
    aggregate tree-reduces per partition before this driver-side fold
    ever sees more than one geometry per group."""
    acc = None
    for kind, data in geoms:
        if acc is None:
            acc = (kind, data)
        else:
            acc = overlay(acc[0], acc[1], kind, data, "union")
    return acc if acc is not None else ("polygon", [])


def _line_in_out(pts: np.ndarray, polys: list) -> tuple:
    """Split a polyline's segments at polygon-boundary crossings and
    classify fragment midpoints: returns (any_inside, any_outside)."""
    pts = np.asarray(pts, dtype=np.float64)
    segs = np.hstack([pts[:-1], pts[1:]])
    edges = _edges_of(polys)
    scale = _scale_of(segs, edges)
    frags = _split_against(segs, edges, scale)
    mid = (frags[:, 0:2] + frags[:, 2:4]) * 0.5
    inside = _membership(polys)(mid[:, 0], mid[:, 1])
    return bool(inside.any()), bool((~inside).any())


def _canonical_segments(lines, nodes: np.ndarray) -> set:
    """Canonical elementary-segment set of a (multi)linestring: each
    segment split at every node point lying strictly inside it (exact
    cross-product collinearity, node coordinates reused verbatim — no
    recomputed split points, so no float drift), zero-length segments
    dropped, endpoints ordered lexicographically. Two 1-D geometries
    are point-set equal iff these sets are equal (see the equals branch
    of relate())."""
    segs = set()
    for pts in lines:
        a = np.asarray(pts, dtype=np.float64)
        for i in range(len(a) - 1):
            p, q = a[i], a[i + 1]
            if p[0] == q[0] and p[1] == q[1]:
                continue
            d = q - p
            cross = (nodes[:, 0] - p[0]) * d[1] - (nodes[:, 1] - p[1]) * d[0]
            t = (((nodes[:, 0] - p[0]) * d[0]
                  + (nodes[:, 1] - p[1]) * d[1]) / (d[0] * d[0]
                                                    + d[1] * d[1]))
            on = (cross == 0.0) & (t > 0.0) & (t < 1.0)
            # interior nodes ordered along the segment; drop duplicates
            inner = nodes[on]
            tp, tq = (float(p[0]), float(p[1])), (float(q[0]), float(q[1]))
            if len(inner):
                order = np.argsort(t[on], kind="mergesort")
                chain = [tp]
                for v in inner[order]:
                    tv = (float(v[0]), float(v[1]))
                    if tv != chain[-1]:
                        chain.append(tv)
                if tq != chain[-1]:
                    chain.append(tq)
            else:
                chain = [tp, tq]
            for u, v in zip(chain[:-1], chain[1:]):
                segs.add((u, v) if u <= v else (v, u))
    return segs


def relate(kind_a: str, data_a, kind_b: str, data_b, predicate: str) -> bool:
    """The reference's geometry predicates (ogr_geometry.h:546-553
    Intersects/Within/Contains/Overlaps/Touches/Crosses, GEOS-delegated
    there) re-derived from this module's exact kernels:

    - interiors intersect  <=> boolean intersection is non-empty (a
      boundary-only touch keeps no fragments, so no area threshold);
    - any contact          <=> geo/distance.geometry_distance == 0
      (covers crossing, touching, containment);
    - within/contains      <=> interiors intersect and the difference
      in the right direction is empty (OGC: shared boundary allowed);
    - overlaps             <=> interiors intersect and neither
      difference is empty (equal-dimension inputs);
    - touches              <=> contact without interior intersection;
    - crosses              <=> line/line proper crossing, or line/area
      with split fragments on both sides (lower-dimension common part).

    Points and lines participate through the distance/PIP kernels;
    boundary-incidence follows the half-open ray-cast rule."""
    from .distance import geometry_distance, segments_cross_np

    areal = ("polygon", "multipolygon")
    ka, kb = kind_a.lower(), kind_b.lower()

    def interiors_intersect():
        if ka in areal and kb in areal:
            return bool(overlay(ka, data_a, kb, data_b, "intersection")[1])
        if ka == "point" and kb in areal:
            return bool(_membership(as_polys(kb, data_b))(
                np.array([data_a[0]]), np.array([data_a[1]]))[0])
        if kb == "point" and ka in areal:
            return bool(_membership(as_polys(ka, data_a))(
                np.array([data_b[0]]), np.array([data_b[1]]))[0])
        if ka == "linestring" and kb in areal:
            return _line_in_out(data_a, as_polys(kb, data_b))[0]
        if kb == "linestring" and ka in areal:
            return _line_in_out(data_b, as_polys(ka, data_a))[0]
        # point/point, point/line, line/line: interiors meet only on
        # exact coincidence/crossing — distance-0 is the usable proxy
        return geometry_distance(ka, data_a, kb, data_b) == 0.0

    if predicate == "intersects":
        return geometry_distance(ka, data_a, kb, data_b) == 0.0
    if predicate == "disjoint":
        return geometry_distance(ka, data_a, kb, data_b) != 0.0
    if predicate == "touches":
        return (geometry_distance(ka, data_a, kb, data_b) == 0.0
                and not interiors_intersect())
    if predicate in ("within", "contains"):
        if predicate == "contains":
            ka, kb, data_a, data_b = kb, ka, data_b, data_a
        # A within B
        if ka == "point" and kb in areal:
            return bool(_membership(as_polys(kb, data_b))(
                np.array([data_a[0]]), np.array([data_a[1]]))[0])
        if ka == "linestring" and kb in areal:
            ins, outs = _line_in_out(data_a, as_polys(kb, data_b))
            return ins and not outs
        if ka in areal and kb in areal:
            return (not overlay(ka, data_a, kb, data_b, "difference")[1]
                    and interiors_intersect())
        raise NotImplementedError(
            f"within/contains for {ka} in {kb} is not defined")
    if predicate == "overlaps":
        if ka in areal and kb in areal:
            return (interiors_intersect()
                    and bool(overlay(ka, data_a, kb, data_b,
                                     "difference")[1])
                    and bool(overlay(kb, data_b, ka, data_a,
                                     "difference")[1]))
        return False
    if predicate == "equals":
        # OGC point-set equality: A within B and B within A. Dimension
        # decides first: point sets of different dimension are never
        # equal (covers every multipoint/multiline-vs-other pairing).
        dims = {"point": 0, "multipoint": 0, "linestring": 1,
                "multilinestring": 1, "polygon": 2, "multipolygon": 2}
        da_, db_ = dims.get(ka), dims.get(kb)
        if da_ is None or db_ is None:
            raise NotImplementedError(
                "ST_Equals with geometry-collection operands")
        if da_ != db_:
            return False
        if da_ == 0:
            pa = (np.asarray([data_a], float) if ka == "point"
                  else np.asarray(data_a, float)).reshape(-1, 2)
            pb = (np.asarray([data_b], float) if kb == "point"
                  else np.asarray(data_b, float)).reshape(-1, 2)
            sa = {(float(x), float(y)) for x, y in pa}
            sb = {(float(x), float(y)) for x, y in pb}
            return sa == sb
        if da_ == 2:
            return (not overlay(ka, data_a, kb, data_b, "difference")[1]
                    and not overlay(kb, data_b, ka, data_a,
                                    "difference")[1]
                    and interiors_intersect())
        # 1-D point-set equality via canonical segment splitting: split
        # every segment at every vertex (of EITHER geometry) lying on
        # it, then compare elementary-segment SETS. A collinear partial
        # overlap's endpoints are always vertices of one of the two
        # segments, so after vertex splitting two overlapping collinear
        # elementary segments are identical; crossings at non-vertex
        # interior points contribute no 1-D part and cannot make unequal
        # sets union to the same point set. Hence set equality after
        # splitting IS point-set equality (at exact-coordinate
        # precision — the reference's GEOS Equals is likewise exact).
        la = data_a if ka == "multilinestring" else [data_a]
        lb = data_b if kb == "multilinestring" else [data_b]
        nodes = np.asarray(
            [tuple(v) for line in (*la, *lb)
             for v in np.asarray(line, float)], dtype=np.float64)
        return (_canonical_segments(la, nodes)
                == _canonical_segments(lb, nodes))
    if predicate == "crosses":
        if ka == "linestring" and kb == "linestring":
            return segments_cross_np(np.asarray(data_a, float),
                                     np.asarray(data_b, float))
        if ka == "linestring" and kb in areal:
            ins, outs = _line_in_out(data_a, as_polys(kb, data_b))
            return ins and outs
        if kb == "linestring" and ka in areal:
            ins, outs = _line_in_out(data_b, as_polys(ka, data_a))
            return ins and outs
        return False
    raise ValueError(f"unknown predicate {predicate}")


def _arc(cx: float, cy: float, r: float, a0: float, a1: float,
         quadsegs: int) -> np.ndarray:
    """CCW arc from angle a0 to a1 (a1 > a0) with quadsegs segments per
    quarter circle — GDAL's Buffer nQuadSegs densification contract
    (ogrgeometry.cpp:4492: 'segments used to approximate a 90 degree
    quadrant')."""
    n = max(1, int(np.ceil((a1 - a0) / (np.pi / 2) * quadsegs)))
    ang = np.linspace(a0, a1, n + 1)
    return np.column_stack([cx + r * np.cos(ang), cy + r * np.sin(ang)])


def _capsule(p0, p1, dist: float, quadsegs: int) -> list:
    """Closed CCW ring buffering segment p0-p1 by `dist` (round caps)."""
    dx, dy = p1[0] - p0[0], p1[1] - p0[1]
    ln = float(np.hypot(dx, dy))
    if ln == 0.0:
        ring = _arc(p0[0], p0[1], dist, 0.0, 2 * np.pi, quadsegs)
        return [ring]
    th = float(np.arctan2(dy, dx))
    cap1 = _arc(p1[0], p1[1], dist, th - np.pi / 2, th + np.pi / 2, quadsegs)
    cap0 = _arc(p0[0], p0[1], dist, th + np.pi / 2, th + 3 * np.pi / 2,
                quadsegs)
    return [np.vstack([cap1, cap0, cap1[:1]])]


def buffer_geometry(kind: str, data, dist: float, quadsegs: int = 30):
    """OGRGeometry::Buffer for linestrings and areal geometries (points
    already have geo/hull.point_buffer_ring).  Positive distance dilates
    (union of the geometry with per-edge round-cap capsules); negative
    distance erodes areal input (difference with the boundary capsules).
    Arc density follows the reference's nQuadSegs=30 default; vertex
    phase is this engine's (arcs start on the segment normal), so
    coordinates are approximation-equal, not bit-equal, to GEOS."""
    kind = kind.lower()
    if kind == "point":
        if dist <= 0:
            return "polygon", []
        ring = _arc(data[0], data[1], dist, 0.0, 2 * np.pi, quadsegs)
        return "polygon", [ring]
    if kind == "linestring":
        if dist <= 0:
            return "polygon", []
        pts = np.asarray(data, dtype=np.float64)
        caps = [("polygon", _capsule(pts[i], pts[i + 1], dist, quadsegs))
                for i in range(len(pts) - 1)]
        return union_all(caps)
    polys = as_polys(kind, data)
    edges = _edges_of(polys)
    caps = [("polygon", _capsule(e[0:2], e[2:4], abs(dist), quadsegs))
            for e in edges]
    if dist > 0:
        return union_all([(kind, data)] + caps)
    if dist == 0:
        return kind, data
    ck, cd = union_all(caps)
    return overlay(kind, data, ck, cd, "difference")


def _segment_grid_tests(pa: np.ndarray, pb: np.ndarray):
    """Orientation products for every segment pair of closed polylines
    pa x pb -> (proper, touch, collinear_overlap) boolean grids."""
    a1 = pa[:-1][:, None, :]
    a2 = pa[1:][:, None, :]
    b1 = pb[None, :-1, :]
    b2 = pb[None, 1:, :]

    def cross(o, p, q):
        return ((p[..., 0] - o[..., 0]) * (q[..., 1] - o[..., 1])
                - (p[..., 1] - o[..., 1]) * (q[..., 0] - o[..., 0]))

    d1 = cross(a1, a2, b1)
    d2 = cross(a1, a2, b2)
    d3 = cross(b1, b2, a1)
    d4 = cross(b1, b2, a2)
    lo_a = np.minimum(a1, a2)
    hi_a = np.maximum(a1, a2)
    lo_b = np.minimum(b1, b2)
    hi_b = np.maximum(b1, b2)
    boxes = ((lo_a[..., 0] <= hi_b[..., 0]) & (lo_b[..., 0] <= hi_a[..., 0])
             & (lo_a[..., 1] <= hi_b[..., 1]) & (lo_b[..., 1] <= hi_a[..., 1]))
    proper = (d1 * d2 < 0) & (d3 * d4 < 0)
    touch = boxes & ~proper & (d1 * d2 <= 0) & (d3 * d4 <= 0) & (
        (d1 == 0) | (d2 == 0) | (d3 == 0) | (d4 == 0))
    allzero = (d1 == 0) & (d2 == 0) & (d3 == 0) & (d4 == 0)
    # collinear segments sharing more than a point: 1-D interval overlap
    # along the dominant axis has positive length
    ov_lo = np.maximum(lo_a, lo_b)
    ov_hi = np.minimum(hi_a, hi_b)
    overlap_len = np.maximum(ov_hi - ov_lo, 0.0).sum(axis=-1)
    collinear_overlap = allzero & boxes & (overlap_len > 0)
    return proper, touch, collinear_overlap


def is_valid(kind: str, data) -> tuple[bool, str]:
    """OGRGeometry::IsValid / `gdal vector check-geometry` semantics for
    areal geometries (ogr/ogrgeometry.cpp IsValid -> GEOS isvalid; rule
    set per OGC SFA 6.1.11.1):

    - every ring simple: no proper self-crossing, no non-adjacent
      self-touch, no collinear self-overlap (bowties, figure-8s);
    - rings may touch at points but never cross or share a boundary
      stretch (shell/hole collinear overlap is invalid);
    - each hole inside its shell; holes not nested in each other.

    (Interior-connectedness via chains of point-touches — GEOS's
    "disconnected interior" — is not checked; it needs the full
    topology graph and none of the replayed fixtures exercise it.)

    -> (valid, reason): reason '' when valid, else the first failing
    rule in GEOS-style wording."""
    polys = as_polys(kind, data)
    for rings in polys:
        closed = [np.vstack([r, r[:1]]) for r in rings]
        # ring simplicity
        for r in closed:
            n = len(r) - 1
            if n < 3:
                return False, "fewer than 3 distinct points in ring"
            proper, touch, _ = _segment_grid_tests(r, r)
            i = np.arange(n)[:, None]
            j = np.arange(n)[None, :]
            adj = (np.abs(i - j) <= 1) | (np.abs(i - j) == n - 1)
            if (proper & ~adj).any() or (touch & ~adj).any():
                return False, "ring self-intersection"
        shell = closed[0]
        holes = closed[1:]
        # ring-vs-ring inside one polygon
        for ai in range(len(closed)):
            for bi in range(ai + 1, len(closed)):
                proper, _, coll = _segment_grid_tests(closed[ai],
                                                      closed[bi])
                if proper.any():
                    return False, "self-intersection (rings cross)"
                if coll.any():
                    return False, "rings share a boundary stretch"
        from .pip import point_in_polygon_np
        for hi_, h in enumerate(holes):
            inside = point_in_polygon_np(h[:-1, 0], h[:-1, 1], [shell])
            if not inside.any():
                return False, "hole lies outside shell"
            for hj, h2 in enumerate(holes):
                if hj == hi_:
                    continue
                if point_in_polygon_np(h[:-1, 0], h[:-1, 1], [h2]).all():
                    return False, "holes are nested"
    return True, ""
