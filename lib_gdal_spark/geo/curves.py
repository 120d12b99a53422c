"""Curve geometries: circular-arc math, stroking (curve -> line), and the
CircularString / CompoundCurve / CurvePolygon measure surface.

Reference semantics (re-derived, not copied):
- GetCurveParameters / OGRGeometryFactoryStrokeArc / curveToLineString:
  /root/reference/ogr/ogrgeometryfactory.cpp:5389-5860. Includes the
  reference's exact rules: scale-normalized circumcenter solve with the
  1e-8 collinearity determinant guard, the 3-point full-circle CCW
  convention (PostGIS-compatible), the arc-order switch (x0 < x2 tie-broken
  on y) that makes stroking direction-symmetric to the last bit, the
  stealth step-count rule (>= 7 intermediate steps, odd parity) and the
  low-byte "hidden alpha" steganography GDAL uses so a stroked arc can be
  re-curved losslessly (OGRGF_SetHiddenValue, :5577-5607).
- Default 4-degree max angle step: GetDefaultArcStepSize
  (ogrgeometryfactory.cpp:4375-4400, OGR_ARC_STEPSIZE).
- CircularString Length/Value/segmentize/CurveToLine/area:
  /root/reference/ogr/ogrcircularstring.cpp:190-960.
- CompoundCurve/CurvePolygon linearization: component-wise with joint
  de-duplication (ogrcircularstring.cpp:665 addSubLineString(.., 1)).

All kernels are plain NumPy/stdlib over decoded WKB structures — they run
inside Arrow-batched pandas UDFs (see functions.st_curvetoline), never
per-row Python in a Spark plan.
"""

from __future__ import annotations

import math
import struct

import numpy as np

#: GDAL's default maximum angle step when stroking arcs, in degrees
#: (OGR_ARC_STEPSIZE default, ogrgeometryfactory.cpp:4383).
DEFAULT_ARC_STEP_DEG = 4.0

_TWO_PI = 2.0 * math.pi


def get_curve_parameters(x0, y0, x1, y1, x2, y2):
    """Circle through three points -> (R, cx, cy, alpha0, alpha1, alpha2)
    or None when the points are aligned / degenerate.

    Faithful to OGRGeometryFactory::GetCurveParameters
    (ogrgeometryfactory.cpp:5415-5507): the closed (p0 == p2) 3-point form
    is a full circle traversed counter-clock-wise; the open form solves
    the circumcenter from scale-normalized chord bisectors and unrolls the
    three atan2 angles into one monotone sweep.
    """
    if any(math.isnan(v) for v in (x0, y0, x1, y1, x2, y2)):
        return None

    if x0 == x2 and y0 == y2:  # full circle, CCW like PostGIS
        if x0 == x1 and y0 == y1:
            return None
        cx = (x0 + x1) / 2
        cy = (y0 + y1) / 2
        # DISTANCE is the sqrt-of-squares form, NOT hypot
        # (ogrgeometryfactory.cpp:4407) — oracle SQL mirrors it exactly
        R = math.sqrt((x0 - cx) * (x0 - cx) + (y0 - cy) * (y0 - cy))
        alpha0 = math.atan2(y0 - cy, x0 - cx)
        return R, cx, cy, alpha0, alpha0 + math.pi, alpha0 + _TWO_PI

    dx01 = x1 - x0
    dy01 = y1 - y0
    dx12 = x2 - x1
    dy12 = y2 - y1

    scale = max(abs(dx01), abs(dy01), abs(dx12), abs(dy12))
    if scale == 0.0:
        return None
    inv = 1.0 / scale
    dx01 *= inv
    dy01 *= inv
    dx12 *= inv
    dy12 *= inv

    det = dx01 * dy12 - dx12 * dy01
    if abs(det) < 1.0e-8 or math.isnan(det):
        return None
    x01_mid = (x0 + x1) * inv
    x12_mid = (x1 + x2) * inv
    y01_mid = (y0 + y1) * inv
    y12_mid = (y1 + y2) * inv
    c01 = dx01 * x01_mid + dy01 * y01_mid
    c12 = dx12 * x12_mid + dy12 * y12_mid
    cx = 0.5 * scale * (c01 * dy12 - c12 * dy01) / det
    cy = 0.5 * scale * (-c01 * dx12 + c12 * dx01) / det

    alpha0 = math.atan2((y0 - cy) * inv, (x0 - cx) * inv)
    alpha1 = math.atan2((y1 - cy) * inv, (x1 - cx) * inv)
    alpha2 = math.atan2((y2 - cy) * inv, (x2 - cx) * inv)
    R = math.sqrt((x0 - cx) * (x0 - cx) + (y0 - cy) * (y0 - cy))

    if det < 0:  # clockwise
        if alpha1 > alpha0:
            alpha1 -= _TWO_PI
        if alpha2 > alpha1:
            alpha2 -= _TWO_PI
    else:
        if alpha1 < alpha0:
            alpha1 += _TWO_PI
        if alpha2 < alpha1:
            alpha2 += _TWO_PI
    return R, cx, cy, alpha0, alpha1, alpha2


# -- stealth "hidden alpha" encoding (ogrgeometryfactory.cpp:5577-5607) --
_HIDDEN_ALPHA_SCALE = (1 << 32) - 2
_HALF_MASK = 0xFFFF


def _set_hidden_value(val16: int, x: float, y: float):
    """Encode 16 bits in the low byte of x and y (little-endian doubles)."""
    bx = bytearray(struct.pack("<d", x))
    bx[0] = val16 & 0xFF
    by = bytearray(struct.pack("<d", y))
    by[0] = (val16 >> 8) & 0xFF
    return struct.unpack("<d", bytes(bx))[0], struct.unpack("<d", bytes(by))[0]


def get_hidden_value(x: float, y: float) -> int:
    bx = struct.pack("<d", x)
    by = struct.pack("<d", y)
    return bx[0] | (by[0] << 8)


def _stroke_arc(out, cx, cy, R, z0, z1, has_z, alpha0, alpha1, step,
                stealth: bool):
    """Append the strictly-interior stroked points of one arc span.

    OGRGeometryFactoryStrokeArc (ogrgeometryfactory.cpp:5512-5575): a
    constant angle step independent of winding order; stealth mode forces
    >= 7 steps with odd parity so the hidden-alpha bits have room.
    """
    nsign = 1 if step > 0 else -1
    num = abs((alpha1 - alpha0) / step) + 0.5
    if not math.isfinite(num) or num >= 2**31:
        return
    nsteps = int(num)
    if stealth:
        if nsteps < 7:
            nsteps = 7
        else:
            nsteps = 7 + 2 * ((nsteps - 7 + 1) // 2)
    elif nsteps < 4:
        nsteps = 4
    step = nsign * abs((alpha1 - alpha0) / nsteps)
    alpha = alpha0 + step
    while (alpha - alpha1) * nsign < -1e-8:
        x = cx + R * math.cos(alpha)
        y = cy + R * math.sin(alpha)
        if has_z:
            z = z0 + (z1 - z0) * (alpha - alpha0) / (alpha1 - alpha0)
            out.append((x, y, z))
        else:
            out.append((x, y))
        alpha += step


def _need_switch_arc_order(x0, y0, x2, y2) -> bool:
    # full ordering between endpoints so both directions stroke to
    # binary-identical (reversed) points (ogrgeometryfactory.cpp:5618)
    return x0 < x2 or (x0 == x2 and y0 < y2)


def curve_to_linestring(p0, p1, p2, max_step_deg: float = 0.0,
                        stealth: bool = True) -> np.ndarray:
    """Stroke one arc (p0, p1, p2) to a point array, endpoints exact.

    Faithful to OGRGeometryFactory::curveToLineString default behavior
    (no options): endpoint-order switch + reversal, collinear fallback to
    the 3 control points, stealth step count, and the hidden-alpha low-byte
    encoding when the result has > 6 points. Points are (x, y) or
    (x, y, z) when the inputs carry 3 coordinates.
    """
    p0 = tuple(map(float, p0))
    p1 = tuple(map(float, p1))
    p2 = tuple(map(float, p2))
    has_z = len(p0) >= 3
    if _need_switch_arc_order(p0[0], p0[1], p2[0], p2[1]):
        return curve_to_linestring(p2, p1, p0, max_step_deg, stealth)[::-1]

    params = get_curve_parameters(p0[0], p0[1], p1[0], p1[1], p2[0], p2[1])
    is_arc = params is not None
    R, cx, cy, alpha0, alpha1, alpha2 = params if is_arc else (
        0.0, 0.0, 0.0, 0.0, 0.0, 0.0)

    nsign = 1 if alpha1 >= alpha0 else -1
    if max_step_deg < 1e-6:
        max_step_deg = DEFAULT_ARC_STEP_DEG
    step = max_step_deg / 180.0 * math.pi
    step = max(step, 0.01 / 180.0 * math.pi)
    step *= nsign

    z0 = p0[2] if has_z else 0.0
    z1 = p1[2] if has_z else 0.0
    z2 = p2[2] if has_z else 0.0
    pts: list[tuple] = [p0[:3] if has_z else p0[:2]]
    if not is_arc:
        # straight spans: StrokeArc adds nothing, the mid control point is
        # kept (ogrgeometryfactory.cpp:5752-5762)
        _stroke_arc(pts, cx, cy, R, z0, z1, has_z, alpha0, alpha1, step,
                    False)
        pts.append(p1[:3] if has_z else p1[:2])
        _stroke_arc(pts, cx, cy, R, z1, z2, has_z, alpha1, alpha2, step,
                    False)
    else:
        _stroke_arc(pts, cx, cy, R, z0, z2, has_z, alpha0, alpha2, step,
                    stealth)
        if stealth and len(pts) > 6:
            # hide the intermediate-point angle ratio in the low bytes of
            # the first and last computed point pairs, 0xFFFF elsewhere —
            # symmetric about the midpoint (ogrgeometryfactory.cpp:5790+)
            ratio = (alpha1 - alpha0) / (alpha2 - alpha0)
            alpha_ratio = 0.5 + _HIDDEN_ALPHA_SCALE * ratio
            if alpha_ratio < 0.0:
                alpha_ratio = -alpha_ratio
            if not (alpha_ratio < 2**32 - 1) or math.isnan(alpha_ratio):
                alpha_ratio = 2**32 - 1
            n_ratio = int(alpha_ratio)
            lo = n_ratio & _HALF_MASK
            hi = n_ratio >> 16
            n = len(pts)
            i = 1
            while i + 1 < n:
                for j, first_val, last_val in ((i, lo, hi),
                                               (i + 1, hi, lo)):
                    val = 0xFFFF
                    if i == 1:
                        val = first_val
                    elif i == n - 2:
                        val = last_val
                    x, y = pts[j][0], pts[j][1]
                    x, y = _set_hidden_value(val, x, y)
                    pts[j] = (x, y, pts[j][2]) if has_z else (x, y)
                i += 2
    pts.append(p2[:3] if has_z else p2[:2])
    return np.asarray(pts, dtype=np.float64)


def _arc_triples(pts: np.ndarray):
    pts = np.asarray(pts, dtype=np.float64)
    for i in range(0, len(pts) - 2, 2):
        yield pts[i], pts[i + 1], pts[i + 2]


def circularstring_to_linestring(pts, max_step_deg: float = 0.0) -> np.ndarray:
    """OGRCircularString::CurveToLine: stroke each arc triple, dropping
    the duplicated joint point between consecutive arcs."""
    out: list[np.ndarray] = []
    for k, (a, b, c) in enumerate(_arc_triples(pts)):
        seg = curve_to_linestring(a, b, c, max_step_deg)
        out.append(seg if k == 0 else seg[1:])
    if not out:
        return np.asarray(pts, dtype=np.float64).copy()
    return np.vstack(out)


def circularstring_length(pts) -> float:
    """Exact arc length (ogrcircularstring.cpp:195): R*|alpha2-alpha0|
    per arc, chord length on collinear spans."""
    total = 0.0
    for a, b, c in _arc_triples(pts):
        prm = get_curve_parameters(a[0], a[1], b[0], b[1], c[0], c[1])
        if prm is not None:
            R, _, _, a0, _, a2 = prm
            total += abs(a2 - a0) * R
        else:
            total += math.hypot(c[0] - a[0], c[1] - a[1])
    return total


def circularstring_value(pts, distance: float):
    """Point at `distance` along the curve (ogrcircularstring.cpp:568).
    Returns (x, y) or (x, y, z) matching the input width."""
    pts = np.asarray(pts, dtype=np.float64)
    has_z = pts.shape[1] >= 3
    if distance < 0:
        return tuple(pts[0])
    walked = 0.0
    for i in range(0, len(pts) - 2, 2):
        a, b, c = pts[i], pts[i + 1], pts[i + 2]
        prm = get_curve_parameters(a[0], a[1], b[0], b[1], c[0], c[1])
        if prm is not None:
            R, cx, cy, a0, _, a2 = prm
            seg = abs(a2 - a0) * R
            if seg > 0:
                if walked <= distance <= walked + seg:
                    ratio = (distance - walked) / seg
                    alpha = a0 * (1 - ratio) + a2 * ratio
                    x = cx + R * math.cos(alpha)
                    y = cy + R * math.sin(alpha)
                    if has_z:
                        return (x, y, a[2] * (1 - ratio) + c[2] * ratio)
                    return (x, y)
                walked += seg
        else:
            seg = math.hypot(c[0] - a[0], c[1] - a[1])
            if seg > 0:
                if walked <= distance <= walked + seg:
                    ratio = (distance - walked) / seg
                    out = a[:2] * (1 - ratio) + c[:2] * ratio
                    if has_z:
                        return (out[0], out[1],
                                a[2] * (1 - ratio) + c[2] * ratio)
                    return tuple(out)
                walked += seg
    return tuple(pts[-1])


def circularstring_segmentize(pts, max_length: float) -> np.ndarray:
    """OGRCircularString::segmentize (ogrcircularstring.cpp:320): insert
    an ODD number of intermediate points per half-arc (keeping the
    CIRCULARSTRING arc structure valid), direction-symmetric via the same
    endpoint-ordering switch as stroking."""
    pts = np.asarray(pts, dtype=np.float64)
    if len(pts) == 0:
        return pts
    has_z = pts.shape[1] >= 3
    p0, pn = pts[0], pts[-1]
    if p0[0] < pn[0] or (p0[0] == pn[0] and p0[1] < pn[1]):
        return circularstring_segmentize(pts[::-1], max_length)[::-1]

    out: list[tuple] = []

    def _row(x, y, z):
        return (x, y, z) if has_z else (x, y)

    for i in range(0, len(pts) - 2, 2):
        a, b, c = pts[i], pts[i + 1], pts[i + 2]
        out.append(_row(a[0], a[1], a[2] if has_z else 0.0))
        prm = get_curve_parameters(a[0], a[1], b[0], b[1], c[0], c[1])
        if prm is not None:
            R, cx, cy, a0, a1, a2 = prm
            seg1 = abs(a1 - a0) * R
            seg2 = abs(a2 - a1) * R
            need = seg1 > max_length or seg2 > max_length
            if need:
                n_mid = int(1 + 2 * math.floor(seg1 / max_length / 2.0))
                step = (a1 - a0) / (n_mid + 1)
                for j in range(1, n_mid + 1):
                    alpha = a0 + step * j
                    z = (a[2] + (b[2] - a[2]) * (alpha - a0) / (a1 - a0)
                         if has_z else 0.0)
                    out.append(_row(cx + R * math.cos(alpha),
                                    cy + R * math.sin(alpha), z))
            out.append(_row(b[0], b[1], b[2] if has_z else 0.0))
            if need:
                n_mid = int(1 + 2 * math.floor(seg2 / max_length / 2.0))
                step = (a2 - a1) / (n_mid + 1)
                for j in range(1, n_mid + 1):
                    alpha = a1 + step * j
                    z = (b[2] + (c[2] - b[2]) * (alpha - a1) / (a2 - a1)
                         if has_z else 0.0)
                    out.append(_row(cx + R * math.cos(alpha),
                                    cy + R * math.sin(alpha), z))
        else:
            # straight spans use CEIL where arcs use FLOOR
            # (ogrcircularstring.cpp:446 vs :380)
            seg1 = math.hypot(b[0] - a[0], b[1] - a[1])
            seg2 = math.hypot(c[0] - b[0], c[1] - b[1])
            if seg1 > max_length or seg2 > max_length:
                n_mid = int(1 + 2 * math.ceil(seg1 / max_length / 2.0))
                for j in range(1, n_mid + 1):
                    t = j / (n_mid + 1)
                    z = a[2] + t * (b[2] - a[2]) if has_z else 0.0
                    out.append(_row(a[0] + t * (b[0] - a[0]),
                                    a[1] + t * (b[1] - a[1]), z))
                out.append(_row(b[0], b[1], b[2] if has_z else 0.0))
                n_mid = int(1 + 2 * math.ceil(seg2 / max_length / 2.0))
                for j in range(1, n_mid + 1):
                    t = j / (n_mid + 1)
                    z = b[2] + t * (c[2] - b[2]) if has_z else 0.0
                    out.append(_row(b[0] + t * (c[0] - b[0]),
                                    b[1] + t * (c[1] - b[1]), z))
            else:
                out.append(_row(b[0], b[1], b[2] if has_z else 0.0))
    last = pts[-1]
    out.append(_row(last[0], last[1], last[2] if has_z else 0.0))
    res = np.asarray(out, dtype=np.float64)
    # the reference keeps the ORIGINAL points when nothing was inserted
    return res if len(res) > len(pts) else pts.copy()


def _is_closed(pts) -> bool:
    pts = np.asarray(pts, dtype=np.float64)
    return len(pts) >= 3 and pts[0][0] == pts[-1][0] and pts[0][1] == pts[-1][1]


def _is_full_circle(pts):
    """-> (cx, cy, R^2) or None (ogrcircularstring.cpp IsFullCircle)."""
    pts = np.asarray(pts, dtype=np.float64)
    if len(pts) == 3 and _is_closed(pts):
        x0, y0 = pts[0][0], pts[0][1]
        x1, y1 = pts[1][0], pts[1][1]
        cx, cy = (x0 + x1) / 2, (y0 + y1) / 2
        return cx, cy, (x1 - cx) ** 2 + (y1 - cy) ** 2
    if len(pts) == 5 and _is_closed(pts):
        prm1 = get_curve_parameters(*pts[0][:2], *pts[1][:2], *pts[2][:2])
        prm2 = get_curve_parameters(*pts[2][:2], *pts[3][:2], *pts[4][:2])
        if (prm1 and prm2
                and abs(prm1[0] - prm2[0]) < 1e-10
                and abs(prm1[1] - prm2[1]) < 1e-10
                and abs(prm1[2] - prm2[2]) < 1e-10
                and (prm1[5] - prm1[3]) * (prm2[5] - prm2[3]) > 0):
            return prm1[1], prm1[2], prm1[0] ** 2
    return None


def _is_convex(pts) -> bool:
    pts = np.asarray(pts, dtype=np.float64)
    for i in range(len(pts) - 2):
        p1, p2, p3 = pts[i], pts[i + 1], pts[i + 2]
        cross = ((p2[0] - p1[0]) * (p3[1] - p2[1])
                 - (p2[1] - p1[1]) * (p3[0] - p2[0]))
        if cross > 0:
            return False
    return True


def _shoelace(pts) -> float:
    pts = np.asarray(pts, dtype=np.float64)
    x, y = pts[:, 0], pts[:, 1]
    return abs(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1])
               + (x[-1] * y[0] - x[0] * y[-1])) / 2.0


def circularstring_area_of_curve_segments(pts) -> float:
    """Sum of circular-segment areas (ogrcircularstring.cpp:827)."""
    total = 0.0
    for a, b, c in _arc_triples(pts):
        prm = get_curve_parameters(a[0], a[1], b[0], b[1], c[0], c[1])
        if prm is not None:
            R, _, _, a0, a1, a2 = prm
            d01, d12 = a1 - a0, a2 - a1
            total += 0.5 * R * R * abs(d01 - math.sin(d01)
                                       + d12 - math.sin(d12))
    return total


def circularstring_area(pts, max_step_deg: float = 0.0) -> float:
    """Closed-ring area (ogrcircularstring.cpp:865): pi*R^2 for full
    circles, shoelace + segment areas for convex rings, stroked shoelace
    otherwise."""
    pts = np.asarray(pts, dtype=np.float64)
    if len(pts) == 0 or not _is_closed(pts):
        return 0.0
    circle = _is_full_circle(pts)
    if circle is not None:
        return math.pi * circle[2]
    if _is_convex(pts):
        return _shoelace(pts) + circularstring_area_of_curve_segments(pts)
    return _shoelace(circularstring_to_linestring(pts, max_step_deg))


def compoundcurve_to_linestring(components, max_step_deg: float = 0.0
                                ) -> np.ndarray:
    """components: [(kind, pts), ...] with kind in {linestring,
    circularstring} -> concatenated stroked points, joints de-duplicated
    (OGRCompoundCurve::CurveToLine semantics)."""
    out: list[np.ndarray] = []
    for k, (kind, pts) in enumerate(components):
        if kind == "circularstring":
            seg = circularstring_to_linestring(pts, max_step_deg)
        else:
            seg = np.asarray(pts, dtype=np.float64)
        out.append(seg if k == 0 else seg[1:])
    return np.vstack(out) if out else np.zeros((0, 2))


def compoundcurve_length(components) -> float:
    total = 0.0
    for kind, pts in components:
        if kind == "circularstring":
            total += circularstring_length(pts)
        else:
            p = np.asarray(pts, dtype=np.float64)
            total += float(np.sum(np.hypot(np.diff(p[:, 0]),
                                           np.diff(p[:, 1]))))
    return total


def compoundcurve_area(components, max_step_deg: float = 0.0) -> float:
    """Closed compound-curve ring area (ogrcompoundcurve.cpp get_Area):
    convex control-point rings use shoelace + exact circular-segment
    areas; concave rings fall back to the stroked shoelace."""
    ctrl: list[np.ndarray] = []
    for k, (kind, pts) in enumerate(components):
        p = np.asarray(pts, dtype=np.float64)[:, :2]
        ctrl.append(p if k == 0 else p[1:])
    if not ctrl:
        return 0.0
    pts = np.vstack(ctrl)
    if not _is_closed(pts):
        return 0.0
    if _is_convex(pts):
        area = _shoelace(pts)
        for kind, comp in components:
            if kind == "circularstring":
                area += circularstring_area_of_curve_segments(comp)
        return area
    return _shoelace(compoundcurve_to_linestring(components, max_step_deg))


def curve_ring_area(ring, max_step_deg: float = 0.0) -> float:
    """Area of one CurvePolygon ring descriptor (kind-tagged), absolute."""
    if isinstance(ring, tuple) and len(ring) == 2 and isinstance(ring[0], str):
        kind, data = ring
        if kind == "circularstring":
            return circularstring_area(data, max_step_deg)
        if kind == "compoundcurve":
            return compoundcurve_area(data, max_step_deg)
        ring = data
    pts = np.asarray(ring, dtype=np.float64)
    if len(pts) == 0 or not _is_closed(pts):
        return 0.0
    return _shoelace(pts)


def curvepolygon_area(rings, max_step_deg: float = 0.0) -> float:
    """OGRCurvePolygon::get_Area (ogrcurvepolygon.cpp): exterior ring
    area minus interior ring areas, each ring exact where the arc math
    allows (full circle -> pi*R^2, convex -> shoelace + segments)."""
    if not rings:
        return 0.0
    area = curve_ring_area(rings[0], max_step_deg)
    for r in rings[1:]:
        area -= curve_ring_area(r, max_step_deg)
    return area


def _ring_to_linestring(ring, max_step_deg: float = 0.0) -> np.ndarray:
    """One CurvePolygon ring (kind-tagged or a bare point array) -> closed
    stroked ring."""
    if isinstance(ring, tuple) and len(ring) == 2 and isinstance(ring[0], str):
        kind, data = ring
        if kind == "circularstring":
            pts = circularstring_to_linestring(data, max_step_deg)
        elif kind == "compoundcurve":
            pts = compoundcurve_to_linestring(data, max_step_deg)
        else:
            pts = np.asarray(data, dtype=np.float64)
    else:
        pts = np.asarray(ring, dtype=np.float64)
    if len(pts) and (pts[0][:2] != pts[-1][:2]).any():
        pts = np.vstack([pts, pts[:1]])
    return pts


def curvepolygon_to_polygon(rings, max_step_deg: float = 0.0):
    """CurvePolygon rings -> list of closed stroked rings (a plain
    polygon in this engine's decoded representation)."""
    return [_ring_to_linestring(r, max_step_deg) for r in rings]


def _linear_length(pts) -> float:
    p = np.asarray(pts, dtype=np.float64)
    if len(p) < 2:
        return 0.0
    return float(np.sum(np.hypot(np.diff(p[:, 0]), np.diff(p[:, 1]))))


def curve_length(kind: str, data) -> float:
    """Exact planar length of any curve-typed geometry (arc spans use
    R*|dalpha|, the reference's get_Length); areal kinds sum their ring
    perimeters."""
    if kind == "circularstring":
        return circularstring_length(data)
    if kind == "compoundcurve":
        return compoundcurve_length(data)
    if kind == "curvepolygon":
        total = 0.0
        for ring in data:
            if (isinstance(ring, tuple) and len(ring) == 2
                    and isinstance(ring[0], str)):
                total += curve_length(ring[0], ring[1])
            else:
                total += _linear_length(ring)
        return total
    if kind in ("multicurve", "multisurface"):
        return sum(curve_length(k, d) for k, d in data)
    if kind == "linestring":
        return _linear_length(data)
    if kind in ("triangle", "polygon"):
        return sum(_linear_length(r) for r in data)
    if kind in ("polyhedralsurface", "tin", "multipolygon"):
        return sum(_linear_length(r) for rings in data for r in rings)
    return 0.0


CURVE_KINDS = frozenset({"circularstring", "compoundcurve", "curvepolygon",
                         "multicurve", "multisurface"})


def has_curve_geometry(kind: str, data) -> bool:
    """OGRGeometry::hasCurveGeometry(bLookForNonLinear=TRUE): does the
    geometry (recursively) contain an actual arc component?"""
    if kind == "circularstring":
        return True
    if kind in ("compoundcurve", "multicurve", "multisurface",
                "collection"):
        return any(has_curve_geometry(k, d) for k, d in data)
    if kind == "curvepolygon":
        for ring in data:
            if (isinstance(ring, tuple) and len(ring) == 2
                    and isinstance(ring[0], str)
                    and has_curve_geometry(ring[0], ring[1])):
                return True
        return False
    return False


def linearize(kind: str, data, max_step_deg: float = 0.0):
    """GetLinearGeometry over this engine's decoded-WKB representation ->
    (linear_kind, linear_data). Linear inputs pass through unchanged."""
    if kind == "circularstring":
        return "linestring", circularstring_to_linestring(data, max_step_deg)
    if kind == "compoundcurve":
        return "linestring", compoundcurve_to_linestring(data, max_step_deg)
    if kind == "curvepolygon":
        return "polygon", curvepolygon_to_polygon(data, max_step_deg)
    if kind == "multicurve":
        return "multilinestring", [
            linearize(k, d, max_step_deg)[1] for k, d in data]
    if kind == "multisurface":
        return "multipolygon", [
            linearize(k, d, max_step_deg)[1] for k, d in data]
    if kind == "triangle":
        return "polygon", data
    if kind in ("polyhedralsurface", "tin"):
        return "multipolygon", data
    if kind == "collection":
        return "collection", [linearize(k, d, max_step_deg) for k, d in data]
    return kind, data
