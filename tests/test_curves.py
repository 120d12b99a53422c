"""Curve geometries: arc stroking, WKB/WKT codec, measures.

Goldens replayed from the reference's own autotest
(/root/reference/autotest/ogr/ogr_geom.py:1540-1960 circularstring,
:1960+ compoundcurve, :2228+ curvepolygon) — stroked vertex lists at a
45-degree step, exact arc lengths, Value() interpolation, segmentize
output, and the full-circle / convex-area rules.
"""

import math

import numpy as np
import pytest

from lib_gdal_spark.geo import curves, wkb, wkt


def _close(got, exp, tol=1e-8):
    got = np.asarray(got, dtype=np.float64)
    exp = np.asarray(exp, dtype=np.float64)
    assert got.shape == exp.shape, (got.shape, exp.shape)
    assert np.abs(got - exp).max() <= tol


# ---------------------------------------------------------------- stroking

# autotest ogr_geom.py test_ogr_geom_circularstring stroking golden
STROKE_45 = [
    (0, 0),
    (0.218168517531969, 0.623489801858729),
    (0.777479066043687, 0.974927912181831),
    (1.433883739117561, 0.900968867902435),
    (1.900968867902463, 0.433883739117562),
    (1.974927912181821, -0.222520933956316),
    (1.623489801858719, -0.78183148246804),
    (1, -1),
]


def test_stroke_45_golden():
    got = curves.circularstring_to_linestring([(0, 0), (1, 1), (1, -1)], 45)
    _close(got, STROKE_45)


def test_stroke_full_circle_3pt_ccw_postgis():
    # ISO 3-point full circle: counter-clock-wise like PostGIS
    exp = [
        (0, 0),
        (0.116977778440514, -0.321393804843282),
        (0.413175911166547, -0.49240387650611),
        (0.75, -0.433012701892224),
        (0.969846310392967, -0.171010071662835),
        (0.969846310392967, 0.171010071662835),
        (0.75, 0.433012701892224),
        (0.413175911166547, 0.49240387650611),
        (0.116977778440514, 0.321393804843282),
        (0, 0),
    ]
    got = curves.circularstring_to_linestring([(0, 0), (1, 0), (0, 0)], 45)
    _close(got, exp)


def test_stroke_full_circle_5pt():
    exp = [
        (0, 0),
        (0.049515566048791, 0.216941869558781),
        (0.188255099070638, 0.390915741234018),
        (0.388739533021848, 0.48746395609092),
        (0.611260466978166, 0.48746395609092),
        (0.811744900929369, 0.390915741234018),
        (0.950484433951232, 0.216941869558781),
        (1, 0),
        (0.950484433951232, -0.216941869558781),
        (0.811744900929369, -0.390915741234018),
        (0.611260466978166, -0.48746395609092),
        (0.388739533021848, -0.48746395609092),
        (0.188255099070638, -0.390915741234018),
        (0.049515566048791, -0.216941869558781),
        (0, 0),
    ]
    got = curves.circularstring_to_linestring(
        [(0, 0), (0.5, 0.5), (1.0, 0.0), (0.5, -0.5), (0.0, 0.0)], 45)
    _close(got, exp)


def test_stroke_collinear_keeps_control_points():
    got = curves.circularstring_to_linestring([(0, 0), (1, 1), (2, 2)], 45)
    _close(got, [(0, 0), (1, 1), (2, 2)], tol=0)


def test_stroke_direction_symmetry_bit_exact():
    # the reference's endpoint-order switch makes both directions stroke
    # to BINARY-identical reversed points (ogr_geom.py segmentize check)
    a = curves.circularstring_to_linestring([(0, 0), (1.2, 1), (2, 0)], 0)
    b = curves.circularstring_to_linestring([(2, 0), (1.2, 1), (0, 0)], 0)
    assert np.array_equal(a, b[::-1])


def test_stroke_z_full_circle_golden():
    # autotest golden: CIRCULARSTRING (0 0 1,1 0 2,0 0 1) strokes with
    # CONSTANT z=1 (z interpolates start->end of the whole sweep, and
    # both endpoints carry z=1)
    exp = [
        (0, 0, 1),
        (0.116977778440514, -0.321393804843282, 1),
        (0.413175911166547, -0.49240387650611, 1),
        (0.75, -0.433012701892224, 1),
        (0.969846310392967, -0.171010071662835, 1),
        (0.969846310392967, 0.171010071662835, 1),
        (0.75, 0.433012701892224, 1),
        (0.413175911166547, 0.49240387650611, 1),
        (0.116977778440514, 0.321393804843282, 1),
        (0, 0, 1),
    ]
    got = curves.circularstring_to_linestring(
        [(0, 0, 1), (1, 0, 2), (0, 0, 1)], 45)
    _close(got, exp)


def test_segmentize_z_golden():
    # autotest golden: Z circularstring segmentize keeps arc structure
    # and interpolates z linearly in angle per half-arc
    got = curves.circularstring_segmentize(
        np.array([(0., 0., 1.), (1., 0., 2.), (0., 0., 1.)]), 0.5)
    exp = [
        (0, 0, 1),
        (0.146446609406726, -0.353553390593274, 1.25),
        (0.5, -0.5, 1.5),
        (0.853553390593274, -0.353553390593274, 1.75),
        (1, 0, 2),
        (0.853553390593274, 0.353553390593274, 1.75),
        (0.5, 0.5, 1.5),
        (0.146446609406727, 0.353553390593274, 1.25),
        (0, 0, 1),
    ]
    _close(got, exp)


def test_stealth_hidden_alpha_bits():
    # default stroking hides the intermediate-angle ratio in the low
    # bytes: interior points carry 0xFFFF except the first/last pairs
    pts = curves.curve_to_linestring((2, 0), (1, 1), (0, 0))
    assert len(pts) > 6
    vals = [curves.get_hidden_value(x, y) for x, y in pts[1:-1]]
    assert vals[2] == 0xFFFF
    lo, hi = vals[0], vals[1]
    ratio = ((hi << 16) | lo) / curves._HIDDEN_ALPHA_SCALE
    assert 0.0 < ratio < 1.0  # recoverable angle ratio


# ---------------------------------------------------------------- measures

def test_length_goldens():
    assert curves.circularstring_length(
        [(0, 0), (1, 1), (1, -1)]) == pytest.approx(1.5 * math.pi, abs=1e-8)
    assert curves.circularstring_length(
        [(0, 0), (1, 0), (0, 0)]) == pytest.approx(math.pi, abs=1e-8)
    assert curves.circularstring_length(
        [(0, 0), (1, 1), (2, 2)]) == pytest.approx(2 * math.sqrt(2),
                                                   abs=1e-8)


def test_value_goldens():
    pts = np.array([(0., 0.), (1., 1.), (1., -1.)])
    L = 1.5 * math.pi
    _close(curves.circularstring_value(pts, -1), (0, 0))
    _close(curves.circularstring_value(pts, L / 6),
           (0.292893218813453, 0.707106781186548))
    _close(curves.circularstring_value(pts, L / 2),
           (1.707106781186547, 0.707106781186547))
    _close(curves.circularstring_value(pts, L + 1), (1, -1))
    # collinear variant
    pts2 = np.array([(0., 0.), (1., 1.), (2., 2.)])
    L2 = 2 * math.sqrt(2)
    _close(curves.circularstring_value(pts2, L2 / 4), (0.5, 0.5))
    _close(curves.circularstring_value(pts2, 3 * L2 / 4), (1.5, 1.5))


def test_segmentize_goldens():
    got = curves.circularstring_segmentize(
        np.array([(0., 0.), (0.5, 0.5), (1., 0.), (0.5, -0.5), (0., 0.)]),
        0.5)
    exp = [
        (0, 0),
        (0.146446609406726, 0.353553390593274),
        (0.5, 0.5),
        (0.853553390593274, 0.353553390593274),
        (1, 0),
        (0.853553390593274, -0.353553390593274),
        (0.5, -0.5),
        (0.146446609406726, -0.353553390593274),
        (0, 0),
    ]
    _close(got, exp)
    # collinear segmentize
    got2 = curves.circularstring_segmentize(
        np.array([(0., 0.), (1., 1.), (2., 2.)]), 0.5)
    assert len(got2) == 13
    _close(got2[1], (1 / 6, 1 / 6))
    # direction symmetry is binary-exact
    a = curves.circularstring_segmentize(
        np.array([(0., 0.), (1.2, 1.), (2., 0.)]), 0.25)
    b = curves.circularstring_segmentize(
        np.array([(2., 0.), (1.2, 1.), (0., 0.)]), 0.25)
    assert np.array_equal(a, b[::-1])


def test_area_full_circle_exact():
    # CurvePolygon over a full circle: exactly pi*R^2, no stroking
    assert curves.circularstring_area(
        [(0, 0), (1, 0), (0, 0)]) == pytest.approx(math.pi * 0.25, abs=0)
    assert curves.circularstring_area(
        [(0, 0), (0.5, 0.5), (1, 0), (0.5, -0.5), (0, 0)]) == pytest.approx(
            math.pi * 0.25, abs=1e-12)


def test_area_convex_shoelace_plus_segments():
    # half-disc: CIRCULARSTRING arc + closing straight edge as a
    # compound ring; area = pi*R^2/2
    comps = [("circularstring", [(0, 0), (0.5, 0.5), (1, 0)]),
             ("linestring", [(1, 0), (0, 0)])]
    assert curves.compoundcurve_area(comps) == pytest.approx(
        math.pi * 0.125, abs=1e-12)
    assert curves.curvepolygon_area(
        [("compoundcurve", comps)]) == pytest.approx(math.pi * 0.125,
                                                     abs=1e-12)


def test_curvepolygon_hole_subtracts():
    outer = ("linestring", [(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)])
    hole = ("circularstring", [(4, 5), (5, 5), (4, 5)])  # r=0.5 circle
    assert curves.curvepolygon_area([outer, hole]) == pytest.approx(
        100 - math.pi * 0.25, abs=1e-12)


# ---------------------------------------------------------------- WKB

def test_wkb_roundtrip_circularstring():
    buf = wkb.encode_circularstring([(0, 0), (1, 1), (1, -1)])
    kind, data = wkb.decode(buf)
    assert kind == "circularstring"
    _close(data, [(0, 0), (1, 1), (1, -1)], tol=0)
    assert wkb.encode_geometry(kind, data) == buf


def test_wkb_iso_z_code_1008():
    import struct
    iso = struct.pack("<BII", 1, 1008, 3) + np.array(
        [(0, 0, 10), (1, 1, 20), (2, 0, 30)], dtype="<f8").tobytes()
    kind, data, has_z = wkb.decode_z(iso)
    assert kind == "circularstring" and has_z
    _close(data, [(0, 0, 10), (1, 1, 20), (2, 0, 30)], tol=0)


def test_wkb_roundtrip_compound_and_curvepolygon():
    cc = wkb.encode_compoundcurve([
        wkb.encode_circularstring([(0, 0), (1, 1), (2, 0)]),
        wkb.encode_linestring([(2, 0), (3, 0)])])
    kind, data = wkb.decode(cc)
    assert kind == "compoundcurve"
    assert [k for k, _ in data] == ["circularstring", "linestring"]
    assert wkb.encode_geometry(kind, data) == cc

    cp = wkb.encode_curvepolygon(
        [wkb.encode_circularstring([(0, 0), (1, 0), (0, 0)])])
    kind, data = wkb.decode(cp)
    assert kind == "curvepolygon"
    assert wkb.encode_geometry(kind, data) == cp


def test_wkb_roundtrip_multis_and_surfaces():
    mc = wkb.encode_multicurve([
        wkb.encode_circularstring([(0, 0), (1, 1), (1, -1)]),
        wkb.encode_linestring([(0, 0), (5, 5)])])
    kind, data = wkb.decode(mc)
    assert kind == "multicurve" and len(data) == 2
    assert wkb.encode_geometry(kind, data) == mc

    ms = wkb.encode_multisurface([
        wkb.encode_curvepolygon(
            [wkb.encode_circularstring([(0, 0), (1, 0), (0, 0)])]),
        wkb.encode_polygon([[(0, 0), (1, 0), (1, 1), (0, 0)]])])
    kind, data = wkb.decode(ms)
    assert kind == "multisurface"
    assert [k for k, _ in data] == ["curvepolygon", "polygon"]
    assert wkb.encode_geometry(kind, data) == ms

    ps = wkb.encode_polyhedralsurface(
        [[[(0, 0), (1, 0), (1, 1), (0, 0)]],
         [[(0, 0), (0, 1), (1, 1), (0, 0)]]])
    kind, data = wkb.decode(ps)
    assert kind == "polyhedralsurface" and len(data) == 2
    assert wkb.encode_geometry(kind, data) == ps

    tin = wkb.encode_polyhedralsurface(
        [[[(0, 0), (1, 0), (1, 1), (0, 0)]]], tin=True)
    kind, data = wkb.decode(tin)
    assert kind == "tin"
    assert wkb.encode_geometry(kind, data) == tin

    tri = wkb.encode_triangle([[(0, 0), (1, 0), (1, 1), (0, 0)]])
    kind, data = wkb.decode(tri)
    assert kind == "triangle"
    assert wkb.encode_geometry(kind, data) == tri


def test_linearize_dispatch():
    kind, data = wkb.decode(wkb.encode_compoundcurve([
        wkb.encode_circularstring([(0, 0), (1, 1), (2, 0)]),
        wkb.encode_linestring([(2, 0), (3, 0)])]))
    lk, ld = curves.linearize(kind, data, 45)
    assert lk == "linestring"
    _close(ld[0], (0, 0), tol=0)
    _close(ld[-1], (3, 0), tol=0)

    lk, ld = curves.linearize("tin", [[[(0, 0), (1, 0), (1, 1), (0, 0)]]])
    assert lk == "multipolygon" and len(ld) == 1


# ---------------------------------------------------------------- WKT

def test_wkt_roundtrip_curves():
    cases = [
        "CIRCULARSTRING (0 0, 1 1, 1 -1)",
        "COMPOUNDCURVE (CIRCULARSTRING (0 0, 1 1, 2 0), (2 0, 3 0))",
        "CURVEPOLYGON (CIRCULARSTRING (0 0, 1 0, 0 0))",
        "MULTICURVE ((0 0, 1 1), CIRCULARSTRING (0 0, 1 1, 1 -1))",
        "MULTISURFACE (CURVEPOLYGON (CIRCULARSTRING (0 0, 1 0, 0 0)), "
        "((10 10, 11 10, 11 11, 10 10)))",
        "TRIANGLE ((0 0, 1 0, 1 1, 0 0))",
        "POLYHEDRALSURFACE (((0 0, 1 0, 1 1, 0 0)), "
        "((0 0, 0 1, 1 1, 0 0)))",
        "TIN (((0 0, 1 0, 1 1, 0 0)))",
    ]
    for case in cases:
        kind, data = wkt.from_wkt(case)
        # text -> structure -> WKB -> structure -> text is stable
        buf = wkb.encode_geometry(kind, data)
        kind2, data2 = wkb.decode(buf)
        assert kind2 == kind
        assert wkt.to_wkt(kind2, data2) == wkt.to_wkt(kind, data)


def test_wkt_compound_matches_wkb_decode_shape():
    kind, data = wkt.from_wkt(
        "COMPOUNDCURVE (CIRCULARSTRING (0 0, 1 1, 2 0), (2 0, 3 0))")
    assert kind == "compoundcurve"
    assert [k for k, _ in data] == ["circularstring", "linestring"]
    assert curves.compoundcurve_length(data) == pytest.approx(
        math.pi + 1.0, abs=1e-8)


def test_has_curve_geometry():
    assert curves.has_curve_geometry(
        *wkt.from_wkt("CIRCULARSTRING (0 0, 1 1, 1 -1)"))
    assert curves.has_curve_geometry(
        *wkt.from_wkt("CURVEPOLYGON (CIRCULARSTRING (0 0, 1 0, 0 0))"))
    # a curve CONTAINER with only linear members has no actual arc
    assert not curves.has_curve_geometry(
        *wkt.from_wkt("MULTICURVE ((0 0, 1 1))"))
    assert not curves.has_curve_geometry(
        *wkt.from_wkt("LINESTRING (0 0, 1 1)"))


def test_wkt_z_roundtrip():
    """Z geometries round-trip text -> structure -> WKB -> text with the
    ` Z ` form (exportToWkt/importFromWkt semantics)."""
    cases = [
        "POINT Z (1 2 3)",
        "LINESTRING Z (0 0 10, 1 1 20)",
        "CIRCULARSTRING Z (0 0 10, 1 1 20, 2 0 30)",
        "POLYGON Z ((0 0 1, 1 0 1, 1 1 1, 0 0 1))",
        "MULTIPOLYGON Z (((0 0 1, 1 0 1, 1 1 1, 0 0 1)))",
    ]
    for c in cases:
        k, d = wkt.from_wkt(c)
        k2, d2, hz = wkb.decode_z(wkb.encode_geometry(k, d))
        assert hz and wkt.to_wkt(k2, d2) == c
    # 2-D output stays Z-free
    assert wkt.to_wkt(*wkt.from_wkt("POLYGON ((0 0, 1 0, 1 1, 0 0))")) \
        == "POLYGON ((0 0, 1 0, 1 1, 0 0))"
