"""DXF source/sink: replays of the reference's own ogr_dxf autotest
expectations (counts, fields, styles, vertex-exact geometry goldens),
ACI palette parity against the reference table, and writer roundtrips.
"""

import math
import re

import numpy as np
import pytest

from lib_gdal_spark.geo import wkb as wkbmod
from lib_gdal_spark.sources import dxf

DATA = "/root/reference/autotest/ogr/data/dxf"
AUTOTEST = "/root/reference/autotest/ogr/ogr_dxf.py"


def _env_area(geom):
    c = np.vstack(list(dxf._coords(geom)))
    return float((c[:, 0].max() - c[:, 0].min())
                 * (c[:, 1].max() - c[:, 1].min()))


def _autotest_golden(prefix: str) -> np.ndarray:
    """Pull a check_feature_geometry WKT golden out of the reference's
    own ogr_dxf.py by a distinctive coordinate prefix, honoring the
    "..." + "..." string concatenation, and parse the coordinates."""
    src = open(AUTOTEST).read()
    start = src.index(prefix)
    q0 = src.rindex('"', 0, start)
    # accumulate string literal parts until the closing paren
    parts = []
    i = q0
    while True:
        j = src.index('"', i + 1)
        parts.append(src[i + 1:j])
        k = j + 1
        while src[k] in " \n\r\t":
            k += 1
        if src[k] == "+":
            i = src.index('"', k)
        else:
            break
    wkt = "".join(parts)
    nums = re.findall(r"[-+]?\d+\.?\d*(?:[eE][-+]?\d+)?", wkt)
    vals = np.array([float(x) for x in nums])
    dims = 3 if (" Z " in wkt or wkt.split("(")[0].strip().endswith("25D")
                 or len(vals) % 3 == 0 and " 0," in wkt) else 2
    # infer dims from the first coordinate group instead: count items
    # between '(' and the first ','
    first = wkt[wkt.rindex("(") + 1:]
    first = first.split(",")[0]
    dims = len(first.split())
    return vals.reshape(-1, dims)


class TestAciPalette:
    def test_table_matches_reference(self):
        src = open("/root/reference/ogr/ogrsf_frmts/dxf/"
                   "ogr_autocad_services.cpp").read()
        block = src[src.index("abyDXFColors[768]"):]
        block = re.sub(r"//[^\n]*", "", block[:block.index("};")])
        nums = [int(x) for x in re.findall(r"\b(\d+)\b", block)][1:]
        ref = np.array(nums, np.uint8).reshape(256, 3)
        np.testing.assert_array_equal(dxf.ACI_COLORS, ref)


class TestAssorted:
    """test_ogr_dxf_1..9 ladder over assorted.dxf."""

    @pytest.fixture(scope="class")
    def rows(self):
        return dxf.parse_dxf(f"{DATA}/assorted.dxf")

    def test_feature_count(self, rows):
        assert len(rows) == 22

    def test_ellipse(self, rows):
        r = rows[0]
        assert r["layer"] == "0"
        assert r["paperspace"] is None
        assert r["subclasses"] == "AcDbEntity:AcDbEllipse"
        assert r["linetype"] == "ByLayer"
        assert r["entityhandle"] == "43"
        assert r["style"] == "PEN(c:#000000)"
        kind, a = r["geom"]
        assert kind == "linestring" and r["has_z"]
        assert abs(_env_area(r["geom"]) - 1596.12) <= 0.5
        assert a[0, 0] == pytest.approx(73.25, abs=0.001)
        assert a[0, 1] == pytest.approx(139.75, abs=0.001)

    def test_partial_ellipse(self, rows):
        r = rows[1]
        assert abs(_env_area(r["geom"]) - 311.864) <= 0.5
        a = r["geom"][1]
        assert a[0, 0] == pytest.approx(61.133, abs=0.01)
        assert a[0, 1] == pytest.approx(103.592, abs=0.01)

    def test_point_truecolor(self, rows):
        r = rows[2]
        np.testing.assert_allclose(r["geom"][1], [83.5, 160.0, 0.0])
        assert r["has_z"]
        assert r["style"] == "PEN(c:#ffbeb8)"

    def test_line_3d(self, rows):
        r = rows[3]
        assert r["has_z"]
        np.testing.assert_allclose(
            r["geom"][1], [[97.0, 159.5, 0], [108.5, 132.25, 0]])

    def test_mtext(self, rows):
        r = rows[4]
        assert not r["has_z"]
        np.testing.assert_allclose(r["geom"][1][:2], [84, 126])
        assert r["style"] == \
            'LABEL(f:"Arial",t:"Test",a:30,s:5g,p:7,c:#000000)'

    def test_partial_circle(self, rows):
        r = rows[5]
        assert abs(_env_area(r["geom"]) - 445.748) <= 0.5
        a = r["geom"][1]
        assert a[0, 0] == pytest.approx(115.258, abs=0.01)
        assert a[0, 1] == pytest.approx(107.791, abs=0.01)

    def test_paperspace_line(self, rows):
        assert rows[6]["paperspace"] == 1

    def test_dimension_fallback(self, rows):
        r = rows[7]
        kind, lines = r["geom"]
        assert kind == "multilinestring"
        golden = _autotest_golden("63.8628719444825 149.209935992088")
        got = np.vstack([a[:, :2] for a in lines])
        np.testing.assert_allclose(got, golden, atol=1e-9)
        # arrowheads
        g1 = _autotest_golden("61.7583023958313 147.797704380064")
        np.testing.assert_allclose(rows[8]["geom"][1][0], g1, atol=1e-9)
        g2 = _autotest_golden("26.4465302172018 113.346762650677")
        np.testing.assert_allclose(rows[9]["geom"][1][0], g2, atol=1e-9)
        # text
        r = rows[10]
        np.testing.assert_allclose(
            r["geom"][1][:2],
            [42.815907752635709, 131.936242584545397], atol=1e-12)
        assert r["style"] == \
            'LABEL(f:"Arial",t:"54.33",p:5,a:43.3,s:2.5g,c:#000000)'

    def test_block_inline_merged(self, rows):
        r = rows[19]
        kind, lines = r["geom"]
        assert kind == "multilinestring" and r["has_z"]
        golden = _autotest_golden("79.069506278985116 121.003652476272777")
        got = np.vstack(lines)
        np.testing.assert_allclose(got, golden, atol=1e-9)

    def test_block_mtexts(self, rows):
        sample_text = 'Text Sample1¿λ\n"abc"'
        sample_style = 'Text Sample1¿λ\n\\"abc\\"'
        r = rows[20]
        assert r["text"] == sample_text
        assert r["style"] == ('LABEL(f:"Arial",t:"%s",a:45,s:0.5g,'
                              "p:5,c:#000000)" % sample_style)
        np.testing.assert_allclose(
            r["geom"][1][:2],
            [77.602201427662891, 120.775897075866169], atol=1e-12)
        r = rows[21]
        assert r["text"] == "Second"
        assert r["subclasses"] == "AcDbEntity:AcDbMText"
        np.testing.assert_allclose(
            r["geom"][1][:2],
            [79.977331629005178, 119.698291706738644], atol=1e-12)


class TestFixtures:
    def test_entities_only(self):
        rows = dxf.parse_dxf(f"{DATA}/entities_only.dxf")
        np.testing.assert_allclose(rows[0]["geom"][1],
                                   [672500.0, 242000.0, 539.986])
        np.testing.assert_allclose(rows[1]["geom"][1],
                                   [672750.0, 242000.0, 558.974])

    @pytest.mark.parametrize("name,want_z", [
        ("polyline_smooth.dxf", True), ("lwpolyline_smooth.dxf", False)])
    def test_smooth_polyline(self, name, want_z):
        rows = dxf.parse_dxf(f"{DATA}/{name}")
        r = rows[0]
        assert r["layer"] == "1"
        kind, a = r["geom"]
        assert kind == "linestring" and r["has_z"] == want_z
        assert abs(_env_area(r["geom"]) - 1350.43) <= 0.5
        assert len(a) == 146
        assert a[0, 0] == pytest.approx(251297.8179, abs=0.001)
        assert a[0, 1] == pytest.approx(412226.8286, abs=0.001)

    def test_solid(self):
        rows = dxf.parse_dxf(f"{DATA}/solid.dxf")
        kind, rings = rows[0]["geom"]
        assert kind == "polygon"
        np.testing.assert_allclose(
            rings[0][:, :2],
            [[2.716846, 2.762514], [2.393674, 1.647962],
             [4.391042, 1.06881], [4.714214, 2.183362],
             [2.716846, 2.762514]], atol=1e-12)

    def test_ellipse_z_extrusion_minus_1(self):
        rows = dxf.parse_dxf(f"{DATA}/ellipse_z_extrusion_minus_1.dxf")
        g1 = _autotest_golden("247.379588068074 525.677518653024")
        np.testing.assert_allclose(rows[0]["geom"][1], g1, atol=1e-9)
        g2 = _autotest_golden("290.988651614349 531.01336644407")
        np.testing.assert_allclose(rows[1]["geom"][1], g2, atol=1e-9)

    def test_lwpolyline_ocs(self):
        rows = dxf.parse_dxf(f"{DATA}/LWPOLYLINE-OCS.dxf")
        g1 = _autotest_golden("600325.567999998573214")
        np.testing.assert_allclose(rows[1]["geom"][1], g1, atol=1e-8)
        g12 = _autotest_golden("611415.459819656 3139300.00002682")
        np.testing.assert_allclose(rows[12]["geom"][1], g12, atol=1e-6)

    def test_binary_dxf_refused(self, tmp_path):
        p = tmp_path / "b.dxf"
        p.write_bytes(b"AutoCAD Binary DXF\r\n\x1a\x00rest")
        with pytest.raises(NotImplementedError):
            dxf.parse_dxf(str(p))


class TestSpark:
    def test_read_dxf_schema(self, spark):
        df = dxf.read_dxf(spark, f"{DATA}/assorted.dxf")
        assert df.count() == 22
        pdf = df.orderBy("fid").toPandas()
        assert list(pdf.columns) == [
            "fid", "layer", "subclasses", "linetype", "entityhandle",
            "text", "paperspace", "style", "kind", "wkb",
            "xmin", "ymin", "xmax", "ymax"]
        assert pdf.kind[0] == "linestring z"
        # wkb decodes back
        k, a, z = wkbmod.decode_z(bytes(pdf.wkb[0]))
        assert k == "linestring" and z

    def test_write_read_roundtrip_exact(self, spark, tmp_path):
        # coordinates with non-terminating decimals (prime denominators,
        # CLAUDE.md knife-edge rule) survive %.17g bit-exactly
        pts = [(i, (i * 9973 % 170000) / 997.0 - 85.0,
                (i * 7919 % 360000) / 997.0 - 180.0) for i in range(50)]
        rows = [(f"L{i % 3}", "point",
                 bytearray(wkbmod.encode_point(x, y)), f"t{i}")
                for i, x, y in pts]
        df = spark.createDataFrame(
            rows, "layer string, kind string, wkb binary, text string")
        path = str(tmp_path / "rt.dxf")
        dxf.write_dxf(df, path)
        back = dxf.parse_dxf(path)
        assert len(back) == 50
        for (i, x, y), r in zip(pts, back):
            assert r["text"] == f"t{i}"
            assert r["layer"] == f"L{i % 3}"
            assert float(r["geom"][1][0]) == x   # bit-exact
            assert float(r["geom"][1][1]) == y


class TestSplineHatch:
    def test_spline_qcad(self):
        rows = dxf.parse_dxf(f"{DATA}/spline_qcad.dxf")
        g = _autotest_golden("10.75 62.75 0,20.6377527691461")
        np.testing.assert_allclose(rows[0]["geom"][1], g, atol=1e-9)

    def test_spline_weights(self):
        rows = dxf.parse_dxf(f"{DATA}/spline_weight.dxf")
        for r, prefix in zip(rows, [
                "2 2 0,2.1025641025641 2.15371128980596",
                "2 2 0,2.10976572340247 2.16451423293308",
                "2 2 0,2.09894267472891 2.14827889065297"]):
            g = _autotest_golden(prefix)
            np.testing.assert_allclose(r["geom"][1], g, atol=1e-9)

    def test_spline_closed_and_recalc_knots(self):
        rows = dxf.parse_dxf(f"{DATA}/spline_closed.dxf")
        g = _autotest_golden("14 2 0,13.9043277090443 2.1111553863727")
        np.testing.assert_allclose(rows[0]["geom"][1], g, atol=1e-9)
        np.testing.assert_allclose(rows[1]["geom"][1], g, atol=1e-9)

    def test_hatch_as_multipolygon(self):
        rows = dxf.parse_dxf(f"{DATA}/hatch_as_multipolygon.dxf")
        kind, data = rows[0]["geom"]
        assert kind == "multipolygon" and len(data) == 5
        g = _autotest_golden("358.626489135389 -3222.17795096722")
        got = np.vstack([np.asarray(rings[0])[:, :2] for rings in data])
        np.testing.assert_allclose(got, g, atol=1e-9)

    def test_hatch_arc_step_override(self):
        # test_ogr_dxf_24 runs under OGR_ARC_STEPSIZE=45
        dxf.ARC_STEP_DEG_OVERRIDE = 45.0
        try:
            rows = dxf.parse_dxf(f"{DATA}/hatch.dxf")
        finally:
            dxf.ARC_STEP_DEG_OVERRIDE = 0.0
        r = rows[0]
        assert r["geom"][0] == "polygon" and not r["has_z"]
        g = _autotest_golden("2 1,1.646446609406726 0.853553390593274")
        np.testing.assert_allclose(r["geom"][1][0][:, :2], g, atol=1e-9)
        r = rows[1]
        assert r["geom"][0] == "polygon" and r["has_z"]
        g = _autotest_golden("0.0 0.0 0,-0.353553390593274")
        np.testing.assert_allclose(r["geom"][1][0], g, atol=1e-9)
        r = rows[2]
        assert r["geom"][0] == "polygon" and r["has_z"]
        np.testing.assert_allclose(
            r["geom"][1][0],
            [[-1, -1, 0], [-1, 0, 0], [0, 0, 0], [-1, -1, 0]], atol=1e-12)


def _test_body(name):
    src = open(AUTOTEST).read()
    i = src.index(f"def {name}(")
    j = src.find("\ndef ", i)
    return src[i:j if j > 0 else len(src)]


def _body_goldens(body):
    out = []
    for m in re.finditer(
            r'check_feature_geometry\(\s*(?:feat|f),\s*'
            r'("(?:[^"\\]|\\.)*"(?:\s*\+\s*"(?:[^"\\]|\\.)*")*)', body):
        parts = re.findall(r'"((?:[^"\\]|\\.)*)"', m.group(1))
        out.append("".join(parts))
    return out


def _parse_wkt(wkt):
    nums = [float(x) for x in re.findall(
        r"[-+]?\d+\.?\d*(?:[eE][-+]?\d+)?", wkt[wkt.index("("):])]
    first = wkt[wkt.index("(") + 1:].lstrip("(").split(",")[0]
    dims = len(first.split())
    return np.array(nums).reshape(-1, dims)


class TestAutotestLadders:
    """Full GetNextFeature ladders: every check_feature_geometry golden
    from the reference's own test function, in order, vertex-exact."""

    @pytest.mark.parametrize("test,fixture", [
        ("test_ogr_dxf_25", "3dface.dxf"),
        ("test_ogr_dxf_read_wipeout", "wipeout.dxf"),
        ("test_ogr_dxf_31", "ocs2wcs1.dxf"),
        ("test_ogr_dxf_32", "ocs2wcs2.dxf"),
    ])
    def test_ladder(self, test, fixture):
        goldens = _body_goldens(_test_body(test))
        rows = dxf.parse_dxf(f"{DATA}/{fixture}")
        assert len(goldens) == len(rows)
        for g, r in zip(goldens, rows):
            exp = _parse_wkt(g)
            got = np.vstack(list(dxf._coords(r["geom"])))
            if not r["has_z"]:
                got = got[:, :2]
            assert got.shape == exp.shape
            np.testing.assert_allclose(got, exp, atol=1e-8)

    def test_text_mtext_styles(self):
        # test_ogr_dxf_22: escape-sequence stack + STYLE-table lookups
        r = dxf.parse_dxf(f"{DATA}/text.dxf")[0]
        test_text = "test\ttext ab/c~d±ef^g.h#i jklm"
        assert r["text"] == test_text
        assert r["style"] == ('LABEL(f:"SwissCheese",bo:1,t:"'
                              + test_text + '",a:45,s:10g,w:51,c:#ff0000)')
        np.testing.assert_allclose(r["geom"][1], [1, 2, 3])
        assert r["has_z"]

    def test_binary_wipeout_refused(self):
        with pytest.raises(NotImplementedError):
            dxf.parse_dxf(f"{DATA}/BINARY_wipeout.dxf")


class TestBlocksLayer:
    """test_ogr_dxf_16: DXF_INLINE_BLOCKS=FALSE surfaces."""

    def test_insert_block_reference_point(self):
        rows = dxf.parse_dxf(f"{DATA}/assorted.dxf", inline_blocks=False)
        br = [r for r in rows if r.get("blockname")]
        assert len(br) == 1
        r = br[0]
        assert r["blockname"] == "STAR"
        assert r["blockangle"] == 0.0
        assert r["blockscale"] == [1.0, 1.0, 1.0]
        np.testing.assert_allclose(
            r["geom"][1],
            [79.097653776656188, 119.962195062443342, 0], atol=1e-12)

    def test_blocks_layer_star(self):
        blocks = dxf.parse_dxf_blocks(f"{DATA}/assorted.dxf")
        star = blocks["STAR"]
        assert len(star) == 3
        kind, lines = star[0]["geom"]
        assert kind == "multilinestring"
        golden = _autotest_golden("-0.028147497671066 1.041457413829428")
        np.testing.assert_allclose(np.vstack(lines), golden, atol=1e-12)
        np.testing.assert_allclose(
            star[1]["geom"][1],
            [-1.495452348993292, 0.813702013422821, 0], atol=1e-12)
        assert star[2]["text"] == "Second"
        np.testing.assert_allclose(
            star[2]["geom"][1],
            [0.879677852348995, -0.263903355704699, 0], atol=1e-12)


class TestLeader:
    """test_ogr_dxf_44 LEADER expectations (MLEADERs are skipped, so
    indices compact onto the plain-LEADER features)."""

    @pytest.fixture(scope="class")
    def rows(self):
        return dxf.parse_dxf(f"{DATA}/leader-mleader.dxf")

    def test_default_arrowhead_with_overrides(self, rows):
        # 6.0 arrowhead size x 1.5 scale: line start shifted to 21,
        # DIMTAD text extension to -13.599...
        g = _autotest_golden("21 40 0,10 40 0,19.3125")
        np.testing.assert_allclose(rows[0]["geom"][1], g, atol=1e-9)
        np.testing.assert_allclose(
            rows[1]["geom"][1][0],
            [[21, 41.5, 0], [30, 40, 0], [21, 38.5, 0], [21, 41.5, 0]],
            atol=1e-12)

    def test_basic_leader(self, rows):
        assert rows[3]["style"] == "PEN(c:#ff0000)"
        g = _autotest_golden("-20.9782552979609 38.1443878852919")
        np.testing.assert_allclose(rows[3]["geom"][1], g, atol=1e-9)
        assert rows[4]["style"] == "BRUSH(fc:#ff0000)"
        g = _autotest_golden("-20.9601206293303 38.1204894796201")
        np.testing.assert_allclose(rows[4]["geom"][1][0], g, atol=1e-9)

    def test_custom_arrowhead_block(self, rows):
        assert rows[5]["style"] == "PEN(c:#00ff00)"
        g = _autotest_golden("26.8 77.6 0,10 65 0")
        np.testing.assert_allclose(rows[5]["geom"][1], g, atol=1e-9)
        # the arrowhead block expands to a polygon and a line
        g = _autotest_golden("27.2 80.4,30.4 82.8")
        np.testing.assert_allclose(rows[6]["geom"][1][0][:, :2], g,
                                   atol=1e-9)
        np.testing.assert_allclose(
            rows[7]["geom"][1], [[28.4, 78.8, 0], [26.8, 77.6, 0]],
            atol=1e-12)

    def test_long_text_xdata(self, rows):
        assert len(rows[8]["text"]) == 319

    def test_spline_leader(self, rows):
        # chord-parameterised interpolative B-spline, 5 control pts x 8
        g = _autotest_golden("75 -5 0,75.3293039686015")
        np.testing.assert_allclose(rows[12]["geom"][1], g, atol=1e-9)


class TestStylesAndInserts:
    def test_block_insert_order_counts(self):
        # test_ogr_dxf_42: the three config combinations
        f = f"{DATA}/block-insert-order.dxf"
        assert len(dxf.parse_dxf(f)) == 2
        rows = dxf.parse_dxf(f, inline_blocks=False)
        assert len(rows) == 2
        np.testing.assert_allclose(rows[0]["geom"][1], [8.0, 2.5, 6])
        np.testing.assert_allclose(rows[1]["geom"][1], [-1, -2, -3])
        assert len(dxf.parse_dxf(f, merge_block_geometries=False)) == 4

    def test_recursive_insert_guard(self):
        # test_ogr_dxf_43: recursively-included blocks don't blow up
        assert len(dxf.parse_dxf(
            f"{DATA}/insert-recursive-pair.dxf")) == 1

    def test_linetype_scaling(self):
        # test_ogr_dxf_45: LTSCALE x LinetypeScale x same-sign merging
        rows = dxf.parse_dxf(f"{DATA}/linetypes.dxf")
        exp = [("DASHED2", 'PEN(c:#000000,p:"12.5g 6.25g")'),
               ("DASHED2", 'PEN(c:#000000,p:"0.625g 0.3125g")'),
               ("DASHED2_FLIPPED", 'PEN(c:#000000,p:"0.625g 0.3125g")'),
               ("Drain_Pipe_Inv_100", 'PEN(c:#000000,p:"35g 22.5g")')]
        for r, (lt, style) in zip(rows, exp):
            assert r["linetype"] == lt
            assert r["style"] == style

    def test_byblock_bylayer_resolution(self):
        # test at ogr_dxf.py:3516: nested anonymous dimension block with
        # ByBlock/ByLayer colors resolved through two INSERT levels
        rows = dxf.parse_dxf(f"{DATA}/byblock-bylayer.dxf",
                             merge_block_geometries=False)
        exp = {0: 'PEN(c:#ff00ff,p:"1.5875g 1.5875g")',
               2: "PEN(c:#0000ff)", 4: "BRUSH(fc:#ff0000)",
               5: "PEN(c:#0000ff)", 6: "BRUSH(fc:#0000ff)",
               7: 'LABEL(f:"Arial",t:"10.141 (2C)",s:0.4g,p:5,'
                  "c:#ff00ff)"}
        for i, want in exp.items():
            assert rows[i]["style"] == want, (i, rows[i]["style"])

    def test_frozen_off_visibility_matrix(self):
        # hidden/frozen layers produce #rrggbb00 colors; the autotest's
        # 104-entry expected-visibility string replays exactly
        rows = dxf.parse_dxf(f"{DATA}/frozen-off.dxf",
                             merge_block_geometries=False)
        vis = (".hhh..hhh..hhhhhhhhhhhhhh.hhhhhhhhhhhhhhhhhhhhhhhhhhh"
               "hhhhhhhhhhhhhhhhhhhhhhhhhhh.hhh..hhhhhhhhhhhhhh.hhh")
        assert len(rows) == len(vis)
        for n, h in enumerate(vis):
            s = rows[n]["style"] or ""
            visible = "#000000)" in s or "#ff0000)" in s
            assert visible != (h == "h"), n


class TestAdditionalEntities:
    """test_ogr_dxf_52/53: HELIX, TRACE, HATCH with spline boundary
    (in OCS), MLINE, MINSERT rows/columns with attributes, a SPLINE
    whose knot vector doesn't start at zero, and block base points."""

    def test_full_ladder(self):
        goldens = _body_goldens(_test_body("test_ogr_dxf_52"))
        rows = dxf.parse_dxf(f"{DATA}/additional-entities.dxf")
        assert len(rows) == 24
        # the autotest skips the 2nd/4th-7th MINSERT instances
        feature_for_golden = [0, 1, 2, 3, 4, 5, 6, 7, 8, 11, 12, 21,
                              22, 23]
        assert len(goldens) == len(feature_for_golden)
        for g, fi in zip(goldens, feature_for_golden):
            exp = _parse_wkt(g)
            r = rows[fi]
            got = np.vstack(list(dxf._coords(r["geom"])))
            if not r["has_z"]:
                got = got[:, :2]
            assert got.shape == exp.shape, fi
            np.testing.assert_allclose(got, exp, atol=1e-8, err_msg=str(fi))

    def test_minsert_attribute_styles(self):
        # ACAdjustText carried the dx/dy offsets through the MINSERT
        rows = dxf.parse_dxf(f"{DATA}/additional-entities.dxf")
        want = ('LABEL(f:"Arial",t:"N",p:5,a:13,s:8g,w:120,'
                "dx:2.21818g,dy:4.61732g,c:#000000)")
        for i in (8, 12, 22):
            assert rows[i]["style"] == want

    def test_block_basepoint(self):
        rows = dxf.parse_dxf(f"{DATA}/block-basepoint.dxf")
        kind, lines = rows[0]["geom"]
        assert kind == "multilinestring"
        np.testing.assert_allclose(
            np.vstack(lines),
            [[290, 160, 0], [310, 140, 0], [310, 160, 0], [290, 140, 0]])
