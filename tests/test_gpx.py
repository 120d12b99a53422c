"""GPX source/sink vs the reference's own autotest expectations
(autotest/ogr/ogr_gpx.py)."""

import numpy as np
import pytest

from lib_gdal_spark.geo import wkb as wkbmod
from lib_gdal_spark.sources import gpx as gpxmod

DATA = "/root/reference/autotest/ogr/data/gpx"


@pytest.fixture(scope="module")
def parsed():
    with open(f"{DATA}/test.gpx", "rb") as f:
        return gpxmod.parse_gpx_bytes(f.read())


def _col(rows, layer_schema, name):
    cols = [c.strip().split()[0] for c in layer_schema.split(",")]
    i = cols.index(name)
    return [r[i] for r in rows]


class TestReadFixture:
    # ogr_gpx.py::test_ogr_gpx_1..5

    def test_waypoints(self, parsed):
        w = parsed["waypoints"]
        s = gpxmod.LAYER_SCHEMAS["waypoints"]
        assert len(w) == 2
        assert _col(w, s, "ele") == [2.0, None]
        assert _col(w, s, "name") == ["waypoint name", None]
        assert _col(w, s, "link1_href") == ["href", None]
        assert _col(w, s, "link1_text") == ["text", None]
        assert _col(w, s, "link1_type") == ["type", None]
        assert _col(w, s, "link2_href") == ["href2", None]
        assert _col(w, s, "link2_text") == ["text2", None]
        assert _col(w, s, "link2_type") == ["type2", None]
        assert _col(w, s, "time") == ["2007-11-25T17:58:00+01:00", None]
        geoms = [wkbmod.decode(x) for x in _col(w, s, "wkb")]
        assert geoms[0] == ("point", (1.0, 0.0))
        assert geoms[1] == ("point", (4.0, 3.0))

    def test_routes(self, parsed):
        r = parsed["routes"]
        s = gpxmod.LAYER_SCHEMAS["routes"]
        assert len(r) == 2
        kind, pts = wkbmod.decode(_col(r, s, "wkb")[0])
        assert kind == "linestring"
        np.testing.assert_allclose(pts, [[6, 5], [9, 8], [12, 11]])
        kind, pts = wkbmod.decode(_col(r, s, "wkb")[1])
        assert kind == "linestring" and len(pts) == 0
        assert _col(r, s, "name") == ["route name", "empty route"]

    def test_route_points(self, parsed):
        rp = parsed["route_points"]
        s = gpxmod.LAYER_SCHEMAS["route_points"]
        assert _col(rp, s, "name") == ["route point name", None, None]
        assert wkbmod.decode(_col(rp, s, "wkb")[0]) == \
            ("point", (6.0, 5.0))
        assert _col(rp, s, "route_fid") == [0, 0, 0]
        assert _col(rp, s, "route_point_id") == [0, 1, 2]

    def test_tracks(self, parsed):
        t = parsed["tracks"]
        s = gpxmod.LAYER_SCHEMAS["tracks"]
        assert len(t) == 3
        kind, lines = wkbmod.decode(_col(t, s, "wkb")[0])
        assert kind == "multilinestring"
        np.testing.assert_allclose(lines[0], [[15, 14], [18, 17]])
        np.testing.assert_allclose(lines[1], [[21, 20], [24, 23]])
        # both the no-trkseg and the empty-trkseg tracks read as
        # MULTILINESTRING EMPTY (ogr_gpx.py:146-162)
        for wkb in _col(t, s, "wkb")[1:]:
            kind, lines = wkbmod.decode(wkb)
            assert kind == "multilinestring" and len(lines) == 0

    def test_track_points(self, parsed):
        tp = parsed["track_points"]
        s = gpxmod.LAYER_SCHEMAS["track_points"]
        assert _col(tp, s, "name") == \
            ["track point name", None, None, None]
        assert wkbmod.decode(_col(tp, s, "wkb")[0]) == \
            ("point", (15.0, 14.0))
        assert _col(tp, s, "track_fid") == [0, 0, 0, 0]
        assert _col(tp, s, "track_seg_id") == [0, 0, 1, 1]
        assert _col(tp, s, "track_seg_point_id") == [0, 1, 0, 1]


class TestWriter:
    def test_gpx8_golden(self):
        # test_ogr_gpx_8: route_points/track_points grouping, byte
        # golden ogr_gpx_8_ref.txt (substring of the document)
        doc = gpxmod.gpx_document(
            route_points=[
                {"route_fid": 0, "route_name": "ROUTE_NAME",
                 "lon": 2.0, "lat": 49.0},
                {"route_fid": 0, "route_name": "--ignored--",
                 "lon": 3.0, "lat": 50.0},
                {"route_fid": 1, "route_name": "ROUTE_NAME2",
                 "lon": 3.0, "lat": 51.0},
                {"route_fid": 1, "lon": 3.0, "lat": 49.0},
            ],
            track_points=[
                {"track_fid": 0, "track_seg_id": 0,
                 "track_name": "TRACK_NAME", "lon": 2.0, "lat": 49.0},
                {"track_fid": 0, "track_seg_id": 0,
                 "track_name": "--ignored--", "lon": 3.0, "lat": 50.0},
                {"track_fid": 0, "track_seg_id": 1,
                 "lon": 3.0, "lat": 51.0},
                {"track_fid": 1, "track_seg_id": 0,
                 "track_name": "TRACK_NAME2", "lon": 3.0, "lat": 49.0},
            ])
        with open(f"{DATA}/ogr_gpx_8_ref.txt") as f:
            ref = f.read()
        assert ref in doc, doc

    def test_roundtrip_wpt(self):
        doc = gpxmod.gpx_document(waypoints=[
            {"lon": 1.0, "lat": 0.0, "ele": 2.0, "name": "wp",
             "cmt": "c", "link1_href": "h", "link1_text": "t"},
            {"lon": 4.0, "lat": 3.0}])
        back = gpxmod.parse_gpx_bytes(doc.encode())
        w = back["waypoints"]
        s = gpxmod.LAYER_SCHEMAS["waypoints"]
        assert _col(w, s, "ele") == [2.0, None]
        assert _col(w, s, "name") == ["wp", None]
        assert _col(w, s, "link1_href") == ["h", None]
        assert [wkbmod.decode(x)[1] for x in _col(w, s, "wkb")] == \
            [(1.0, 0.0), (4.0, 3.0)]

    def test_roundtrip_tracks(self):
        doc = gpxmod.gpx_document(tracks=[
            {"name": "trk", "segments": [[(1.0, 2.0), (3.0, 4.0)],
                                         [(5.0, 6.0)]]}])
        back = gpxmod.parse_gpx_bytes(doc.encode())
        t = back["tracks"]
        s = gpxmod.LAYER_SCHEMAS["tracks"]
        assert _col(t, s, "name") == ["trk"]
        kind, lines = wkbmod.decode(_col(t, s, "wkb")[0])
        assert kind == "multilinestring" and len(lines) == 2
        np.testing.assert_allclose(lines[0], [[1, 2], [3, 4]])

    def test_fmt_double_golden_shape(self):
        assert gpxmod.fmt_double(49.0) == "49.0"
        assert gpxmod.fmt_double(2.0) == "2.0"
        assert gpxmod.fmt_double(179.9999999) == "179.9999999"

    def test_extensions_roundtrip(self):
        # ogr_gpx_7 semantics: extra fields -> <extensions>, read back
        doc = gpxmod.gpx_document(waypoints=[
            {"lon": 1.0, "lat": 2.0, "Primary_ID": "PID1"}])
        back = gpxmod.parse_gpx_bytes(doc.encode())
        s = gpxmod.LAYER_SCHEMAS["waypoints"]
        props = _col(back["waypoints"], s, "properties")[0]
        assert '"Primary_ID":"PID1"' in props


class TestSpark:
    def test_read_gpx_layers(self, spark, tmp_path):
        import shutil
        shutil.copy(f"{DATA}/test.gpx", tmp_path / "a.gpx")
        shutil.copy(f"{DATA}/test.gpx", tmp_path / "b.gpx")
        wp = gpxmod.read_gpx(spark, str(tmp_path), "waypoints")
        assert wp.count() == 4
        tp = gpxmod.read_gpx(spark, str(tmp_path), "track_points")
        assert tp.count() == 8
        rt = gpxmod.read_gpx(spark, str(tmp_path), "routes")
        assert rt.count() == 4
        assert "xmin" in rt.columns

    def test_unknown_layer_raises(self, spark):
        with pytest.raises(ValueError):
            gpxmod.read_gpx(spark, "/tmp/x", "nope")
