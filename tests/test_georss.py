"""GeoRSS source/sink (sources/georss.py).

Fixture replays from autotest/ogr/ogr_georss.py: the full
atom_field_values table on both atom_rfc_sample variants (incl. the
xhtml content payload with its default-xmlns serialization), all four
simple-geometry WKTs of test_georss_simple.xml with OGR's
OGRMakeWktCoordinate formatting quirks ("2 48" vs "2.2 48.0"), the
georss:where GML variant, and writer round-trips in both formats
(test_ogr_georss_1bis's write-then-reread shape).
"""

import pytest

from lib_gdal_spark.sources.georss import (
    parse_georss_bytes, read_georss, write_georss)

D = "/root/reference/autotest/ogr/data/georss"

ATOM_EXPECT = [
    ("title", "Atom draft-07 snapshot"),
    ("link_rel", "alternate"), ("link_type", "text/html"),
    ("link_href", "http://example.org/2005/04/02/atom"),
    ("link2_rel", "enclosure"), ("link2_type", "audio/mpeg"),
    ("link2_length", "1337"),
    ("link2_href", "http://example.org/audio/ph34r_my_podcast.mp3"),
    ("id", "tag:example.org,2003:3.2397"),
    ("updated", "2005/07/31 12:29:29+00"),
    ("published", "2003/12/13 08:29:29-04"),
    ("author_name", "Mark Pilgrim"),
    ("author_uri", "http://example.org/"),
    ("author_email", "f8dy@example.com"),
    ("contributor_name", "Sam Ruby"),
    ("contributor2_name", "Joe Gregorio"),
    ("content_type", "xhtml"), ("content_xml_lang", "en"),
    ("content_xml_base", "http://diveintomark.org/"),
]

RSS_WKTS = [
    "POINT (2 49)",
    "LINESTRING (2 48,2.1 48.1,2.2 48.0)",
    "POLYGON ((2 50,2.1 50.1,2.2 48.1,2.1 46.1,2 50))",
    "POLYGON ((2 49,2.0 49.5,2.2 49.5,2.2 49.0,2 49))",
]


@pytest.mark.parametrize("fn", ["atom_rfc_sample.xml",
                                "atom_rfc_sample_atom_ns.xml"])
def test_atom_fixture(fn):
    feats = parse_georss_bytes(open(f"{D}/{fn}", "rb").read())
    assert len(feats) == 1
    f = feats[0]["fields"]
    for key, want in ATOM_EXPECT:
        assert str(f.get(key)) == want, key
    assert '<div xmlns="http://www.w3.org/1999/xhtml">' in f["content"]


@pytest.mark.parametrize("fn", ["test_georss_simple.xml",
                                "test_georss_gml.xml"])
def test_rss_geometries(fn):
    feats = parse_georss_bytes(open(f"{D}/{fn}", "rb").read())
    assert [ft["wkt"] for ft in feats] == RSS_WKTS
    f = feats[0]["fields"]
    assert f["title"] == "A point"
    assert f["author"] == "Author"
    assert f["link"] == "http://gdal.org"
    assert f["pubDate"] == "2008/12/07 20:13:00+02"
    assert f["category"] == "First category"
    assert f["category_domain"] == "first_domain"
    assert f["category2"] == "Second category"
    assert f["category2_domain"] == "second_domain"
    assert feats[1]["fields"]["title"] == "A line"
    assert feats[2]["fields"]["title"] == "A polygon"
    assert feats[3]["fields"]["title"] == "A box"


def test_rss_writer_roundtrip(tmp_path):
    feats = parse_georss_bytes(
        open(f"{D}/test_georss_simple.xml", "rb").read())
    p = write_georss(str(tmp_path / "rt.xml"), feats, "RSS")
    back = parse_georss_bytes(open(p, "rb").read())
    assert [b["wkt"] for b in back] == RSS_WKTS
    for a, b in zip(feats, back):
        for k in ("title", "pubDate", "category", "category_domain",
                  "category2", "category2_domain"):
            assert a["fields"].get(k) == b["fields"].get(k)


def test_atom_writer_roundtrip(tmp_path):
    feats = parse_georss_bytes(
        open(f"{D}/atom_rfc_sample.xml", "rb").read())
    p = write_georss(str(tmp_path / "rt_atom.xml"), feats, "ATOM")
    back = parse_georss_bytes(open(p, "rb").read())
    f = back[0]["fields"]
    for key, want in ATOM_EXPECT:
        assert str(f.get(key)) == want, key


def test_dataframe_view(spark):
    df = read_georss(spark, f"{D}/test_georss_simple.xml")
    rows = df.orderBy("fid").collect()
    assert len(rows) == 4
    assert rows[0]["wkt"] == "POINT (2 49)"
    assert rows[1]["title"] == "A line"
    assert "category2_domain" in df.columns
