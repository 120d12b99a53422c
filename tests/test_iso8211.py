"""Direct unit tests for the ISO/IEC 8211 reader (sources/iso8211.py)
— format-control parsing, binary subfield decoding and the repeating
group walk — on top of its indirect S-57/ADRG/SRP fixture coverage."""

import pytest

from lib_gdal_spark.sources.iso8211 import (_decode_value,
                                            _parse_formats, parse_ddf)


def test_format_parsing():
    assert _parse_formats("(b11,b14,2b24,A,B(40))") == [
        ("b11", None), ("b14", None), ("b24", None), ("b24", None),
        ("A", None), ("B", 40)]
    assert _parse_formats("(A(2),I(10),3b11)") == [
        ("A", 2), ("I", 10), ("b11", None), ("b11", None),
        ("b11", None)]


def test_binary_decode():
    data = b"\x05\x00\x01\x00\x00\x00\xff\xff\xff\xff"
    v, pos = _decode_value("b12", None, data, 0)
    assert v == 5 and pos == 2
    v, pos = _decode_value("b14", None, data, 2)
    assert v == 1 and pos == 6
    v, pos = _decode_value("b24", None, data, 6)
    assert v == -1 and pos == 10  # signed


def test_text_decode_terminators():
    data = b"hello\x1fworld\x1e"
    v, pos = _decode_value("A", None, data, 0)
    assert v == "hello" and pos == 6
    v, pos = _decode_value("A", None, data, 6)
    assert v == "world"


def test_ucs2_decode():
    data = "Пiд".encode("utf-16-le") + b"\x1f\x00rest"
    v, pos = _decode_value("A", None, data, 0, ucs2=True)
    assert v == "Пiд"
    assert data[pos:] == b"rest"


def test_real_s57_module_roundtrip():
    # the S-57 fixture IS an ISO 8211 conformance corpus
    d = open("/root/reference/autotest/ogr/data/s57/1B5X02NE.000",
             "rb").read()
    fields, recs = parse_ddf(d)
    assert "SG2D" in fields and fields["SG2D"].repeating
    assert fields["SG2D"].labels == ["YCOO", "XCOO"]
    assert len(recs) == 70
    # every VRID record's groups decode as full dicts
    for r in recs:
        for g in r.get("VRID", []):
            assert set(g) == {"RCNM", "RCID", "RVER", "RUIN"}


def test_not_ddf_refused():
    with pytest.raises(ValueError, match="8211"):
        parse_ddf(b"0" * 48)
