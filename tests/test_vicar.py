"""VICAR planetary image codec (sources/vicar.py).

Fixture replays from autotest/gdrivers/vicar.py:
- all 13 datatype checksums (BYTE/HALF/FULL/REAL/DOUB/COMP across
  INTFMT LOW|HIGH, REALFMT IEEE|RIEEE|VAX, ORG BSQ/BIL/BIP),
- all 4 BASIC/BASIC2 compressed checksums,
- the binary-prefix record (GDAL_AUTOTEST BLTYPE, VAX reals),
- test_vicar_truncated.bin's full label surface (gt, scale/offset,
  nodata, projection params, nested PROPERTY/TASK values incl. the
  '' quote escape).
"""

import numpy as np
import pandas as pd
import pytest

from lib_gdal_spark.operators import raster
from lib_gdal_spark.sources.vicar import (
    get_keyword, read_vicar, read_vicar_grid, read_vicar_prefixes,
    write_vicar)

DIR = "/root/reference/autotest/gdrivers/data/vicar"

CHECKSUMS = [
    ("vicar_byte", 129), ("vicar_int16", 129),
    ("vicar_bigendian_int16", 129), ("vicar_int32", 129),
    ("vicar_float32_bsq", 123), ("vicar_float32_bil", 123),
    ("vicar_float32_bip", 123), ("vicar_bigendian_float32", 129),
    ("vicar_float64", 129), ("vicar_cfloat32", 148),
    ("vicar_vax_float32", 129), ("vicar_vax_float64", 129),
    ("vicar_vax_cfloat32", 226),
    ("vicar_byte_basic", 4672), ("vicar_byte_basic2", 4672),
    ("vicar_int16_basic2", 4672), ("vicar_all_ones_basic2", 34464),
]


def _checksum_np(vals):
    # GDALChecksumImage twin over a (h, w) plane (complex planes come
    # interleaved, matching the reference's nValsPerIter=2 walk)
    primes = np.array(raster.CHECKSUM_PRIMES, np.int64)
    h, w = vals.shape
    idx = (np.arange(h * w) % 11)
    iv = np.floor(vals.ravel() + 0.5).astype(np.int64)
    return int(np.fmod(iv, primes[idx]).sum()) & 0xFFFF


@pytest.mark.parametrize("name,want", CHECKSUMS,
                         ids=[c[0] for c in CHECKSUMS])
def test_fixture_checksums(name, want):
    g = read_vicar_grid(f"{DIR}/{name}.vic")
    assert _checksum_np(g["values"][0]) == want


def test_truncated_label_surface():
    g = read_vicar_grid(f"{DIR}/test_vicar_truncated.bin")
    assert g["gt"] == (-53985.0, 25.0, 0.0, -200805.0, 0.0, -25.0)
    assert abs(g["scale"] - 2.34) < 1e-12
    assert abs(g["offset"] - 4.56) < 1e-12
    assert g["nodata"] == 0.0
    assert g["projection"] == "SINUSOIDAL"
    assert g["target"] == "MARS" and g["center_lon"] == 137.0
    assert g["radius_m"] == 3396000.0
    lbl = g["label"]
    assert lbl["LBLSIZE"] == 9680 and lbl["FORMAT"] == "BYTE"
    orb = lbl["PROPERTY"]["M94_ORBIT"]
    assert orb["ASCENDING_NODE_LONGITUDE"] == 118.46
    assert orb["SPACECRAFT_ORIENTATION"] == [0.0, -1.0, 0.0]
    assert lbl["TASK"]["HRCONVER"]["SPICE_FILE_NAME"] == ["foo"]
    assert lbl["TASK"]["HRORTHO"]["EXTORI_FILE_NAME"] \
        == "extori'_file_name"
    assert get_keyword(lbl, "M94_ORBIT.STOP_TIME") == "stop_time"
    # (SPACECRAFT_NAME/PRODUCT_TYPE in the autotest's GetMetadata are
    # GDAL-synthesized for the HRSC instrument, not label content)


def test_binary_prefix_records():
    recs = read_vicar_prefixes(f"{DIR}/vicar_binary_prefix.vic")
    assert recs == [{
        "unsigned_char": 255, "unsigned_short": 65535,
        "unsigned_int": 4294967295, "short": -32768,
        "int": -2147483648, "float": 1.25, "double": 3.25}]


def test_vax_cfloat_values():
    g = read_vicar_grid(f"{DIR}/vicar_vax_cfloat32.vic")
    assert g["complex"]
    # checksum already pins the stream; spot-check finite + paired
    assert g["values"].shape[2] == g["width"] * 2
    assert np.isfinite(g["values"]).all()


def test_write_read_roundtrip(spark, tmp_path):
    rng = np.random.default_rng(9)
    for fmt, arr in [
            ("BYTE", rng.integers(0, 256, (5, 7)).astype(np.float64)),
            ("HALF", rng.integers(-30000, 30000, (5, 7)).astype(float)),
            ("FULL", rng.integers(-2**31, 2**31 - 1, (4, 6)).astype(float)),
            ("REAL", rng.normal(0, 10, (3, 8)).astype(np.float32)
             .astype(np.float64)),
            ("DOUB", rng.normal(0, 10, (3, 8)))]:
        p = write_vicar(str(tmp_path / f"{fmt}.vic"), arr, fmt,
                        properties={"MAP": {"MAP_SCALE": 0.025,
                                            "TARGET_NAME": "MARS"}})
        g = read_vicar_grid(p)
        assert g["format"] == fmt
        assert (g["values"][0] == arr).all()
        assert g["label"]["PROPERTY"]["MAP"]["TARGET_NAME"] == "MARS"
        assert g["gt"][1] == 25.0
    # quote escaping round-trips
    p = write_vicar(str(tmp_path / "q.vic"),
                    np.zeros((2, 2)), "BYTE",
                    properties={"X": {"NAME": "it's"}})
    assert read_vicar_grid(p)["label"]["PROPERTY"]["X"]["NAME"] == "it's"


def test_dataframe_view(spark):
    df, meta = read_vicar(spark, f"{DIR}/vicar_byte.vic")
    rows = {(r["bx"], r["by"]): r["value"] for r in df.collect()}
    # 4x3 grid of 1..4 / 11..14 / 21..24; by=2 is the TOP row
    assert rows[(0, 2)] == 1.0 and rows[(3, 0)] == 24.0
    assert meta["width"] == 4 and meta["height"] == 3
