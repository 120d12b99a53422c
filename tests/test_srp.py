"""SRP/USRP source (sources/srp.py over sources/iso8211.py) vs the
reference's own autotest expectations (autotest/gdrivers/srp.py):
checksum 24576 with gt (500000, 5, 0, 5000000, 0, -5) through all
three PCB run-length modes (0 raw, 4 nibble RLE, 8 byte RLE), the
4-entry QAL color table and the full SRP_* metadata ladder."""

import numpy as np
import pytest

from lib_gdal_spark.operators import raster
from lib_gdal_spark.sources import srp

SD = "/root/reference/autotest/gdrivers/data/srp"

EXPECTED_MD = {
    "SRP_CLASSIFICATION": "U", "SRP_CREATIONDATE": "20120505",
    "SRP_EDN": "0", "SRP_NAM": "FKUSRP", "SRP_PRODUCT": "USRP",
    "SRP_REVISIONDATE": "20120505", "SRP_SCA": "50000",
    "SRP_ZNA": "17", "SRP_PSP": "100.0",
}


def _cs(vals):
    primes = np.array(raster.CHECKSUM_PRIMES, np.int64)
    h, w = vals.shape
    iv = np.clip(np.floor(vals.astype(np.float64) + 0.5),
                 -2147483647, 2147483647).astype(np.int64)
    return int(np.fmod(iv.ravel(),
                       primes[np.arange(h * w) % 11]).sum()) & 0xFFFF


@pytest.mark.parametrize("pcb", (0, 4, 8))
def test_usrp_all_pcb_modes(pcb):
    vals, meta = srp.read_srp_array(
        f"{SD}/USRP_PCB{pcb}/FKUSRP01.GEN")
    assert _cs(vals) == 24576  # autotest srp.py:48
    assert meta["gt"] == (500000.0, 5.0, 0.0, 5000000.0, 0.0, -5.0)
    assert meta["pcb"] == pcb


def test_color_table_and_metadata():
    _, meta = srp.read_srp_array(f"{SD}/USRP_PCB0/FKUSRP01.GEN")
    ct = meta["color_table"]
    assert len(ct) == 4
    assert ct[0] == (0, 0, 0)
    assert ct[1] == (255, 0, 0)
    for k, v in EXPECTED_MD.items():
        assert meta["metadata"][k] == v, k


def test_no_gin_refused():
    with pytest.raises(ValueError):
        srp.parse_gen(b"nothing like iso8211 here" * 3)


def test_spark_face(spark):
    df, meta = srp.read_srp(spark, f"{SD}/USRP_PCB0/FKUSRP01.GEN")
    assert df.count() == meta["width"] * meta["height"]
