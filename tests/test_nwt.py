"""Northwood GRD/GRC codec (sources/nwt.py) vs the reference's own
autotest expectations (autotest/gdrivers/nwt_grd.py / nwt_grc.py):
per-band checksums 28093/33690/20365/25856 on nwt_grd.grd — the first
three exercise the integer color-gradient pipeline (createIP float
ramps over the header inflections), the fourth the 16-bit z scaling
with raw-0 nodata — and 46760 on nwt_grc.grc's class indices."""

import numpy as np
import pytest

from lib_gdal_spark.operators import raster
from lib_gdal_spark.sources import nwt

GD = "/root/reference/autotest/gdrivers/data"


def _cs(vals):
    primes = np.array(raster.CHECKSUM_PRIMES, np.int64)
    h, w = vals.shape
    iv = np.clip(np.floor(vals + 0.5), -2147483647,
                 2147483647).astype(np.int64)
    return int(np.fmod(iv.ravel(),
                       primes[np.arange(h * w) % 11]).sum()) & 0xFFFF


def test_grd_four_band_checksums():
    bands, meta = nwt.decode_grd(
        open(f"{GD}/nwt_grd/nwt_grd.grd", "rb").read())
    assert (meta["nx"], meta["ny"]) == (63, 47)
    # RGB via the 4096-entry gradient map (autotest bands 1-3)
    assert [_cs(b.astype(np.float64)) for b in bands[:3]] == \
        [28093, 33690, 20365]
    # Z: raw==0 surfaces the reference's -1e37 nodata in the checksum
    z = np.nan_to_num(bands[3].astype(np.float64), nan=nwt.NWT_NODATA)
    assert _cs(z) == 25856
    # z range honors the header min/max scaling
    finite = bands[3][np.isfinite(bands[3])]
    assert finite.min() >= np.float32(meta["zmin"])
    assert finite.max() <= np.float32(meta["zmax"])


def test_grd_geotransform_half_cell():
    _, meta = nwt.decode_grd(
        open(f"{GD}/nwt_grd/nwt_grd.grd", "rb").read())
    gt = meta["gt"]
    assert gt[0] == meta["minx"] - meta["step"] * 0.5
    assert gt[3] == meta["maxy"] + meta["step"] * 0.5
    assert gt[5] == -gt[1]


def test_grc_classified():
    raw, meta = nwt.decode_grc(
        open(f"{GD}/nwt_grc/nwt_grc.grc", "rb").read())
    assert (meta["nx"], meta["ny"]) == (265, 181)
    assert meta["bits"] == 8
    assert _cs(raw.astype(np.float64)) == 46760
    assert len(meta["classes"]) >= 1
    # indices never exceed the dictionary
    assert raw.max() <= max(c["pix"] for c in meta["classes"])


def test_kind_mismatch_refused():
    grd = open(f"{GD}/nwt_grd/nwt_grd.grd", "rb").read()
    with pytest.raises(ValueError, match="GRC"):
        nwt.decode_grc(grd)


def test_grd_spark_face(spark):
    df, meta = nwt.read_grd(spark, f"{GD}/nwt_grd/nwt_grd.grd")
    n = df.count()
    assert 0 < n <= meta["nx"] * meta["ny"]
    row = df.agg({"value": "min"}).collect()[0][0]
    assert row >= float(np.float32(meta["zmin"]))
