"""FITS reader (sources/fitsfile.py).

Fixture replays from autotest/gdrivers/fits.py: byte_merc's full WCS
geotransform (CDELT*PC, A_RADIUS radfac, crpix half-pixel), the
BSCALE/BZERO offset-scale pair to the exact doubles, the
image-in-second-HDU metadata merge with override and preserved quoted
padding, the empty-primary rejection, the two-image subdataset
listing byte-for-byte (EXTNAME surfacing in both the description and
the metadata), and the four-HDU file with a binary table skipped.
"""

import numpy as np
import pytest

from lib_gdal_spark.sources.fitsfile import read_fits

D = "/root/reference/autotest/gdrivers/data/fits"


def test_merc_georef():
    g = read_fits(f"{D}/byte_merc.fits")
    want = (-13095897.481058259, 72.23522015778646, 0.0,
            3991653.2130816197, 0.0, -72.23522015778646)
    for a, b in zip(g["gt"], want):
        assert abs(a - b) < 1e-3
    assert (g["width"], g["height"]) == (20, 20)
    assert g["nodata"] == -9999.0


def test_offset_scale():
    g = read_fits(f"{D}/offset_scale_no_georef.fits")
    assert g["offset"] == -0.0039525691699605
    assert g["scale"] == 1.00395256917
    assert g["gt"] is None


def test_second_hdu_metadata():
    g = read_fits(f"{D}/image_in_second_hdu.fits")
    assert (g["width"], g["height"], g["bands"]) == (1, 2, 1)
    assert g["metadata"] == {"BAR": "BAZ     ",
                             "FOO": "BAR_override",
                             "FOO2": "BAR2    "}


def test_empty_primary_rejected():
    with pytest.raises(ValueError):
        read_fits(f"{D}/empty_primary_hdu.fits")


def test_two_image_subdatasets():
    p = f"{D}/image_in_first_and_second_hdu.fits"
    g = read_fits(p)
    assert g["metadata"] == {"EXTNAME": "FIRST_IMAGE"}
    assert g["subdatasets"] == [
        (f'FITS:"{p}":1', "HDU 1 (1x2, 1 band), FIRST_IMAGE"),
        (f'FITS:"{p}":2', "HDU 2 (1x3, 1 band)"),
    ]
    g1 = read_fits(p, hdu=1)
    g2 = read_fits(p, hdu=2)
    assert (g1["width"], g1["height"]) == (1, 2)
    assert (g2["width"], g2["height"]) == (1, 3)


def test_table_hdu_skipped():
    g = read_fits(
        f"{D}/image_in_second_and_fourth_hdu_table_in_third.fits")
    assert len(g["subdatasets"]) == 2


def test_rejects_non_fits(tmp_path):
    p = tmp_path / "x.fits"
    p.write_bytes(b"not fits" * 360)
    with pytest.raises(ValueError):
        read_fits(str(p))
