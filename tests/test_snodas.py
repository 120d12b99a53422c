"""SNODAS reader (sources/snodas.py).

Fixture replay: autotest/gdrivers/snodas.py test_snodas_1 — the exact
expected geotransform from the min/max axis coordinates and checksum 0
over the (empty, zero-padded) .dat file.
"""

import numpy as np
import pytest

from lib_gdal_spark.sources.snodas import read_snodas_grid

FIX = "/root/reference/autotest/gdrivers/data/snodas/fake_snodas.hdr"


def test_fixture():
    g = read_snodas_grid(FIX)
    assert (g["width"], g["height"]) == (6935, 3351)
    want = (-124.733749999995, 0.0083333333333330643, 0.0,
            52.874583333331302, 0.0, -0.0083333333333330054)
    assert g["gt"] == want
    assert g["nodata"] == -9999.0
    assert g["scale"] == 1.0 and g["offset"] == 0.0
    assert g["description"] == "Non-snow accumulation, 24-hour total"
    # empty .dat zero-pads -> checksum 0 (all terms 0 mod anything)
    assert g["values"].sum() == 0


def test_rejects_non_snodas(tmp_path):
    p = tmp_path / "x.hdr"
    p.write_text("Format version: something else\n")
    with pytest.raises(ValueError):
        read_snodas_grid(str(p))
