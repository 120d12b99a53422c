"""Byte-exact replays of the reference's own gdaldem autotest
expectations (autotest/utilities/test_gdaldem.py) on its n43.tif
fixture, through the LZW TIFF source + operators/gdaldem_compat.

Every asserted constant is the reference's own committed checksum."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lib_gdal_spark.operators import gdaldem_compat as gc
from lib_gdal_spark.operators.raster import checksum
from lib_gdal_spark.sources.tiff import decode_tiff, read_tiff

N43 = "/root/reference/autotest/gdrivers/data/n43.tif"

# gdaldem color-relief ramp: autotest/utilities/data/color_file.txt
RAMP = [(-32768, 200, 230, 255), (75, 200, 230, 255), (76, 50, 180, 50),
        (150, 240, 250, 150), (300, 190, 185, 135), (450, 235, 220, 175),
        (500, 255, 255, 255)]


def test_n43_lzw_decode_checksum():
    """LZW strip decode: n43.tif is compression=5 (TIFF LZW). Its pixel
    grid equals the n43.dt0 DTED fixture, whose committed band checksum
    is 49187 (autotest/gdrivers/dted.py:31)."""
    arr, meta = decode_tiff(open(N43, "rb").read())
    assert arr.shape == (121, 121) and arr.dtype == np.int16
    assert meta["nodata"] == -32767.0
    # GeoKey 1025 = PixelIsPoint: the origin carries the half-pixel
    # area-convention shift the reference reports
    assert meta["pixel_is_point"]
    gt = meta["geotransform"]
    assert gt[0] == -80.00416666666666 and gt[1] == 0.008333333333333333
    assert gt[3] == 44.00416666666666 and gt[5] == -0.008333333333333333
    primes = np.array([7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43])
    v = arr.flatten().astype(np.int64)
    cs = int(np.sum(np.fmod(v, primes[np.arange(v.size) % 11]))) & 0xFFFF
    assert cs == 49187


@pytest.fixture(scope="module")
def n43(spark):
    cells, meta = read_tiff(spark, N43)
    return cells.cache(), meta


def _cs(df, col, w, h):
    return checksum(df.withColumnRenamed(col, "value"), 0, 0, w, h) \
        .collect()[0][0]


def test_gdaldem_hillshade_plain(spark, n43):
    """`gdaldem hillshade -s 111120 -z 30 n43.tif` -> checksum 45587
    (test_gdaldem.py:51); square pixels route the same-res fast path."""
    cells, meta = n43
    out = gc.hillshade_gdal(cells, meta["geotransform"], 121, 121,
                            z=30, scale=111120, src_nodata=-32767)
    assert _cs(out, "shade", 121, 121) == 45587


def test_gdaldem_hillshade_combined(spark, n43):
    """`-combined` variant -> checksum 43876 (test_gdaldem.py:112)."""
    cells, meta = n43
    out = gc.hillshade_gdal(cells, meta["geotransform"], 121, 121,
                            z=30, scale=111120, variant="combined",
                            src_nodata=-32767)
    assert _cs(out, "shade", 121, 121) == 43876


def test_gdaldem_hillshade_compute_edges(spark, n43):
    """`-compute_edges` -> checksum 50239 (test_gdaldem.py:144): edge
    windows mirror via INTERPOL(2a-b) with the reference's asymmetric
    clamp-vs-mirror column rules."""
    cells, meta = n43
    out = gc.hillshade_gdal(cells, meta["geotransform"], 121, 121,
                            z=30, scale=111120, compute_edges=True,
                            src_nodata=-32767)
    assert _cs(out, "shade", 121, 121) == 50239


def test_gdaldem_slope(spark, n43):
    """`gdaldem slope -s 111120` -> checksum 63748 (test_gdaldem.py:245)
    on the Float32 band (checksum reads floor(double(f32) + 0.5))."""
    cells, meta = n43
    out = gc.slope_gdal(cells, meta["geotransform"], 121, 121,
                        scale=111120, src_nodata=-32767)
    assert _cs(out, "slope", 121, 121) == 63748


def test_gdaldem_aspect(spark, n43):
    """`gdaldem aspect` -> checksum 54885 (test_gdaldem.py:275); azimuth
    rotation runs in float32 arithmetic, flat cells -> -9999."""
    cells, meta = n43
    out = gc.aspect_gdal(cells, 121, 121, src_nodata=-32767)
    assert _cs(out, "aspect", 121, 121) == 54885


def test_gdaldem_color_relief(spark, n43):
    """`gdaldem color-relief n43.tif color_file.txt` -> band checksums
    55066 / 37594 / 47768 (test_gdaldem.py:312-316)."""
    cells, _meta = n43
    out = gc.color_relief_gdal(cells, RAMP).cache()
    assert _cs(out.select("bx", "by", "r"), "r", 121, 121) == 55066
    assert _cs(out.select("bx", "by", "g"), "g", 121, 121) == 37594
    assert _cs(out.select("bx", "by", "b"), "b", 121, 121) == 47768


def test_gdaldem_color_relief_nearest(spark, n43):
    """`-nearest_color_entry` -> band checksums 57296 / 42926 / 47181
    (test_gdaldem.py:495-499); ties go to the upper entry."""
    cells, _meta = n43
    out = gc.color_relief_gdal(cells, RAMP, mode="nearest",
                               src_nodata=-32767).cache()
    assert _cs(out.select("bx", "by", "r"), "r", 121, 121) == 57296
    assert _cs(out.select("bx", "by", "g"), "g", 121, 121) == 42926
    assert _cs(out.select("bx", "by", "b"), "b", 121, 121) == 47181


def test_gdaldem_color_relief_repeated_entry(spark):
    """Repeated DEM values in the color table + an `nv` nodata entry
    (#6422 regression, test_gdaldem.py:583): nodata gets nextafter
    bracket twins and the duplicate 6-entries are nudged apart by
    balanced DBL_EPSILON multiples; expected band bytes (1,1,5,10,10,25)
    are the reference's committed assertion."""
    rows = [(0, 2, 1.0), (1, 2, 4.9), (0, 1, 5.0), (1, 1, 5.1),
            (0, 0, 6.0), (1, 0, 7.0)]
    g = spark.createDataFrame(rows, "bx long, by long, value double")
    colors = gc.parse_color_file(
        "1 1 1 1\n6 10 10 10\n6 20 20 20\n8 30 30 30\nnv 5 5 5\n",
        src_nodata=5.0)
    got = {(r.bx, r.by): r.r
           for r in gc.color_relief_gdal(g, colors, src_nodata=5.0).collect()}
    assert [got[(0, 2)], got[(1, 2)], got[(0, 1)], got[(1, 1)],
            got[(0, 0)], got[(1, 0)]] == [1, 1, 5, 10, 10, 25]


def test_gdaldem_color_relief_exact_mode(spark):
    """-exact_color_entry: non-entry values map to 0 (the reference's
    transparent black), exact entries to their color."""
    g = spark.createDataFrame([(0, 0, 76.0), (1, 0, 77.0)],
                              "bx long, by long, value double")
    got = {r.bx: (r.r, r.g, r.b)
           for r in gc.color_relief_gdal(g, RAMP, mode="exact").collect()}
    assert got[0] == (50, 180, 50) and got[1] == (0, 0, 0)


# --- the new-CLI (gdalalg) variant matrix: auto-derived geographic
# xscale/yscale, edges computed by default -----------------------------

_HS_CASES = [
    ({}, 63031), ({"z": 30}, 50999),
    ({"xscale": 111120, "yscale": 111120}, 63905),
    ({"xscale": 90000, "yscale": 111120}, 63319),
    ({"azimuth": 180}, 2228), ({"altitude": 90}, 48616),
    ({"gradient_alg": "zt"}, 62530), ({"variant": "combined"}, 51495),
    ({"variant": "multidirectional"}, 62942), ({"variant": "igor"}, 51362),
]


@pytest.mark.parametrize("opts,want", _HS_CASES)
def test_gdalalg_hillshade_variants(spark, n43, opts, want):
    """`gdal raster hillshade` variant matrix on n43.tif
    (test_gdalalg_raster_hillshade.py:24-39): default scales derive from
    the geographic CRS (auto_scale), edges are computed by default; the
    reference itself asserts to within 1 (its SSE rsqrt path)."""
    cells, meta = n43
    gt = meta["geotransform"]
    xs, ys = gc.auto_scale(gt, 121)
    o = dict(opts)
    o.setdefault("xscale", xs)
    o.setdefault("yscale", ys)
    out = gc.hillshade_gdal(cells, gt, 121, 121, compute_edges=True,
                            src_nodata=-32767, **o)
    assert abs(_cs(out, "shade", 121, 121) - want) <= 1


def test_gdalalg_hillshade_no_edges(spark, n43):
    cells, meta = n43
    gt = meta["geotransform"]
    xs, ys = gc.auto_scale(gt, 121)
    out = gc.hillshade_gdal(cells, gt, 121, 121, xscale=xs, yscale=ys,
                            src_nodata=-32767)
    assert abs(_cs(out, "shade", 121, 121) - 58409) <= 1


_SLOPE_CASES = [
    ({}, True, 5604), ({"percent": True}, True, 10827),
    ({"xscale": 111120, "yscale": 111120}, True, 4589),
    ({"xscale": 90000, "yscale": 111120}, True, 5232),
    ({"gradient_alg": "zt"}, True, 6378),
    ({"gradient_alg": "zt"}, False, 65468), ({}, False, 64725),
]


@pytest.mark.parametrize("opts,edges,want", _SLOPE_CASES)
def test_gdalalg_slope_variants(spark, n43, opts, edges, want):
    """`gdal raster slope` matrix (test_gdalalg_raster_slope.py:24-36):
    degrees/percent, per-axis scales, Zevenbergen-Thorne, no-edges —
    exact checksums."""
    cells, meta = n43
    gt = meta["geotransform"]
    xs, ys = gc.auto_scale(gt, 121)
    o = dict(opts)
    o.setdefault("xscale", xs)
    o.setdefault("yscale", ys)
    out = gc.slope_gdal(cells, gt, 121, 121, compute_edges=edges,
                        src_nodata=-32767, **o)
    assert _cs(out, "slope", 121, 121) == want


_ASPECT_CASES = [
    ({}, True, 63997), ({"gradient_alg": "zt"}, True, 59218),
    ({"zero_for_flat": True}, True, 53663), ({"azimuth": False}, True, 63627),
    ({"gradient_alg": "zt"}, False, 50539), ({}, False, 54885),
]


@pytest.mark.parametrize("opts,edges,want", _ASPECT_CASES)
def test_gdalalg_aspect_variants(spark, n43, opts, edges, want):
    """`gdal raster aspect` matrix (test_gdalalg_raster_aspect.py:24-33):
    azimuth/trigonometric, zero-for-flat, Zevenbergen-Thorne, no-edges —
    exact checksums."""
    cells, _meta = n43
    out = gc.aspect_gdal(cells, 121, 121, compute_edges=edges,
                         src_nodata=-32767, **opts)
    assert _cs(out, "aspect", 121, 121) == want


_TPI_TRI_ROUGH = [
    ("tpi", {}, True, 1147), ("tpi", {}, False, 60504),
    ("tri", {}, True, 51634), ("tri", {"algorithm": "wilson"}, True, 4381),
    ("tri", {}, False, 41233),
    ("roughness", {}, True, 48806), ("roughness", {}, False, 38624),
]


@pytest.mark.parametrize("op,opts,edges,want", _TPI_TRI_ROUGH)
def test_gdalalg_tpi_tri_roughness(spark, n43, op, opts, edges, want):
    """`gdal raster tpi/tri/roughness` goldens
    (test_gdalalg_raster_{tpi,tri,roughness}.py): TPI and Wilson-TRI
    carry the C's float 0.125f multiply; Riley-TRI squares in double —
    exact checksums."""
    cells, _meta = n43
    fn = {"tpi": gc.tpi_gdal, "tri": gc.tri_gdal,
          "roughness": gc.roughness_gdal}[op]
    out = fn(cells, 121, 121, compute_edges=edges, src_nodata=-32767,
             **opts)
    assert _cs(out, op, 121, 121) == want
