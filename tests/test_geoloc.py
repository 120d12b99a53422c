"""Geolocation-array transformer tests (geo/geoloc.py).

Replays the reference's own autotest matrix
(autotest/gcore/geoloc.py test_geoloc_affine_transformation — exact
forward goldens + inverse round trips over step/convention;
..._with_noise — seeded perturbation round trips) plus the
anti-meridian semantics of alg/gdalgeoloc.h:72 ShiftGeoX, and pins
the relational ``forward_cells`` to the NumPy kernel bit-exactly
with a broadcast-only plan.
"""

import random

import numpy as np
import pytest

from lib_gdal_spark.geo import geoloc as G


def _affine_gl(step, top_left):
    shift = 0.0 if top_left else 0.5
    n = 20 // step
    # float32 arrays, as the reference autotest writes GDT_Float32
    lon = np.array([np.float32(-80 + step * (x + shift)) for x in range(n)],
                   np.float64)
    lat = np.array([np.float32(50 - step * (x + shift)) for x in range(n)],
                   np.float64)
    return G.GeolocArray.from_regular(
        lon, lat, pixel_step=float(step), line_step=float(step),
        origin_top_left=top_left, geographic=True)


#: (pixel, line) -> exact (X, Y) from the reference autotest
_AFFINE_GOLDENS = [
    (10, 10, -70.0, 40.0),
    (1.23, 2.34, -78.77, 47.66),
    (0, 0, -80.0, 50.0),
    (20, 0, -60.0, 50.0),
    (0, 20, -80.0, 30.0),
    (20, 20, -60.0, 30.0),
]


@pytest.mark.parametrize("step", [1, 2])
@pytest.mark.parametrize("top_left", [True, False])
def test_affine_forward_goldens(step, top_left):
    gl = _affine_gl(step, top_left)
    xs = [p[0] for p in _AFFINE_GOLDENS]
    ys = [p[1] for p in _AFFINE_GOLDENS]
    gx, gy, ok = G.forward(gl, xs, ys)
    assert ok.all()
    for k, (_, _, X, Y) in enumerate(_AFFINE_GOLDENS):
        assert gx[k] == pytest.approx(X, abs=1e-9)
        assert gy[k] == pytest.approx(Y, abs=1e-9)


@pytest.mark.parametrize("step", [1, 2])
@pytest.mark.parametrize("top_left", [True, False])
def test_affine_inverse_roundtrip(step, top_left):
    gl = _affine_gl(step, top_left)
    xs = [p[0] for p in _AFFINE_GOLDENS]
    ys = [p[1] for p in _AFFINE_GOLDENS]
    gx, gy, ok = G.forward(gl, xs, ys)
    px, py, ok2 = G.inverse(gl, gx, gy)
    assert ok2.all()
    np.testing.assert_allclose(px, xs, atol=1e-7)
    np.testing.assert_allclose(py, ys, atol=1e-7)


@pytest.mark.parametrize("step", [1, 2])
@pytest.mark.parametrize("top_left", [True, False])
def test_noise_roundtrip(step, top_left):
    # test_geoloc_affine_transformation_with_noise, random.Random(0):
    # lon written row-by-row, lat written column-by-column.
    shift = 0.0 if top_left else 0.5
    n = 20 // step
    r = random.Random(0)
    lon = np.empty((n, n))
    lat = np.empty((n, n))
    for y in range(n):
        lon[y, :] = [np.float32(-80 + step * (x + shift)
                                + r.uniform(-0.25, 0.25)) for x in range(n)]
    for x in range(n):
        lat[:, x] = [np.float32(50 - step * (y + shift)
                                + r.uniform(-0.25, 0.25)) for y in range(n)]
    gl = G.GeolocArray(lon=lon, lat=lat, pixel_step=float(step),
                       line_step=float(step), origin_top_left=top_left,
                       geographic=True)
    for (x, y) in [(10, 10), (1.23, 2.34), (0, 0), (20, 0), (0, 20),
                   (20, 20)]:
        gx, gy, ok = G.forward(gl, [x], [y])
        assert ok[0]
        px, py, ok2 = G.inverse(gl, gx, gy)
        assert ok2[0]
        assert px[0] == pytest.approx(x, abs=1e-5)
        assert py[0] == pytest.approx(y, abs=1e-5)


def _dateline_gl():
    W = 21
    lonrow = np.array([(170.0 + x) if 170.0 + x <= 180 else
                       (170.0 + x - 360.0) for x in range(W)])
    lat1 = np.linspace(10, 0, 11)
    return G.GeolocArray(lon=np.tile(lonrow, (11, 1)),
                         lat=np.repeat(lat1, W).reshape(11, W),
                         geographic=True)


def test_antimeridian_forward():
    # Interpolating between lon 179 and -179 must land at ±179.5, not 0
    # (ShiftGeoX, alg/gdalgeoloc.h:72; UnshiftGeoX renormalizes).
    gl = _dateline_gl()
    gx, gy, ok = G.forward(gl, [9.5, 10.5, 15.0], [5.0, 5.0, 5.0])
    assert ok.all()
    np.testing.assert_allclose(gx, [179.5, -179.5, -175.0], atol=1e-12)
    np.testing.assert_allclose(gy, [5.0, 5.0, 5.0], atol=1e-12)


def test_antimeridian_inverse():
    gl = _dateline_gl()
    pts_x = [9.5, 10.5, 15.0, 3.25, 0.0, 20.0]
    pts_y = [5.0, 5.0, 5.0, 2.75, 0.0, 10.0]
    gx, gy, ok = G.forward(gl, pts_x, pts_y)
    px, py, ok2 = G.inverse(gl, gx, gy)
    assert ok2.all()
    np.testing.assert_allclose(px, pts_x, atol=1e-7)
    np.testing.assert_allclose(py, pts_y, atol=1e-7)


def test_nodata_corner():
    lon = np.arange(25, dtype=float).reshape(5, 5) * 0.1 - 80.0
    lat = 50.0 - np.repeat(np.arange(5, dtype=float), 5).reshape(5, 5)
    lon[2, 2] = -999.0
    gl = G.GeolocArray(lon=lon, lat=lat, nodata=-999.0)
    # origin corner nodata -> not ok (gdalgeoloc.cpp:418)
    _, _, ok = G.forward(gl, [2.25], [2.25])
    assert not ok[0]
    # far corner unaffected
    gx, gy, ok = G.forward(gl, [0.5], [0.5])
    assert ok[0]
    assert gx[0] == pytest.approx(-80.0 + 0.5 * 0.1 + 0.5 * 0.5)


def test_edge_extrapolation():
    # pixel/line beyond W-1/H-1: the retry branches step one node in
    # and the bilinear extrapolates (infinite-extension semantics) --
    # golden (20, 20) -> (-60, 30) above already pins this for the
    # regular grid; here a 3x3 checks the 1-D degenerate branches.
    lon = np.array([[0.0, 1, 2], [0, 1, 2], [0, 1, 2]])
    lat = np.array([[2.0, 2, 2], [1, 1, 1], [0, 0, 0]])
    gl = G.GeolocArray(lon=lon, lat=lat)
    gx, gy, ok = G.forward(gl, [2.0, 2.5], [1.0, 1.5])
    assert ok.all()
    np.testing.assert_allclose(gx, [2.0, 2.5], atol=1e-12)
    np.testing.assert_allclose(gy, [1.0, 0.5], atol=1e-12)


def test_transform_geolocations():
    # autotest/alg/transformgeoloc.py semantics: apply a transform to
    # the geoloc arrays themselves.
    gl = _affine_gl(1, True)
    out = G.transform_geolocations(
        gl, lambda x, y: (x * 2.0 + 1.0, y - 10.0))
    np.testing.assert_allclose(out.lon, gl.lon * 2.0 + 1.0)
    np.testing.assert_allclose(out.lat, gl.lat - 10.0)
    assert out.pixel_step == gl.pixel_step


def test_forward_cells_matches_numpy(spark):
    # smooth non-affine grid with exact dyadic node values
    H = W = 9
    jj, ii = np.meshgrid(np.arange(H, dtype=float),
                         np.arange(W, dtype=float), indexing="ij")
    lon = (-80.0 + ii * 0.5) + (ii * jj) * 0.001953125
    lat = (50.0 - jj * 0.5) + (ii * jj) * 0.0009765625
    gl = G.GeolocArray(lon=lon, lat=lat)
    rng = [(k % 97) * (7.9 / 97.0) for k in range(40)]
    rng2 = [(k % 89) * (7.9 / 89.0) for k in range(40)]
    pdf = [(k, rng[k], rng2[k]) for k in range(40)]
    pts = spark.createDataFrame(pdf, "id long, px double, py double")
    cells = G.cells_df(spark, gl)
    out = (G.forward_cells(pts, cells, gl)
           .orderBy("id").toPandas())
    ex, ey, ok = G.forward(gl, np.array(rng), np.array(rng2))
    assert ok.all() and len(out) == 40
    # bit-exact: same op order in Column math and NumPy kernel
    assert (out["geo_x"].to_numpy() == ex).all()
    assert (out["geo_y"].to_numpy() == ey).all()


def test_forward_cells_plan_broadcast_only(spark):
    # scale shape: the ONLY join is broadcast-hash on the cell table;
    # the point side never exchanges.
    H = W = 5
    jj, ii = np.meshgrid(np.arange(H, dtype=float),
                         np.arange(W, dtype=float), indexing="ij")
    gl = G.GeolocArray(lon=ii.copy(), lat=jj.copy())
    pts = spark.range(100).selectExpr(
        "id", "(id % 97) * 0.04 as px", "(id % 89) * 0.04 as py")
    out = G.forward_cells(pts, G.cells_df(spark, gl), gl)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted")
    assert "BroadcastHashJoin" in plan
    # the only Exchange is the broadcast of the cell table: no shuffle
    assert "BroadcastExchange" in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_roundtrip_cells_recovers_input(spark):
    # relational exact inverse bilinear (gdalgeoloc.cpp:967) undoes the
    # forward on the same quad; also agrees with the NumPy inverse.
    H = W = 9
    jj, ii = np.meshgrid(np.arange(H, dtype=float),
                         np.arange(W, dtype=float), indexing="ij")
    lon = (-80.0 + ii * 0.5) + (ii * jj) * 0.001953125
    lat = (50.0 - jj * 0.5) + (ii * jj) * 0.0009765625
    gl = G.GeolocArray(lon=lon, lat=lat)
    pdf = [(k, (k % 97) * (7.9 / 97.0), (k % 89) * (7.9 / 89.0))
           for k in range(50)]
    pts = spark.createDataFrame(pdf, "id long, px double, py double")
    out = (G.roundtrip_cells(pts, G.cells_df(spark, gl), gl)
           .orderBy("id").toPandas())
    assert len(out) == 50
    exp_px = np.array([p[1] for p in pdf])
    exp_py = np.array([p[2] for p in pdf])
    np.testing.assert_allclose(out["px_rec"], exp_px, atol=1e-12)
    np.testing.assert_allclose(out["py_rec"], exp_py, atol=1e-12)
    ipx, ipy, ok = G.inverse(gl, out["geo_x"].to_numpy(),
                             out["geo_y"].to_numpy())
    assert ok.all()
    np.testing.assert_allclose(out["px_rec"], ipx, atol=1e-9)
    np.testing.assert_allclose(out["py_rec"], ipy, atol=1e-9)


def test_transform_df_forward_and_inverse(spark):
    # the Arrow pandas-UDF surface (general path incl. spiral inverse)
    # matches the local NumPy kernels bit-for-bit and round-trips.
    gl = _dateline_gl()
    pts = [(k, 0.3 + k * 0.37, 0.2 + k * 0.17) for k in range(50)]
    df = spark.createDataFrame(pts, "id long, px double, py double")
    fwd = (G.transform_df(df, gl, "px", "py")
           .orderBy("id").toPandas())
    ex, ey, eok = G.forward(gl, np.array([p[1] for p in pts]),
                            np.array([p[2] for p in pts]))
    assert eok.all() and fwd["t_ok"].all()
    assert (fwd["tx"].to_numpy() == ex).all()
    assert (fwd["ty"].to_numpy() == ey).all()
    inv = (G.transform_df(
        spark.createDataFrame(
            [(k, float(x), float(y)) for k, (x, y) in
             enumerate(zip(ex, ey))], "id long, gx double, gy double"),
        gl, "gx", "gy", inverse=True).orderBy("id").toPandas())
    assert inv["t_ok"].all()
    np.testing.assert_allclose(inv["tx"], [p[1] for p in pts], atol=1e-7)
    np.testing.assert_allclose(inv["ty"], [p[2] for p in pts], atol=1e-7)


def test_suggested_warp_output_bounds_autotest():
    # gcore/geoloc.py test_geoloc_bounds: the output extent must take
    # the geoloc-array min/max into account (gdaltransformer.cpp:899
    # geoloc special case) — gt[0] ~ -179.9, gt[3] ~ 60.4 + 0.5*59,
    # exactly the reference's assertions (float32 fixture wobble incl.)
    lon = np.array([np.float32(91 + 0.5 * x) for x in range(178)]
                   + [np.float32(-179.9 + 0.5 * x) for x in range(182)],
                   np.float64)
    lat = np.array([np.float32(60.4 + 0.5 * x) for x in range(60)]
                   + [np.float32(89 - 0.5 * x) for x in range(20)],
                   np.float64)
    gl = G.GeolocArray.from_regular(lon, lat, geographic=True)
    gt, pixels, lines = G.suggested_warp_output(gl, 360, 80)
    assert gt[0] == pytest.approx(-179.9, abs=1e-4)
    assert gt[3] == pytest.approx(60.4 + 0.5 * 59, abs=1e-4)
    assert pixels > 0 and lines > 0


def test_warp_geoloc_affine_identity(spark):
    # an affine geoloc grid warped onto its own suggested grid must
    # reproduce the source values 1:1 (nearest sampling, exact inverse)
    gl = _affine_gl(1, True)
    W = H = 20
    src = spark.range(W * H).selectExpr(
        f"cast(id % {W} as int) as bx", f"cast(id / {W} as int) as by",
        "cast(id as double) as value")
    gt, pw, ph = G.suggested_warp_output(gl, W, H)
    out = G.warp_geoloc(src, gl, gt, pw, ph).toPandas()
    assert len(out) == pw * ph  # full coverage, no holes
    # spot-check: dst pixel (x,y) center -> geo -> the same cell
    got = {(r.bx, r.by): r.value for r in out.itertuples()}
    gx = gt[0] + (3 + 0.5) * gt[1]
    gy = gt[3] + (4 + 0.5) * gt[5]
    px, py, ok = G.inverse(gl, [gx], [gy])
    assert ok[0]
    exp = int(py[0]) * W + int(px[0])
    assert got[(3, 4)] == float(exp)


def test_pole_fixture_end_to_end(spark):
    # the reference's own north-pole scene (alg/data/geoloc/*.tif,
    # float32 + predictor 3): decode, build the transformer, suggest
    # the output grid, warp a constant raster — every landed pixel
    # must carry the constant and the output must cover a substantial
    # fraction of the suggested grid (the fill_line autotest's warp
    # shape; its exact checksum needs GDAL's approx-transformer
    # scanline interpolation, documented out of scope)
    from lib_gdal_spark.sources.tiff import decode_tiff
    base = "/root/reference/autotest/alg/data/geoloc"
    lon, _ = decode_tiff(open(f"{base}/longitude_including_pole.tif",
                              "rb").read())
    lat, _ = decode_tiff(open(f"{base}/latitude_including_pole.tif",
                              "rb").read())
    gl = G.GeolocArray(lon=lon.astype(np.float64),
                       lat=lat.astype(np.float64), geographic=True)
    H, W = gl.shape   # 372 x 200 (raster size == geoloc size here)
    gt, pw, ph = G.suggested_warp_output(gl, W, H)
    assert gt[3] <= 90.0 + 1e-6 and gt[0] >= -180.0 - 1e-6
    src = spark.range(W * H).selectExpr(
        f"cast(id % {W} as int) as bx", f"cast(id / {W} as int) as by",
        "cast(1.0 as double) as value")
    out = G.warp_geoloc(src, gl, gt, pw, ph).toPandas()
    assert (out["value"] == 1.0).all()
    assert len(out) > 0.2 * pw * ph


def test_tiff_float_predictor3():
    # predictor-3 (floating-point) TIFF decode round-trips the
    # reference fixture values into plausible lon/lat ranges
    from lib_gdal_spark.sources.tiff import decode_tiff
    base = "/root/reference/autotest/alg/data/geoloc"
    lon, meta = decode_tiff(open(f"{base}/longitude_including_pole.tif",
                                 "rb").read())
    assert lon.shape == (372, 200) and lon.dtype == np.float32
    assert -180.0 <= lon.min() and lon.max() <= 180.0
    lat, _ = decode_tiff(open(f"{base}/latitude_including_pole.tif",
                              "rb").read())
    assert 75.0 < lat.min() and lat.max() < 90.0


def test_forward_cells_rejects_nodata_and_wrap(spark):
    lon = np.array([[0.0, 1.0], [0.0, 1.0]])
    lat = np.array([[1.0, 1.0], [0.0, 0.0]])
    gl = G.GeolocArray(lon=lon.copy(), lat=lat, nodata=0.0)
    with pytest.raises(ValueError):
        G.cells_df(spark, gl)
    glw = G.GeolocArray(lon=np.array([[179.0, -179.0], [179.0, -179.0]]),
                        lat=lat, geographic=True)
    with pytest.raises(ValueError):
        G.cells_df(spark, glw)
