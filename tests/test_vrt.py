"""VRT composition source: the reference's own vrt_read.py + pixfun.py
autotest expectations replayed through read_vrt."""

import numpy as np
import pytest

from lib_gdal_spark.operators import raster
from lib_gdal_spark.sources.vrt import parse_vrt, read_vrt

DATA = "/root/reference/autotest/gcore/data"


def _cs(spark, path, band=1):
    cells, meta = read_vrt(spark, path, band=band)
    return raster.checksum(
        cells, 0, 0, meta["xsize"], meta["ysize"]).collect()[0].checksum


class TestVrtOpenReplay:
    # autotest/gcore/vrt_read.py:44-62 init_list
    def test_byte_vrt(self, spark):
        assert _cs(spark, f"{DATA}/byte.vrt") == 4672

    def test_int32_vrt(self, spark):
        assert _cs(spark, f"{DATA}/int32.vrt") == 4672

    def test_float32_vrt(self, spark):
        assert _cs(spark, f"{DATA}/float32.vrt") == 4672

    def test_msubwinbyte(self, spark):
        # two sub-window SimpleSources per band, zero fill elsewhere
        for band in (1, 2, 3):
            assert _cs(spark, f"{DATA}/msubwinbyte.vrt", band=band) == 2699

    def test_utmsmall(self, spark):
        assert _cs(spark, f"{DATA}/utmsmall.vrt") == 50054

    def test_nearest_50pct(self, spark):
        assert _cs(spark, f"{DATA}/byte_nearest_50pct.vrt") == 1192

    def test_nearest_200pct(self, spark):
        assert _cs(spark, f"{DATA}/byte_nearest_200pct.vrt") == 18784

    def test_averaged_50pct(self, spark):
        assert _cs(spark, f"{DATA}/byte_averaged_50pct.vrt") == 1152

    def test_averaged_200pct(self, spark):
        assert _cs(spark, f"{DATA}/byte_averaged_200pct.vrt") == 18784


def _grid(cells_df, w, h):
    a = np.full((h, w), np.nan)
    for r in cells_df.collect():
        a[h - 1 - r.by, r.bx] = r.value
    return a


def _ref_band(path):
    from lib_gdal_spark.sources.tiff import read_tiff
    return path


class TestPixelFunctions:
    # autotest/gcore/pixfun.py sum/diff/mul expectations, recomputed
    # with the engine's own tiff reader as the reference side
    def _tif_grid(self, spark, name):
        from lib_gdal_spark.sources.tiff import read_tiff
        cells, meta = read_tiff(spark, f"{DATA}/{name}")
        return _grid(cells, meta["width"], meta["height"])

    def test_sum_r(self, spark):
        cells, meta = read_vrt(spark, f"{DATA}/vrt/pixfun_sum_r.vrt")
        got = _grid(cells, meta["xsize"], meta["ysize"])
        ref = sum(self._tif_grid(spark, n)
                  for n in ("uint16.tif", "int32.tif", "float32.tif"))
        assert np.array_equal(got, ref.astype(np.float32).astype(float))

    def test_sum_k(self, spark):
        cells, meta = read_vrt(spark, f"{DATA}/vrt/pixfun_sum_k.vrt")
        got = _grid(cells, meta["xsize"], meta["ysize"])
        ref = 2.0 + sum(self._tif_grid(spark, n)
                        for n in ("uint16.tif", "int32.tif", "float32.tif"))
        assert np.array_equal(got, ref.astype(np.float32).astype(float))

    def test_mul_k(self, spark):
        cells, meta = read_vrt(spark, f"{DATA}/vrt/pixfun_mul_k.vrt")
        got = _grid(cells, meta["xsize"], meta["ysize"])
        ref = 2.0
        for n in ("uint16.tif", "int32.tif", "float32.tif"):
            ref = ref * self._tif_grid(spark, n)
        assert np.array_equal(got, ref.astype(np.float32).astype(float))

    def test_sqrt(self, spark):
        cells, meta = read_vrt(spark, f"{DATA}/vrt/pixfun_sqrt.vrt")
        got = _grid(cells, meta["xsize"], meta["ysize"])
        ref = np.sqrt(self._tif_grid(spark, "float32.tif"))
        assert np.allclose(got, ref.astype(np.float32).astype(float),
                           rtol=1e-7, equal_nan=True)


class TestParseGuards:
    def test_fractional_rect_refuses(self):
        with pytest.raises(NotImplementedError):
            parse_vrt(f"{DATA}/dstsize_larger_than_source.vrt")

    def test_meta(self):
        m = parse_vrt(f"{DATA}/byte.vrt")
        assert (m["xsize"], m["ysize"]) == (20, 20)
        assert m["bands"][0]["nodata"] == 107.0
        assert m["geotransform"][0] == 440720.0


class TestBuildVrt:
    # gdalbuildvrt (apps/gdalbuildvrt_lib.cpp): union extent, running-
    # mean 'average' resolution, int(0.5 + ...) sizing, DstRect
    # placement — verified by reading the built VRT back
    def _write_grd(self, spark, tmp_path, name, vals, x0, y0, cs=1.0):
        rows = [(c, len(vals) - 1 - r, float(v))
                for r, line in enumerate(vals)
                for c, v in enumerate(line)]
        df = spark.createDataFrame(rows, "bx long, by long, value double")
        from lib_gdal_spark.sources.aaigrid import write_aaigrid
        p = str(tmp_path / name)
        write_aaigrid(df, p, meta={
            "ncols": len(vals[0]), "nrows": len(vals),
            "xllcorner": x0, "yllcorner": y0, "cellsize": cs})
        return p

    def test_union_mosaic(self, spark, tmp_path):
        from lib_gdal_spark.sources.vrt import build_vrt, read_vrt

        a = self._write_grd(spark, tmp_path, "a.grd",
                            [[1, 2], [3, 4]], x0=0.0, y0=0.0)
        b = self._write_grd(spark, tmp_path, "b.grd",
                            [[9, 8], [7, 6]], x0=3.0, y0=1.0)
        out = str(tmp_path / "m.vrt")
        meta = build_vrt(out, [a, b])
        # union extent: x 0..5, y 0..3 at cellsize 1
        assert (meta["xsize"], meta["ysize"]) == (5, 3)
        assert meta["geotransform"] == (0.0, 1.0, 0.0, 3.0, 0.0, -1.0)
        cells, _ = read_vrt(spark, out)
        got = {(r.bx, r.by): r.value for r in cells.collect()}
        # a sits at engine rows by 0..1, b at by 1..2 / bx 3..4
        assert got[(0, 1)] == 1.0 and got[(1, 0)] == 4.0
        assert got[(3, 2)] == 9.0 and got[(4, 1)] == 6.0
        assert (2, 0) not in got        # gap between the two sources

    def test_average_resolution_running_mean(self, spark, tmp_path):
        from lib_gdal_spark.sources.vrt import build_vrt

        a = self._write_grd(spark, tmp_path, "a.grd", [[1]], 0.0, 0.0,
                            cs=1.0)
        b = self._write_grd(spark, tmp_path, "b.grd", [[1]], 0.0, 0.0,
                            cs=3.0)
        out = str(tmp_path / "m.vrt")
        with pytest.raises(NotImplementedError):
            # avg res 2.0 puts the 1x1 cs=1 source on a half pixel —
            # the aligned-only contract must refuse at build time
            build_vrt(out, [a, b])
        meta = build_vrt(out, [a, b], resolution="highest")
        assert meta["geotransform"][1] == 1.0
        # the cs=3 source upsamples 3x on the finer grid
        assert meta["bands"][0]["sources"][1]["dst_rect"] == (0, 0, 3, 3)

    def test_nodata_becomes_complex_source(self, spark, tmp_path):
        from lib_gdal_spark.sources.vrt import build_vrt, read_vrt

        a = self._write_grd(spark, tmp_path, "a.grd",
                            [[5, 13], [13, 6]], 0.0, 0.0)
        out = str(tmp_path / "m.vrt")
        meta = build_vrt(out, [a], src_nodata=13.0)
        assert meta["bands"][0]["sources"][0]["kind"] == "ComplexSource"
        cells, _ = read_vrt(spark, out)
        got = {(r.bx, r.by): r.value for r in cells.collect()}
        assert got == {(0, 1): 5.0, (1, 0): 6.0}

    def test_unknown_resolution_rejected_single_input(self, tmp_path):
        from lib_gdal_spark.sources.vrt import build_vrt

        out = str(tmp_path / "m.vrt")
        with pytest.raises(ValueError, match="resolution strategy"):
            # must raise even with ONE input (the per-input loop only
            # reaches its validating else-branch from input 2 onward)
            build_vrt(out, [
                ("x.tif", (4, 4), (0.0, 1.0, 0.0, 4.0, 0.0, -1.0))],
                resolution="typo")

    def test_probe_tuple_inputs(self, tmp_path):
        from lib_gdal_spark.sources.vrt import build_vrt

        out = str(tmp_path / "m.vrt")
        meta = build_vrt(out, [
            ("x.tif", (10, 10), (100.0, 2.0, 0.0, 220.0, 0.0, -2.0)),
            ("y.tif", (10, 10), (120.0, 2.0, 0.0, 200.0, 0.0, -2.0))])
        assert (meta["xsize"], meta["ysize"]) == (20, 20)
        d = meta["bands"][0]["sources"][1]["dst_rect"]
        assert d == (10, 10, 10, 10)


class TestExpressionAndGuards:
    def _vrt(self, tmp_path, body, xs=20, ys=20):
        p = str(tmp_path / "e.vrt")
        with open(p, "w") as f:
            f.write(f'<VRTDataset rasterXSize="{xs}" rasterYSize="{ys}">'
                    f"{body}</VRTDataset>")
        return p

    def _src(self, name="../float32.tif"):
        return (f'<SimpleSource><SourceFilename relativeToVRT="1">'
                f"{name}</SourceFilename><SourceBand>1</SourceBand>"
                f'<SrcRect xOff="0" yOff="0" xSize="20" ySize="20"/>'
                f'<DstRect xOff="0" yOff="0" xSize="20" ySize="20"/>'
                f"</SimpleSource>")

    def test_expression_pixel_function(self, spark, tmp_path):
        # pixelfunctions.cpp:2834 'expression' via F.expr: (B1+B2)/2 + 1
        import shutil

        import numpy as np

        from lib_gdal_spark.sources.tiff import read_tiff
        from lib_gdal_spark.sources.vrt import read_vrt

        shutil.copy(f"{DATA}/float32.tif", tmp_path / "a.tif")
        shutil.copy(f"{DATA}/byte.tif", tmp_path / "b.tif")
        body = ('<VRTRasterBand dataType="Float64" band="1" '
                'subClass="VRTDerivedRasterBand">'
                "<PixelFunctionType>expression</PixelFunctionType>"
                '<PixelFunctionArguments expression='
                '"(B1+B2)/2 + 1" dialect="muparser"/>'
                + self._src("a.tif") + self._src("b.tif")
                + "</VRTRasterBand>")
        p = self._vrt(tmp_path, body)
        cells, meta = read_vrt(spark, p)
        got = _grid(cells, meta["xsize"], meta["ysize"])
        a_c, _ = read_tiff(spark, str(tmp_path / "a.tif"))
        b_c, _ = read_tiff(spark, str(tmp_path / "b.tif"))
        a = _grid(a_c, 20, 20)
        b = _grid(b_c, 20, 20)
        assert np.allclose(got, (a + b) / 2 + 1, rtol=1e-12)

    def test_expression_min_maps_to_least(self, spark, tmp_path):
        import shutil

        import numpy as np

        from lib_gdal_spark.sources.tiff import read_tiff
        from lib_gdal_spark.sources.vrt import read_vrt

        shutil.copy(f"{DATA}/float32.tif", tmp_path / "a.tif")
        shutil.copy(f"{DATA}/byte.tif", tmp_path / "b.tif")
        body = ('<VRTRasterBand dataType="Float64" band="1" '
                'subClass="VRTDerivedRasterBand">'
                "<PixelFunctionType>expression</PixelFunctionType>"
                '<PixelFunctionArguments expression="min(B1, B2)"/>'
                + self._src("a.tif") + self._src("b.tif")
                + "</VRTRasterBand>")
        cells, meta = read_vrt(spark, self._vrt(tmp_path, body))
        got = _grid(cells, 20, 20)
        a = _grid(read_tiff(spark, str(tmp_path / "a.tif"))[0], 20, 20)
        b = _grid(read_tiff(spark, str(tmp_path / "b.tif"))[0], 20, 20)
        assert np.array_equal(got, np.minimum(a, b))

    def test_unknown_resampling_refuses(self, spark, tmp_path):
        import shutil

        from lib_gdal_spark.sources.vrt import read_vrt

        shutil.copy(f"{DATA}/byte.tif", tmp_path / "b.tif")
        body = ('<VRTRasterBand dataType="Byte" band="1">'
                '<SimpleSource resampling="bilinear">'
                '<SourceFilename relativeToVRT="1">b.tif</SourceFilename>'
                "<SourceBand>1</SourceBand>"
                '<SrcRect xOff="0" yOff="0" xSize="20" ySize="20"/>'
                '<DstRect xOff="0" yOff="0" xSize="10" ySize="10"/>'
                "</SimpleSource></VRTRasterBand>")
        with pytest.raises(NotImplementedError):
            read_vrt(spark, self._vrt(tmp_path, body, 10, 10))[0].count()
