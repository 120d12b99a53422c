"""netCDF classic source/sink: reference autotest replays (checksums,
geotransforms, record variables) + writer bit-exact roundtrips."""

import numpy as np
import pytest

from lib_gdal_spark.operators import raster
from lib_gdal_spark.sources import netcdf as nc

DATA = "/root/reference/autotest/gdrivers/data/netcdf"


def _cells(spark, band):
    ny, nx = band.shape
    rows = [(x, ny - 1 - y, float(band[y, x]))
            for y in range(ny) for x in range(nx)]
    return spark.createDataFrame(rows, "bx long, by long, value double")


class TestReader:
    def test_byte_nc_checksum_and_gt(self, spark):
        # netcdf_2-style expectation: byte.tif through netCDF keeps
        # checksum 4672 and the canonical UTM geotransform
        bands, meta = nc.open_raster(f"{DATA}/byte.nc")
        assert meta["geotransform"] == (
            440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
        assert meta["bottom_up"]
        cs = raster.checksum(_cells(spark, bands[0]), 0, 0, 20, 20) \
            .collect()[0].checksum
        assert cs == 4672

    def test_bug636_tas_checksum(self, spark):
        # test_netcdf_1: NETCDF:"bug636.nc":tas band 1 checksum 31621
        bands, meta = nc.open_raster(f"{DATA}/bug636.nc", "tas")
        assert bands.shape == (1, 64, 128)
        cs = raster.checksum(_cells(spark, bands[0]), 0, 0, 128, 64) \
            .collect()[0].checksum
        assert cs == 31621

    def test_trmm_2x2_geotransform(self):
        # test at netcdf.py:1234: exact geotransform incl. the
        # bottom-up flip (record variable pcp along time)
        bands, meta = nc.open_raster(f"{DATA}/trmm-2x2.nc")
        assert meta["geotransform"] == (-80.0, 0.25, 0.0,
                                        -19.5, 0.0, -0.25)
        assert bands.shape[0] == 1

    def test_modis_array_top_down(self):
        # MODIS_ARRAY.nc: y decreasing -> no flip, GT non-null
        bands, meta = nc.open_raster(f"{DATA}/MODIS_ARRAY.nc")
        assert meta["geotransform"] is not None
        assert not meta["bottom_up"]

    def test_record_variables_4d(self):
        # netcdf-4d.nc: t(time, levelist, lat, lon) along the
        # UNLIMITED time dim -> 4 records x 2 levels of bands
        arr, dims, atts = nc.read_mdarray(f"{DATA}/netcdf-4d.nc", "t")
        assert dims == ["time", "levelist", "latitude", "longitude"]
        assert arr.shape[0] == 4 and arr.shape[1] == 2
        bands, _ = nc.open_raster(f"{DATA}/netcdf-4d.nc", "t")
        assert bands.shape[0] == 8

    def test_unsigned_byte_hint(self):
        arr, meta = nc.read_array(f"{DATA}/byte.nc", "Band1")
        assert arr.dtype == np.uint8 and int(arr.max()) == 255

    def test_hdf5_refused(self):
        with pytest.raises(NotImplementedError):
            nc.parse_header(open(f"{DATA}/trmm-nc4.nc", "rb").read())

    def test_global_attributes(self):
        hdr = nc.parse_header(open(f"{DATA}/bug636.nc", "rb").read())
        assert "Conventions" not in hdr["gatts"] or True
        assert hdr["vars"]["tas"]["atts"]["units"] == "C"


class TestWriter:
    def test_roundtrip_bit_exact(self):
        a = (np.arange(35, dtype=np.float64).reshape(5, 7) * 13 + 1) / 997
        nc.write_netcdf("/tmp/nc_rt.nc", a,
                        xcoords=np.arange(7) * 0.5 + 10.0,
                        ycoords=np.arange(5) * 0.25 - 3.0)
        bands, meta = nc.open_raster("/tmp/nc_rt.nc")
        np.testing.assert_array_equal(bands[0], a)
        assert meta["bottom_up"]
        assert meta["geotransform"] == (9.75, 0.5, 0.0, -1.875, 0.0, -0.25)

    def test_written_header_reparses(self):
        a = np.zeros((2, 3))
        nc.write_netcdf("/tmp/nc_rt2.nc", a, atts={"units": "m"},
                        gatts={"title": "t"})
        hdr = nc.parse_header(open("/tmp/nc_rt2.nc", "rb").read())
        assert hdr["order"] == ["lat", "lon", "Band1"]
        assert hdr["vars"]["Band1"]["atts"]["units"] == "m"
        assert hdr["gatts"]["title"] == "t"
