"""TMS Global Geodetic (Plate Carrée) tile profile.

The second of gdal2tiles' two tile profiles (class GlobalGeodetic,
osgeo_utils/gdal2tiles.py:534-640): latitude/longitude used directly as
planar XY, scaled to the pixel pyramid and cut to tiles with the same
ceil-minus-one rule as the Mercator profile. Two resolution factors
(gdal2tiles.py:568-576):

- tmscompatible: resFact = 180/tile_size — two tiles at level 0, the
  OSGeo TMS spec profile; the tile matrix is 2^(z+1) wide x 2^z high.
- default (OpenLayers/WMTS): resFact = 360/tile_size — one tile at
  level 0; the matrix is 2^z wide and 2^(z-1) high (half a tile of
  latitude at z=0 — the reference's own quirk, kept).

Formulas (gdal2tiles.py:581-596): px = (180 + lon) / res,
py = (90 + lat) / res with res = resFact / 2^z; tile = ceil(p/ts) - 1.
Rows are TMS (origin bottom-left); xyz=True flips through the matrix
height 2^z (tmscompatible only — the default profile's fractional
z=0 matrix has no whole-tile flip).

Column, NumPy and oracle-SQL forms keep the identical op order:
one commutative addition, one division by the exact dyadic res
(180/256 = 0.703125 and 360/256 = 1.40625 are exact doubles, as is
every res = resFact / 2^z), one ceil — so the three engines agree to
the last ulp by construction.
"""

from __future__ import annotations

import math

import numpy as np

__all__ = ["geodetic_resolution", "geodetic_tile_np",
           "geodetic_tile_x_col", "geodetic_tile_y_col",
           "geodetic_tile_bounds_np"]


def geodetic_resolution(zoom: int, tile_size: int = 256,
                        tmscompatible: bool = True) -> float:
    res_fact = (180.0 if tmscompatible else 360.0) / tile_size
    return res_fact / 2 ** zoom


def geodetic_tile_np(lon, lat, zoom: int, tile_size: int = 256,
                     tmscompatible: bool = True, xyz: bool = True):
    """(lon, lat) arrays -> (tx, ty) tile indices."""
    res = geodetic_resolution(zoom, tile_size, tmscompatible)
    px = (180.0 + np.asarray(lon, dtype=np.float64)) / res
    py = (90.0 + np.asarray(lat, dtype=np.float64)) / res
    tx = np.ceil(px / tile_size).astype(np.int64) - 1
    ty = np.ceil(py / tile_size).astype(np.int64) - 1
    if xyz:
        if not tmscompatible:
            raise ValueError("xyz flip needs the tmscompatible matrix "
                             "(2^z rows); the default profile's z=0 "
                             "matrix is half a tile high")
        ty = (1 << zoom) - 1 - ty
    return tx, ty


def geodetic_tile_x_col(lon, zoom: int, tile_size: int = 256,
                        tmscompatible: bool = True):
    from pyspark.sql import functions as F

    res = geodetic_resolution(zoom, tile_size, tmscompatible)
    px = (F.lit(180.0) + lon) / F.lit(res)
    return (F.ceil(px / F.lit(float(tile_size))) - 1).cast("long")


def geodetic_tile_y_col(lat, zoom: int, tile_size: int = 256,
                        tmscompatible: bool = True, xyz: bool = True):
    from pyspark.sql import functions as F

    res = geodetic_resolution(zoom, tile_size, tmscompatible)
    py = (F.lit(90.0) + lat) / F.lit(res)
    ty = (F.ceil(py / F.lit(float(tile_size))) - 1).cast("long")
    if xyz:
        if not tmscompatible:
            raise ValueError("xyz flip needs the tmscompatible matrix")
        ty = F.lit((1 << zoom) - 1) - ty
    return ty


def geodetic_tile_bounds_np(tx, ty_tms, zoom: int, tile_size: int = 256,
                            tmscompatible: bool = True):
    """TileBounds (gdal2tiles.py:598-606): lonlat extent of a TMS tile."""
    res = geodetic_resolution(zoom, tile_size, tmscompatible)
    tx = np.asarray(tx, dtype=np.float64)
    ty = np.asarray(ty_tms, dtype=np.float64)
    return (tx * tile_size * res - 180.0,
            ty * tile_size * res - 90.0,
            (tx + 1) * tile_size * res - 180.0,
            (ty + 1) * tile_size * res - 90.0)
