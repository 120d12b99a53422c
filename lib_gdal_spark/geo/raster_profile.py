"""gdal2tiles' remaining tile schemes: the `raster` profile and the
Zoomify tree.

With the Mercator (geo/mercator.py) and geodetic (geo/geodetic_profile)
profiles these complete gdal2tiles' profile set:

- raster profile (gdal2tiles.py:2518-2591): tiles in NATIVE pixel
  coordinates of an un-reprojected raster. nativezoom =
  max(0, ceil(log2(xsize/ts)), ceil(log2(ysize/ts))); at zoom z the
  tile span is tsize = 2^(nativezoom - z) * ts pixels and the matrix is
  ceil(size/tsize) tiles per axis; rows are TMS (origin bottom-left),
  which on the engine's bottom-up `by` axis is a straight integer
  division — no flip.
- Zoomify (gdal2tiles.py class Zoomify :637-685): halving tiers down
  to one tile, tier sizes recorded top-down, and the flat tile index
  x + y*tier_w + count_up_to_tier that buckets files into
  TileGroup<idx//256> folders.

Pure integer math; the Column forms stay in whole-stage codegen.
"""

from __future__ import annotations

import math

__all__ = ["native_zoom", "raster_tile_np", "raster_tile_cols",
           "zoomify_tiers", "zoomify_tilename"]


def native_zoom(xsize: int, ysize: int, tile_size: int = 256) -> int:
    """gdal2tiles.py:2522: the zoom at which one pixel of the pyramid
    is one pixel of the raster."""
    log2 = lambda v: math.log10(v) / math.log10(2)
    return max(0, int(max(math.ceil(log2(xsize / float(tile_size))),
                          math.ceil(log2(ysize / float(tile_size))))))


def raster_tile_np(bx, by, zoom: int, nativezoom: int,
                   tile_size: int = 256):
    """(bx, by bottom-up) cell -> raster-profile TMS tile at `zoom`."""
    import numpy as np

    tsize = (1 << (nativezoom - zoom)) * tile_size
    bx = np.asarray(bx, dtype=np.int64)
    by = np.asarray(by, dtype=np.int64)
    return bx // tsize, by // tsize


def raster_tile_cols(bx, by, zoom: int, nativezoom: int,
                     tile_size: int = 256):
    """Column twin of raster_tile_np."""
    from pyspark.sql import functions as F

    tsize = (1 << (nativezoom - zoom)) * tile_size
    return (F.floor(bx / F.lit(tsize)).cast("long"),
            F.floor(by / F.lit(tsize)).cast("long"))


def zoomify_tiers(width: int, height: int, tile_size: int = 256):
    """Zoomify.__init__ (gdal2tiles.py:641-675): (tier_sizes_in_tiles,
    tier_image_sizes, tile_count_up_to_tier), tiers listed smallest
    first exactly like the reference."""
    imagesize = (width, height)
    tiles = (math.ceil(width / tile_size), math.ceil(height / tile_size))
    tier_tiles = [tiles]
    tier_sizes = [imagesize]
    while imagesize[0] > tile_size or imagesize[1] > tile_size:
        imagesize = (math.floor(imagesize[0] / 2),
                     math.floor(imagesize[1] / 2))
        tier_tiles.append((math.ceil(imagesize[0] / tile_size),
                           math.ceil(imagesize[1] / tile_size)))
        tier_sizes.append(imagesize)
    tier_tiles.reverse()
    tier_sizes.reverse()
    count_up = [0]
    for tw, th in tier_tiles:
        count_up.append(count_up[-1] + tw * th)
    return tier_tiles, tier_sizes, count_up


def zoomify_tilename(x: int, y: int, z: int, width: int, height: int,
                     tile_size: int = 256, tileformat: str = "jpg") -> str:
    """Zoomify.tilefilename (gdal2tiles.py:678-685): the
    TileGroup<n>/z-x-y.<ext> path. y is the Zoomify top-down row."""
    tier_tiles, _sizes, count_up = zoomify_tiers(width, height, tile_size)
    idx = x + y * tier_tiles[z][0] + count_up[z]
    return f"TileGroup{idx // 256}/{z}-{x}-{y}.{tileformat}"
