"""STACTA (STAC tiled-assets) mosaic source.

Reference semantics (studied, re-expressed — no code copied):
frmts/stacta/stactadataset.cpp — a STAC item with the tiled-assets
extension describes a tile pyramid: `asset_templates.*.href` is a
path template over {TileMatrixSet}/{TileMatrix}/{TileRow}/{TileCol},
`tiles:tile_matrix_sets` embeds the OGC TileMatrixSet (per-level
topLeftCorner, tileWidth/Height, matrixWidth/Height, scaleDenominator
-> pixel size = scaleDenominator * 0.28e-3 / metersPerUnit, with
degree CRSs using the OGC 111319.49... meters-per-degree constant),
and `tiles:tile_matrix_links.limits` bounds the tiles that actually
exist per level. The full-resolution dataset is the HIGHEST level's
limited tile block; lower levels are overviews. Tiles decode through
the engine's own TIFF codec; missing tiles fill with nodata.

The autotest's reference equality (BuildVRT of the level-2 tiles) is
replayed by mosaicking the same two tiles through this reader
(stacta.py::test_stacta_basic's size/geotransform/content checks)."""

from __future__ import annotations

import json
import os

import numpy as np

_DEG_METERS = 111319.490793273667  # OGC TMS meters per degree


def parse_stacta(text: str) -> dict:
    d = json.loads(text)
    props = d.get("properties", {})
    links = props.get("tiles:tile_matrix_links")
    tms_sets = props.get("tiles:tile_matrix_sets")
    templates = d.get("asset_templates")
    if not links or not tms_sets or not templates:
        raise ValueError("not a STACTA item")
    tms_name = sorted(links.keys())[0]
    tms = tms_sets[tms_name]
    limits = {str(k): v for k, v in
              (links[tms_name].get("limits") or {}).items()}
    levels = {}
    for lvl in tms.get("tileMatrix", []):
        levels[str(lvl["identifier"])] = lvl
    tmpl = sorted(templates.keys())[0]
    href = templates[tmpl]["href"]
    return {"tms_name": tms_name, "levels": levels, "limits": limits,
            "href": href, "item": d}


def read_stacta_array(path: str, level: str | None = None):
    """-> (values (bands, h, w) north-up, meta). Mosaics the chosen
    (default: highest) tile-matrix level over its limits."""
    from .tiff import decode_tiff

    meta = parse_stacta(open(path, encoding="utf-8").read())
    base = os.path.dirname(path)
    levels = meta["levels"]
    if level is None:
        level = max(levels, key=lambda k: int(k))
    lvl = levels[level]
    lim = meta["limits"].get(level) or {
        "min_tile_col": 0, "max_tile_col": lvl["matrixWidth"] - 1,
        "min_tile_row": 0, "max_tile_row": lvl["matrixHeight"] - 1}
    tw, th = int(lvl["tileWidth"]), int(lvl["tileHeight"])
    c0, c1 = int(lim["min_tile_col"]), int(lim["max_tile_col"])
    r0, r1 = int(lim["min_tile_row"]), int(lim["max_tile_row"])
    w = (c1 - c0 + 1) * tw
    h = (r1 - r0 + 1) * th
    out = None
    nbands = 1
    for r in range(r0, r1 + 1):
        for c in range(c0, c1 + 1):
            rel = (meta["href"]
                   .replace("{TileMatrixSet}", meta["tms_name"])
                   .replace("{TileMatrix}", level)
                   .replace("{TileRow}", str(r))
                   .replace("{TileCol}", str(c)))
            p = os.path.normpath(os.path.join(base, rel))
            if not os.path.exists(p):
                continue
            arr, _m = decode_tiff(open(p, "rb").read())
            if arr.ndim == 2:
                arr = arr[None]
            if out is None:
                nbands = arr.shape[0]
                out = np.zeros((nbands, h, w), arr.dtype)
            out[:, (r - r0) * th:(r - r0) * th + arr.shape[1],
                (c - c0) * tw:(c - c0) * tw + arr.shape[2]] = arr
    if out is None:
        raise ValueError("no tiles found for STACTA level")
    # geotransform: topLeftCorner + scaleDenominator-derived pixel size
    tlx, tly = lvl["topLeftCorner"]
    crs = (meta["item"]["properties"]["tiles:tile_matrix_sets"]
           [meta["tms_name"]].get("supportedCRS", ""))
    mpu = _DEG_METERS if ("CRS84" in crs or "4326" in crs) else 1.0
    ps = float(lvl["scaleDenominator"]) * 0.28e-3 / mpu
    gt = (float(tlx) + c0 * tw * ps, ps, 0.0,
          float(tly) - r0 * th * ps, 0.0, -ps)
    return out, {"width": w, "height": h, "bands": nbands,
                 "level": level, "gt": gt,
                 "n_levels": len(levels)}


def read_stacta(spark, path: str, band: int = 1,
                level: str | None = None):
    import pandas as pd

    arr, meta = read_stacta_array(path, level)
    vals = arr[band - 1].astype(np.float64)
    h, w = vals.shape
    yy, xx = np.mgrid[0:h, 0:w]
    keep = vals != 0.0  # nodata 0 per the driver default
    pdf = pd.DataFrame({"bx": xx[keep].astype(np.int64),
                        "by": (h - 1 - yy[keep]).astype(np.int64),
                        "value": vals[keep]})
    return (spark.createDataFrame(pdf, "bx long, by long, value double"),
            meta)
