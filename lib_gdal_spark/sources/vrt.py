"""VRT composition: GDAL's virtual-raster XML as a lazy DataFrame plan.

A .vrt file is a logical plan serialized as XML — mosaic windows
(SimpleSource), value-mapped windows (ComplexSource ScaleRatio/
ScaleOffset/NODATA), decimating windows (AveragedSource), and derived
bands combining several sources through a named pixel function
(VRTDerivedRasterBand, frmts/vrt/pixelfunctions.cpp). This module
parses that plan (stdlib ElementTree) and builds the equivalent
DataFrame expression over the engine's cell-grid model: each source is
a windowed/remapped scan of its file through the existing readers, the
band is a union + paint-over aggregate (later sources win, the
VRTSimpleSource compositing order), and a derived band replaces the
paint-over with the pixel function's combiner. Nothing materializes
until an action — exactly the reference's "VRT is a view" semantics
(frmts/vrt/vrtdataset.cpp).

Window semantics replayed from frmts/vrt/vrtsources.cpp:
- SimpleSource nearest scaling uses the RasterIO decimation rule
  iSrc = floor((iDst + 0.5) * src/dst + 1e-10) (gcore/rasterio.cpp) —
  the same rule raster.resize replays checksums 1192/18784 with.
- AveragedSource (vrtsources.cpp VRTAveragedSource::RasterIO): per dst
  pixel the source window is [floor(j*R + 0.5), floor((j+1)*R + 0.5))
  when R >= 1, else the single pixel floor(j*R); nodata excluded from
  the mean; empty window -> absent pixel; Byte output rounds
  floor(v + 0.5) clamped to [0, 255].
- ComplexSource: NODATA filter, then v*ScaleRatio + ScaleOffset
  (vrtsources.cpp ComplexSource linear scaling branch).

Integer-aligned Src/DstRects only; fractional rects (the sub-pixel
GetSrcDstWindow path, vrtsources.cpp:997) raise NotImplementedError —
documented unsupported input, not silent wrong answers.
"""

from __future__ import annotations

import math
import os
import re
import xml.etree.ElementTree as ET

__all__ = ["parse_vrt", "read_vrt", "build_vrt", "PIXEL_FUNCTIONS"]

# real-valued subset of pixelfunctions.cpp:3944-4067 (complex variants
# need a complex cell model this engine does not have)
PIXEL_FUNCTIONS = ("sum", "diff", "mul", "div", "min", "max", "mean",
                   "sqrt", "log10", "exp", "pow", "scale", "expression")


def _rect(el):
    if el is None:
        return None
    vals = [float(el.get(k)) for k in ("xOff", "yOff", "xSize", "ySize")]
    ints = [int(round(v)) for v in vals]
    if any(abs(v - i) > 1e-9 for v, i in zip(vals, ints)):
        raise NotImplementedError(
            "fractional Src/DstRect (sub-pixel GetSrcDstWindow path, "
            "vrtsources.cpp:997) not supported")
    return tuple(ints)


def parse_vrt(path: str) -> dict:
    """Parse a VRTDataset file -> {xsize, ysize, geotransform, bands}."""
    root = ET.parse(path).getroot()
    if root.tag != "VRTDataset":
        raise ValueError(f"not a VRTDataset: {root.tag}")
    out = {"xsize": int(root.get("rasterXSize")),
           "ysize": int(root.get("rasterYSize")),
           "geotransform": None, "bands": []}
    gt = root.find("GeoTransform")
    if gt is not None:
        out["geotransform"] = tuple(
            float(v) for v in gt.text.strip().split(","))
    for bel in root.findall("VRTRasterBand"):
        band = {"band": int(bel.get("band", "1")),
                "dtype": bel.get("dataType", "Byte"),
                "derived": bel.get("subClass") == "VRTDerivedRasterBand",
                "pixel_function": None, "pixel_args": {},
                "nodata": None, "sources": []}
        for tag in ("NoDataValue", "NodataValue"):
            nel = bel.find(tag)
            if nel is not None:
                band["nodata"] = float(nel.text)
        pf = bel.find("PixelFunctionType")
        if pf is not None:
            band["pixel_function"] = pf.text.strip()
        pa = bel.find("PixelFunctionArguments")
        if pa is not None:
            args = {}
            for k, v in pa.attrib.items():
                try:
                    args[k] = float(v)
                except ValueError:
                    args[k] = v
            band["pixel_args"] = args
        for sel in bel:
            if sel.tag not in ("SimpleSource", "ComplexSource",
                               "AveragedSource"):
                continue
            fel = sel.find("SourceFilename")
            fname = fel.text.strip()
            if fel.get("relativeToVRT", "0") == "1":
                fname = os.path.join(os.path.dirname(path), fname)
            sb = sel.find("SourceBand")
            src = {"kind": sel.tag, "filename": fname,
                   "band": int(sb.text) if sb is not None else 1,
                   "src_rect": _rect(sel.find("SrcRect")),
                   "dst_rect": _rect(sel.find("DstRect")),
                   "scale_ratio": 1.0, "scale_offset": 0.0, "nodata": None,
                   "resampling": sel.get("resampling")}
            if sel.tag == "ComplexSource":
                for tag, key in (("ScaleRatio", "scale_ratio"),
                                 ("ScaleOffset", "scale_offset"),
                                 ("NODATA", "nodata")):
                    tel = sel.find(tag)
                    if tel is not None:
                        src[key] = float(tel.text)
            band["sources"].append(src)
        out["bands"].append(band)
    return out


def _read_source(spark, fname: str, band: int):
    """Dispatch on extension to the engine's readers -> (cells topdown
    DataFrame(c, r, value), width, height). c/r are VRT-style top-down
    pixel coordinates."""
    from pyspark.sql import functions as F

    ext = os.path.splitext(fname)[1].lower()
    if ext in (".tif", ".tiff"):
        from .tiff import read_tiff
        cells, meta = read_tiff(spark, fname, band=band)
        w, h = int(meta["width"]), int(meta["height"])
    elif ext == ".png":
        from .png import read_png
        cells, meta = read_png(spark, fname, band=band)
        w, h = int(meta["width"]), int(meta["height"])
    elif ext in (".grd", ".asc"):
        from .aaigrid import read_aaigrid
        cells, meta = read_aaigrid(spark, fname)
        w, h = int(meta["ncols"]), int(meta["nrows"])
    elif ext == ".bmp":
        from .tiff import read_bmp
        cells, meta = read_bmp(spark, fname, band=band)
        w, h = int(meta["width"]), int(meta["height"])
    elif ext == ".vrt":
        cells, meta = read_vrt(spark, fname, band=band)
        w, h = int(meta["xsize"]), int(meta["ysize"])
    else:
        raise NotImplementedError(f"VRT source format {ext}")
    top = cells.select(F.col("bx").alias("c"),
                       (F.lit(h - 1) - F.col("by")).alias("r"), "value")
    return top, w, h


def _remap_source(spark, src: dict, vrt_w: int, vrt_h: int):
    """One source -> DataFrame(c, r, value) in VRT top-down dst pixel
    coordinates, windowed/scaled per the source kind."""
    from pyspark.sql import functions as F

    cells, sw_full, sh_full = _read_source(spark, src["filename"],
                                           src["band"])
    sx0, sy0, sw, sh = src["src_rect"] or (0, 0, sw_full, sh_full)
    dx0, dy0, dw, dh = src["dst_rect"] or (0, 0, vrt_w, vrt_h)
    cells = cells.filter(
        (F.col("c") >= sx0) & (F.col("c") < sx0 + sw) &
        (F.col("r") >= sy0) & (F.col("r") < sy0 + sh))
    if src["nodata"] is not None:
        cells = cells.filter(F.col("value") != F.lit(src["nodata"]))

    if src["kind"] == "AveragedSource":
        rx, ry = sw / dw, sh / dh
        # dst-grid side: per-axis source window via the center rule
        # (VRTAveragedSource::RasterIO); candidate-offset explode keeps
        # the join equi (no range join) — window width <= ceil(R)+1
        grid = spark.range(dw * dh).select(
            (F.col("id") % dw).alias("jx"),
            (F.col("id") / dw).cast("long").alias("jy"))

        def _win(j, ratio, size):
            # [start, end) in rect-relative source pixels
            if ratio >= 1.0:
                start = F.floor(j * ratio + 0.5)
                end = F.floor((j + 1) * ratio + 0.5)
            else:
                start = F.floor(j * ratio)
                end = start + 1
            return start, end

        xs, xe = _win(F.col("jx"), rx, sw)
        ys, ye = _win(F.col("jy"), ry, sh)
        grid = grid.select("jx", "jy", xs.alias("xs"), xe.alias("xe"),
                           ys.alias("ys"), ye.alias("ye"))
        kx = int(math.ceil(max(rx, 1.0))) + 1
        ky = int(math.ceil(max(ry, 1.0))) + 1
        grid = grid.select(
            "jx", "jy", "xs", "ys", "xe", "ye",
            F.explode(F.sequence(F.lit(0), F.lit(kx - 1))).alias("ox"))
        grid = grid.select(
            "jx", "jy", "xs", "ys", "xe", "ye", "ox",
            F.explode(F.sequence(F.lit(0), F.lit(ky - 1))).alias("oy"))
        grid = grid.filter((F.col("xs") + F.col("ox") < F.col("xe")) &
                           (F.col("ys") + F.col("oy") < F.col("ye")))
        grid = grid.select(
            "jx", "jy",
            (F.col("xs") + F.col("ox") + sx0).alias("sc"),
            (F.col("ys") + F.col("oy") + sy0).alias("sr"))
        j = grid.join(cells, (grid.sc == cells.c) & (grid.sr == cells.r))
        avg = j.groupBy("jx", "jy").agg(
            (F.sum(F.col("value").cast("float")) / F.count("*"))
            .cast("float").cast("double").alias("value"))
        return avg.select((F.col("jx") + dx0).alias("c"),
                          (F.col("jy") + dy0).alias("r"),
                          F.col("value"))

    if src["resampling"] not in (None, "", "nearest", "near"):
        # a silently-wrong kernel is worse than a refusal: only the
        # nearest rule (and AveragedSource's mean) are implemented
        raise NotImplementedError(
            f"SimpleSource resampling={src['resampling']!r} "
            "(GDALRasterIOGetResampleAlg path, vrtsources.cpp:1706)")
    if (sw, sh) == (dw, dh):
        out = cells.select((F.col("c") - sx0 + dx0).alias("c"),
                           (F.col("r") - sy0 + dy0).alias("r"), "value")
    else:
        # nearest via the RasterIO decimation rule
        grid = spark.range(dw * dh).select(
            (F.col("id") % dw).alias("jx"),
            (F.col("id") / dw).cast("long").alias("jy"))
        grid = grid.select(
            "jx", "jy",
            (F.floor((F.col("jx") + 0.5) * (sw / dw) + 1e-10) + sx0)
            .alias("sc"),
            (F.floor((F.col("jy") + 0.5) * (sh / dh) + 1e-10) + sy0)
            .alias("sr"))
        j = grid.join(cells, (grid.sc == cells.c) & (grid.sr == cells.r))
        out = j.select((F.col("jx") + dx0).alias("c"),
                       (F.col("jy") + dy0).alias("r"), "value")
    if src["scale_ratio"] != 1.0 or src["scale_offset"] != 0.0:
        out = out.select(
            "c", "r",
            (F.col("value") * F.lit(src["scale_ratio"])
             + F.lit(src["scale_offset"])).alias("value"))
    return out


def _combine_derived(parts, fn: str, args: dict):
    """Pixel-function combiner over tagged source parts."""
    from functools import reduce

    from pyspark.sql import functions as F

    u = reduce(lambda a, b: a.unionByName(b), parts)
    g = u.groupBy("c", "r")
    k = args.get("k")
    if fn == "sum":
        out = g.agg(F.sum("value").alias("value"))
        if k is not None:
            out = out.withColumn("value", F.col("value") + F.lit(k))
    elif fn == "mul":
        # product via sign-aware exp/ln is inexact; pivot the (small,
        # fixed) source count into columns instead
        n = len(parts)
        aggs = [F.max(F.when(F.col("i") == i, F.col("value"))).alias(f"v{i}")
                for i in range(n)]
        out = g.agg(*aggs)
        prod = F.col("v0")
        for i in range(1, n):
            prod = prod * F.col(f"v{i}")
        if k is not None:
            prod = prod * F.lit(k)
        out = out.select("c", "r", prod.alias("value"))
    elif fn in ("diff", "div", "pow"):
        out = g.agg(
            F.max(F.when(F.col("i") == 0, F.col("value"))).alias("a"),
            F.max(F.when(F.col("i") == 1, F.col("value"))).alias("b"))
        expr = {"diff": F.col("a") - F.col("b"),
                "div": F.col("a") / F.col("b"),
                "pow": F.pow(F.col("a"), F.col("b"))}[fn]
        out = out.select("c", "r", expr.alias("value"))
    elif fn in ("min", "max", "mean"):
        agg = {"min": F.min, "max": F.max, "mean": F.avg}[fn]
        out = g.agg(agg("value").alias("value"))
    elif fn in ("sqrt", "log10", "exp"):
        expr = {"sqrt": F.sqrt, "log10": F.log10, "exp": F.exp}[fn]
        out = u.select("c", "r", expr(F.col("value")).alias("value"))
    elif fn == "scale":
        out = u.select(
            "c", "r",
            (F.col("value") * F.lit(args.get("scale", 1.0))
             + F.lit(args.get("offset", 0.0))).alias("value"))
    elif fn == "expression":
        # the muParser 'expression' pixel function
        # (pixelfunctions.cpp:2834): sources pivot into columns, the
        # expression string maps B<k> -> source k and muparser min/max
        # -> SQL least/greatest, then Catalyst evaluates it natively
        # (F.expr — whole-stage codegen, not an interpreter)
        n = len(parts)
        aggs = [F.max(F.when(F.col("i") == i, F.col("value")))
                .alias(f"v{i}") for i in range(n)]
        out = g.agg(*aggs)
        e = str(args.get("expression", ""))
        if not re.fullmatch(r"[A-Za-z0-9_+\-*/%(),.\s<>=!?:]*", e) or not e:
            raise ValueError(f"unsupported expression {e!r}")
        e = re.sub(r"\bB(\d+)\b",
                   lambda m: f"v{int(m.group(1)) - 1}", e)
        e = re.sub(r"\bmin\(", "least(", e)
        e = re.sub(r"\bmax\(", "greatest(", e)
        out = out.select("c", "r", F.expr(e).cast("double").alias("value"))
    else:
        raise NotImplementedError(
            f"pixel function {fn!r} (supported: {PIXEL_FUNCTIONS})")
    return out


def read_vrt(spark, path: str, band: int = 1):
    """VRT file -> (cells DataFrame(bx, by, value), meta). Grid
    convention matches every other source: by increases upward."""
    from functools import reduce

    from pyspark.sql import functions as F

    meta = parse_vrt(path)
    W, H = meta["xsize"], meta["ysize"]
    bdef = next((b for b in meta["bands"] if b["band"] == band), None)
    if bdef is None:
        raise KeyError(f"band {band} not in {path}")

    parts = []
    for i, src in enumerate(bdef["sources"]):
        p = _remap_source(spark, src, W, H).filter(
            (F.col("c") >= 0) & (F.col("c") < W) &
            (F.col("r") >= 0) & (F.col("r") < H))
        parts.append(p.select("c", "r", "value", F.lit(i).alias("i")))
    if not parts:
        empty = spark.createDataFrame([], "bx long, by long, value double")
        return empty, meta

    if bdef["derived"]:
        out = _combine_derived(parts, bdef["pixel_function"],
                               bdef["pixel_args"])
        dtype = bdef["dtype"]
        if dtype == "Float32":
            out = out.withColumn(
                "value", F.col("value").cast("float").cast("double"))
    else:
        u = reduce(lambda a, b: a.unionByName(b), parts)
        out = u.groupBy("c", "r").agg(
            F.max_by(F.col("value"), F.col("i")).alias("value"))
        if bdef["dtype"] == "Byte":
            # Byte write rule (GDALCopyWords round+clamp, applied on
            # every source kind — a ComplexSource with fractional
            # ScaleRatio/ScaleOffset rounds too, not just AveragedSource)
            out = out.withColumn(
                "value", F.least(F.lit(255.0), F.greatest(
                    F.lit(0.0), F.floor(F.col("value") + 0.5))))
    return (out.select(F.col("c").alias("bx"),
                       (F.lit(H - 1) - F.col("r")).alias("by"),
                       F.col("value").cast("double").alias("value")),
            meta)


def _probe(fname: str):
    """(width, height, geotransform) of a raster file, for build_vrt."""
    ext = os.path.splitext(fname)[1].lower()
    if ext in (".tif", ".tiff"):
        from .tiff import decode_tiff
        with open(fname, "rb") as f:
            _arr, meta = decode_tiff(f.read())
        gt = meta.get("geotransform")
        if gt is None:
            raise ValueError(f"{fname} has no geotransform")
        return int(meta["width"]), int(meta["height"]), tuple(gt)
    if ext in (".grd", ".asc"):
        meta = {}
        with open(fname) as f:
            for line in f:
                parts = line.split()
                if len(parts) == 2 and parts[0].lower() in (
                        "ncols", "nrows", "xllcorner", "yllcorner",
                        "cellsize", "xllcenter", "yllcenter", "dx", "dy"):
                    meta[parts[0].lower()] = float(parts[1])
                elif parts:
                    break
        w, h = int(meta["ncols"]), int(meta["nrows"])
        cs = float(meta.get("cellsize", meta.get("dx", 1.0)))
        x0 = float(meta.get("xllcorner",
                            meta.get("xllcenter", cs / 2.0) - cs / 2.0))
        y0 = float(meta.get("yllcorner",
                            meta.get("yllcenter", cs / 2.0) - cs / 2.0))
        return w, h, (x0, cs, 0.0, y0 + h * cs, 0.0, -cs)
    if ext == ".vrt":
        m = parse_vrt(fname)
        if m["geotransform"] is None:
            raise ValueError(f"{fname} has no geotransform")
        return m["xsize"], m["ysize"], m["geotransform"]
    raise NotImplementedError(f"build_vrt probe for {ext}")


def build_vrt(out_path: str, inputs, *, resolution: str = "average",
              src_nodata: float | None = None,
              band_dtype: str = "Float64") -> dict:
    """gdalbuildvrt (apps/gdalbuildvrt_lib.cpp): union-extent mosaic
    VRT over a list of georeferenced rasters.

    `inputs`: filenames (probed), or (filename, (w, h), geotransform)
    tuples. Rules replayed from the reference: extent = union of
    source extents; resolution strategy 'average' (running-mean update,
    :979-990), 'highest' (min pixel size, :1017-1021) or 'lowest';
    raster size = int(0.5 + extent/res) (:1763-1764); per-source
    DstRect positioned by (topleft - min) / res (:146-158). Sources
    whose windows do not land on integer pixels raise — the same
    aligned-only contract read_vrt enforces, checked at BUILD time so
    the failure is immediate.

    Returns the parsed meta of the written file.
    """
    if resolution not in ("average", "highest", "lowest"):
        # validate up front: the per-input loop only reaches the else
        # branch from the second input on, so a single-input call would
        # otherwise silently accept an unknown strategy
        raise ValueError(f"resolution strategy {resolution!r}")
    props = []
    for item in inputs:
        if isinstance(item, str):
            w, h, gt = _probe(item)
            props.append((item, w, h, gt))
        else:
            fname, (w, h), gt = item
            props.append((fname, int(w), int(h), tuple(gt)))
    if not props:
        raise ValueError("no inputs")
    for _f, _w, _h, gt in props:
        if gt[2] != 0.0 or gt[4] != 0.0:
            raise NotImplementedError("rotated sources in build_vrt")

    we_res = ns_res = 0.0
    n_valid = 0
    for i, (_f, _w, _h, gt) in enumerate(props):
        if resolution == "average":
            n_valid += 1
            we_res += (gt[1] - we_res) / n_valid
            ns_res += (gt[5] - ns_res) / n_valid
        elif i == 0:
            we_res, ns_res = gt[1], gt[5]
        elif resolution == "highest":
            we_res = min(we_res, gt[1])
            ns_res = max(ns_res, gt[5])
        elif resolution == "lowest":
            we_res = max(we_res, gt[1])
            ns_res = min(ns_res, gt[5])
        else:
            raise ValueError(f"resolution strategy {resolution!r}")

    min_x = min(gt[0] for _f, _w, _h, gt in props)
    max_y = max(gt[3] for _f, _w, _h, gt in props)
    max_x = max(gt[0] + w * gt[1] for _f, w, _h, gt in props)
    min_y = min(gt[3] + h * gt[5] for _f, _w, h, gt in props)
    xsize = int(0.5 + (max_x - min_x) / we_res)
    ysize = int(0.5 + (max_y - min_y) / -ns_res)

    def _i(v, what):
        r = int(round(v))
        if abs(v - r) > 1e-8:
            raise NotImplementedError(
                f"{what} = {v} not pixel-aligned (fractional windows "
                "need the sub-pixel GetSrcDstWindow path)")
        return r

    srcs = []
    for fname, w, h, gt in props:
        dst_xoff = _i((gt[0] - min_x) / we_res, f"{fname} DstRect xOff")
        dst_yoff = _i((gt[3] - max_y) / ns_res, f"{fname} DstRect yOff")
        dst_w = _i(w * gt[1] / we_res, f"{fname} DstRect xSize")
        dst_h = _i(h * gt[5] / ns_res, f"{fname} DstRect ySize")
        rel = os.path.relpath(fname, os.path.dirname(out_path) or ".")
        tag = "ComplexSource" if src_nodata is not None else "SimpleSource"
        nod = (f"\n      <NODATA>{src_nodata!r}</NODATA>"
               if src_nodata is not None else "")
        srcs.append(f"""    <{tag}>
      <SourceFilename relativeToVRT="1">{rel}</SourceFilename>
      <SourceBand>1</SourceBand>
      <SrcRect xOff="0" yOff="0" xSize="{w}" ySize="{h}"/>
      <DstRect xOff="{dst_xoff}" yOff="{dst_yoff}" xSize="{dst_w}" ySize="{dst_h}"/>{nod}
    </{tag}>""")
    gt_text = ", ".join(repr(float(v)) for v in
                        (min_x, we_res, 0.0, max_y, 0.0, ns_res))
    xml = (f'<VRTDataset rasterXSize="{xsize}" rasterYSize="{ysize}">\n'
           f"  <GeoTransform>{gt_text}</GeoTransform>\n"
           f'  <VRTRasterBand dataType="{band_dtype}" band="1">\n'
           + "\n".join(srcs)
           + "\n  </VRTRasterBand>\n</VRTDataset>\n")
    with open(out_path, "w") as f:
        f.write(xml)
    return parse_vrt(out_path)
