"""RRASTER, SAGA, Idrisi RST, SIGDEM and NSIDC sea-ice grid codecs.

Five more of the reference's single-file grid drivers re-expressed as
pure-NumPy codecs feeding the engine's (bx, by, value) cell tables:

- RRASTER — frmts/raw/rrasterdataset.cpp: R `raster` package native
  format; ASCII .grd key=value header ([georeference]/[data] sections)
  over a raw .gri body. datatype codes INT1S/INT1U/INT2S/INT2U/INT4S/
  INT4U/FLT4S/FLT8S (rrasterdataset.cpp:523-531), byteorder
  little/big, bandorder BIL/BIP/BSQ, rows top-down; geotransform from
  the xmin/xmax/ymin/ymax edges over nrows/ncols
  (rrasterdataset.cpp:1220-1225).
- SAGA — frmts/saga/sagadataset.cpp: ASCII .sgrd header + raw .sdat
  body stored BOTTOM-UP (IReadBlock seeks nRows-1-y,
  sagadataset.cpp:198); TOPTOBOTTOM=TRUE is refused exactly like the
  reference (:549-553). POSITION_XMIN/_YMIN are CELL CENTERS (half-cell
  shifts into the geotransform); per-type default nodata table
  (sagadataset.cpp:34-40).
- Idrisi RST — frmts/idrisi/IdrisiDataset.cpp: .rdc "key : value"
  ASCII sidecar; data types byte / integer (Int16 LE) / real
  (Float32 LE) / rgb24 (BGR triplets, band j reads offset 3-nBand,
  IdrisiDataset.cpp IReadBlock); rows top-down; geotransform from
  min./max. X/Y scaled by "unit dist." (IdrisiDataset.cpp:668-700);
  "flag value : none" = no nodata.
- SIGDEM — frmts/sigdem/sigdemdataset.cpp: "SIGDEM" magic + 132-byte
  big-endian header (Read() offsets sigdemdataset.cpp:442-465), Int32
  big-endian scaled cells stored BOTTOM-UP (IReadBlock block index
  nRows-1-y), value = offsetZ + n/scaleFactorZ, NO_DATA 0x80000000
  surfaces as -9999 (sigdemdataset.cpp:57,576-583).
- NSIDC bin — frmts/raw/nsidcbindataset.cpp: 300-byte header of
  6-char fields (columns at [6:12], rows at [12:18]), one-byte sea-ice
  concentration cells; ANTARCTIC at [230] selects the southern polar
  stereographic grid (gt -3950000/4350000, EPSG:3976) vs the northern
  (-3837500/5837500, EPSG:3413), both 25 km (nsidcbindataset.cpp:
  326-347). Read-only, like the reference.

Decode/encode are driver-side pure functions over fixture-scale rasters
(the sources/ house convention); the distributed face is the
(bx, by, value) cell DataFrame — `by` increases UPWARD and nodata cells
are ABSENT rows.
"""

from __future__ import annotations

import os
import struct

import numpy as np

# ------------------------------------------------------------------ RRASTER

_RR_DTYPES = {
    "INT1S": "i1", "INT1U": "u1", "INT2S": "i2", "INT2U": "u2",
    "INT4S": "i4", "INT4U": "u4", "FLT4S": "f4", "FLT8S": "f8",
}


def parse_rraster_grd(text: str) -> dict:
    """.grd INI-ish header -> flat {key: value} (sections carry no
    information the reference uses; keys are unique across them)."""
    kv = {}
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("["):
            continue
        if "=" in line:
            k, v = line.split("=", 1)
            kv[k.strip().lower()] = v.strip()
    return kv


def decode_rraster(grd_text: str, raw: bytes):
    """-> (values (bands, h, w) float64 north-up, meta). Rows are
    top-down in the file; BIL/BIP/BSQ interleaves all land in band-major
    memory order here."""
    h = parse_rraster_grd(grd_text)
    nrows, ncols = int(h["nrows"]), int(h["ncols"])
    nbands = int(h.get("nbands", "1"))
    code = h.get("datatype", "FLT8S").upper()
    if code not in _RR_DTYPES:
        raise ValueError(f"unsupported RRASTER datatype {code!r}")
    order = "<" if h.get("byteorder", "little").lower() == "little" else ">"
    dt = np.dtype(order + _RR_DTYPES[code])
    n = nrows * ncols * nbands
    arr = np.frombuffer(raw, dt, count=n).astype(np.float64)
    bo = h.get("bandorder", "BIL").upper()
    if bo == "BIL":
        arr = arr.reshape(nrows, nbands, ncols).transpose(1, 0, 2)
    elif bo == "BIP":
        arr = arr.reshape(nrows, ncols, nbands).transpose(2, 0, 1)
    elif bo == "BSQ":
        arr = arr.reshape(nbands, nrows, ncols)
    else:
        raise ValueError(f"unsupported RRASTER bandorder {bo!r}")
    xmin, xmax = float(h["xmin"]), float(h["xmax"])
    ymin, ymax = float(h["ymin"]), float(h["ymax"])
    gt = (xmin, (xmax - xmin) / ncols, 0.0, ymax, 0.0,
          -(ymax - ymin) / nrows)
    nd = h.get("nodatavalue")
    nodata = None
    if nd is not None and nd.lower() not in ("na", "nan"):
        nodata = float(nd)
    meta = {"width": ncols, "height": nrows, "bands": nbands, "gt": gt,
            "nodata": nodata, "datatype": code,
            "layername": h.get("layername")}
    return arr, meta


def encode_rraster(arr: np.ndarray, gt, nodata: float | None = None,
                   datatype: str = "FLT8S", layername: str = "layer"):
    """-> (grd_text, raw BIL little-endian). Field order mirrors the
    reference writer (rrasterdataset.cpp:750-770)."""
    if arr.ndim == 2:
        arr = arr[None, :, :]
    nbands, nrows, ncols = arr.shape
    if datatype not in _RR_DTYPES:
        raise ValueError(f"unsupported RRASTER datatype {datatype!r}")
    dt = np.dtype("<" + _RR_DTYPES[datatype])
    body = arr.transpose(1, 0, 2).astype(dt).tobytes()
    lines = ["[general]", "creator=lib_gdal_spark", "[georeference]",
             f"nrows={nrows}", f"ncols={ncols}",
             f"xmin={gt[0]:.17g}",
             f"ymin={gt[3] + nrows * gt[5]:.17g}",
             f"xmax={gt[0] + ncols * gt[1]:.17g}",
             f"ymax={gt[3]:.17g}",
             "[data]", f"datatype={datatype}", "byteorder=little",
             f"nbands={nbands}", "bandorder=BIL"]
    if nodata is not None:
        lines.append(f"nodatavalue={nodata:.17g}")
    lines += ["[description]", f"layername={layername}"]
    return "\n".join(lines) + "\n", body


def read_rraster(spark, path: str, band: int = 1):
    """Single-band spark face -> ((bx, by, value) DataFrame, meta)."""
    grd = open(path, encoding="latin-1").read()
    gri = os.path.splitext(path)[0] + ".gri"
    arr, meta = decode_rraster(grd, open(gri, "rb").read())
    vals = arr[band - 1]
    if meta["nodata"] is not None:
        vals = np.where(vals == meta["nodata"], np.nan, vals)
    return _cells_df(spark, vals), meta


def write_rraster(cells, path: str, width: int, height: int, gt,
                  nodata: float = -9999.0, datatype: str = "FLT8S") -> str:
    vals = _cells_to_array(cells, width, height, nodata)
    grd, body = encode_rraster(vals, gt, nodata=nodata, datatype=datatype)
    open(path, "w").write(grd)
    open(os.path.splitext(path)[0] + ".gri", "wb").write(body)
    return path


# -------------------------------------------------------------------- SAGA

_SAGA_DTYPES = {
    "BYTE": ("u1", 255.0), "BYTE_UNSIGNED": ("u1", 255.0),
    "SHORTINT_UNSIGNED": ("<u2", 65535.0), "SHORTINT": ("<i2", -32767.0),
    "INTEGER_UNSIGNED": ("<u4", 4294967295.0),
    "INTEGER": ("<i4", -2147483647.0),
    "FLOAT": ("<f4", -99999.0), "DOUBLE": ("<f8", -99999.0),
}


def parse_sgrd(text: str) -> dict:
    kv = {}
    for line in text.splitlines():
        if "=" in line:
            k, v = line.split("=", 1)
            kv[k.strip().upper()] = v.strip()
    return kv


def decode_saga(sgrd_text: str, sdat: bytes):
    """-> (values (h, w) float64 NORTH-UP, meta). The body is stored
    bottom-up (TOPTOBOTTOM=FALSE); TRUE is refused like the
    reference (sagadataset.cpp:549)."""
    h = parse_sgrd(sgrd_text)
    if h.get("TOPTOBOTTOM", "FALSE").upper().startswith("TRUE"):
        raise ValueError("SAGA grids written TOPTOBOTTOM are unsupported")
    fmt = h.get("DATAFORMAT", "DOUBLE").upper()
    if fmt not in _SAGA_DTYPES:
        raise ValueError(f"unsupported SAGA DATAFORMAT {fmt!r}")
    dts, _dflt_nd = _SAGA_DTYPES[fmt]
    dt = np.dtype(dts)
    if h.get("BYTEORDER_BIG", "FALSE").upper().startswith("TRUE"):
        dt = dt.newbyteorder(">")
    w = int(h["CELLCOUNT_X"])
    ht = int(h["CELLCOUNT_Y"])
    off = int(h.get("DATAFILE_OFFSET", "0"))
    vals = np.frombuffer(sdat, dt, count=w * ht, offset=off) \
        .astype(np.float64).reshape(ht, w)[::-1]
    z = float(h.get("Z_FACTOR", "1"))
    if z != 1.0:
        vals = vals * z
    cs = float(h["CELLSIZE"])
    xmin = float(h["POSITION_XMIN"])  # cell CENTER
    ymin = float(h["POSITION_YMIN"])
    gt = (xmin - cs / 2.0, cs, 0.0,
          ymin + cs * (ht - 1) + cs / 2.0, 0.0, -cs)
    nodata = float(h["NODATA_VALUE"]) if "NODATA_VALUE" in h else None
    return vals, {"width": w, "height": ht, "gt": gt, "nodata": nodata,
                  "dataformat": fmt, "name": h.get("NAME", "")}


def encode_saga(vals: np.ndarray, gt, nodata: float = -99999.0,
                dataformat: str = "FLOAT", name: str = "grid"):
    """-> (sgrd_text, sdat bottom-up little-endian)."""
    if dataformat not in _SAGA_DTYPES:
        raise ValueError(f"unsupported SAGA DATAFORMAT {dataformat!r}")
    ht, w = vals.shape
    dts, _ = _SAGA_DTYPES[dataformat]
    body = vals[::-1].astype(np.dtype(dts)).tobytes()
    cs = float(gt[1])
    sgrd = "\n".join([
        f"NAME\t= {name}", "DESCRIPTION\t= ", "UNIT\t= ",
        "DATAFILE_OFFSET\t= 0", f"DATAFORMAT\t= {dataformat}",
        "BYTEORDER_BIG\t= FALSE",
        f"POSITION_XMIN\t= {gt[0] + cs / 2.0:.10f}",
        f"POSITION_YMIN\t= {gt[3] + gt[5] * vals.shape[0] - gt[5] / 2.0:.10f}",
        f"CELLCOUNT_X\t= {w}", f"CELLCOUNT_Y\t= {ht}",
        f"CELLSIZE\t= {cs:.10f}", "Z_FACTOR\t= 1.000000",
        f"NODATA_VALUE\t= {nodata:.6f}", "TOPTOBOTTOM\t= FALSE"]) + "\n"
    return sgrd, body


def read_saga(spark, path: str):
    sgrd = os.path.splitext(path)[0] + ".sgrd"
    vals, meta = decode_saga(open(sgrd, encoding="latin-1").read(),
                             open(path, "rb").read())
    if meta["nodata"] is not None:
        vals = np.where(vals == meta["nodata"], np.nan, vals)
    return _cells_df(spark, vals), meta


def write_saga(cells, path: str, width: int, height: int, gt,
               nodata: float = -99999.0, dataformat: str = "FLOAT") -> str:
    vals = _cells_to_array(cells, width, height, nodata)
    sgrd, body = encode_saga(vals, gt, nodata=nodata,
                             dataformat=dataformat)
    open(os.path.splitext(path)[0] + ".sgrd", "w").write(sgrd)
    open(path, "wb").write(body)
    return path


# -------------------------------------------------------------- Idrisi RST

_RST_DTYPES = {"byte": ("u1", 1), "integer": ("<i2", 1),
               "real": ("<f4", 1), "rgb24": ("u1", 3)}


def parse_rdc(text: str) -> dict:
    kv = {}
    for line in text.splitlines():
        if ":" in line:
            k, v = line.split(":", 1)
            kv[k.strip().lower()] = v.strip()
    return kv


def decode_rst(rdc_text: str, raw: bytes):
    """-> (values float64 north-up — (h, w), or (3, h, w) RGB for
    rgb24 whose file triplets are BGR — and meta). Rows are
    top-down."""
    h = parse_rdc(rdc_text)
    w = int(h["columns"])
    ht = int(h["rows"])
    dtyp = h["data type"].lower()
    if dtyp not in _RST_DTYPES:
        raise ValueError(f"unsupported RST data type {dtyp!r}")
    dts, spp = _RST_DTYPES[dtyp]
    arr = np.frombuffer(raw, np.dtype(dts), count=w * ht * spp) \
        .astype(np.float64)
    if spp == 3:
        vals = arr.reshape(ht, w, 3)[:, :, ::-1].transpose(2, 0, 1)
    else:
        vals = arr.reshape(ht, w)
    unit = float(h.get("unit dist.", "1") or 1)
    xmin = float(h["min. x"]) * unit
    xmax = float(h["max. x"]) * unit
    ymin = float(h["min. y"]) * unit
    ymax = float(h["max. y"]) * unit
    gt = (xmin, (xmax - xmin) / w, 0.0, ymax, 0.0, (ymin - ymax) / ht)
    flag = h.get("flag value", "none")
    nodata = None if flag.lower() in ("none", "") else float(flag)
    return vals, {"width": w, "height": ht, "gt": gt, "nodata": nodata,
                  "data_type": dtyp}


def encode_rst(vals: np.ndarray, gt, nodata: float | None = None,
               data_type: str = "real", title: str = "grid"):
    """-> (rdc_text, raw). The .rdc mirrors the reference's field set
    (IdrisiDataset.cpp rdc* keys)."""
    if data_type not in ("byte", "integer", "real"):
        raise ValueError(f"unsupported RST data type {data_type!r}")
    ht, w = vals.shape
    dts, _ = _RST_DTYPES[data_type]
    body = vals.astype(np.dtype(dts)).tobytes()
    finite = vals[np.isfinite(vals)]
    vmin = float(finite.min()) if finite.size else 0.0
    vmax = float(finite.max()) if finite.size else 0.0
    flag = "none" if nodata is None else f"{nodata:g}"
    rdc = "\n".join([
        "file format : IDRISI Raster A.1",
        f"file title  : {title}",
        f"data type   : {data_type}",
        "file type   : binary",
        f"columns     : {w}",
        f"rows        : {ht}",
        "ref. system : plane",
        "ref. units  : m",
        "unit dist.  : 1.0000000",
        f"min. X      : {gt[0]:.7f}",
        f"max. X      : {gt[0] + w * gt[1]:.7f}",
        f"min. Y      : {gt[3] + ht * gt[5]:.7f}",
        f"max. Y      : {gt[3]:.7f}",
        "pos`n error : unknown",
        "resolution  : unknown",
        f"min. value  : {vmin:g}",
        f"max. value  : {vmax:g}",
        f"display min : {vmin:g}",
        f"display max : {vmax:g}",
        "value units : unspecified",
        "value error : unknown",
        f"flag value  : {flag}",
        "flag def`n  : none" if nodata is None else "flag def`n  : missing data",
        "legend cats : 0"]) + "\n"
    return rdc, body


def read_rst(spark, path: str, band: int = 1):
    rdc = os.path.splitext(path)[0] + ".rdc"
    vals, meta = decode_rst(open(rdc, encoding="latin-1").read(),
                            open(path, "rb").read())
    if vals.ndim == 3:
        vals = vals[band - 1]
    if meta["nodata"] is not None:
        vals = np.where(vals == meta["nodata"], np.nan, vals)
    return _cells_df(spark, vals), meta


def write_rst(cells, path: str, width: int, height: int, gt,
              nodata: float | None = None, data_type: str = "real") -> str:
    fill = nodata if nodata is not None else 0.0
    vals = _cells_to_array(cells, width, height, fill)
    rdc, body = encode_rst(vals, gt, nodata=nodata, data_type=data_type)
    open(os.path.splitext(path)[0] + ".rdc", "w").write(rdc)
    open(path, "wb").write(body)
    return path


# ------------------------------------------------------------------ SIGDEM

SIGDEM_NO_DATA = -0x80000000  # sigdemdataset.cpp:57 (int32 0x80000000)
_SIGDEM_HEADER = 132


def decode_sigdem(data: bytes):
    """-> (values (h, w) float64 NORTH-UP, NaN where NO_DATA, meta).
    Header layout per SIGDEMHeader::Read (sigdemdataset.cpp:442-465,
    all fields big-endian); rows are stored BOTTOM-UP."""
    if data[:6] != b"SIGDEM":
        raise ValueError("not a SIGDEM payload")
    (version, csid, offx, sclx, offy, scly, offz, sclz,
     minx, miny, minz, maxx, maxy, maxz, ncols, nrows,
     xdim, ydim) = struct.unpack(">hi12d2i2d", data[6:_SIGDEM_HEADER])
    n = ncols * nrows
    cells = np.frombuffer(data, ">i4", count=n, offset=_SIGDEM_HEADER) \
        .reshape(nrows, ncols)[::-1]
    inv = (1.0 / sclz) if sclz != 0.0 else 0.0
    vals = offz + cells * inv
    vals[cells == SIGDEM_NO_DATA] = np.nan
    gt = (minx, xdim, 0.0, maxy, 0.0, -ydim)
    return vals, {"width": int(ncols), "height": int(nrows), "gt": gt,
                  "version": int(version), "epsg": int(csid),
                  "scale_z": sclz, "offset_z": offz,
                  "min_z": minz, "max_z": maxz}


def encode_sigdem(vals: np.ndarray, gt, epsg: int = 0,
                  scale_z: float = 1000.0) -> bytes:
    """CreateCopy semantics (sigdemdataset.cpp:163-231): offsets X/Y =
    min corner, Z offset 0, NaN cells -> NO_DATA, cell = round(v *
    scale_z), rows written bottom-up."""
    nrows, ncols = vals.shape
    minx, maxy = float(gt[0]), float(gt[3])
    xdim, ydim = float(gt[1]), -float(gt[5])
    maxx = minx + ncols * xdim
    miny = maxy - nrows * ydim
    finite = vals[np.isfinite(vals)]
    minz = float(finite.min()) if finite.size else -10000.0
    maxz = float(finite.max()) if finite.size else 10000.0
    hdr = b"SIGDEM" + struct.pack(
        ">hi12d2i2d", 1, epsg, minx, 1000.0, miny, 1000.0, 0.0, scale_z,
        minx, miny, minz, maxx, maxy, maxz, ncols, nrows, xdim, ydim)
    cells = np.where(np.isfinite(vals),
                     np.floor(vals * scale_z + 0.5), SIGDEM_NO_DATA) \
        .astype(np.int64).astype(np.int32)
    return hdr + cells[::-1].astype(">i4").tobytes()


def read_sigdem(spark, path: str):
    vals, meta = decode_sigdem(open(path, "rb").read())
    return _cells_df(spark, vals), meta


def write_sigdem(cells, path: str, width: int, height: int, gt,
                 scale_z: float = 1000.0) -> str:
    vals = _cells_to_array(cells, width, height, np.nan)
    open(path, "wb").write(encode_sigdem(vals, gt, scale_z=scale_z))
    return path


# --------------------------------------------------------------- NSIDC bin

NSIDC_SOUTH_GT = (-3950000.0, 25000.0, 0.0, 4350000.0, 0.0, -25000.0)
NSIDC_NORTH_GT = (-3837500.0, 25000.0, 0.0, 5837500.0, 0.0, -25000.0)


def decode_nsidcbin(data: bytes):
    """-> (values (h, w) float64 top-down=north-up, meta). 300-byte
    header of 6-char fields; read-only like the reference."""
    if len(data) < 300:
        raise ValueError("not an NSIDC bin payload")
    def fld(a, b):
        return data[a:b].decode("ascii", "replace").strip("\x00 \t")

    cols = int(fld(6, 12) or 0)
    rows = int(fld(12, 18) or 0)
    if cols not in (304, 316):
        raise ValueError(f"unexpected NSIDC grid width {cols}")
    south = data[230:239] == b"ANTARCTIC"
    vals = np.frombuffer(data, np.uint8, count=cols * rows, offset=300) \
        .astype(np.float64).reshape(rows, cols)
    meta = {"width": cols, "height": rows, "south": bool(south),
            "gt": NSIDC_SOUTH_GT if south else NSIDC_NORTH_GT,
            "epsg": 3976 if south else 3413,
            "instrument": fld(54, 60),
            "year": fld(102, 108), "julian_day": fld(108, 114)}
    return vals, meta


def read_nsidcbin(spark, path: str):
    vals, meta = decode_nsidcbin(open(path, "rb").read())
    return _cells_df(spark, vals), meta


# ----------------------------------------------------------------- helpers

def _cells_df(spark, vals: np.ndarray):
    """(h, w) north-up array -> (bx, by, value) DataFrame; NaN cells
    are absent rows, `by` increases upward (row 0 = by h-1)."""
    import pandas as pd

    h, w = vals.shape
    yy, xx = np.mgrid[0:h, 0:w]
    keep = np.isfinite(vals)
    pdf = pd.DataFrame({
        "bx": xx[keep].astype(np.int64),
        "by": (h - 1 - yy[keep]).astype(np.int64),
        "value": vals[keep].astype(np.float64)})
    return spark.createDataFrame(pdf, "bx long, by long, value double")


def _cells_to_array(cells, width: int, height: int, fill) -> np.ndarray:
    rows = cells.select("bx", "by", "value").collect()
    vals = np.full((height, width), fill, np.float64)
    for r in rows:
        vals[height - 1 - int(r["by"]), int(r["bx"])] = float(r["value"])
    return vals


# ----------------------------------------------------------- PCRaster CSF

_CSF_SIG = b"RUU CROSS SYSTEM MAP FORMAT"
_CSF_CR = {0x00: "u1", 0x04: "i1", 0x11: "u2", 0x15: "i2",
           0x22: "u4", 0x26: "i4", 0x5A: "f4", 0xDB: "f8"}
_CSF_MV = {0x00: 255, 0x04: -128, 0x11: 65535, 0x15: -32768,
           0x22: 4294967295, 0x26: -2147483648}
_CSF_VS = {0xE0: "boolean", 0xE2: "nominal", 0xF2: "ordinal",
           0xEB: "scalar", 0xFB: "direction", 0xF0: "ldd",
           0: "notdetermined", 1: "classified", 2: "continuous"}


def decode_csf(data: bytes):
    """PCRaster CSF 2.0 (frmts/pcraster/libcsf): 64-byte main header
    ("RUU CROSS SYSTEM MAP FORMAT" signature, csfimpl.h layout), raster
    header at 64 (valueScale/cellRepr/min/max/xUL/yUL/rows/cols/
    cellSize/angle), cells at 256 row-major top-down. Missing values
    per csftypes.h MV_* (REAL4/8 use all-ones NaN patterns).

    -> (values (h, w) float64 north-up with NaN at MV, meta)."""
    if data[:27] != _CSF_SIG:
        raise ValueError("not a PCRaster CSF payload")
    import struct as _st

    byte_order = _st.unpack_from("<I", data, 46)[0]
    end = "<" if byte_order == 1 else ">"
    (value_scale, cell_repr) = _st.unpack_from(end + "2H", data, 64)
    xul, yul = _st.unpack_from(end + "2d", data, 84)
    nrows, ncols = _st.unpack_from(end + "2I", data, 100)
    cell_size, _dup, angle = _st.unpack_from(end + "3d", data, 108)
    if cell_repr not in _CSF_CR:
        raise ValueError(f"unsupported CSF cell representation "
                         f"{cell_repr:#x}")
    dt = np.dtype(end + _CSF_CR[cell_repr])
    vals = np.frombuffer(data, dt, count=nrows * ncols, offset=256) \
        .astype(np.float64).reshape(nrows, ncols)
    if cell_repr in _CSF_MV:
        vals = np.where(vals == _CSF_MV[cell_repr], np.nan, vals)
    # REAL4/REAL8 MV is the all-ones bit pattern = NaN already
    gt = (xul, cell_size, 0.0, yul, 0.0, -cell_size)
    return vals, {"width": int(ncols), "height": int(nrows), "gt": gt,
                  "angle": angle,
                  "value_scale": _CSF_VS.get(value_scale, "undefined"),
                  "cell_repr": int(cell_repr),
                  "nodata": _CSF_MV.get(cell_repr)}


def read_csf(spark, path: str):
    vals, meta = decode_csf(open(path, "rb").read())
    return _cells_df(spark, vals), meta
