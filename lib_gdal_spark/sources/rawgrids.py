"""Raw binary grid codecs: SRTM HGT, DTED, ESRI EHdr/BIL, ENVI.

Four of the reference's "raw" elevation/grid format drivers re-expressed
as pure-NumPy codecs feeding the engine's (bx, by, value) cell tables:

- SRTM HGT — frmts/srtmhgt/srtmhgtdataset.cpp: header-less big-endian
  grids whose dimensions are DETERMINED BY FILE SIZE (1201x1201 3",
  1801x3601 / 3601x3601 1", 3601x3601x1 SWBD byte masks, 3601x3601x4
  float32 ".hgts", 7201x7201); the SW corner is parsed from the
  FILENAME (N51E013.hgt); geotransform per srtmhgtdataset.cpp:483-488
  (pixel-is-point, hence the half-cell shifts), nodata -32768.
- DTED — frmts/dted/dted_api.c: UHL/DSI/ACC text headers followed by
  COLUMN-major records (bottom-to-top within each column), 16-bit
  SIGN-MAGNITUDE big-endian samples (dted_api.c:639-648 — NOT two's
  complement; the <-16000 mis-generated two's-complement fixup is
  replayed too), a per-column additive checksum, nodata -32767.
- EHdr — frmts/raw/ehdrdataset.cpp: ASCII .hdr sidecar (NROWS/NCOLS/
  NBITS/PIXELTYPE/BYTEORDER/LAYOUT/ULXMAP|XLLCORNER/.../NODATA) over a
  flat BIL/BIP/BSQ body, with the reference's inference ladder
  (negative nodata -> signed int, 4 bytes/pixel -> float32, .flt
  extension -> float32) and its center-vs-corner registration rules
  (ehdrdataset.cpp:1320-1351).
- ENVI — frmts/raw/envidataset.cpp: "ENVI" key=value header (data type
  codes 1/2/3/4/5/12/13/14/15, interleave, byte order, header offset,
  "map info = {proj, refx, refy, mapx, mapy, xdim, ydim, ...}" with the
  rotation/upside-down handling of envidataset.cpp:1355-1374, "data
  ignore value").

Decode/encode are driver-side pure functions over small fixture-scale
rasters (the house convention of sources/tiff.py / png.py); the
distributed face is the (bx, by, value) cell DataFrame every raster
operator consumes — `by` increases UPWARD (raster row 0 = max by) and
nodata cells are ABSENT rows.
"""

from __future__ import annotations

import os
import re
import struct

import numpy as np

HGT_NODATA = -32768.0          # srtmhgtdataset.cpp:29
DTED_NODATA = -32767.0         # dted_api.h:83

# file size -> (nx, ny, dtype); srtmhgtdataset.cpp:332-336 + 440-460
_HGT_SIZES = {
    1201 * 1201 * 2: (1201, 1201, ">i2"),
    1801 * 3601 * 2: (1801, 3601, ">i2"),
    3601 * 3601: (3601, 3601, "u1"),
    3601 * 3601 * 2: (3601, 3601, ">i2"),
    3601 * 3601 * 4: (3601, 3601, ">f4"),
    7201 * 7201 * 2: (7201, 7201, ">i2"),
}


# --------------------------------------------------------------- SRTM HGT

def parse_hgt_name(filename: str) -> tuple[int, int]:
    """N51E013.hgt -> (southwest lat, southwest lon); the reference
    parses positions [0]/[1:3] and [3]/[4:7] case-insensitively
    (srtmhgtdataset.cpp:414-436)."""
    base = os.path.basename(filename)
    if len(base) < 7:
        raise ValueError(f"not an SRTM HGT filename: {base!r}")
    ns, ew = base[0].upper(), base[3].upper()
    if ns not in "NS" or ew not in "EW":
        raise ValueError(f"not an SRTM HGT filename: {base!r}")
    lat = int(base[1:3]) * (1 if ns == "N" else -1)
    lon = int(base[4:7]) * (1 if ew == "E" else -1)
    return lat, lon


def decode_hgt(data: bytes, filename: str):
    """-> (array north-up (ny, nx), meta). Dimensions resolve from the
    byte length alone; unknown sizes are refused exactly like the
    reference's Identify."""
    if len(data) not in _HGT_SIZES:
        raise ValueError(f"not an SRTM HGT payload: {len(data)} bytes")
    nx, ny, dt = _HGT_SIZES[len(data)]
    sw_lat, sw_lon = parse_hgt_name(filename)
    arr = np.frombuffer(data, dtype=np.dtype(dt)).reshape(ny, nx)
    meta = {
        "width": nx, "height": ny,
        # srtmhgtdataset.cpp:483-488 (AREA_OR_POINT=Point)
        "geotransform": (sw_lon - 0.5 / (nx - 1), 1.0 / (nx - 1), 0.0,
                         sw_lat + 1 + 0.5 / (ny - 1), 0.0,
                         -1.0 / (ny - 1)),
        "pixel_is_point": True,
        "nodata": HGT_NODATA if dt == ">i2" else None,
    }
    return arr, meta


def encode_hgt(arr: np.ndarray) -> bytes:
    """North-up (ny, nx) array -> big-endian HGT payload. Dimensions
    must be one of the legal HGT shapes (the writer refuses others,
    srtmhgtdataset.cpp:589-596)."""
    ny, nx = arr.shape
    if arr.dtype.kind == "f":
        dt = ">f4"
    elif arr.dtype == np.uint8:
        dt = "u1"
    else:
        dt = ">i2"
    out = np.ascontiguousarray(arr.astype(np.dtype(dt)))
    if len(out.tobytes()) not in _HGT_SIZES:
        raise ValueError(f"illegal HGT dimensions {nx}x{ny} for {dt}")
    return out.tobytes()


def hgt_filename(sw_lat: int, sw_lon: int, ext: str = ".hgt") -> str:
    return (f"{'N' if sw_lat >= 0 else 'S'}{abs(sw_lat):02d}"
            f"{'E' if sw_lon >= 0 else 'W'}{abs(sw_lon):03d}{ext}")


def read_hgt(spark, path: str):
    """-> (cells DataFrame, meta); nodata cells absent, by bottom-up."""
    with open(path, "rb") as f:
        arr, meta = decode_hgt(f.read(), path)
    return _cells_df(spark, np.asarray(arr, dtype=np.float64),
                     meta.get("nodata")), meta


def write_hgt(cells, path: str, sw_lat: int, sw_lon: int,
              size: int = 1201, dtype: str = "i2") -> str:
    """(bx, by, value) -> <dir>/N..E...hgt; absent cells take nodata."""
    arr = _cells_to_array(cells, size, size,
                          HGT_NODATA if dtype == "i2" else 0.0, dtype)
    name = hgt_filename(sw_lat, sw_lon,
                        ".hgts" if dtype == "f4" else ".hgt")
    out = os.path.join(path, name)
    with open(out, "wb") as f:
        f.write(encode_hgt(arr))
    return out


# ------------------------------------------------------------------ DTED

_DTED_UHL, _DTED_DSI, _DTED_ACC = 80, 648, 2700


def _dms_to_deg(field: bytes) -> float:
    """DDDMMSSH -> signed degrees (dted_api.c:262-311; W and S negate)."""
    deg = int(field[0:3])
    mins = int(field[3:5])
    sec = int(field[5:7])
    val = deg + mins / 60.0 + sec / 3600.0
    hemi = chr(field[7])
    return -val if hemi in "WS" else val, hemi


def decode_dted(data: bytes, verify_checksum: bool = False):
    """-> (array north-up (ny, nx), meta). Column-major records decoded
    per DTEDReadProfileEx: sign-magnitude 16-bit, bottom-to-top within
    each column, with the mis-generated two's-complement fixup."""
    pos = 0
    # skip VOL/HDR records (dted_api.c:135-153)
    while data[pos:pos + 3].upper() in (b"VOL", b"HDR"):
        pos += _DTED_UHL
    uhl = data[pos:pos + _DTED_UHL]
    if uhl[:3].upper() != b"UHL":
        raise ValueError("no UHL record — not a DTED file")
    if uhl[4:5] == b" ":
        raise NotImplementedError(
            "non-89020B DTED variant (blank UHL position 5) is not "
            "supported (dted_api.c:215 bIsWeirdDTED)")
    # 0-based offsets for the 1-based DTEDGetField positions
    lon_origin, lon_h = _dms_to_deg(uhl[4:12])
    lat_origin, lat_h = _dms_to_deg(uhl[12:20])
    psx = int(uhl[20:24]) / 36000.0
    psy = int(uhl[24:28]) / 36000.0
    nx = int(uhl[47:51])
    ny = int(uhl[51:55])
    # MIL-D-89020 pre-Amendment-1 swapped lat/long (dted_api.c:275-311)
    if lon_h in "NS":
        lon_origin, lat_origin = lat_origin, lon_origin
    pos += _DTED_UHL
    if data[pos:pos + 3].upper() != b"DSI":
        raise ValueError("DSI record missing")
    pos += _DTED_DSI
    if data[pos:pos + 3].upper() != b"ACC":
        raise ValueError("ACC record missing")
    pos += _DTED_ACC

    rec_len = 12 + ny * 2
    arr = np.full((ny, nx), DTED_NODATA, dtype=np.int16)
    raw = np.frombuffer(data[pos:pos + rec_len * nx], dtype=np.uint8)
    if raw.size != rec_len * nx:
        raise ValueError("truncated DTED data section")
    rec = raw.reshape(nx, rec_len)
    if not (rec[:, 0] == 0xAA).all():
        raise ValueError("bad data record sentinel (expected 0252)")
    hi = rec[:, 8:8 + ny * 2:2].astype(np.int32)
    lo = rec[:, 9:9 + ny * 2:2].astype(np.int32)
    mag = ((hi & 0x7F) << 8) | lo
    val = np.where(hi & 0x80, -mag, mag)
    # two's-complement mis-generation fixup (dted_api.c:651-660)
    twos = ((hi << 8) | lo).astype(np.int16).astype(np.int32)
    bad = (hi & 0x80).astype(bool) & (val < -16000) & (val != -32767)
    val = np.where(bad, twos, val)
    if verify_checksum:
        sums = rec[:, :8 + ny * 2].astype(np.uint64).sum(axis=1)
        fsum = ((rec[:, -4].astype(np.uint64) << 24)
                | (rec[:, -3].astype(np.uint64) << 16)
                | (rec[:, -2].astype(np.uint64) << 8)
                | rec[:, -1].astype(np.uint64))
        if not (sums == fsum).all():
            raise ValueError("DTED column checksum mismatch")
    # columns run bottom-to-top: sample i of column j is row ny-1-i
    arr[:, :] = val.T[::-1, :]
    meta = {
        "width": nx, "height": ny, "nodata": DTED_NODATA,
        # dted_api.c:316-318
        "geotransform": (lon_origin - 0.5 * psx, psx, 0.0,
                         lat_origin - 0.5 * psy + ny * psy, 0.0, -psy),
        "pixel_is_point": True,
    }
    return arr, meta


def _dms_field(deg: int, width: int) -> bytes:
    hemi = (b"N" if deg >= 0 else b"S") if width == 2 else (
        b"E" if deg >= 0 else b"W")
    return (b"%0*d0000" % (3, abs(deg))) + hemi


def dted_level_size(level: int, ll_lat: int) -> tuple[int, int]:
    """Level 0/1/2 dimensions with the reference's latitude-zone
    longitude thinning (dted_create.c:99-130)."""
    base = {0: 121, 1: 1201, 2: 3601}
    if level not in base:
        raise ValueError(f"illegal DTED level {level}")
    nx = ny = base[level]
    ref = -(ll_lat + 1) if ll_lat < 0 else ll_lat
    if ref >= 80:
        nx = (nx - 1) // 6 + 1
    elif ref >= 75:
        nx = (nx - 1) // 4 + 1
    elif ref >= 70:
        nx = (nx - 1) // 3 + 1
    elif ref >= 50:
        nx = (nx - 1) // 2 + 1
    return nx, ny


def encode_dted(arr: np.ndarray, ll_lat: int, ll_lon: int) -> bytes:
    """North-up int16 (ny, nx) array -> DTED bytes (UHL+DSI+ACC + the
    column records DTEDWriteProfile emits: sign-magnitude samples
    bottom-to-top, additive checksum)."""
    ny, nx = arr.shape
    uhl = bytearray(b" " * _DTED_UHL)
    uhl[0:4] = b"UHL1"
    uhl[4:12] = _dms_field(ll_lon, 3)
    uhl[12:20] = _dms_field(ll_lat, 2)
    uhl[20:24] = b"%04d" % ((3600 // (nx - 1)) * 10)
    uhl[24:28] = b"%04d" % ((3600 // (ny - 1)) * 10)
    uhl[28:32] = b"  NA"
    uhl[32:35] = b"U  "
    uhl[47:51] = b"%04d" % nx
    uhl[51:55] = b"%04d" % ny
    uhl[55:56] = b"0"
    dsi = bytearray(b" " * _DTED_DSI)
    dsi[0:3] = b"DSI"
    dsi[281:285] = b"%04d" % ny
    dsi[285:289] = b"%04d" % nx
    acc = bytearray(b" " * _DTED_ACC)
    acc[0:3] = b"ACC"

    a = np.ascontiguousarray(arr.astype(np.int32))
    out = bytearray(bytes(uhl) + bytes(dsi) + bytes(acc))
    for j in range(nx):
        col = a[::-1, j]  # bottom-to-top
        rec = bytearray(12 + ny * 2)
        rec[0] = 0xAA
        rec[2], rec[3] = j // 256, j % 256
        rec[4], rec[5] = j // 256, j % 256
        mag = np.abs(col).astype(np.uint16)
        hi = ((mag >> 8) & 0x7F).astype(np.uint8) | np.where(
            col < 0, 0x80, 0).astype(np.uint8)
        lo = (mag & 0xFF).astype(np.uint8)
        body = np.empty(ny * 2, dtype=np.uint8)
        body[0::2], body[1::2] = hi, lo
        rec[8:8 + ny * 2] = body.tobytes()
        csum = int(np.asarray(rec[:8 + ny * 2], dtype=np.uint64).sum())
        rec[8 + ny * 2:] = struct.pack(">I", csum & 0xFFFFFFFF)
        out += rec
    return bytes(out)


def read_dted(spark, path: str, verify_checksum: bool = False):
    with open(path, "rb") as f:
        arr, meta = decode_dted(f.read(), verify_checksum)
    return _cells_df(spark, arr.astype(np.float64), meta["nodata"]), meta


def write_dted(cells, path: str, ll_lat: int, ll_lon: int,
               level: int = 0) -> str:
    nx, ny = dted_level_size(level, ll_lat)
    arr = _cells_to_array(cells, nx, ny, DTED_NODATA, "i2")
    out = os.path.join(path, f"dted{level}_{ll_lat}_{ll_lon}.dt{level}")
    with open(out, "wb") as f:
        f.write(encode_dted(arr, ll_lat, ll_lon))
    return out


# ------------------------------------------------------------------ EHdr

def parse_ehdr(text: str) -> dict:
    """Tokenize a .hdr per ehdrdataset.cpp:1017-1091 (case-insensitive
    keys; xllcorner/yllcorner flip the center flag; cellsize sets both
    dims)."""
    h = {"ulxmap": 0.5, "ulymap": 0.5, "xdim": 1.0, "ydim": 1.0,
         "nbands": 1, "nbits": -1, "layout": "BIL", "skipbytes": 0,
         "byteorder": "I", "pixeltype": "N", "nodata": None,
         "center": True, "yll": None}
    for line in text.splitlines():
        toks = line.split()
        if len(toks) < 2:
            continue
        k, v = toks[0].lower(), toks[1]
        if k == "ncols":
            h["ncols"] = int(v)
        elif k == "nrows":
            h["nrows"] = int(v)
        elif k == "skipbytes":
            h["skipbytes"] = int(v)
        elif k in ("ulxmap", "xllcorner", "xllcenter"):
            h["ulxmap"] = float(v)
            if k == "xllcorner":
                h["center"] = False
        elif k == "ulymap":
            h["ulymap"] = float(v)
        elif k in ("yllcorner", "yllcenter"):
            h["yll"] = float(v)
            if k == "yllcorner":
                h["center"] = False
        elif k == "xdim":
            h["xdim"] = float(v)
        elif k == "ydim":
            h["ydim"] = float(v)
        elif k == "cellsize":
            h["xdim"] = h["ydim"] = float(v)
        elif k == "nbands":
            h["nbands"] = int(v)
        elif k == "layout":
            h["layout"] = v.upper()
        elif k in ("nodata_value", "nodata"):
            h["nodata"] = float(v)
        elif k == "nbits":
            h["nbits"] = int(v)
        elif k == "pixeltype":
            h["pixeltype"] = v[0].upper()
        elif k == "byteorder":
            h["byteorder"] = v[0].upper()
    if "ncols" not in h or "nrows" not in h:
        raise ValueError("EHdr header lacks NROWS/NCOLS")
    return h


def _ehdr_dtype(h: dict, data_len: int, flt_ext: bool) -> np.dtype:
    nbits, pt = h["nbits"], h["pixeltype"]
    if nbits == -1 and pt == "N":
        nbytes = data_len // h["ncols"] // h["nrows"] // h["nbands"]
        if 0 < nbytes <= 8 and nbytes != 3:
            nbits = nbytes * 8
        if nbytes == 4:
            pt = "F"
    if pt == "N" and flt_ext:
        pt = "F"
    if h["nodata"] is not None and h["nodata"] < 0 and pt == "N":
        pt = "S"
    order = "<" if h["byteorder"] != "M" else ">"
    if nbits == 16:
        base = "i2" if pt == "S" else "u2"
    elif nbits == 32:
        base = {"S": "i4", "F": "f4"}.get(pt, "u4")
    elif 1 <= nbits <= 8:
        base = "i1" if pt == "S" else "u1"
    elif nbits == -1:
        base = "f4" if pt == "F" else "u1"
    else:
        raise NotImplementedError(f"EHdr NBITS {nbits} unsupported")
    return np.dtype(order + base)


def decode_ehdr(hdr_text: str, data: bytes, flt_ext: bool = False):
    """-> (array (nbands, nrows, ncols) north-up or (nrows, ncols) for
    one band, meta)."""
    h = parse_ehdr(hdr_text)
    nr, nc, nb = h["nrows"], h["ncols"], h["nbands"]
    dt = _ehdr_dtype(h, len(data) - h["skipbytes"], flt_ext)
    body = np.frombuffer(data, dtype=dt, count=nr * nc * nb,
                         offset=h["skipbytes"])
    layout = h["layout"]
    if layout == "BIL":
        arr = body.reshape(nr, nb, nc).transpose(1, 0, 2)
    elif layout == "BIP":
        arr = body.reshape(nr, nc, nb).transpose(2, 0, 1)
    elif layout == "BSQ":
        arr = body.reshape(nb, nr, nc)
    else:
        raise NotImplementedError(f"EHdr LAYOUT {layout}")
    ulx, uly = h["ulxmap"], h["ulymap"]
    if h["yll"] is not None:  # ehdrdataset.cpp:1321-1326
        uly = h["yll"] + (nr - 1 if h["center"] else nr) * h["ydim"]
    if (ulx, uly, h["xdim"], h["ydim"]) != (0.5, 0.5, 1.0, 1.0):
        if h["center"]:
            gt = (ulx - h["xdim"] * 0.5, h["xdim"], 0.0,
                  uly + h["ydim"] * 0.5, 0.0, -h["ydim"])
        else:
            gt = (ulx, h["xdim"], 0.0, uly, 0.0, -h["ydim"])
    else:
        gt = None
    meta = {"width": nc, "height": nr, "bands": nb,
            "nodata": h["nodata"], "geotransform": gt}
    return (arr[0] if nb == 1 else arr), meta


def encode_ehdr(arr: np.ndarray, ulxmap: float | None = None,
                ulymap: float | None = None, xdim: float = 1.0,
                ydim: float = 1.0, nodata: float | None = None,
                layout: str = "BIL") -> tuple[str, bytes]:
    """-> (.hdr text, body bytes); arr is (nrows, ncols) or
    (nbands, nrows, ncols), little-endian body (BYTEORDER I)."""
    a = arr if arr.ndim == 3 else arr[None]
    nb, nr, nc = a.shape
    kind = a.dtype.kind
    nbits = a.dtype.itemsize * 8
    pt = {"f": "FLOAT", "i": "SIGNEDINT", "u": "UNSIGNEDINT"}[kind]
    lines = [f"NROWS {nr}", f"NCOLS {nc}", f"NBANDS {nb}",
             f"NBITS {nbits}", f"PIXELTYPE {pt}", "BYTEORDER I",
             f"LAYOUT {layout}"]
    if ulxmap is not None:
        lines += [f"ULXMAP {ulxmap!r}", f"ULYMAP {ulymap!r}",
                  f"XDIM {xdim!r}", f"YDIM {ydim!r}"]
    if nodata is not None:
        lines.append(f"NODATA {nodata:.8g}")
    body = np.ascontiguousarray(a.astype(a.dtype.newbyteorder("<")))
    if layout == "BIL":
        body = body.transpose(1, 0, 2)
    elif layout == "BIP":
        body = body.transpose(1, 2, 0)
    elif layout != "BSQ":
        raise NotImplementedError(f"EHdr LAYOUT {layout}")
    return "\n".join(lines) + "\n", np.ascontiguousarray(body).tobytes()


def read_ehdr(spark, path: str):
    hdr_path = os.path.splitext(path)[0] + ".hdr"
    with open(hdr_path) as f:
        hdr = f.read()
    with open(path, "rb") as f:
        data = f.read()
    arr, meta = decode_ehdr(hdr, data,
                            flt_ext=path.lower().endswith(".flt"))
    if arr.ndim == 3:
        raise NotImplementedError("read_ehdr: single-band cells only; "
                                  "use decode_ehdr for multi-band")
    return _cells_df(spark, arr.astype(np.float64), meta["nodata"]), meta


def write_ehdr(cells, path: str, width: int, height: int,
               dtype: str = "f4", nodata: float = -9999.0,
               **geo) -> str:
    arr = _cells_to_array(cells, width, height, nodata, dtype)
    hdr, body = encode_ehdr(arr, nodata=nodata, **geo)
    with open(os.path.splitext(path)[0] + ".hdr", "w") as f:
        f.write(hdr)
    with open(path, "wb") as f:
        f.write(body)
    return path


# ------------------------------------------------------------------ ENVI

_ENVI_DTYPES = {1: "u1", 2: "i2", 3: "i4", 4: "f4", 5: "f8",
                12: "u2", 13: "u4", 14: "i8", 15: "u8"}


def parse_envi(text: str) -> dict:
    """'ENVI' + key = value lines; brace values may span lines."""
    if not text.lstrip().startswith("ENVI"):
        raise ValueError("missing ENVI header magic")
    # join continued brace groups
    joined = re.sub(r"\{[^}]*\}", lambda m: m.group(0).replace("\n", " "),
                    text)
    h = {}
    for line in joined.splitlines():
        if "=" not in line:
            continue
        k, v = line.split("=", 1)
        h[k.strip().lower()] = v.strip()
    return h


def decode_envi(hdr_text: str, data: bytes):
    h = parse_envi(hdr_text)
    nc = int(h["samples"])
    nr = int(h["lines"])
    nb = int(h.get("bands", "1"))
    code = int(h.get("data type", "1"))
    if code not in _ENVI_DTYPES:
        raise NotImplementedError(f"ENVI data type {code} unsupported")
    order = ">" if h.get("byte order", "0").strip() == "1" else "<"
    dt = np.dtype(order + _ENVI_DTYPES[code])
    off = int(h.get("header offset", "0"))
    body = np.frombuffer(data, dtype=dt, count=nr * nc * nb, offset=off)
    il = h.get("interleave", "bsq").lower()
    if il == "bil":
        arr = body.reshape(nr, nb, nc).transpose(1, 0, 2)
    elif il == "bip":
        arr = body.reshape(nr, nc, nb).transpose(2, 0, 1)
    elif il == "bsq":
        arr = body.reshape(nb, nr, nc)
    else:
        raise NotImplementedError(f"ENVI interleave {il}")
    gt = None
    if "map info" in h:
        f = [s.strip() for s in h["map info"].strip("{} ").split(",")]
        refx, refy = float(f[1]), float(f[2])
        mapx, mapy = float(f[3]), float(f[4])
        xs, ys = float(f[5]), float(f[6])
        rot_deg = 0.0
        for item in f:
            if item.startswith("rotation="):
                rot_deg = float(item[len("rotation="):])
        # envidataset.cpp:1355-1374
        rot = -rot_deg * np.pi / 180.0
        gt = [mapx - (refx - 1) * xs, np.cos(rot) * xs, -np.sin(rot) * xs,
              mapy + (refy - 1) * ys, -np.sin(rot) * ys, -np.cos(rot) * ys]
        if abs(rot_deg) == 180.0:  # bUpsideDown exactness shortcut
            gt[1:3] = [xs, 0.0]
            gt[4:6] = [0.0, ys]
        gt = tuple(gt)
    nod = h.get("data ignore value")
    meta = {"width": nc, "height": nr, "bands": nb,
            "nodata": float(nod) if nod is not None else None,
            "geotransform": gt}
    return (arr[0] if nb == 1 else arr), meta


def encode_envi(arr: np.ndarray, geotransform=None,
                nodata: float | None = None,
                interleave: str = "bsq") -> tuple[str, bytes]:
    a = arr if arr.ndim == 3 else arr[None]
    nb, nr, nc = a.shape
    code = {np.dtype(k): c for c, k in _ENVI_DTYPES.items()}.get(
        a.dtype.newbyteorder("="))
    if code is None:
        raise NotImplementedError(f"ENVI encode dtype {a.dtype}")
    lines = ["ENVI", f"samples = {nc}", f"lines = {nr}", f"bands = {nb}",
             "header offset = 0", "file type = ENVI Standard",
             f"data type = {code}", f"interleave = {interleave}",
             "byte order = 0"]
    if geotransform is not None:
        g0, g1, _g2, g3, _g4, g5 = geotransform
        lines.append("map info = {Arbitrary, 1, 1, "
                     f"{g0!r}, {g3!r}, {g1!r}, {-g5!r}, units=Meters}}")
    if nodata is not None:
        lines.append(f"data ignore value = {nodata:.17g}")
    body = np.ascontiguousarray(a.astype(a.dtype.newbyteorder("<")))
    if interleave == "bil":
        body = body.transpose(1, 0, 2)
    elif interleave == "bip":
        body = body.transpose(1, 2, 0)
    elif interleave != "bsq":
        raise NotImplementedError(f"ENVI interleave {interleave}")
    return "\n".join(lines) + "\n", np.ascontiguousarray(body).tobytes()


def read_envi(spark, path: str):
    with open(path + ".hdr") as f:
        hdr = f.read()
    with open(path, "rb") as f:
        data = f.read()
    arr, meta = decode_envi(hdr, data)
    if arr.ndim == 3:
        raise NotImplementedError("read_envi: single-band cells only; "
                                  "use decode_envi for multi-band")
    return _cells_df(spark, arr.astype(np.float64), meta["nodata"]), meta


def write_envi(cells, path: str, width: int, height: int,
               dtype: str = "f4", nodata: float = -9999.0,
               geotransform=None, interleave: str = "bsq") -> str:
    arr = _cells_to_array(cells, width, height, nodata, dtype)
    hdr, body = encode_envi(arr, geotransform, nodata, interleave)
    with open(path + ".hdr", "w") as f:
        f.write(hdr)
    with open(path, "wb") as f:
        f.write(body)
    return path


# --------------------------------------------------------------- helpers

def _cells_df(spark, arr: np.ndarray, nodata: float | None):
    """(ny, nx) float array -> (bx, by, value) rows, by bottom-up,
    nodata absent — the same contract as read_tiff/read_aaigrid."""
    h, w = arr.shape
    rows = []
    for r in range(h):
        for c in range(w):
            v = float(arr[r, c])
            if nodata is not None and v == nodata:
                continue
            rows.append((c, h - 1 - r, v))
    return spark.createDataFrame(rows, "bx long, by long, value double")


def _cells_to_array(cells, width: int, height: int, nodata: float,
                    dtype: str) -> np.ndarray:
    got = {(r.bx, r.by): r.value for r in cells.collect()}
    arr = np.full((height, width), nodata, dtype=np.dtype(dtype))
    for (x, y), v in got.items():
        if 0 <= x < width and 0 <= y < height:
            arr[height - 1 - y, x] = v
    return arr


# ------------------------------------------------------------------ BT

def decode_bt(data: bytes):
    """VTP .bt binary terrain (frmts/raw/btdataset.cpp:556-700):
    "binterr1.x" magic, LE cols@10/rows@14, datasize@18 + float
    flag@20 select Int16/Int32/Float32, extents as doubles at
    28/36/44/52, vscale float at 62. Data is COLUMN-major,
    bottom-to-top within each profile (:120-175). -> (top-down
    (rows, cols) float64, meta)."""
    if not data.startswith(b"binterr"):
        raise ValueError("not a .bt file (missing binterr magic)")
    version = data[7:10].decode("ascii", "replace")
    cols, rows = struct.unpack_from("<ii", data, 10)
    (datasize,) = struct.unpack_from("<h", data, 18)
    is_float = data[20] != 0
    if is_float and datasize == 4:
        dt = np.dtype("<f4")
    elif not is_float and datasize == 4:
        dt = np.dtype("<i4")
    elif not is_float and datasize == 2:
        dt = np.dtype("<i2")
    else:
        raise ValueError(f".bt data type unknown (datasize={datasize})")
    hunits, utm_zone, datum = struct.unpack_from("<hhh", data, 22)
    left, right, bottom, top = struct.unpack_from("<4d", data, 28)
    (vscale,) = struct.unpack_from("<f", data, 62)
    body = np.frombuffer(data, dt, cols * rows, 256)
    # columns of bottom-up profiles -> top-down row-major
    arr = body.reshape(cols, rows).T[::-1].astype(np.float64)
    gt = (left, (right - left) / cols, 0.0, top, 0.0,
          -(top - bottom) / rows)
    return arr.copy(), {"version": version, "cols": cols, "rows": rows,
                        "dtype": str(dt), "geotransform": gt,
                        "utm_zone": utm_zone, "datum": datum,
                        "hunits": hunits,
                        "vscale": float(vscale) if vscale else 1.0}


def encode_bt(arr: np.ndarray, geotransform, dtype: str = "<i2",
              datum: int = 6267, utm_zone: int = 0,
              hunits: int = 0) -> bytes:
    """Top-down array -> .bt v1.3 (IWriteBlock's bottom-up column
    profiles; header layout btdataset.cpp:385-540)."""
    dt = np.dtype(dtype)
    rows, cols = arr.shape
    gt = geotransform
    left = gt[0]
    right = gt[0] + gt[1] * cols
    top = gt[3]
    bottom = gt[3] + gt[5] * rows
    hdr = bytearray(256)
    hdr[0:10] = b"binterr1.3"
    struct.pack_into("<ii", hdr, 10, cols, rows)
    struct.pack_into("<h", hdr, 18, dt.itemsize)
    hdr[20] = 1 if dt.kind == "f" else 0
    struct.pack_into("<hhh", hdr, 22, hunits, utm_zone, datum)
    struct.pack_into("<4d", hdr, 28, left, right, bottom, top)
    hdr[60] = 0
    struct.pack_into("<f", hdr, 62, 1.0)
    body = arr[::-1].T.astype(dt).tobytes()  # bottom-up columns
    return bytes(hdr) + body


def read_bt(spark, path: str):
    with open(path, "rb") as f:
        arr, meta = decode_bt(f.read())
    return _cells_df(spark, arr, None), meta


def write_bt(cells, path: str, width: int, height: int,
             geotransform, dtype: str = "<i2") -> str:
    arr = _cells_to_array(cells, width, height, 0.0, "f8")
    with open(path, "wb") as f:
        f.write(encode_bt(arr, geotransform, dtype))
    return path


# ----------------------------------------------------------------- LAN

def decode_lan(data: bytes):
    """Erdas 7.x LAN/GIS (frmts/raw/landataset.cpp:26-82 header doc +
    :354-520 open): "HEADER" (float32 width/height) or "HEAD74"
    (int32), pixel type 0=8bit/1=4bit/2=16bit at 6, band count at 8,
    coord system at 88, UL center + pixel size floats at 112-127;
    byte order inferred from the band-count sanity test (:361-410).
    Data: band-interleaved-by-line after the 128-byte header; 4-bit
    packs two pixels per byte, high nibble first. -> (bands, h, w)
    float64 + meta."""
    if not (data[:6] in (b"HEADER", b"HEAD74")):
        raise ValueError("not an Erdas LAN/GIS file")
    head74 = data[:6] == b"HEAD74"
    for bo in ("<", ">"):
        nbands = struct.unpack_from(bo + "h", data, 8)[0]
        if 0 < nbands < 256:
            break
    ptype = struct.unpack_from(bo + "h", data, 6)[0]
    if head74:
        w, h = struct.unpack_from(bo + "ii", data, 16)
    else:
        wf, hf = struct.unpack_from(bo + "ff", data, 16)
        w, h = int(wf), int(hf)
    coord_sys = struct.unpack_from(bo + "h", data, 88)[0]
    ulx, uly, dx, dy = struct.unpack_from(bo + "4f", data, 112)
    if ptype == 0:
        px = 1
        dt = np.uint8
    elif ptype == 2:
        px = 2
        dt = np.dtype(bo + "i2")
    elif ptype == 1:
        px = -1  # 4-bit
        dt = np.uint8
    else:
        raise ValueError(f"LAN pixel type {ptype} unsupported")
    bands = np.empty((nbands, h, w), dtype=np.float64)
    if px == -1:
        line_bytes = (w + 1) // 2
        for b in range(nbands):
            for r in range(h):
                off = 128 + (r * nbands + b) * line_bytes
                packed = np.frombuffer(data, np.uint8, line_bytes, off)
                nib = np.empty(line_bytes * 2, np.uint8)
                nib[0::2] = packed >> 4
                nib[1::2] = packed & 0x0F
                bands[b, r] = nib[:w]
    else:
        line = w * px
        for b in range(nbands):
            for r in range(h):
                off = 128 + (r * nbands + b) * line
                bands[b, r] = np.frombuffer(data, dt, w, off)
    gt = (float(ulx) - float(dx) / 2, float(dx), 0.0,
          float(uly) + float(dy) / 2, 0.0, -float(dy))
    return bands, {"bands": nbands, "width": w, "height": h,
                   "pixel_type": ptype, "coord_system": coord_sys,
                   "geotransform": gt, "head74": head74}


def read_lan(spark, path: str, band: int = 1):
    with open(path, "rb") as f:
        bands, meta = decode_lan(f.read())
    return _cells_df(spark, bands[band - 1], None), meta
