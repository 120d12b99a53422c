"""Raster Matrix Format (Panorama GIS .rsw / .mtw) codec.

Reference: frmts/rmf/ —
- 320-byte header (rmfdataset.cpp:1357-1416 field offsets), signature
  "RSW\\0" (LE), "\\0WSR" (big-endian RSW) or "MTW\\0"; version 0x201
  (HUGE) scales every file offset by 256 (:2436-2444).
- Tile table of (offset, size) uint32 pairs; tiles are row-major,
  edge tiles clipped by nLastTileWidth/Height; offset 0 = null tile
  filled with dfNoData (:3182-3186).
- RSW bit depths: 8 (palette, 1 band) / 24 / 32 (pixel-interleaved
  B,G,R[,A] — band 1 reads component nBands-nBand, :275-287) /
  16 (5-5-5 packed, :289-330) / 4 / 1 (packed, low nibble first /
  MSB first); MTW: Int16/Int32/Float64 elevation.
- LZW (rmflzw.cpp): 12-bit codes that ARE mid-square hash-table
  slots — the table is rebuilt on both sides with the identical hash
  walk (insertion from +101 on collision), codes packed two per 3
  bytes.
- DEM delta compression (rmfdem.cpp): (type|count) records of
  4/8/12/16/24/32-bit differences against the running value with
  out-of-range sentinels; Int32 work stream.
- Geotransform (:1933-1937): gt = (dfLLX, pixel, 0, dfLLY +
  height*pixel, 0, -pixel).
"""

from __future__ import annotations

import struct

import numpy as np

COMPRESSION_NONE = 0
COMPRESSION_LZW = 1
COMPRESSION_JPEG = 2
COMPRESSION_DEM = 32

_HDR_FIELDS = [
    # (name, offset, fmt) per rmfdataset.cpp:1357-1416
    ("iVersion", 4, "I"), ("nSize", 8, "I"), ("nOvrOffset", 12, "I"),
    ("iUserID", 16, "I"), ("nBitDepth", 52, "I"), ("nHeight", 56, "I"),
    ("nWidth", 60, "I"), ("nXTiles", 64, "I"), ("nYTiles", 68, "I"),
    ("nTileHeight", 72, "I"), ("nTileWidth", 76, "I"),
    ("nLastTileHeight", 80, "I"), ("nLastTileWidth", 84, "I"),
    ("nROIOffset", 88, "I"), ("nROISize", 92, "I"),
    ("nClrTblOffset", 96, "I"), ("nClrTblSize", 100, "I"),
    ("nTileTblOffset", 104, "I"), ("nTileTblSize", 108, "I"),
    ("iMapType", 124, "i"), ("iProjection", 128, "i"),
    ("iEPSGCode", 132, "i"), ("dfScale", 136, "d"),
    ("dfResolution", 144, "d"), ("dfPixelSize", 152, "d"),
    ("dfLLY", 160, "d"), ("dfLLX", 168, "d"), ("dfStdP1", 176, "d"),
    ("dfStdP2", 184, "d"), ("dfCenterLong", 192, "d"),
    ("dfCenterLat", 200, "d"), ("nFlagsTblOffset", 212, "I"),
    ("nFlagsTblSize", 216, "I"), ("nFileSize0", 220, "I"),
    ("nFileSize1", 224, "I"), ("adfElevMin", 280, "d"),
    ("adfElevMax", 288, "d"), ("dfNoData", 296, "d"),
    ("iElevationUnit", 304, "I"), ("nExtHdrOffset", 312, "I"),
    ("nExtHdrSize", 316, "I"),
]


# ------------------------------------------------------------ LZW

_NO_PRED = 0xFFFF
_TABSIZE = 4096


def _lzw_update(tab, pred, follow):
    f = follow - 256 if follow >= 128 else follow
    local = ((pred + f) & 0xFFFFFFFF) | 0x0800
    local = ((local * local) & 0xFFFFFFFF) >> 6 & 0x0FFF
    nxt = local
    if tab[local][0]:
        while True:
            nxt = tab[local][1]
            if nxt == 0:
                break
            local = nxt
        nxt = (local + 101) & 0x0FFF
        while tab[nxt][0]:
            nxt += 1
            if nxt >= _TABSIZE:
                nxt = 0
        tab[local] = (tab[local][0], nxt, tab[local][2], tab[local][3])
    tab[nxt] = (True, 0, pred, follow)
    return nxt


def _lzw_table():
    tab = [(False, 0, 0, 0)] * _TABSIZE
    for code in range(256):
        _lzw_update(tab, _NO_PRED, code)
    return tab


def lzw_decompress(src: bytes, out_size: int) -> bytes:
    """rmflzw.cpp LZWReadStream — codes are table indices."""
    if len(src) < 2:
        return b""
    tab = _lzw_table()
    out = bytearray()
    pos = 0
    code = (src[pos] << 4) & 0xFF0
    pos += 1
    code += (src[pos] >> 4) & 0x0F
    old = code
    bitsleft = True
    fin = tab[code][3]
    out.append(fin)
    count = _TABSIZE - 256
    remaining = len(src) - pos
    while remaining > 0:
        if bitsleft:
            code = ((src[pos] & 0x0F) << 8) & 0xF00
            pos += 1
            remaining -= 1
            if remaining == 0:
                break
            code += src[pos]
            pos += 1
            remaining -= 1
            bitsleft = False
        else:
            code = (src[pos] << 4) & 0xFF0
            pos += 1
            remaining -= 1
            if remaining == 0:
                break
            code += (src[pos] >> 4) & 0x0F
            bitsleft = True
        in_code = code
        new_code = False
        last_char = 0
        if not tab[code][0]:
            code = old
            last_char = fin
            new_code = True
        stack = []
        while tab[code][2] != _NO_PRED:
            if len(stack) >= _TABSIZE:
                return b""
            stack.append(tab[code][3])
            code = tab[code][2]
        if len(out) >= out_size:
            return b""
        fin = tab[code][3]
        out.append(fin)
        if len(stack) > out_size - len(out):
            return b""
        out.extend(reversed(stack))
        if new_code:
            if len(out) >= out_size:
                return b""
            fin = last_char
            out.append(fin)
        if count > 0:
            count -= 1
            _lzw_update(tab, old, fin)
        old = in_code
    return bytes(out)


# ------------------------------------------------------------ DEM

_OUT_INT32 = -0x80000000


def dem_decompress(src: bytes, out_count: int) -> np.ndarray:
    """rmfdem.cpp DEMDecompress — Int32 delta stream."""
    out = np.empty(out_count, np.int32)
    n_out = 0
    prev = 0
    pos = 0
    n = len(src)
    ranges = {0x40: (0x7, -0x10, -0x8), 0x80: (0x7FF, -0x1000, -0x800),
              0xC0: (0x7FFFFF, -0x1000000, -0x800000)}
    while pos < n and n_out < out_count:
        b0 = src[pos]
        pos += 1
        count = b0 & 0x1F
        typ = b0 & 0xE0
        if count == 0:
            if pos >= n:
                break
            count = 32 + src[pos]
            pos += 1
        count = min(count, out_count - n_out)
        if typ == 0x20:  # ZERO
            out[n_out:n_out + count] = prev
            n_out += count
        elif typ == 0x00:  # OUT
            out[n_out:n_out + count] = _OUT_INT32
            n_out += count
        elif typ == 0x40:  # INT4
            rng, inv, sentinel = ranges[typ]
            k = 0
            while k < count:
                bb = src[pos]
                code = bb & 0x0F
                if code > rng:
                    code |= inv
                    code -= 1 << 32 if code >= 1 << 31 else 0
                if code == sentinel:
                    out[n_out] = _OUT_INT32
                else:
                    prev = _add32(prev, code)
                    out[n_out] = prev
                n_out += 1
                k += 1
                if k >= count:
                    pos += 1
                    break
                code = (bb >> 4) & 0x0F
                if code > rng:
                    code |= inv
                    code -= 1 << 32 if code >= 1 << 31 else 0
                if code == sentinel:
                    out[n_out] = _OUT_INT32
                else:
                    prev = _add32(prev, code)
                    out[n_out] = prev
                n_out += 1
                k += 1
                pos += 1
        elif typ == 0x60:  # INT8
            for _ in range(count):
                code = src[pos]
                pos += 1
                if code >= 128:
                    code -= 256
                if code == -0x80:
                    out[n_out] = _OUT_INT32
                else:
                    prev = _add32(prev, code)
                    out[n_out] = prev
                n_out += 1
        elif typ == 0x80:  # INT12 (pairs packed in 3 bytes)
            rng, inv, sentinel = ranges[typ]
            k = 0
            while k < count:
                v16 = struct.unpack_from("<h", src, pos)[0]
                code = v16 & 0x0FFF
                pos += 1
                if code > rng:
                    code |= inv
                    code -= 1 << 32 if code >= 1 << 31 else 0
                if code == sentinel:
                    out[n_out] = _OUT_INT32
                else:
                    prev = _add32(prev, code)
                    out[n_out] = prev
                n_out += 1
                k += 1
                if k >= count:
                    pos += 1
                    break
                v16 = struct.unpack_from("<h", src, pos)[0]
                code = (v16 >> 4) & 0x0FFF
                pos += 2
                if code > rng:
                    code |= inv
                    code -= 1 << 32 if code >= 1 << 31 else 0
                if code == sentinel:
                    out[n_out] = _OUT_INT32
                else:
                    prev = _add32(prev, code)
                    out[n_out] = prev
                n_out += 1
                k += 1
        elif typ == 0xA0:  # INT16
            for _ in range(count):
                code = struct.unpack_from("<h", src, pos)[0]
                pos += 2
                if code == -0x8000:
                    out[n_out] = _OUT_INT32
                else:
                    prev = _add32(prev, code)
                    out[n_out] = prev
                n_out += 1
        elif typ == 0xC0:  # INT24
            rng, inv, sentinel = ranges[typ]
            for _ in range(count):
                code = src[pos] | (src[pos + 1] << 8) | (src[pos + 2] << 16)
                pos += 3
                if code > rng:
                    code |= inv
                    code -= 1 << 32 if code >= 1 << 31 else 0
                if code == sentinel:
                    out[n_out] = _OUT_INT32
                else:
                    prev = _add32(prev, code)
                    out[n_out] = prev
                n_out += 1
        elif typ == 0xE0:  # INT32
            for _ in range(count):
                code = struct.unpack_from("<i", src, pos)[0]
                pos += 4
                if code == _OUT_INT32:
                    out[n_out] = _OUT_INT32
                else:
                    prev = _add32(prev, code)
                    out[n_out] = prev
                n_out += 1
    return out[:n_out]


def _add32(a: int, b: int) -> int:
    v = (a + b) & 0xFFFFFFFF
    return v - (1 << 32) if v >= 1 << 31 else v


# ------------------------------------------------------------ read

def read_rmf_grid(path: str) -> dict:
    with open(path, "rb") as f:
        data = f.read()
    sig = data[:4]
    if sig == b"MTW\x00":
        rmf_type, en = "MTW", "<"
    elif sig == b"\x00WSR":
        rmf_type, en = "RSW", ">"
    elif sig == b"RSW\x00":
        rmf_type, en = "RSW", "<"
    else:
        raise ValueError("not an RMF file")
    h = {name: struct.unpack_from(en + fmt, data, off)[0]
         for name, off, fmt in _HDR_FIELDS}
    h["iCompression"] = data[208]
    h["iMaskType"], h["iMaskStep"], h["iFrameFlag"] = data[209:212]
    h["iGeorefFlag"], h["iInverse"], h["iJpegQuality"] = data[244:247]
    h["byName"] = data[20:52].split(b"\x00")[0].decode("ascii", "replace")
    huge = 256 if h["iVersion"] >= 0x0201 else 1

    width, height = h["nWidth"], h["nHeight"]
    tw, th = h["nTileWidth"], h["nTileHeight"]
    bitdepth = h["nBitDepth"]
    if rmf_type == "RSW":
        nbands = 3 if bitdepth in (16, 24, 32) else 1
        dt = np.uint8
    else:
        nbands = 1
        dt = {8: np.uint8, 16: np.int16, 32: np.int32,
              64: np.float64}[bitdepth]
    nxt = (width + tw - 1) // tw
    nyt = (height + th - 1) // th
    ntab = h["nTileTblSize"] // 4
    tiles = struct.unpack_from(f"{en}{ntab}I", data,
                               h["nTileTblOffset"] * huge)
    comp = h["iCompression"]
    if comp not in (COMPRESSION_NONE, COMPRESSION_LZW, COMPRESSION_DEM):
        raise NotImplementedError(f"RMF compression {comp}")

    color_table = None
    if rmf_type == "RSW" and bitdepth in (1, 4, 8):
        n = 1 << bitdepth
        off = h["nClrTblOffset"] * huge
        if h["nClrTblSize"] >= n * 4 and off:
            ct = np.frombuffer(data, np.uint8, n * 4, off).reshape(n, 4)
            color_table = ct[:, :3].copy()  # R, G, B

    bands = np.zeros((nbands, height, width), np.float64)
    itemsize = np.dtype(dt).itemsize
    for ty in range(nyt):
        for tx in range(nxt):
            ti = ty * nxt + tx
            if 2 * ti + 1 >= ntab:
                continue
            toff, tbytes = tiles[2 * ti] * huge, tiles[2 * ti + 1]
            rw = h["nLastTileWidth"] if (h["nLastTileWidth"]
                                         and tx == nxt - 1) else tw
            rh = h["nLastTileHeight"] if (h["nLastTileHeight"]
                                          and ty == nyt - 1) else th
            raw_bytes = rw * rh * bitdepth // 8
            if tiles[2 * ti] == 0:
                tile = np.full((nbands, rh, rw), h["dfNoData"])
            else:
                buf = data[toff:toff + tbytes]
                if comp == COMPRESSION_LZW and tbytes != raw_bytes:
                    buf = lzw_decompress(buf, raw_bytes)
                elif comp == COMPRESSION_DEM and tbytes != raw_bytes:
                    buf = dem_decompress(buf, raw_bytes // 4) \
                        .astype("<i4").tobytes()
                if len(buf) != raw_bytes:
                    raise ValueError(
                        f"RMF: tile {ti} decodes to {len(buf)} bytes, "
                        f"expected {raw_bytes}")
                tile = _deinterleave(buf, rmf_type, bitdepth, nbands,
                                     rw, rh, en, dt, itemsize)
            y0, x0 = ty * th, tx * tw
            bands[:, y0:y0 + rh, x0:x0 + rw] = tile
    gt = (h["dfLLX"], h["dfPixelSize"], 0.0,
          h["dfLLY"] + height * h["dfPixelSize"], 0.0, -h["dfPixelSize"])
    return {"width": width, "height": height, "bands": nbands,
            "type": rmf_type, "bitdepth": bitdepth, "values": bands,
            "gt": gt, "nodata": h["dfNoData"], "epsg": h["iEPSGCode"],
            "color_table": color_table, "compression": comp,
            "header": h, "big_endian": en == ">"}


def _deinterleave(buf, rmf_type, bitdepth, nbands, rw, rh, en, dt,
                  itemsize):
    if rmf_type == "MTW" or (nbands == 1 and bitdepth == 8):
        return np.frombuffer(buf, en + np.dtype(dt).str[1:],
                             count=rw * rh).reshape(1, rh, rw) \
            .astype(np.float64)
    if bitdepth in (24, 32):
        ncomp = bitdepth // 8
        a = np.frombuffer(buf, np.uint8, rw * rh * ncomp) \
            .reshape(rh, rw, ncomp)
        # file order B,G,R[,A]; band i reads component nbands - i
        return np.stack([a[:, :, nbands - b] for b in range(1, 4)]) \
            .astype(np.float64)
    if bitdepth == 16:
        v = np.frombuffer(buf, en + "u2", rw * rh).reshape(rh, rw) \
            .astype(np.uint32)
        r = (v & 0x7C00) >> 7
        g = (v & 0x03E0) >> 2
        b = (v & 0x1F) << 3
        return np.stack([r, g, b]).astype(np.float64)
    if bitdepth == 4:
        a = np.frombuffer(buf, np.uint8)
        line_bytes = (rw * 4) // 8 if (rw * 4) % 8 == 0 else rw // 2 + 1
        line_bytes = 4 * rw // 8
        out = np.empty((rh, rw), np.uint8)
        for y in range(rh):
            row = a[y * line_bytes:(y + 1) * line_bytes]
            pairs = np.empty(line_bytes * 2, np.uint8)
            pairs[0::2] = row & 0x0F
            pairs[1::2] = (row & 0xF0) >> 4
            out[y] = pairs[:rw]
        return out[None].astype(np.float64)
    if bitdepth == 1:
        a = np.frombuffer(buf, np.uint8)
        line_bytes = rw // 8
        out = np.empty((rh, rw), np.uint8)
        for y in range(rh):
            row = a[y * line_bytes:(y + 1) * line_bytes]
            bits = np.unpackbits(row)
            out[y] = bits[:rw]
        return out[None].astype(np.float64)
    raise NotImplementedError(f"RMF bit depth {bitdepth}")


def read_rmf(spark, path: str, band: int = 1):
    """-> (cells DataFrame (bx, by, value), meta); by northward."""
    import pandas as pd

    g = read_rmf_grid(path)
    h, w = g["height"], g["width"]
    by, bx = np.mgrid[0:h, 0:w]
    pdf = pd.DataFrame({
        "bx": bx.ravel().astype(np.int64),
        "by": (h - 1 - by).ravel().astype(np.int64),
        "value": g["values"][band - 1].ravel()})
    meta = {k: g[k] for k in g if k != "values"}
    return spark.createDataFrame(pdf), meta


# ------------------------------------------------------------ write

def write_rmf(path: str, values, *, mtw: bool = False,
              gt=(0.0, 1.0, 0.0, 0.0, 0.0, -1.0), epsg: int = 0,
              nodata: float = 0.0, tile: int = 256,
              color_table=None) -> str:
    """Uncompressed little-endian writer. values: (H, W) for single
    band (Byte RSW, or Int16/Int32/Float64 MTW) or (3, H, W) Byte RSW
    (stored pixel-interleaved B,G,R)."""
    arr = np.asarray(values)
    if arr.ndim == 2:
        arr = arr[None]
    nb, hgt, wid = arr.shape
    if mtw:
        if nb != 1:
            raise ValueError("MTW is single-band")
        dt = {np.dtype(np.int16): ("<i2", 16),
              np.dtype(np.int32): ("<i4", 32),
              np.dtype(np.float64): ("<f8", 64)}.get(
            arr.dtype, ("<i4", 32))
        sig = b"MTW\x00"
    else:
        dt = ("u1", 8 if nb == 1 else 24)
        sig = b"RSW\x00"
    dts, bitdepth = dt
    tw = th = tile
    nxt = (wid + tw - 1) // tw
    nyt = (hgt + th - 1) // th
    hdr = bytearray(320)
    hdr[0:4] = sig

    def put(off, fmt, v):
        struct.pack_into("<" + fmt, hdr, off, v)

    put(4, "I", 0x0200)
    hdr[20:20 + 4] = b"gdal"
    put(52, "I", bitdepth)
    put(56, "I", hgt)
    put(60, "I", wid)
    put(64, "I", nxt)
    put(68, "I", nyt)
    put(72, "I", th)
    put(76, "I", tw)
    put(80, "I", hgt % th)
    put(84, "I", wid % tw)
    put(132, "i", epsg)
    put(136, "d", 10000.0)
    put(152, "d", gt[1])
    put(168, "d", gt[0])
    put(160, "d", gt[3] - hgt * gt[1])
    hdr[244] = 1  # georef flag
    put(296, "d", float(nodata))
    pos = 320
    body = bytearray()
    clr_off = clr_size = 0
    if not mtw and nb == 1:
        ct = np.zeros((256, 4), np.uint8)
        if color_table is not None:
            ct[:len(color_table), :3] = color_table
        else:
            ct[:, 0] = ct[:, 1] = ct[:, 2] = np.arange(256)
        clr_off, clr_size = pos, 1024
        body += ct.tobytes()
        pos += 1024
    tbl_off = pos
    ntiles = nxt * nyt
    tbl_size = ntiles * 8
    pos += tbl_size
    table = []
    tiles_raw = bytearray()
    for ty in range(nyt):
        for tx in range(nxt):
            rw = wid - tx * tw if tx == nxt - 1 else tw
            rh = hgt - ty * th if ty == nyt - 1 else th
            sub = arr[:, ty * th:ty * th + rh, tx * tw:tx * tw + rw]
            if mtw or nb == 1:
                blob = np.ascontiguousarray(sub[0], dts).tobytes()
            else:
                px = np.stack([sub[2], sub[1], sub[0]], axis=2)
                blob = np.ascontiguousarray(px, "u1").tobytes()
            table.append((pos, len(blob)))
            tiles_raw += blob
            pos += len(blob)
    tbl = b"".join(struct.pack("<II", o, s) for o, s in table)
    put(96, "I", clr_off)
    put(100, "I", clr_size)
    put(104, "I", tbl_off)
    put(108, "I", tbl_size)
    put(8, "I", pos)
    with open(path, "wb") as f:
        f.write(bytes(hdr) + bytes(body) + tbl + bytes(tiles_raw))
    return path
