"""Uncompressed TIFF raster source — pure-NumPy IFD + strip parsing.

Reference: the GTiff driver (frmts/gtiff/, ~60k LoC with libtiff) is the
reference's workhorse format; its autotest fixtures (e.g.
autotest/alg/data/pat.tif, the proximity golden input) are tiny
uncompressed striped TIFFs. This source parses exactly that subset
natively — no codec library:

- classic TIFF (not BigTIFF), II or MM byte order;
- Compression 1 (none), 5 (LZW), 8/32946 (Deflate via zlib); striped
  layout (StripOffsets/StripByteCounts/RowsPerStrip); single- or
  multi-band (chunky or separate planes);
- BitsPerSample 8/16/32 unsigned, or 32/64-bit IEEE float
  (SampleFormat=3);
- the GDAL_NODATA ASCII tag (42113) — nodata cells become ABSENT rows,
  the engine's nodata discipline (same convention as the AAIGrid
  source).

Anything outside the subset (compression, tiles, multi-band, BigTIFF)
raises NotImplementedError with the actual offending parameter — honest
partial coverage, like the multimodal codec tier.

Driver-side parse of a single (small, by format construction) header +
raster; the OUTPUT is a distributed cell table. For web-scale rasters
the storage model is parquet cell tables (SURVEY §2.1) — this source
exists for ingest parity with the reference's own fixtures.
"""

from __future__ import annotations

import struct

import numpy as np
from pyspark.sql import DataFrame, SparkSession

# TIFF tag ids
_TAGS = {
    256: "width", 257: "height", 258: "bits", 259: "compression",
    273: "strip_offsets", 277: "samples_per_pixel", 278: "rows_per_strip",
    279: "strip_counts", 284: "planar", 317: "predictor",
    322: "tile_width", 323: "tile_length", 324: "tile_offsets",
    325: "tile_counts", 339: "sample_format",
    33550: "pixel_scale", 33922: "tiepoint", 34735: "geo_keys",
    42113: "gdal_nodata",
}
_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4,
              10: 8, 11: 4, 12: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i", 11: "f",
             12: "d"}


def _read_ifd(buf: bytes):
    if buf[:2] == b"II":
        eo = "<"
    elif buf[:2] == b"MM":
        eo = ">"
    else:
        raise NotImplementedError("not a TIFF (bad byte-order mark)")
    magic = struct.unpack_from(eo + "H", buf, 2)[0]
    if magic == 43:
        raise NotImplementedError("BigTIFF not supported")
    if magic != 42:
        raise NotImplementedError(f"bad TIFF magic {magic}")
    ifd_off = struct.unpack_from(eo + "I", buf, 4)[0]
    n = struct.unpack_from(eo + "H", buf, ifd_off)[0]
    tags = {}
    for i in range(n):
        off = ifd_off + 2 + 12 * i
        tag, typ, cnt = struct.unpack_from(eo + "HHI", buf, off)
        if tag not in _TAGS or typ not in _TYPE_SIZE:
            continue
        size = _TYPE_SIZE[typ] * cnt
        voff = off + 8 if size <= 4 else struct.unpack_from(eo + "I", buf,
                                                            off + 8)[0]
        if typ == 2:  # ASCII
            val = buf[voff : voff + cnt].split(b"\0")[0].decode("ascii")
        else:
            fmt = _TYPE_FMT.get(typ)
            if fmt is None:
                continue
            vals = struct.unpack_from(eo + fmt * cnt, buf, voff)
            val = list(vals) if cnt > 1 else vals[0]
        tags[_TAGS[tag]] = val
    return eo, tags


def _lzw_decode(data: bytes) -> bytes:
    """TIFF-variant LZW (TIFF 6.0 spec §13): MSB-first code packing,
    ClearCode=256, EOI=257, 9->12-bit codes with the spec's "early
    change" (width bumps when the table reaches 2^width - 1, one entry
    before the natural boundary — libtiff parity). Pure Python; strips
    are tiny by format construction (the fixtures this source exists
    for), and the OUTPUT is what gets distributed."""
    out = bytearray()
    table: list[bytes] = []
    width = 9
    prev: bytes | None = None
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)

    def reset():
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        prev = None

    reset()
    while True:
        while nbits < width:
            if pos >= n:
                return bytes(out)
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == 256:  # ClearCode
            reset()
            continue
        if code == 257:  # EndOfInformation
            return bytes(out)
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"corrupt LZW stream: code {code} > table")
        out += entry
        prev = entry
        if len(table) == (1 << width) - 1 and width < 12:  # early change
            width += 1


def _packbits_decode(data: bytes) -> bytes:
    """PackBits RLE (TIFF 6.0 spec §9): n in 0..127 copies n+1 literal
    bytes; n in -127..-1 repeats the next byte 1-n times; -128 is a
    no-op."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        c = data[i]
        i += 1
        if c < 128:
            out += data[i : i + c + 1]
            i += c + 1
        elif c > 128:
            out += data[i : i + 1] * (257 - c)
            i += 1
    return bytes(out)


def _decompress(blob: bytes, comp: int) -> bytes:
    if comp == 5:
        return _lzw_decode(blob)  # LZW resets per strip/tile
    if comp in (8, 32946):
        import zlib

        return zlib.decompress(blob)
    if comp == 32773:
        return _packbits_decode(blob)
    return blob


def _fit(blob: bytes, size: int) -> bytes:
    """Clamp a decoded strip/tile to its expected byte size: partial
    final blocks may come up SHORT (gdal #1179 — the contig/separate
    strip+tile fixtures) or padded long; absent trailing bytes read as
    zero, exactly like libtiff's fill behavior."""
    if len(blob) == size:
        return blob
    return blob[:size] + b"\0" * max(0, size - len(blob))


def decode_tiff(buf: bytes) -> tuple[np.ndarray, dict]:
    """TIFF bytes -> (array [row 0 = top], meta). Classic TIFF, striped
    or tiled, chunky or separate planes; Compression none (1), LZW (5),
    Deflate (8/32946) or PackBits (32773); Predictor none or horizontal
    differencing (2)."""
    eo, t = _read_ifd(buf)
    comp = t.get("compression", 1)
    if comp not in (1, 5, 8, 32946, 32773):
        raise NotImplementedError(f"TIFF compression {comp} needs libtiff")
    spp = int(t.get("samples_per_pixel", 1))
    w, h = int(t["width"]), int(t["height"])
    bits = t.get("bits", 8)
    if isinstance(bits, list):
        bits = bits[0]
    sfmt = t.get("sample_format", 1)
    if isinstance(sfmt, list):
        sfmt = sfmt[0]
    key = (int(bits), int(sfmt))
    dt = {(8, 1): "u1", (16, 1): "u2", (32, 1): "u4",
          (8, 2): "i1", (16, 2): "i2", (32, 2): "i4",
          (32, 3): "f4", (64, 3): "f8"}.get(key)
    if dt is None:
        raise NotImplementedError(f"TIFF bits/format {key} unsupported")
    dtype = np.dtype(eo + dt)
    pred = t.get("predictor", 1)
    if pred not in (1, 2, 3):
        raise NotImplementedError(f"TIFF predictor {pred}")
    if pred == 3 and dt not in ("f4", "f8"):
        raise NotImplementedError("TIFF predictor 3 on non-float samples")
    planar = int(t.get("planar", 1))
    isz = dtype.itemsize

    def undiff(a2d):
        # horizontal differencing: samples after the first in each row
        # are deltas; integer cumsum with native wraparound restores them
        return np.cumsum(a2d.astype(np.int64), axis=-1).astype(dtype)

    def fp_undiff(raw: bytes, nsamp: int, stride: int = 1) -> np.ndarray:
        # floating-point predictor (3, libtiff tif_predict.c fpAcc):
        # per row, undo byte-level horizontal differencing over the
        # whole row, then de-interleave the byte planes (stored most-
        # significant plane first, independent of file byte order) and
        # reassemble big-endian floats. Returns flat samples, row-major.
        # libtiff accumulates with stride = samples-per-pixel on chunky
        # multi-sample data (tif_predict.c PredictorSetupDecode): byte
        # lane k only sums bytes at positions ≡ k (mod stride).
        rowb = nsamp * isz
        b = np.frombuffer(raw, np.uint8)
        rows = len(b) // rowb
        b = b[: rows * rowb].reshape(rows, rowb).astype(np.int64)
        if stride == 1:
            b = (np.cumsum(b, axis=1) & 0xFF).astype(np.uint8)
        else:
            b = b.reshape(rows, rowb // stride, stride)
            b = ((np.cumsum(b, axis=1) & 0xFF).astype(np.uint8)
                 .reshape(rows, rowb))
        planes = b.reshape(rows, isz, nsamp).transpose(0, 2, 1)
        be = np.ascontiguousarray(planes).reshape(rows * rowb)
        return np.frombuffer(be.tobytes(), ">" + dt).astype(
            np.dtype(dt))

    if "tile_offsets" in t:
        # tiled layout: tiles are always full tile_width x tile_length
        # (short final blocks zero-fill via _fit), chunky or plane-major
        tw, th = int(t["tile_width"]), int(t["tile_length"])
        offs, cnts = t["tile_offsets"], t["tile_counts"]
        if not isinstance(offs, list):
            offs, cnts = [offs], [cnts]
        ntx = (w + tw - 1) // tw
        nty = (h + th - 1) // th
        cpp = spp if planar == 1 else 1  # samples per pixel per tile
        arr = np.zeros((spp, h, w), dtype)
        i = 0
        for plane in range(spp if planar == 2 else 1):
            for ty in range(nty):
                for tx in range(ntx):
                    raw = _fit(_decompress(buf[offs[i]: offs[i] + cnts[i]],
                                           comp), tw * th * cpp * isz)
                    i += 1
                    if pred == 3:
                        ta = fp_undiff(raw, tw * cpp, stride=cpp).reshape(
                            th, tw, cpp)
                    else:
                        ta = np.frombuffer(raw, dtype).reshape(
                            th, tw, cpp)
                    ta = ta.transpose(2, 0, 1)  # (bands, th, tw)
                    if pred == 2:
                        ta = np.stack([undiff(bnd) for bnd in ta])
                    ys, xs = ty * th, tx * tw
                    ch = min(th, h - ys)
                    cw = min(tw, w - xs)
                    if planar == 2:
                        arr[plane, ys:ys + ch, xs:xs + cw] = \
                            ta[0, :ch, :cw]
                    else:
                        arr[:, ys:ys + ch, xs:xs + cw] = ta[:, :ch, :cw]
        if spp == 1:
            arr = arr[0]
    else:
        offs, cnts = t["strip_offsets"], t["strip_counts"]
        if not isinstance(offs, list):
            offs, cnts = [offs], [cnts]
        rps = int(t.get("rows_per_strip", h))
        spp_strip = spp if planar == 1 else 1
        spl = (h + rps - 1) // rps  # strips per plane
        strips = []
        for i, (o, c) in enumerate(zip(offs, cnts)):
            nrows = min(rps, h - (i % spl) * rps)
            strips.append(_fit(_decompress(buf[o : o + c], comp),
                               nrows * w * spp_strip * isz))
        raw = b"".join(strips)
        if spp == 1:
            if pred == 3:
                arr = fp_undiff(raw, w)[: w * h].reshape(h, w)
            else:
                arr = np.frombuffer(raw, dtype, count=w * h).reshape(h, w)
            if pred == 2:
                arr = undiff(arr)
        else:
            if planar == 2:
                # separate planes: strips run band-major (rows of w)
                if pred == 3:
                    arr = fp_undiff(raw, w)[: spp * w * h].reshape(
                        spp, h, w)
                else:
                    arr = np.frombuffer(raw, dtype, count=spp * w * h) \
                        .reshape(spp, h, w)
            else:
                # chunky: pixel-interleaved; differencing strides per
                # sample
                if pred == 3:
                    arr = fp_undiff(raw, w * spp, stride=spp)[: spp * w * h] \
                        .reshape(h, w, spp).transpose(2, 0, 1)
                else:
                    arr = np.frombuffer(raw, dtype, count=spp * w * h) \
                        .reshape(h, w, spp).transpose(2, 0, 1)
            if pred == 2:
                arr = np.stack([undiff(b) for b in arr])
    meta = {"width": w, "height": h, "bits": int(bits),
            "sample_format": int(sfmt), "bands": spp}
    if "gdal_nodata" in t:
        meta["nodata"] = float(t["gdal_nodata"])
    # GeoTIFF geotransform: ModelPixelScale + ModelTiepoint (the affine
    # subset gdaldem needs for its ewres/nsres constants). GeoKey 1025
    # (GTRasterTypeGeoKey) value 2 = RasterPixelIsPoint: the tiepoint
    # names a pixel CENTER, so the area-convention origin the reference
    # reports shifts by half a pixel (frmts/gtiff geotransform logic).
    if "pixel_scale" in t and "tiepoint" in t:
        sx, sy = t["pixel_scale"][0], t["pixel_scale"][1]
        i, j, _k, x, y, _z = t["tiepoint"][:6]
        gx, gy = x - i * sx, y + j * sy
        gk = t.get("geo_keys") or []
        for g in range(0, len(gk) - 3, 4):
            if gk[g] == 1025 and gk[g + 1] == 0 and gk[g + 3] == 2:
                gx -= 0.5 * sx
                gy += 0.5 * sy
                meta["pixel_is_point"] = True
        meta["geotransform"] = (gx, sx, 0.0, gy, 0.0, -sy)
    return arr, meta


def read_tiff(spark: SparkSession, path: str, band: int | None = None):
    """-> (cells DataFrame, meta). Grid convention matches the AAIGrid
    source: by increases UPWARD (raster row 0 = max by); GDAL_NODATA
    cells are absent rows. Single-band files (or an explicit 1-based
    `band` selection) yield (bx, by, value); multi-band files yield
    (bx, by, vals array<double>) pixel-interleaved."""
    with open(path, "rb") as f:
        arr, meta = decode_tiff(f.read())
    nodata = meta.get("nodata")
    if arr.ndim == 3 and band is not None:
        arr = arr[band - 1]
    if arr.ndim == 3:
        nb, h, w = arr.shape
        rows = [(c, h - 1 - r, [float(arr[b, r, c]) for b in range(nb)])
                for r in range(h) for c in range(w)]
        return (spark.createDataFrame(
            rows, "bx long, by long, vals array<double>"), meta)
    h, w = arr.shape
    rows = []
    for r in range(h):
        for c in range(w):
            v = float(arr[r, c])
            if nodata is not None and v == nodata:
                continue
            rows.append((c, h - 1 - r, v))
    return (spark.createDataFrame(rows, "bx long, by long, value double"),
            meta)


def encode_tiff(arr: np.ndarray, nodata: float | None = None) -> bytes:
    """2-D array -> minimal single-strip little-endian classic TIFF
    (uncompressed, single band; uint8/16/32, int8/16/32 or float32/64),
    with the GDAL_NODATA ASCII tag when `nodata` is given — the exact
    subset decode_tiff reads, round-trip tested."""
    arr = np.ascontiguousarray(arr)
    h, w = arr.shape
    kind_fmt = {"u": 1, "i": 2, "f": 3}
    sfmt = kind_fmt.get(arr.dtype.kind)
    if sfmt is None or arr.dtype.itemsize not in (1, 2, 4, 8):
        raise NotImplementedError(f"encode_tiff: dtype {arr.dtype}")
    bits = arr.dtype.itemsize * 8
    data = arr.astype(arr.dtype.newbyteorder("<")).tobytes()
    nod = f"{nodata:g}".encode() + b"\0" if nodata is not None else None

    entries = []  # (tag, type, count, value or bytes-offset placeholder)

    def short(tag, v):
        entries.append((tag, 3, 1, v))

    def long_(tag, v):
        entries.append((tag, 4, 1, v))

    short(256, w)
    short(257, h)
    short(258, bits)
    short(259, 1)            # no compression
    short(262, 1)            # BlackIsZero
    long_(273, 0)            # strip offset (patched below)
    short(277, 1)
    short(278, h)            # one strip
    long_(279, len(data))
    short(339, sfmt)
    if nod is not None:
        entries.append((42113, 2, len(nod), None))  # ascii, out-of-line
    entries.sort(key=lambda e: e[0])
    n = len(entries)
    ifd_off = 8
    after_ifd = ifd_off + 2 + 12 * n + 4
    nod_inline = nod is not None and len(nod) <= 4
    nod_off = after_ifd
    data_off = after_ifd + (0 if nod is None or nod_inline else len(nod))
    out = bytearray(struct.pack("<2sHI", b"II", 42, ifd_off))
    out += struct.pack("<H", n)
    for tag, typ, cnt, val in entries:
        if tag == 273:
            val = data_off
        if tag == 42113:
            if nod_inline:
                # values <= 4 bytes live IN the 12-byte entry (TIFF 6.0)
                out += struct.pack("<HHI", tag, typ, cnt)
                out += nod.ljust(4, b"\0")
            else:
                out += struct.pack("<HHII", tag, typ, cnt, nod_off)
            continue
        out += struct.pack("<HHII", tag, typ, cnt, val)
    out += struct.pack("<I", 0)  # no next IFD
    if nod is not None and not nod_inline:
        out += nod
    out += data
    return bytes(out)


def write_tiff(cells: DataFrame, path: str, width: int, height: int,
               dtype: str = "f8", nodata: float = -9999.0) -> dict:
    """(bx, by, value) -> uncompressed TIFF; absent cells take `nodata`
    (written as the GDAL_NODATA tag). Bottom-up by maps to raster row
    height-1-by, mirroring read_tiff."""
    got = {(r.bx, r.by): r.value for r in cells.collect()}
    arr = np.full((height, width), nodata, dtype=np.dtype(dtype))
    for (x, y), v in got.items():
        if 0 <= x < width and 0 <= y < height:
            arr[height - 1 - y, x] = v
    with open(path, "wb") as f:
        f.write(encode_tiff(arr, nodata=nodata))
    return {"width": width, "height": height, "nodata": nodata}


def read_bmp(spark: SparkSession, path: str, band: int = 1):
    """Uncompressed BMP -> (cells DataFrame (bx, by, value), meta) for
    one 1-based band (1=R, 2=G, 3=B[, 4=A]) — reuses the multimodal
    pure-NumPy BMP codec; same upward-by grid convention."""
    from ..operators.multimodal import _decode_bmp

    with open(path, "rb") as f:
        arr, meta = _decode_bmp(f.read())
    h, w = arr.shape[:2]
    ch = arr[:, :, band - 1]
    rows = [(c, h - 1 - r, float(ch[r, c]))
            for r in range(h) for c in range(w)]
    return (spark.createDataFrame(rows, "bx long, by long, value double"),
            meta)
