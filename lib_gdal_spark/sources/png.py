"""PNG source — pure stdlib/NumPy decode (zlib inflate + scanline
unfiltering), no codec libraries.

Reference behavior: frmts/png (libpng-backed driver). Band semantics
match GDAL's: gray -> 1 band, RGB -> 3, palette -> 1 band of indices
(color table in meta), gray+alpha -> 2, RGBA -> 4. Parity replays in
tests/test_sources.py: autotest/gdrivers/png.py's test.png band-1
checksum 57921, uint16_interlaced.png checksum 4672 (16-bit + Adam7),
and gcore's stefan_full_rgba quartet [12603, 58561, 36064, 10807]
(autotest/gcore/tiff_read.py:215 — same pixels as the PNG twin).

Coverage: bit depths 1/2/4/8/16, color types 0/2/3/4/6, filters 0-4,
non-interlaced and Adam7. Decode is a driver-side fixture read (like
the TIFF/AAIGrid sources); the distributed path is the cell DataFrame
it returns.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
from pyspark.sql import SparkSession

_SIG = b"\x89PNG\r\n\x1a\n"

# samples per pixel by color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# Adam7 pass grids: (x0, y0, dx, dy)
_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def _chunks(buf: bytes):
    if buf[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    i = 8
    while i + 8 <= len(buf):
        ln, typ = struct.unpack(">I4s", buf[i:i + 8])
        yield typ, buf[i + 8:i + 8 + ln]
        i += 12 + ln
        if typ == b"IEND":
            return


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """raw: (h, 1 + stride) uint8 filtered scanlines -> (h, stride)."""
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for r in range(h):
        ftype = int(raw[r, 0])
        line = raw[r, 1:].astype(np.int32)
        if ftype == 0:
            cur = line
        elif ftype == 1:      # Sub: prefix sum per byte lane mod 256
            cur = line.copy()
            for i in range(bpp, stride):
                cur[i] = (cur[i] + cur[i - bpp]) & 0xFF
        elif ftype == 2:      # Up
            cur = (line + prev) & 0xFF
        elif ftype == 3:      # Average
            cur = line.copy()
            for i in range(stride):
                left = cur[i - bpp] if i >= bpp else 0
                cur[i] = (cur[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:      # Paeth
            cur = line.copy()
            for i in range(stride):
                left = int(cur[i - bpp]) if i >= bpp else 0
                ul = int(prev[i - bpp]) if i >= bpp else 0
                cur[i] = (cur[i] + _paeth(left, int(prev[i]), ul)) & 0xFF
        else:
            raise ValueError(f"PNG: unknown filter type {ftype}")
        out[r] = cur.astype(np.uint8)
        prev = cur
    return out


def _unpack_samples(rows: np.ndarray, w: int, depth: int,
                    nch: int) -> np.ndarray:
    """(h, stride) unfiltered bytes -> (h, w, nch) samples."""
    h = rows.shape[0]
    if depth == 8:
        return rows.reshape(h, -1)[:, :w * nch].reshape(h, w, nch)
    if depth == 16:
        a = rows.reshape(h, -1).view(">u2")[:, :w * nch].astype(np.uint16)
        return a.reshape(h, w, nch)
    # 1/2/4-bit (gray or palette: nch == 1): MSB-first within each byte
    bits = np.unpackbits(rows, axis=1)
    per = bits[:, :w * depth].reshape(h, w, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint16)
    return (per * weights).sum(axis=2, dtype=np.uint16) \
        .astype(np.uint16).reshape(h, w, 1)


def decode_png(buf: bytes) -> tuple[np.ndarray, dict]:
    """-> (arr, meta): arr is (h, w) for 1-band images else (bands, h, w);
    meta carries width/height/depth/color_type/palette/trns."""
    ihdr = None
    idat = []
    plte = None
    trns = None
    for typ, payload in _chunks(buf):
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif typ == b"IDAT":
            idat.append(payload)
        elif typ == b"PLTE":
            plte = np.frombuffer(payload, np.uint8).reshape(-1, 3)
        elif typ == b"tRNS":
            trns = bytes(payload)
    if ihdr is None or not idat:
        raise ValueError("PNG: missing IHDR or IDAT")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise NotImplementedError("PNG: nonstandard compression/filter")
    if ctype not in _CHANNELS:
        raise NotImplementedError(f"PNG: color type {ctype}")
    if depth not in (1, 2, 4, 8, 16):
        raise NotImplementedError(f"PNG: bit depth {depth}")
    if depth < 8 and ctype not in (0, 3):
        raise ValueError("PNG: sub-byte depth only for gray/palette")
    nch = _CHANNELS[ctype]
    data = zlib.decompress(b"".join(idat))
    bpp = max(1, (depth * nch) // 8)

    def pass_decode(buf_off: int, pw: int, ph: int):
        stride = (pw * nch * depth + 7) // 8
        n = ph * (1 + stride)
        raw = np.frombuffer(data[buf_off:buf_off + n],
                            np.uint8).reshape(ph, 1 + stride)
        rows = _unfilter(raw, ph, stride, bpp)
        return _unpack_samples(rows, pw, depth, nch), buf_off + n

    dt = np.uint16 if depth == 16 else np.uint8
    img = np.zeros((h, w, nch), dtype=dt)
    if interlace == 0:
        samples, _ = pass_decode(0, w, h)
        img = samples.astype(dt)
    elif interlace == 1:
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw == 0 or ph == 0:
                continue
            samples, off = pass_decode(off, pw, ph)
            img[y0::dy, x0::dx] = samples.astype(dt)
    else:
        raise NotImplementedError(f"PNG: interlace method {interlace}")

    meta = {"width": w, "height": h, "depth": depth, "color_type": ctype,
            "interlace": interlace, "palette": plte, "trns": trns}
    if nch == 1:
        return img[:, :, 0], meta
    return np.transpose(img, (2, 0, 1)), meta


def read_png(spark: SparkSession, path: str, band: int | None = None):
    """-> (cells DataFrame, meta). Same grid convention as the TIFF and
    AAIGrid sources: by increases UPWARD (raster row 0 = max by);
    single band -> (bx, by, value), multi-band -> (bx, by, vals)."""
    with open(path, "rb") as f:
        arr, meta = decode_png(f.read())
    if arr.ndim == 3 and band is not None:
        arr = arr[band - 1]
    if arr.ndim == 3:
        nb, h, w = arr.shape
        rows = [(c, h - 1 - r, [float(arr[b, r, c]) for b in range(nb)])
                for r in range(h) for c in range(w)]
        return (spark.createDataFrame(
            rows, "bx long, by long, vals array<double>"), meta)
    h, w = arr.shape
    rows = [(c, h - 1 - r, float(arr[r, c]))
            for r in range(h) for c in range(w)]
    return (spark.createDataFrame(rows, "bx long, by long, value double"),
            meta)


def encode_png(arr: np.ndarray) -> bytes:
    """(h, w) uint8/uint16 gray or (h, w, 3|4) uint8 -> non-interlaced
    PNG (filter 0 rows). Round-trip twin for tests and sinks."""
    if arr.ndim == 2:
        ctype = 0
        depth = 16 if arr.dtype == np.uint16 else 8
        samples = arr[:, :, None]
    elif arr.ndim == 3 and arr.shape[2] in (3, 4):
        ctype = 2 if arr.shape[2] == 3 else 6
        depth = 8
        samples = arr
    else:
        raise ValueError("encode_png: unsupported array shape")
    h, w, nch = samples.shape
    if depth == 16:
        body = samples.astype(">u2").tobytes()
        stride = w * nch * 2
    else:
        body = samples.astype(np.uint8).tobytes()
        stride = w * nch
    raw = b"".join(b"\x00" + body[r * stride:(r + 1) * stride]
                   for r in range(h))

    def chunk(typ: bytes, payload: bytes) -> bytes:
        return (struct.pack(">I", len(payload)) + typ + payload
                + struct.pack(">I", zlib.crc32(typ + payload)))

    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 0)
    return (_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6))
            + chunk(b"IEND", b""))
