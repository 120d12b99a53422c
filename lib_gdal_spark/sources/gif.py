"""GIF raster source and sink (pure stdlib/NumPy codec).

Reference semantics (studied, re-expressed — no code copied):
frmts/gif/gifdataset.cpp + the giflib the reference vendors. The
driver exposes the palette index stream as band 1 (checksum 57921 for
bug407.gif — the SAME image content as the reference's PNG fixture),
the color table as a 16/256-entry RGBA RasterColorTable (entry 0
(255,255,255,255) for bug407), the background index as the
GIF_BACKGROUND band metadata string, and the 89a Graphic Control
transparency index as the band nodata value (gifdataset.cpp nodata
plumbing — test_gif_6 expects nodata 0 after a nodata CreateCopy).
The writer (gifdataset.cpp CreateCopy, INTERLACING=NO default path)
round-trips byte.tif to checksum 4672 (test_gif_5).

Codec scope: 87a/89a, global+local color tables, interlaced and
sequential layouts, variable-width LZW with clear/EOI handling and
the 12-bit dictionary cap. Multi-image (animated) files read their
FIRST image — the reference's GIF driver does the same (BIGGIF
handles the rest).

Spark-first: whole-file decode (GIF is not splittable — LZW state is
sequential), one task per file; the OUTPUT is the distributed
(bx, by, value) cell table every raster operator consumes, same grid
convention as sources/png.py (by increases upward).
"""

from __future__ import annotations

import struct

import numpy as np
from pyspark.sql import DataFrame, SparkSession


def _lzw_decode(min_code: int, data: bytes, npix: int) -> np.ndarray:
    clear = 1 << min_code
    eoi = clear + 1
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table, width
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code + 1

    width = min_code + 1
    reset()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                reset()
                prev = None
                continue
            if code == eoi:
                return np.frombuffer(bytes(out[:npix]), np.uint8)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            else:  # the KwKwK case
                entry = prev + prev[:1]
                table.append(entry)
            out += entry
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
            if len(out) >= npix:
                return np.frombuffer(bytes(out[:npix]), np.uint8)
    return np.frombuffer(bytes(out[:npix].ljust(npix, b"\0")), np.uint8)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(arr: np.ndarray) -> np.ndarray:
    h = arr.shape[0]
    order = [r for start, step in _INTERLACE_PASSES
             for r in range(start, h, step)]
    out = np.empty_like(arr)
    out[order] = arr
    return out


def decode_gif(buf: bytes) -> tuple[np.ndarray, dict]:
    """-> (index array (h, w) uint8, meta with width/height/palette
    (n,4 RGBA uint8)/background/transparent)."""
    if buf[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF stream")
    sw, sh, packed, background, _ = struct.unpack_from("<HHBBB", buf, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(buf, np.uint8, 3 * n, pos).reshape(-1, 3)
        pos += 3 * n
    transparent = None
    while pos < len(buf):
        b = buf[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = buf[pos]
            pos += 1
            subs = []
            while buf[pos] != 0:
                ln = buf[pos]
                subs.append(buf[pos + 1: pos + 1 + ln])
                pos += 1 + ln
            pos += 1
            if label == 0xF9 and subs:
                flags = subs[0][0]
                if flags & 0x01:
                    transparent = subs[0][3]
            continue
        if b != 0x2C:
            raise ValueError(f"GIF: unexpected block 0x{b:02x}")
        left, top, w, h, ipack = struct.unpack_from("<HHHHB", buf, pos)
        pos += 9
        pal = gct
        if ipack & 0x80:
            n = 2 << (ipack & 0x07)
            pal = np.frombuffer(buf, np.uint8, 3 * n, pos).reshape(-1, 3)
            pos += 3 * n
        interlaced = bool(ipack & 0x40)
        min_code = buf[pos]
        pos += 1
        chunks = []
        while buf[pos] != 0:
            ln = buf[pos]
            chunks.append(buf[pos + 1: pos + 1 + ln])
            pos += 1 + ln
        pos += 1
        arr = _lzw_decode(min_code, b"".join(chunks),
                          w * h).reshape(h, w)
        if interlaced:
            arr = _deinterlace(arr)
        if pal is None:
            raise ValueError("GIF: image without a color table")
        rgba = np.column_stack(
            [pal, np.full(len(pal), 255, np.uint8)])
        if transparent is not None and transparent < len(rgba):
            rgba[transparent, 3] = 0
        return arr, {"width": int(w), "height": int(h),
                     "screen": (int(sw), int(sh)),
                     "palette": rgba, "background": int(background),
                     "transparent": (None if transparent is None
                                     else int(transparent)),
                     "interlaced": interlaced}
    raise ValueError("GIF: no image descriptor")


def _lzw_encode(min_code: int, pix: np.ndarray) -> bytes:
    clear = 1 << min_code
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0
    width = min_code + 1

    def emit(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    nxt = eoi + 1
    emit(clear)
    run = b""
    for v in pix.tobytes():
        cand = run + bytes([v])
        if cand in table:
            run = cand
            continue
        emit(table[run])
        table[cand] = nxt
        nxt += 1
        if nxt == (1 << width) + 1 and width < 12:
            width += 1
        if nxt >= 4096:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            nxt = eoi + 1
            width = min_code + 1
        run = bytes([v])
    if run:
        emit(table[run])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(arr: np.ndarray, palette: np.ndarray | None = None,
               background: int = 0,
               transparent: int | None = None) -> bytes:
    """(h, w) uint8 indices + (n, 3|4) palette -> sequential
    (INTERLACING=NO) GIF. Grayscale identity palette when omitted —
    the CreateCopy-from-byte.tif shape (test_gif_5 checksum 4672)."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w = a.shape
    if palette is None:
        g = np.arange(256, dtype=np.uint8)
        palette = np.column_stack([g, g, g])
    pal = np.asarray(palette, dtype=np.uint8)[:, :3]
    bits = max(1, int(np.ceil(np.log2(max(2, len(pal))))))
    n = 1 << bits
    padded = np.zeros((n, 3), np.uint8)
    padded[: len(pal)] = pal
    out = bytearray(b"GIF89a" if transparent is not None else b"GIF87a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) & 7) << 4
                       | (bits - 1), background, 0)
    out += padded.tobytes()
    if transparent is not None:
        out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, transparent & 0xFF, 0])
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
    min_code = max(2, bits)
    out.append(min_code)
    payload = _lzw_encode(min_code, a.ravel())
    for i in range(0, len(payload), 255):
        blk = payload[i: i + 255]
        out.append(len(blk))
        out += blk
    out += bytes([0, 0x3B])
    return bytes(out)


def read_gif(spark: SparkSession, path: str):
    """-> (cells DataFrame (bx, by, value), meta). Same grid convention
    as read_png: by increases upward."""
    with open(path, "rb") as f:
        arr, meta = decode_gif(f.read())
    h, w = arr.shape
    rows = [(c, h - 1 - r, float(arr[r, c]))
            for r in range(h) for c in range(w)]
    return (spark.createDataFrame(rows, "bx long, by long, value double"),
            meta)
