"""HF2/HFZ heightfield codec.

Reference: frmts/hf2/hf2dataset.cpp — 28-byte header ("HF2\\0" + u16
version, u32 width/height, u16 tile size, f32 vertical precision, f32
horizontal scale, u32 extended-header length), extended header of
typed blocks ("bin\\0" + 16-byte name + u32 size; "georef-extents" =
u16 units + 4 f64 edge coordinates), then TILES ordered bottom tile
row first, x-major (writer loop hf2dataset.cpp:965-978): each tile is
f32 scale + f32 offset, then per tile row (bottom-up): u8 word size,
i32 first quantized value, (width-1) deltas of that word size; pixel =
n * scale + offset clamped to float32 (:207-213). The writer
quantizes float tiles with fIntVal = (v - min) / scale TRUNCATED via
the C int cast (:1089-1101); Int16 sources write scale=1/offset=0 with
raw values. HFZ is the same stream gzipped.

Pure-NumPy decode/encode; the autotest checksums (byte.tif 4672 incl.
compressed, hfa/float.img 23529, n43.dt0 49187) replay through the
loop in tests/test_hf2.py."""

from __future__ import annotations

import gzip
import struct

import numpy as np


def decode_hf2(data: bytes):
    """-> (values (h, w) float32 NORTH-UP, meta)."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    if data[:6] != b"HF2\x00\x00\x00":
        raise ValueError("not an HF2 payload")
    w, h = struct.unpack_from("<2i", data, 6)
    tile = struct.unpack_from("<H", data, 14)[0]
    vert_pres, horiz_scale = struct.unpack_from("<2f", data, 16)
    ext_len = struct.unpack_from("<I", data, 24)[0]
    if tile < 8 or w <= 0 or h <= 0:
        raise ValueError("invalid HF2 header")
    # extended header blocks
    off = 28
    end_ext = 28 + ext_len
    extents = None
    units = None
    while off + 24 <= end_ext:
        name = data[off + 4:off + 20].split(b"\x00")[0].decode("latin-1")
        size = struct.unpack_from("<I", data, off + 20)[0]
        blob = data[off + 24:off + 24 + size]
        if name == "georef-extents" and size == 34:
            units = struct.unpack_from("<H", blob, 0)[0]
            extents = struct.unpack_from("<4d", blob, 2)
        off += 24 + size
    off = end_ext

    nxb = (w + tile - 1) // tile
    nyb = (h + tile - 1) // tile
    vals = np.zeros((h, w), np.float32)
    fmax = np.finfo(np.float32).max
    for jb in range(nyb):           # bottom tile row first
        th = min(tile, h - jb * tile)
        for ib in range(nxb):
            tw = min(tile, w - ib * tile)
            scale, offset = struct.unpack_from("<2f", data, off)
            off += 8
            rows = np.empty((th, tw), np.float64)
            for k in range(th):     # bottom row of the tile first
                ws = data[off]
                off += 1
                n0 = struct.unpack_from("<i", data, off)[0]
                off += 4
                if ws == 1:
                    d = np.frombuffer(data, np.int8, tw - 1, off)
                elif ws == 2:
                    d = np.frombuffer(data, "<i2", tw - 1, off)
                elif ws == 4:
                    d = np.frombuffer(data, "<i4", tw - 1, off)
                else:
                    raise ValueError(f"unexpected HF2 word size {ws}")
                off += ws * (tw - 1)
                n = np.empty(tw, np.int64)
                n[0] = n0
                if tw > 1:
                    n[1:] = n0 + np.cumsum(d.astype(np.int64))
                rows[k] = n * np.float64(scale) + np.float64(offset)
            np.clip(rows, -fmax, fmax, out=rows)
            # tile row k is the k-th row from the raster BOTTOM
            y1 = h - jb * tile
            y0 = y1 - th
            block = rows[::-1]      # to top-down
            vals[y0:y1, ib * tile:ib * tile + tw] = block.astype(
                np.float32)
    meta = {"width": w, "height": h, "tile_size": tile,
            "vert_precision": vert_pres, "horiz_scale": horiz_scale,
            "extent_units": units}
    if extents is not None:
        minx, maxx, miny, maxy = extents
        meta["gt"] = (minx, (maxx - minx) / w, 0.0, maxy, 0.0,
                      -(maxy - miny) / h)
    return vals, meta


def _encode_tile_rows(q: np.ndarray, out: list):
    """q: (th, tw) int64 quantized tile, top-down; writes bottom-up
    rows with the minimal word size per row (writer rule)."""
    th, tw = q.shape
    for k in range(th):
        row = q[th - 1 - k]
        if tw > 1:
            diffs = np.diff(row)
            lo, hi = int(diffs.min()), int(diffs.max())
            if lo < -32768 or hi > 32767:
                ws, dt = 4, "<i4"
            elif lo < -128 or hi > 127:
                ws, dt = 2, "<i2"
            else:
                ws, dt = 1, "i1"
        else:
            ws, dt = 1, "i1"
            diffs = np.empty(0, np.int64)
        out.append(bytes([ws]))
        out.append(struct.pack("<i", int(row[0])))
        out.append(diffs.astype(dt).tobytes())


def encode_hf2(vals: np.ndarray, gt=None, tile_size: int = 256,
               vert_precision: float = 0.01, source_int16: bool = False,
               compress: bool = False) -> bytes:
    """CreateCopy twin. ``source_int16`` takes the writer's Int16 path
    (scale 1, offset 0, exact); otherwise the float path quantizes with
    the reference's truncating (v - min) / scale cast."""
    vals = np.asarray(vals)
    h, w = vals.shape
    ext = b""
    if gt is not None:
        ext = (b"bin\x00" + b"georef-extents".ljust(16, b"\x00")
               + struct.pack("<I", 34) + struct.pack("<H", 1)
               + struct.pack("<4d", gt[0], gt[0] + w * gt[1],
                             gt[3] + h * gt[5], gt[3]))
    hscale = abs(gt[1]) / 2 + abs(gt[5]) / 2 if gt is not None else 1.0
    out = [b"HF2\x00", struct.pack("<H", 0), struct.pack("<2i", w, h),
           struct.pack("<H", tile_size),
           struct.pack("<2f", vert_precision, hscale),
           struct.pack("<I", len(ext)), ext]
    nxb = (w + tile_size - 1) // tile_size
    nyb = (h + tile_size - 1) // tile_size
    for jb in range(nyb):
        th = min(tile_size, h - jb * tile_size)
        y1 = h - jb * tile_size
        y0 = y1 - th
        for ib in range(nxb):
            tw = min(tile_size, w - ib * tile_size)
            t = vals[y0:y1, ib * tile_size:ib * tile_size + tw]
            if source_int16:
                out.append(struct.pack("<2f", 1.0, 0.0))
                q = t.astype(np.int64)
            else:
                t32 = t.astype(np.float32)
                fmin = float(t32.min())
                fmax = float(t32.max())
                int_range = np.float32((np.float32(fmax) - np.float32(fmin))
                                       / np.float32(vert_precision))
                scale = (np.float32(1.0) if fmin == fmax else
                         np.float32((np.float32(fmax) - np.float32(fmin))
                                    / int_range))
                offset = np.float32(fmin)
                out.append(struct.pack("<2f", float(scale), float(offset)))
                # the reference's (int) cast truncates toward zero
                q = np.trunc((t32 - offset) / scale).astype(np.int64)
            _encode_tile_rows(q, out)
    blob = b"".join(out)
    return gzip.compress(blob) if compress else blob


def read_hf2(spark, path: str):
    from .gridpack import _cells_df

    vals, meta = decode_hf2(open(path, "rb").read())
    return _cells_df(spark, vals.astype(np.float64)), meta
