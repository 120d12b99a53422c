"""Terragen terrain (.ter) heightfield codec.

Reference: frmts/terragen/terragendataset.cpp — a 16-byte
"TERRAGENTERRAIN " signature then little-endian 4-byte chunk tags:
SIZE (uint16 n, square grid n+1 unless XPTS/YPTS follow), XPTS/YPTS
(uint16), SCAL (3 float32, y is the ground spacing; default 30 when
absent), CRAD/CRVM (skipped), ALTW (int16 heightScale, int16
baseHeight, then xpts*ypts int16 samples BOTTOM-TOP — raster row 0 is
the LAST file row, :255-263), EOF. Band: raw Int16 with
scale = SCAL/65536*heightScale and offset = SCAL*baseHeight (:70-71);
physical height = raw*scale + offset.

The writer replicates the reference's header + quantization exactly
(:444-620): SIZE/XPTS/YPTS, SCAL only when != 30, the heightscale/
baseheight convergence search over L2P/P2L with C truncation
semantics, and the per-pixel int16 cast of (f*mpe/SCAL - bh)*65536/hs
(:360-366), rows written bottom-top — so the reference's own
MINUSERPIXELVALUE/MAXUSERPIXELVALUE -> -unscale autotest replays
bit-for-bit (tests/test_terragen.py, checksum 4672).
"""

from __future__ import annotations

import struct

import numpy as np


def read_terragen_grid(path: str) -> dict:
    with open(path, "rb") as f:
        data = f.read()
    if data[:16] != b"TERRAGENTERRAIN ":
        raise ValueError("not a Terragen terrain file")
    pos = 16
    scal = 30.0
    xpts = ypts = None
    hs = bh = None
    vals = None

    def u16(p):
        return struct.unpack_from("<H", data, p)[0]

    while pos + 4 <= len(data):
        tag = data[pos:pos + 4]
        pos += 4
        if tag == b"SIZE":
            n = u16(pos)
            pos += 4
            if xpts is None:
                xpts = ypts = n + 1
        elif tag == b"XPTS":
            xpts = u16(pos)
            pos += 4
        elif tag == b"YPTS":
            ypts = u16(pos)
            pos += 4
        elif tag == b"SCAL":
            scal = float(struct.unpack_from("<f", data, pos + 4)[0])
            pos += 12
        elif tag == b"CRAD":
            pos += 4
        elif tag == b"CRVM":
            pos += 4
        elif tag == b"ALTW":
            hs, bh = struct.unpack_from("<hh", data, pos)
            pos += 4
            n = xpts * ypts
            vals = np.frombuffer(data, "<i2", count=n,
                                 offset=pos).reshape(ypts, xpts)
            pos += 2 * n
        elif tag == b"EOF ":
            break
        else:
            raise ValueError(f"Terragen: unknown chunk {tag!r}")
    if not xpts or not ypts or vals is None:
        raise ValueError("Terragen: missing SIZE/ALTW chunks")
    return {
        "width": xpts, "height": ypts, "scal": scal,
        "height_scale": hs, "base_height": bh,
        # bottom-top file order -> raster row 0 on top
        "values": np.ascontiguousarray(vals[::-1, :]).astype(np.int64),
        "scale": scal / 65536 * hs, "offset": scal * bh,
        "gt": (0.0, scal, 0.0, 0.0, 0.0, scal),
    }


def read_terragen(spark, path: str):
    """-> (cells DataFrame (bx, by, value), meta): RAW Int16 values
    (physical height = value*meta['scale'] + meta['offset']), by
    increasing northward (by = height-1-raster_row)."""
    import pandas as pd

    g = read_terragen_grid(path)
    h, w = g["height"], g["width"]
    by, bx = np.mgrid[0:h, 0:w]
    pdf = pd.DataFrame({
        "bx": bx.ravel().astype(np.int64),
        "by": (h - 1 - by).ravel().astype(np.int64),
        "value": g["values"].ravel().astype(np.float64)})
    meta = {k: g[k] for k in ("width", "height", "scal", "scale",
                              "offset", "gt", "height_scale",
                              "base_height")}
    return spark.createDataFrame(pdf), meta


def _search_quantization(span_px, hs0: int):
    """The reference's heightscale/baseheight convergence search
    (:566-600) with exact C semantics: L2P truncates toward zero."""
    def l2p(n, hs, bh):
        return int((n - bh) * 65536.0 / hs)

    def p2l(n, hs, bh):
        return float(n) / 65536.0 * hs + bh

    hs = max(1, hs0)
    while hs <= 32767:
        prevdelta = 1.0e30
        found = None
        bh = -32768
        while bh <= 32767:
            valley = l2p(span_px[0], hs, bh)
            if valley >= -32768:
                peak = l2p(span_px[1], hs, bh)
                if peak <= 32767:
                    d = p2l(valley, hs, bh)
                    delta = abs(d - span_px[0])
                    if delta < prevdelta:
                        prevdelta = delta
                    else:
                        bh -= 1
                        found = bh
                        break
            bh += 1
        if found is not None:
            return hs, found
        hs += 1
    raise ValueError("Terragen: no heightscale/baseheight fits the span")


def write_terragen(path: str, values, log_span, *, ground_scale: float,
                   meters_per_elev_unit: float = 1.0) -> str:
    """values: (H, W) float array, raster order (row 0 = top);
    log_span: (min, max) logical pixel values (the reference's
    MINUSERPIXELVALUE/MAXUSERPIXELVALUE creation options);
    ground_scale: average(|gt1|, |gt5|) of the source raster."""
    arr = np.asarray(values, np.float64)
    h, w = arr.shape
    scal = ground_scale * 1.0
    span_m = (log_span[0] * meters_per_elev_unit,
              log_span[1] * meters_per_elev_unit)
    span_px = (span_m[0] / scal, span_m[1] / scal)
    hs0 = int(span_px[1] - span_px[0])
    hs, bh = _search_quantization(span_px, hs0 if hs0 != 0 else 1)
    out = bytearray(b"TERRAGENTERRAIN ")
    out += b"SIZE" + struct.pack("<h", min(w, h) - 1) + b"\x00\x00"
    if w != h:
        out += b"XPTS" + struct.pack("<h", w) + b"\x00\x00"
        out += b"YPTS" + struct.pack("<h", h) + b"\x00\x00"
    if scal != 30.0:
        sc = struct.pack("<f", np.float32(scal))
        out += b"SCAL" + sc + sc + sc
    out += b"ALTW" + struct.pack("<hh", hs, bh)
    f = arr * meters_per_elev_unit / scal
    hv = np.trunc((f - bh) * 65536.0 / hs).astype(np.int64) \
        .astype(np.int16)
    out += np.ascontiguousarray(hv[::-1, :], dtype="<i2").tobytes()
    out += b"EOF "
    with open(path, "wb") as fp:
        fp.write(bytes(out))
    return path
