"""Baseline JPEG (SOF0/SOF1, 8-bit) decoder, bit-parity with the
reference's vendored libjpeg.

Reference semantics (studied, re-expressed — no code copied):
frmts/jpeg/libjpeg/ —
- inverse DCT: the default jpeg_idct_islow fixed-point algorithm
  (jidctint.c:78-380): CONST_BITS=13 / PASS1_BITS=2 constants,
  column pass descaled by CONST_BITS-PASS1_BITS, row pass by
  CONST_BITS+PASS1_BITS+3, rounding right-shifts, and the post-IDCT
  range limit that level-shifts by +128 and clamps to [0,255]
  (jdmaster.c:248-273 table semantics).
- upsampling: the default do_fancy_upsampling=TRUE path —
  h2v2_fancy_upsample (jdsample.c:346-391: 3:1 row blend then the
  9/3/3/1 horizontal taps with the +8/+7 rounding pair) and
  h2v1_fancy_upsample (:305-334); non-fancy box expansion for other
  integral ratios and for downsampled_width <= 2 (:452-469).
  Context rows duplicate the edge row at the image top/bottom
  (jdmainct.c funny-pointer semantics).
- color: ycc_rgb_convert's SCALEBITS=16 integer tables
  (jdcolor.c:61-104): R = y + ((FIX(1.40200)(Cr-128) + 32768)>>16),
  B likewise with FIX(1.77200)(Cb-128), G = y + ((-FIX(0.34414)
  (Cb-128) - FIX(0.71414)(Cr-128) + 32768) >> 16), clamped.
- entropy: baseline Huffman with 0xFF00 stuffing, RSTn restart
  markers resetting DC predictors on byte boundaries (jdhuff.c
  semantics), EXTEND sign rule.

The parity claim is testable: the reference's own autotest accepts
albania.jpg band-2 checksum 34296 (libjpeg 9b), 34298 (libjpeg 8) or
17016 (every other libjpeg generation, incl. libjpeg-turbo) — this
decoder lands EXACTLY on 17016, and the appended-validity-mask path
reproduces masked.jpg's mask checksum 770.

Spark-first: whole-file decode (entropy state is sequential), one
task per file; batch the per-block IDCT across all blocks in NumPy.
"""

from __future__ import annotations

import struct

import numpy as np

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64)

# jidctint.c CONST_BITS=13 fixed-point constants
_F0_298631336 = 2446
_F0_390180644 = 3196
_F0_541196100 = 4433
_F0_765366865 = 6270
_F0_899976223 = 7373
_F1_175875602 = 9633
_F1_501321110 = 12299
_F1_847759065 = 15137
_F1_961570560 = 16069
_F2_053119869 = 16819
_F2_562915447 = 20995
_F3_072711026 = 25172
_CONST_BITS = 13
_PASS1_BITS = 2


def _descale(x: np.ndarray, n: int) -> np.ndarray:
    return (x + (1 << (n - 1))) >> n


def _idct_pass(c) -> tuple:
    """One islow butterfly over axis-0 indices 0..7 of an
    (8, ...) int64 array; returns the 8 outputs BEFORE descaling."""
    z2, z3 = c[2], c[6]
    z1 = (z2 + z3) * _F0_541196100
    t2 = z1 - z3 * _F1_847759065
    t3 = z1 + z2 * _F0_765366865
    t0 = (c[0] + c[4]) << _CONST_BITS
    t1 = (c[0] - c[4]) << _CONST_BITS
    t10, t13 = t0 + t3, t0 - t3
    t11, t12 = t1 + t2, t1 - t2
    w0, w1, w2, w3 = c[7], c[5], c[3], c[1]
    z1 = w0 + w3
    z2 = w1 + w2
    z3 = w0 + w2
    z4 = w1 + w3
    z5 = (z3 + z4) * _F1_175875602
    w0 = w0 * _F0_298631336
    w1 = w1 * _F2_053119869
    w2 = w2 * _F3_072711026
    w3 = w3 * _F1_501321110
    z1 = z1 * -_F0_899976223
    z2 = z2 * -_F2_562915447
    z3 = z3 * -_F1_961570560 + z5
    z4 = z4 * -_F0_390180644 + z5
    w0 += z1 + z3
    w1 += z2 + z4
    w2 += z2 + z3
    w3 += z1 + z4
    return (t10 + w3, t11 + w2, t12 + w1, t13 + w0,
            t13 - w0, t12 - w1, t11 - w2, t10 - w3)


def idct_islow(blocks: np.ndarray, quant: np.ndarray) -> np.ndarray:
    """(n, 64) zigzag-order coefficients + 64-entry zigzag-order
    quant table -> (n, 8, 8) uint8 samples (level-shifted, clamped).
    Vectorized across blocks; numerically identical to jidctint.c
    including both descale points."""
    deq = (blocks.astype(np.int64) * quant.astype(np.int64))
    nat = np.empty_like(deq)
    nat[:, ZIGZAG] = deq
    b = nat.reshape(-1, 8, 8)
    # pass 1: columns (axis -2)
    cols = np.moveaxis(b, 1, 0)  # (8 rows, n, 8 cols)
    ws = np.stack(
        [_descale(v, _CONST_BITS - _PASS1_BITS)
         for v in _idct_pass(cols)])
    # pass 2: rows — index along the last axis
    rows = np.moveaxis(ws, 2, 0)  # (8 cols, 8 rows, n)
    out = np.stack(
        [_descale(v, _CONST_BITS + _PASS1_BITS + 3)
         for v in _idct_pass(rows)])
    # out[col, row, n] -> (n, row, col); +128 level shift + clamp is
    # the post-IDCT range-limit table (jdmaster.c:248-273)
    samples = np.transpose(out, (2, 1, 0))
    return np.clip(samples + 128, 0, 255).astype(np.uint8)


class _Huff:
    def __init__(self, counts: bytes, values: bytes):
        self.lut = {}
        code = 0
        k = 0
        for ln in range(1, 17):
            for _ in range(counts[ln - 1]):
                self.lut[(ln, code)] = values[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first reader over entropy data with 0xFF00 stuffing and
    RSTn detection (jdhuff.c byte-level semantics)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                self.acc = (self.acc << 8) | 0xFF  # pad like jdhuff
                self.nbits += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                    self.acc = (self.acc << 8) | 0xFF
                    self.nbits += 8
                    continue
                # a real marker (RSTn / EOI): stop feeding
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                self.pos = self.pos  # stay on the marker
                return
            self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def decode(self, table: _Huff) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.bit()
            v = table.lut.get((ln, code))
            if v is not None:
                return v
        raise ValueError("JPEG: bad Huffman code")

    def restart(self):
        """Byte-align and consume an RSTn marker."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        p = self.pos
        while p + 1 < len(d) and not (
                d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7):
            p += 1
        self.pos = p + 2


def _extend(v: int, n: int) -> int:
    return v - (1 << n) + 1 if n and v < (1 << (n - 1)) else v


def decode_jpeg(data: bytes):
    """-> (array, meta): (h, w) uint8 for grayscale, (h, w, 3) RGB
    otherwise."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    hdc: dict[int, _Huff] = {}
    hac: dict[int, _Huff] = {}
    comps = None
    W = H = 0
    restart_interval = 0
    adobe_transform = None
    scan = None
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("JPEG: marker desync")
        m = data[pos + 1]
        if m == 0xD9:
            break
        ln = struct.unpack_from(">H", data, pos + 2)[0]
        seg = data[pos + 4: pos + 2 + ln]
        if m == 0xDB:
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                if pq == 0:
                    qt[tq] = np.frombuffer(seg, np.uint8, 64,
                                           p + 1).astype(np.int64)
                    p += 65
                else:
                    qt[tq] = np.frombuffer(
                        seg, ">u2", 64, p + 1).astype(np.int64)
                    p += 129
            pos += 2 + ln
        elif m == 0xC4:
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                counts = seg[p + 1: p + 17]
                nv = sum(counts)
                values = seg[p + 17: p + 17 + nv]
                (hdc if tc == 0 else hac)[th] = _Huff(counts, values)
                p += 17 + nv
            pos += 2 + ln
        elif m in (0xC0, 0xC1):
            prec = seg[0]
            if prec != 8:
                raise NotImplementedError("JPEG: only 8-bit baseline")
            H = (seg[1] << 8) | seg[2]
            W = (seg[3] << 8) | seg[4]
            nc = seg[5]
            comps = []
            for c in range(nc):
                cid = seg[6 + 3 * c]
                samp = seg[7 + 3 * c]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 15,
                              "tq": seg[8 + 3 * c]})
            pos += 2 + ln
        elif m in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG: non-baseline SOF 0x{m:02x} (progressive / "
                "lossless) unsupported")
        elif m == 0xDD:
            restart_interval = struct.unpack_from(">H", data, pos + 4)[0]
            pos += 2 + ln
        elif m == 0xEE and seg[:5] == b"Adobe":
            adobe_transform = seg[11] if len(seg) > 11 else 0
            pos += 2 + ln
        elif m == 0xDA:
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scan.append({"id": cs, "dc": tt >> 4, "ac": tt & 15})
            pos += 2 + ln
            break
        else:
            pos += 2 + ln
    if comps is None or scan is None:
        raise ValueError("JPEG: missing SOF/SOS")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (W + 8 * hmax - 1) // (8 * hmax)
    mcuy = (H + 8 * vmax - 1) // (8 * vmax)
    order = []
    for s in scan:
        c = next(cc for cc in comps if cc["id"] == s["id"])
        c.update(dc=s["dc"], ac=s["ac"])
        order.append(c)
    for c in comps:
        c["bw"] = mcux * c["h"]
        c["bh"] = mcuy * c["v"]
        c["blocks"] = np.zeros((c["bh"] * c["bw"], 64), np.int32)

    br = _BitReader(data, pos)
    pred = {c["id"]: 0 for c in comps}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count \
                    and mcu_count % restart_interval == 0:
                br.restart()
                for k in pred:
                    pred[k] = 0
            for c in order:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = np.zeros(64, np.int32)
                        t = br.decode(hdc[c["dc"]])
                        diff = _extend(br.bits(t), t) if t else 0
                        pred[c["id"]] += diff
                        blk[0] = pred[c["id"]]
                        k = 1
                        while k < 64:
                            rs = br.decode(hac[c["ac"]])
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r != 15:
                                    break
                                k += 16
                                continue
                            k += r
                            if k > 63:
                                raise ValueError("JPEG: AC overflow")
                            blk[k] = _extend(br.bits(s), s)
                            k += 1
                        row = my * c["v"] + by
                        col = mx * c["h"] + bx
                        c["blocks"][row * c["bw"] + col] = blk
            mcu_count += 1

    planes = []
    for c in comps:
        samp = idct_islow(c["blocks"], qt[c["tq"]])
        plane = (samp.reshape(c["bh"], c["bw"], 8, 8)
                 .transpose(0, 2, 1, 3)
                 .reshape(c["bh"] * 8, c["bw"] * 8))
        dw = (W * c["h"] + hmax - 1) // hmax
        dh = (H * c["v"] + vmax - 1) // vmax
        c["plane"] = plane[:dh, :dw]
        planes.append(c)

    full = [_upsample(c, W, H, hmax, vmax) for c in comps]
    if len(comps) == 1:
        return full[0], {"width": W, "height": H, "bands": 1}
    if len(comps) == 3:
        transform = adobe_transform if adobe_transform is not None else 1
        if transform == 0:
            rgb = np.stack(full, axis=-1)
        else:
            rgb = _ycc_rgb(full[0], full[1], full[2])
        return rgb, {"width": W, "height": H, "bands": 3}
    raise NotImplementedError("JPEG: CMYK not supported")


def _h2v1_fancy(p: np.ndarray) -> np.ndarray:
    v = p.astype(np.int32)
    left = np.roll(v, 1, axis=1)
    left[:, 0] = v[:, 0]
    right = np.roll(v, -1, axis=1)
    right[:, -1] = v[:, -1]
    out = np.empty((v.shape[0], v.shape[1] * 2), np.int32)
    out[:, 0::2] = (v * 3 + left + 1) >> 2
    out[:, 1::2] = (v * 3 + right + 2) >> 2
    out[:, 0] = v[:, 0]
    out[:, -1] = v[:, -1]
    return out.astype(np.uint8)


def _h2v2_fancy(p: np.ndarray) -> np.ndarray:
    v = p.astype(np.int32)
    h = v.shape[0]
    up = v[np.clip(np.arange(h) - 1, 0, h - 1)]
    dn = v[np.clip(np.arange(h) + 1, 0, h - 1)]
    out_rows = []
    for other in (up, dn):
        t = v * 3 + other  # column sums
        left = np.roll(t, 1, axis=1)
        left[:, 0] = t[:, 0]
        right = np.roll(t, -1, axis=1)
        right[:, -1] = t[:, -1]
        row = np.empty((h, t.shape[1] * 2), np.int32)
        row[:, 0::2] = (t * 3 + left + 8) >> 4
        row[:, 1::2] = (t * 3 + right + 7) >> 4
        row[:, 0] = (t[:, 0] * 4 + 8) >> 4
        row[:, -1] = (t[:, -1] * 4 + 7) >> 4
        out_rows.append(row)
    out = np.empty((h * 2, out_rows[0].shape[1]), np.int32)
    out[0::2] = out_rows[0]
    out[1::2] = out_rows[1]
    return out.astype(np.uint8)


def _upsample(c: dict, W: int, H: int, hmax: int, vmax: int):
    p = c["plane"]
    he = hmax // c["h"]
    ve = vmax // c["v"]
    if he == 1 and ve == 1:
        return p[:H, :W]
    if he == 2 and ve == 1 and p.shape[1] > 2:
        return _h2v1_fancy(p)[:H, :W]
    if he == 2 and ve == 2 and p.shape[1] > 2:
        return _h2v2_fancy(p)[:H, :W]
    return np.repeat(np.repeat(p, ve, axis=0), he, axis=1)[:H, :W]


def _ycc_rgb(y, cb, cr) -> np.ndarray:
    i = np.arange(256, dtype=np.int64)
    x = i - 128
    crr = (91881 * x + 32768) >> 16      # FIX(1.40200)
    cbb = (116130 * x + 32768) >> 16     # FIX(1.77200)
    crg = -46802 * x                     # -FIX(0.71414)
    cbg = -22554 * x + 32768             # -FIX(0.34414) + ONE_HALF
    yl = y.astype(np.int64)
    r = yl + crr[cr]
    b = yl + cbb[cb]
    g = yl + ((cbg[cb] + crg[cr]) >> 16)
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


def read_jpeg(spark, path: str, band: int | None = None):
    """-> (cells DataFrame, meta); same grid convention as read_png."""
    with open(path, "rb") as f:
        arr, meta = decode_jpeg(f.read())
    if arr.ndim == 3 and band is not None:
        arr = arr[:, :, band - 1]
    if arr.ndim == 3:
        h, w, nb = arr.shape
        rows = [(c, h - 1 - r, [float(arr[r, c, b]) for b in range(nb)])
                for r in range(h) for c in range(w)]
        return (spark.createDataFrame(
            rows, "bx long, by long, vals array<double>"), meta)
    h, w = arr.shape
    rows = [(c, h - 1 - r, float(arr[r, c]))
            for r in range(h) for c in range(w)]
    return (spark.createDataFrame(rows, "bx long, by long, value double"),
            meta)


def decode_jpeg_mask(data: bytes) -> np.ndarray | None:
    """GDAL's appended validity bitmask (jpgdataset.cpp:3500-3650):
    trailing [zlib bitmask][LE uint32 jpeg-size] after the EOI. Bits
    are one per pixel in row-major y*W+x order, LSB-first within each
    byte by default (the MSB heuristic only fires for the single-
    transition #5102 shape). -> (h, w) uint8 mask of 0/255, or None
    when no appendix is present."""
    import zlib

    if len(data) < 8:
        return None
    nimg = struct.unpack("<I", data[-4:])[0]
    if not (2 <= nimg <= len(data) - 4 and nimg >= len(data) // 2):
        return None
    if data[nimg - 2:nimg] != b"\xff\xd9":
        return None
    _arr, meta = decode_jpeg(data[:nimg])
    H, W = meta["height"], meta["width"]
    try:
        bits = zlib.decompress(data[nimg:-4])
    except zlib.error:
        return None
    b = np.frombuffer(bits, np.uint8)
    idx = np.arange(H * W)
    lsb = ((b[idx >> 3] >> (idx & 7)) & 1).reshape(H, W)
    use_msb = False
    if W > 8 and H > 1:
        msb = ((b[idx >> 3] >> (7 - (idx & 7))) & 1).reshape(H, W)
        row = msb[0]
        changes = np.nonzero(row[1:] != row[:-1])[0]
        if len(changes) == 1 and (changes[0] + 1) % 8 != 0 \
                and np.array_equal(msb[0], msb[1]):
            use_msb = True
            lsb = msb
    return (lsb * 255).astype(np.uint8)
