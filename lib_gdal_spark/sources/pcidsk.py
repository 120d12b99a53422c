"""PCIDSK (.pix) database file source.

Reference semantics (studied, re-expressed — no code copied):
frmts/pcidsk/sdk/core/cpcidskfile.cpp +
channel/cbandinterleavedchannel.cpp —
- 512-byte ASCII file header: width @384:8, height @392:8, channel
  count @376:8, image start block @304:16, image-header start block
  @336:16, interleaving @360:8, per-type channel counts @464.
- each channel has a 1024-byte image header at
  (ih_start_block-1)*512 + (ch-1)*1024: pixel type @160:8
  (8U/16S/16U/32R...), start byte @168:16, pixel offset @184:8,
  line offset @192:8 (BAND interleave); PIXEL interleave packs a
  512-padded pixel-group scanline from the image start block.
- tiled channels (SysBMDir block maps) are refused honestly.

utm.pix replays the autotest checksum 39576."""

from __future__ import annotations

import numpy as np

_DTYPES = {"8U": "u1", "16S": "<i2", "16U": "<u2", "32R": "<f4",
           "32S": "<i4", "32U": "<u4", "64R": "<f8"}


def read_pcidsk_array(path: str, band: int = 1):
    data = open(path, "rb").read()
    if data[:8] != b"PCIDSK  ":
        raise ValueError("not a PCIDSK payload")
    hdr = data[:512].decode("latin-1", "replace")

    def geti(off, n):
        s = hdr[off:off + n].strip()
        return int(s) if s else 0

    width = geti(384, 8)
    height = geti(392, 8)
    nchan = geti(376, 8)
    img_start = geti(304, 16)
    ih_start = geti(336, 16)
    interleave = hdr[360:368].strip()
    if band < 1 or band > nchan:
        raise ValueError(f"band {band} out of range 1..{nchan}")
    ih_off = (ih_start - 1) * 512 + (band - 1) * 1024
    ih = data[ih_off:ih_off + 1024].decode("latin-1", "replace")
    ptype = ih[160:168].strip()
    if ptype not in _DTYPES:
        raise ValueError(f"unsupported PCIDSK pixel type {ptype!r}")
    dt = np.dtype(_DTYPES[ptype])

    if interleave == "BAND":
        # internal BAND channels pack tightly from the image block in
        # channel order (cbandinterleavedchannel.cpp:61-65 — the
        # header's start/offset fields are only used for FILE
        # interleaving)
        start = (img_start - 1) * 512
        for c in range(band - 1):
            co = (ih_start - 1) * 512 + c * 1024
            ct = data[co + 160:co + 168].decode("latin-1").strip()
            start += np.dtype(_DTYPES.get(ct, "u1")).itemsize \
                * width * height
        vals = np.frombuffer(data, dt, count=width * height,
                             offset=start).reshape(height, width)
    elif interleave == "PIXEL":
        # pixel-group scanlines padded to 512 from the image block
        base = (img_start - 1) * 512
        # group size = sum of per-type sizes over all channels
        gsz = 0
        offs = []
        for c in range(nchan):
            co = (ih_start - 1) * 512 + c * 1024
            ct = data[co + 160:co + 168].decode("latin-1").strip()
            sz = np.dtype(_DTYPES.get(ct, "u1")).itemsize
            offs.append((gsz, ct))
            gsz += sz
        line = gsz * width
        if line % 512:
            line += 512 - line % 512
        my_off, my_t = offs[band - 1]
        mdt = np.dtype(_DTYPES[my_t])
        vals = np.empty((height, width), mdt)
        for r in range(height):
            row = data[base + r * line: base + r * line + gsz * width]
            vals[r] = np.frombuffer(
                np.ascontiguousarray(
                    np.frombuffer(row, np.uint8).reshape(width, gsz)
                    [:, my_off:my_off + mdt.itemsize]), mdt)
    else:
        raise ValueError(
            f"PCIDSK interleaving {interleave!r} unsupported")
    return vals, {"width": width, "height": height, "bands": nchan,
                  "interleave": interleave, "pixel_type": ptype}


def read_pcidsk(spark, path: str, band: int = 1):
    import pandas as pd

    vals, meta = read_pcidsk_array(path, band)
    v = vals.astype(np.float64)
    h, w = v.shape
    yy, xx = np.mgrid[0:h, 0:w]
    pdf = pd.DataFrame({"bx": xx.ravel().astype(np.int64),
                        "by": (h - 1 - yy).ravel().astype(np.int64),
                        "value": v.ravel()})
    return (spark.createDataFrame(pdf, "bx long, by long, value double"),
            meta)
