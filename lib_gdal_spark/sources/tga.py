"""Truevision TGA (TARGA) image codec.

Reference: frmts/tga/tgadataset.cpp — image types 1/2/3 (uncompressed
color-mapped / true-color / grayscale) and 9/10/11 (their RLE twins):

- 18-byte header: id-length, colormap-type, image-type, colormap spec
  (first-index u16, length u16, entry-size u8), origin x/y u16,
  width/height u16, pixel-depth u8, image-descriptor u8.
- Orientation: descriptor bit 5 set = rows stored TOP-down, else
  bottom-up (tgadataset.cpp:289-291 flips to north-up).
- True-color byte order is BGR(A); 16-bit pixels expand 5-5-5 with
  <<3 per channel (tgadataset.cpp:375,418,508); colormap entries of
  15/16 bits expand the same way (:268-270), 24/32-bit entries are
  B,G,R(,A).
- RLE packets: high bit = run (count low7+1, ONE pixel repeated),
  else raw block of count+1 pixels; runs may CROSS scanlines
  (the ffmpeg-sample fixtures pin this), so the stream decodes
  sequentially.
- Fourth channel: present when (descriptor & 15) == 8; the v2 footer's
  extension area (TRUEVISION-XFILE. tail, tgadataset.cpp:589-668)
  refines it — attribute type 1 drops the channel, 2 keeps it as
  non-alpha — and carries AUTHOR_NAME (offset 2, 40 chars), COMMENTS
  (4 x 81 at offset 43) and the attribute type (offset 494); the
  header's ID field surfaces as IMAGE_ID.

Pure-NumPy decode feeding the multimodal pipeline's image kernels
(fixture-scale; the distributed face is mapInPandas over binary
columns, like sources/png.py)."""

from __future__ import annotations

import numpy as np

_UNC_COLORMAP, _UNC_TRUECOLOR, _UNC_GRAY = 1, 2, 3
_RLE_COLORMAP, _RLE_TRUECOLOR, _RLE_GRAY = 9, 10, 11


def _expand_entries(raw: np.ndarray, entry_bits: int) -> np.ndarray:
    """Colormap payload -> (n, 4) uint8 RGBA."""
    if entry_bits in (15, 16):
        v = raw.view("<u2").astype(np.uint32)
        out = np.stack([((v >> 10) & 31) << 3, ((v >> 5) & 31) << 3,
                        (v & 31) << 3,
                        np.full(v.shape, 255, np.uint32)], axis=1)
        return out.astype(np.uint8)
    spp = entry_bits // 8
    e = raw.reshape(-1, spp)
    n = len(e)
    out = np.full((n, 4), 255, np.uint8)
    out[:, 0] = e[:, 2]
    out[:, 1] = e[:, 1]
    out[:, 2] = e[:, 0]
    if spp == 4:
        out[:, 3] = e[:, 3]
    return out


def _rle_decode(data: bytes, n_pixels: int, bpp: int) -> np.ndarray:
    """Sequential RLE packet stream -> flat pixel bytes (n_pixels*bpp)."""
    out = np.empty(n_pixels * bpp, np.uint8)
    src = np.frombuffer(data, np.uint8)
    si = 0
    di = 0
    end = n_pixels * bpp
    while di < end:
        ctrl = int(src[si])
        si += 1
        count = (ctrl & 0x7F) + 1
        if ctrl & 0x80:
            px = src[si:si + bpp]
            si += bpp
            run = np.tile(px, count)
        else:
            run = src[si:si + count * bpp]
            si += count * bpp
        take = min(len(run), end - di)
        out[di:di + take] = run[:take]
        di += take
    return out


def decode_tga(data: bytes):
    """-> (bands, meta): bands is a list of (h, w) uint8/uint16 arrays
    NORTH-UP (gray or indices = 1 band; true-color = R,G,B(,4th));
    meta carries width/height/color_table/image_id/author_name/
    comments/fourth_is_alpha/nodata."""
    if len(data) < 18:
        raise ValueError("not a TGA payload")
    idlen = data[0]
    cmap_type = data[1]
    img_type = data[2]
    if img_type not in (_UNC_COLORMAP, _UNC_TRUECOLOR, _UNC_GRAY,
                        _RLE_COLORMAP, _RLE_TRUECOLOR, _RLE_GRAY):
        raise ValueError(f"unsupported TGA image type {img_type}")
    cm_first = int.from_bytes(data[3:5], "little")
    cm_len = int.from_bytes(data[5:7], "little")
    cm_bits = data[7]
    w = int.from_bytes(data[12:14], "little")
    h = int.from_bytes(data[14:16], "little")
    depth = data[16]
    descriptor = data[17]
    if w == 0 or h == 0:
        raise ValueError("empty TGA raster")

    meta = {"width": w, "height": h, "color_table": None,
            "image_id": None, "author_name": None, "comments": None,
            "fourth_is_alpha": None, "nodata": None}
    off = 18
    if idlen:
        meta["image_id"] = data[18:18 + idlen].decode("latin-1")
        off += idlen
    has_cmap = cmap_type == 1 and img_type in (_UNC_COLORMAP,
                                               _RLE_COLORMAP)
    if cmap_type == 1:
        cm_bytes = cm_len * (2 if cm_bits in (15, 16) else cm_bits // 8)
        if has_cmap:
            ct = np.zeros((cm_first + cm_len, 4), np.uint8)
            ct[:, 3] = 255
            ct[cm_first:] = _expand_entries(
                np.frombuffer(data, np.uint8, count=cm_bytes, offset=off),
                cm_bits)
            meta["color_table"] = ct
            # single fully-transparent 32-bit entry = nodata index
            # (tgadataset.cpp:236-257)
            if cm_bits == 32:
                zeros = np.nonzero(ct[cm_first:, 3] == 0)[0]
                if len(zeros) == 1:
                    meta["nodata"] = float(cm_first + zeros[0])
        off += cm_bytes

    has_fourth = (descriptor & 15) == 8
    fourth_is_alpha = has_fourth
    # v2 footer + extension area
    if len(data) >= 26 and data[-18:] == b"TRUEVISION-XFILE.\x00":
        ext_off = int.from_bytes(data[-26:-22], "little")
        if ext_off > 0 and ext_off + 495 <= len(data):
            ext = data[ext_off:ext_off + 495]
            if int.from_bytes(ext[0:2], "little") >= 495:
                if ext[2] not in (0x20, 0):
                    meta["author_name"] = (
                        ext[2:42].split(b"\x00")[0].decode("latin-1")
                        .rstrip(" "))
                if ext[43] not in (0x20, 0):
                    lines = []
                    for i in range(4):
                        seg = ext[43 + 81 * i:43 + 81 * i + 80]
                        if seg[:1] == b"\x00":
                            break
                        lines.append(seg.split(b"\x00")[0]
                                     .decode("latin-1").rstrip(" "))
                    meta["comments"] = "\n".join(lines)
                attr_type = ext[494]
                if attr_type == 1:
                    has_fourth = False
                elif attr_type == 2:
                    fourth_is_alpha = False

    gray16 = depth == 16 and img_type in (_UNC_GRAY, _RLE_GRAY)
    bpp = depth // 8
    n_px = w * h
    if img_type in (_RLE_COLORMAP, _RLE_TRUECOLOR, _RLE_GRAY):
        flat = _rle_decode(data[off:], n_px, bpp)
    else:
        flat = np.frombuffer(data, np.uint8, count=n_px * bpp, offset=off)

    top_down = bool(descriptor & (1 << 5))

    def orient(a):
        return a if top_down else a[::-1]

    if img_type in (_UNC_GRAY, _RLE_GRAY) or (
            img_type in (_UNC_COLORMAP, _RLE_COLORMAP)):
        if gray16:
            img = flat.view("<u2").reshape(h, w)
        elif depth == 16:
            img = flat.view("<u2").reshape(h, w)  # 16-bit indices
        else:
            img = flat.reshape(h, w)
        bands = [orient(img).copy()]
    elif depth == 16:
        v = flat.view("<u2").reshape(h, w).astype(np.uint32)
        bands = [orient((((v >> s) & 31) << 3).astype(np.uint8)).copy()
                 for s in (10, 5, 0)]
    else:
        px = flat.reshape(h, w, bpp)
        bands = [orient(px[:, :, 2]).copy(), orient(px[:, :, 1]).copy(),
                 orient(px[:, :, 0]).copy()]
        if bpp == 4 and has_fourth:
            bands.append(orient(px[:, :, 3]).copy())
    meta["fourth_is_alpha"] = bool(fourth_is_alpha) if len(bands) == 4 \
        else None
    return bands, meta


def read_tga(spark, path: str, band: int = 1):
    """Spark face -> ((bx, by, value) DataFrame, meta), north-up cells
    like every raster source in this engine."""
    import pandas as pd

    bands, meta = decode_tga(open(path, "rb").read())
    vals = bands[band - 1].astype(np.float64)
    h, w = vals.shape
    yy, xx = np.mgrid[0:h, 0:w]
    pdf = pd.DataFrame({"bx": xx.ravel().astype(np.int64),
                        "by": (h - 1 - yy).ravel().astype(np.int64),
                        "value": vals.ravel()})
    return (spark.createDataFrame(pdf, "bx long, by long, value double"),
            meta)
