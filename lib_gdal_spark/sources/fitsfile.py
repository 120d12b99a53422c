"""FITS (Flexible Image Transport System) reader.

Reference: frmts/fits/fitsdataset.cpp — 2880-byte blocks of 80-char
header cards; the primary HDU and XTENSION='IMAGE' extensions carry
images (BITPIX 8/16/32/-32/-64, big-endian, data rows stored BOTTOM
first, :1743-1744), BSCALE/BZERO expose as band scale/offset, BLANK
as nodata; non-structural cards merge into dataset metadata with
later HDUs overriding (quoted values keep their blank padding). A
file whose primary HDU is empty must carry at least one image
extension; multiple image HDUs surface as subdatasets
("HDU n (WxH, b band[s])[, EXTNAME]"). Georeferencing replays the
reference's WCS path (:3475-3530): cd = CDELT*PC (or CD matrix),
radfac = pi/180 * A_RADIUS, gt = (crval1*radfac - gt1*(crpix1-0.5),
cd00*radfac, cd01*radfac, -gt5*(crpix2-0.5), cd10*radfac,
-cd11*radfac).
"""

from __future__ import annotations

import math
import re

import numpy as np

_BITPIX = {8: ">u1", 16: ">i2", 32: ">i4", -32: ">f4", -64: ">f8"}


def _parse_cards(block_iter):
    """Yield (key, value-string-or-None) until END; consume blocks."""
    cards = []
    done = False
    used = 0
    for block in block_iter:
        used += 1
        for i in range(0, 2880, 80):
            card = block[i:i + 80].decode("ascii", "replace")
            key = card[:8].strip()
            if key == "END":
                done = True
                break
            if not key or key in ("COMMENT", "HISTORY", "CONTINUE"):
                continue
            if card[8:10] != "= ":
                continue
            body = card[10:]
            m = re.match(r"\s*'((?:[^']|'')*)'", body)
            if m:
                value = m.group(1).replace("''", "'")
            else:
                value = body.split("/")[0].strip()
            cards.append((key, value))
        if done:
            break
    return cards, used, done


def _hdu_headers(data: bytes):
    """Split the file into HDUs: [(cards, data_offset, data_len)]."""
    hdus = []
    pos = 0
    n = len(data)
    while pos < n:
        blocks = (data[p:p + 2880]
                  for p in range(pos, n, 2880))
        cards, used, done = _parse_cards(blocks)
        if not done:
            break
        kv = dict(cards)
        pos += used * 2880
        naxis = int(kv.get("NAXIS", "0") or 0)
        size = 1
        for ax in range(1, naxis + 1):
            size *= int(kv.get(f"NAXIS{ax}", "0") or 0)
        bitpix = int(kv.get("BITPIX", "8") or 8)
        nbytes = size * abs(bitpix) // 8 if naxis > 0 else 0
        hdus.append((cards, kv, pos, nbytes))
        pos += ((nbytes + 2879) // 2880) * 2880
    return hdus


_STRUCTURAL = re.compile(
    r"^(SIMPLE|BITPIX|NAXIS\d*|EXTEND|XTENSION|PCOUNT|GCOUNT|END|"
    r"BSCALE|BZERO|BLANK|CTYPE\d|CRVAL\d|CRPIX\d|CDELT\d|PC\d_\d|"
    r"CD\d_\d|A_RADIUS|B_RADIUS|C_RADIUS|OBJECT|LONGSTRN|"
    r"CHECKSUM|DATASUM)$")


def read_fits(path: str, hdu: int | None = None) -> dict:
    with open(path, "rb") as f:
        data = f.read()
    if not data.startswith(b"SIMPLE  ="):
        raise ValueError("not a FITS file")
    hdus = _hdu_headers(data)
    images = []
    metadata: dict[str, str] = {}
    for idx, (cards, kv, off, nbytes) in enumerate(hdus):
        is_image = (idx == 0 and int(kv.get("NAXIS", "0") or 0) >= 2) \
            or kv.get("XTENSION", "").strip() == "IMAGE" \
            and int(kv.get("NAXIS", "0") or 0) >= 2
        if idx == 0 or kv.get("XTENSION", "").strip() == "IMAGE":
            for k, v in cards:
                if not _STRUCTURAL.match(k):
                    metadata[k] = v
        if not is_image:
            continue
        nx = int(kv["NAXIS1"])
        ny = int(kv["NAXIS2"])
        nb = int(kv.get("NAXIS3", "1") or 1) \
            if int(kv.get("NAXIS", "2") or 2) >= 3 else 1
        bitpix = int(kv["BITPIX"])
        if bitpix not in _BITPIX:
            raise NotImplementedError(f"FITS BITPIX {bitpix}")
        dt = _BITPIX[bitpix]
        count = nb * ny * nx
        raw = data[off:off + count * abs(bitpix) // 8]
        raw = raw + b"\x00" * (count * abs(bitpix) // 8 - len(raw))
        arr = np.frombuffer(raw, dt, count).astype(np.float64) \
            .reshape(nb, ny, nx)[:, ::-1, :]  # bottom-first -> N-up
        images.append({
            "hdu": idx + 1, "width": nx, "height": ny, "bands": nb,
            "values": np.ascontiguousarray(arr),
            "scale": float(kv.get("BSCALE", "1") or 1),
            "offset": float(kv.get("BZERO", "0") or 0),
            "nodata": (float(kv["BLANK"]) if "BLANK" in kv else None),
            "extname": kv.get("EXTNAME", "").strip() or None,
            "kv": kv,
        })
    if not images:
        raise ValueError("FITS: no image HDU found")
    subdatasets = None
    if len(images) > 1 and hdu is None:
        subdatasets = [
            (f'FITS:"{path}":{im["hdu"]}',
             f'HDU {im["hdu"]} ({im["width"]}x{im["height"]}, '
             f'{im["bands"]} band'
             + ("s" if im["bands"] > 1 else "") + ")"
             + (f', {im["extname"]}' if im["extname"] else ""))
            for im in images]
        chosen = None
    else:
        if hdu is not None:
            match = [im for im in images if im["hdu"] == hdu]
            if not match:
                raise ValueError(f"FITS: HDU {hdu} is not an image")
            chosen = match[0]
        else:
            chosen = images[0]
    out = {"metadata": metadata, "subdatasets": subdatasets,
           "images": images, "gt": None}
    if chosen is not None:
        out.update({k: chosen[k] for k in
                    ("width", "height", "bands", "values", "scale",
                     "offset", "nodata")})
        out["gt"] = _georef(chosen["kv"])
    return out


def _georef(kv: dict):
    if "CRPIX1" not in kv or "A_RADIUS" not in kv:
        return None
    crval1 = float(kv.get("CRVAL1", "0") or 0)
    crpix1 = float(kv["CRPIX1"])
    crpix2 = float(kv.get("CRPIX2", "0") or 0)
    a_radius = float(kv["A_RADIUS"])
    if "CDELT1" in kv:
        cdelt1 = float(kv["CDELT1"])
        cdelt2 = float(kv.get("CDELT2", kv["CDELT1"]))
        pc = [float(kv.get(f"PC{i}_{j}", "1" if i == j else "0") or 0)
              for i in (1, 2) for j in (1, 2)]
        cd = [cdelt1 * pc[0], cdelt1 * pc[1],
              cdelt2 * pc[2], cdelt2 * pc[3]]
    elif "CD1_1" in kv:
        cd = [float(kv.get(f"CD{i}_{j}", "0") or 0)
              for i in (1, 2) for j in (1, 2)]
    else:
        return None
    radfac = math.pi / 180.0 * a_radius
    gt1 = cd[0] * radfac
    gt2 = cd[1] * radfac
    gt4 = cd[2] * radfac
    gt5 = -cd[3] * radfac
    if crval1 > 180.0:
        crval1 -= 180.0
    return (crval1 * radfac - gt1 * (crpix1 - 0.5), gt1, gt2,
            -gt5 * (crpix2 - 0.5), gt4, gt5)
