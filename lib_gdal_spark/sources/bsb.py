"""BSB/KAP nautical raster chart reader.

Reference: frmts/bsb/bsb_read.c + bsbdataset.cpp — an ASCII header of
TOK/... records (continuation lines spliced with commas,
BSBReadHeaderLine :589-658) terminated by 0x1A 0x00, then one byte of
color depth (1..7 bits; ASCII-digit variant tolerated after skipped
junk, :421-428) and RLE scanlines: each starts with a 7-bit
base-128 line marker (high bit = continuation), runs pack the pixel
value in the top nColorSize bits and a base-128 run count below
(:808-858); a row exactly one pixel short is padded with one zero
(:875-877). Line offsets come from the big-endian index table whose
position is the file's last 4 bytes when the table validates
(:474-566), else from sequential discovery. Header records: BSB/RA
dims, RGB/i,r,g,b palette, VER/, REF/n,pixel,line,lat,lon GCPs,
PLY/n,lat,lon cutline (emitted as the BSB_CUTLINE POLYGON string,
:699-735), KNP PR=/PP= projection hints — TRANSVERSE MERCATOR
reprojects the GCPs through lat0=0/k0=1/FE=0 Gauss-Krueger before the
least-squares geotransform fit (:442-465, :526-556). Read-only.
"""

from __future__ import annotations

import struct

import numpy as np


def _read_header_lines(data: bytes):
    """BSBReadHeaderLine: splice continuation lines, stop at 0x1A."""
    lines = []
    cur = []
    i = 0
    n = len(data)
    while i < n:
        c = data[i]
        if c == 0x1A:
            break
        if c in (0x0D, 0x0A):
            # peek past CR/LF run; continuation if next line starts
            # with blank
            j = i
            while j < n and data[j] in (0x0D, 0x0A):
                j += 1
            if j < n and data[j] in (0x20, 0x09) and cur:
                while j < n and data[j] in (0x20, 0x09):
                    j += 1
                cur.append(ord(","))
                i = j
                continue
            if cur:
                lines.append(bytes(cur).decode("ascii", "replace"))
                cur = []
            i = j
            continue
        cur.append(c)
        i += 1
    if cur:
        lines.append(bytes(cur).decode("ascii", "replace"))
    return lines, i


def read_bsb_grid(path: str) -> dict:
    with open(path, "rb") as f:
        data = f.read()
    lines, hdr_end = _read_header_lines(data)
    if not any(ln.startswith(("BSB/", "NOS/", "KNP/", "KNQ/"))
               for ln in lines):
        raise ValueError("not a BSB file (no BSB/NOS/KNP header)")
    nx = ny = 0
    pct: dict[int, tuple] = {}
    refs = []
    ply = []
    knp = None
    version = 0
    for ln in lines:
        if len(ln) < 4 or ln[3] != "/":
            continue
        toks = [t for t in ln[4:].replace("=", ",").split(",")]
        if ln.startswith("BSB/"):
            if "RA" in toks:
                k = toks.index("RA")
                nx, ny = int(toks[k + 1]), int(toks[k + 2])
        elif ln.startswith("NOS/"):
            if "RA" in toks:
                k = toks.index("RA")
                nx, ny = int(toks[k + 3]), int(toks[k + 4])
        elif ln.startswith("RGB/"):
            i = int(toks[0])
            pct[i] = (int(toks[1]), int(toks[2]), int(toks[3]))
        elif ln.startswith("VER/"):
            version = int(100 * float(toks[0]) + 0.5)
        elif ln.startswith("REF/"):
            refs.append((float(toks[1]), float(toks[2]),
                         float(toks[3]), float(toks[4])))
        elif ln.startswith("PLY/"):
            ply.append((toks[1], toks[2]))
        elif ln.startswith("KNP/"):
            knp = ln[4:]
    if nx == 0 or not pct:
        raise ValueError("BSB: missing RA dimensions or RGB palette")

    # skip to 0x1A 0x00 (junk-tolerant, :376-398)
    pos = hdr_end
    skipped = 0
    while skipped < 100 and not (data[pos] == 0x1A
                                 and data[pos + 1] == 0x00):
        if data[pos + 1] == 0x1A:
            pos += 1
        else:
            pos += 1
        skipped += 1
    if skipped >= 100:
        raise ValueError("BSB: no compressed data segment")
    pos += 2
    color_size = data[pos]
    pos += 1
    if skipped > 0 and 0x31 <= color_size <= 0x38:
        color_size -= 0x30
    if not 0 < color_size <= 7:
        raise ValueError(f"BSB: bad color depth {color_size}")
    first_line = pos

    # index table
    offsets = None
    n_rows = ny
    tbl = struct.unpack(">i", data[-4:])[0]
    if 0 < tbl and tbl + 4 * (ny - 1) == len(data) - 4:
        n_rows = ny - 1
    if first_line < tbl and tbl + 4 * n_rows <= len(data) - 4:
        cand = list(struct.unpack(f">{n_rows}i", data[tbl:tbl + 4 * n_rows]))
        ok = all(first_line <= cand[i] < tbl
                 and (i == n_rows - 1 or cand[i] <= cand[i + 1])
                 and _check_marker(data, cand[i], i)
                 for i in range(n_rows))
        if ok:
            offsets = cand
    try:
        return _decode_rows(data, nx, ny, n_rows, color_size, first_line,
                            tbl, offsets, pct, version, refs, ply, knp)
    except IndexError:
        raise ValueError("BSB: truncated file") from None


def _decode_rows(data, nx, ny, n_rows, color_size, first_line, tbl,
                 offsets, pct, version, refs, ply, knp):
    vals = np.zeros((n_rows, nx), np.uint8)
    shift = 7 - color_size
    vmask = ((1 << color_size) - 1) << shift
    cmask = (1 << shift) - 1
    if offsets is None:
        offsets = [first_line] + [None] * (n_rows - 1)
    limit = tbl if offsets and tbl > first_line else len(data)
    pos = first_line
    for row in range(n_rows):
        if offsets[row] is None:
            offsets[row] = pos
        p = offsets[row]
        p = _skip_marker(data, p, row)
        if p is None:
            raise ValueError(f"BSB: bad scanline marker at row {row}")
        ip = 0
        while True:  # refill loop (:820-921): a 0 byte mid-row that is
            # not followed by a valid next-line marker resumes the row
            while p < limit:
                b = data[p]
                p += 1
                if b == 0:
                    break
                pix = (b & vmask) >> shift
                run = b & cmask
                while b & 0x80:
                    if p >= limit:
                        raise ValueError("BSB: truncated file")
                    b = data[p]
                    p += 1
                    run = run * 128 + (b & 0x7F)
                if ip + run + 1 > nx:
                    run = nx - ip - 1
                if run < 0:
                    continue
                vals[row, ip:ip + run + 1] = pix
                ip += run + 1
            else:
                raise ValueError("BSB: truncated file")
            if ip == nx - 1:
                ip += 1  # one-pixel-short rows pad with zero
                break
            if ip >= nx or row == n_rows - 1:
                break
            if _skip_marker(data, p, row + 1) is not None:
                break  # genuine next row; short row stays zero-filled
        pos = p
    # band semantics (bsbdataset.cpp:130-137): palette indices are
    # 1-based; nonzero pixels are decremented so the band aligns with
    # a 0-based color table
    out_vals = np.where(vals > 0, vals - 1, 0)
    n_colors = max(pct)
    table = np.zeros((n_colors, 3), np.uint8)
    for i, rgb in pct.items():
        if i >= 1:
            table[i - 1] = rgb
    out = {"width": nx, "height": n_rows,
           "values": out_vals.astype(np.float64),
           "color_table": table, "color_size": color_size,
           "version": version, "refs": refs, "knp": knp,
           "cutline": None, "gt": None, "gcps": None}
    if ply:
        out["cutline"] = ("POLYGON ((" + ",".join(
            f"{lon} {lat}" for lat, lon in ply) + "))")
    if refs:
        out.update(_georef(refs, knp))
    return out


def _check_marker(data, p, row):
    return _skip_marker(data, p, row) is not None


def _skip_marker(data, p, row):
    """Base-128 line marker; returns position after it, or None."""
    marker = 0
    first = True
    while p < len(data):
        b = data[p]
        p += 1
        if row != 0 and marker == 0 and b == 0 and not first:
            continue  # extra-zero hack (:714-717)
        first = False
        marker = marker * 128 + (b & 0x7F)
        if not b & 0x80:
            break
    else:
        return None
    return p if marker in (row, row + 1) else None


def _georef(refs, knp):
    gcps = [(px, ln, lon, lat) for px, ln, lat, lon in refs]
    srs = None
    if knp:
        pr = pp = None
        for part in knp.split(","):
            if part.startswith("PR="):
                pr = part[3:]
            elif part.startswith("PP="):
                pp = part[3:]
        # KNP tokens may hold spaces: PR=TRANSVERSE MERCATOR survives
        # only if we scan the raw string
        i = knp.find("PR=")
        if i >= 0:
            j = knp.find(",", i)
            pr = knp[i + 3:j if j > 0 else None]
        if pr and pr.upper().startswith("TRANSVERSE MERCATOR") and pp:
            from ..geo import tmerc

            lon0 = float(pp)
            out = []
            for px, ln, lon, lat in gcps:
                x, y = tmerc.tmerc_forward(
                    np.array([lon]), np.array([lat]), lon0=lon0, k0=1.0,
                    false_e=0.0, false_n=0.0)
                out.append((px, ln, float(x[0]), float(y[0])))
            gcps = out
            srs = f"tmerc lon0={lon0} k0=1"
    A = np.array([[1.0, p, l] for p, l, _x, _y in gcps])
    cx, *_ = np.linalg.lstsq(A, np.array([g[2] for g in gcps]), rcond=None)
    cy, *_ = np.linalg.lstsq(A, np.array([g[3] for g in gcps]), rcond=None)
    return {"gt": (cx[0], cx[1], cx[2], cy[0], cy[1], cy[2]),
            "gcps": gcps, "srs": srs}


def read_bsb(spark, path: str):
    import pandas as pd

    g = read_bsb_grid(path)
    h, w = g["height"], g["width"]
    by, bx = np.mgrid[0:h, 0:w]
    pdf = pd.DataFrame({
        "bx": bx.ravel().astype(np.int64),
        "by": (h - 1 - by).ravel().astype(np.int64),
        "value": g["values"].ravel()})
    meta = {k: g[k] for k in g if k != "values"}
    return spark.createDataFrame(pdf), meta
