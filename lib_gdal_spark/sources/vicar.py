"""NASA/JPL VICAR (.vic) planetary image codec.

Reference: frmts/pds/vicardataset.cpp —
- ASCII label of LBLSIZE bytes: whitespace-separated KEY=VALUE tokens;
  values are ints, reals, 'strings' (with '' escaping an embedded
  quote) or (a, b, ...) arrays; PROPERTY='X' / TASK='X' tokens open
  named groups that following keys belong to. EOL=1 appends a second
  label after the data area.
- Layout: RECSIZE-byte records; data starts at LBLSIZE + RECSIZE*NLB;
  each record is NBB binary-prefix bytes + N1 samples; ORG maps
  (N1,N2,N3) to BSQ (samp,line,band) / BIL (samp,band,line) / BIP
  (band,samp,line).
- Types: FORMAT BYTE/HALF/WORD/FULL/LONG/REAL/DOUB/COMP with INTFMT
  LOW|HIGH and REALFMT IEEE (big-endian)|RIEEE (little)|VAX.
- VAX floats: port/cpl_vax.cpp — F-floats via the VICAR-project
  vax_ieee_r pair-swap + exponent-rebias (denormal truncation
  semantics preserved); D-floats via CPLVaxToIEEEDouble's hi/lo bit
  walk with the sticky rounding-bit OR.
- BASIC/BASIC2 compression (:586-711 basic_decode, :915-1040
  framing): per-record bitstream, 3-bit delta alphabet around `old`,
  run-length escapes (4/8/24-bit), byte-planar within the record
  (outer loop over the dtype's byte lanes). BASIC prefixes each
  record with its uint32 size; BASIC2 packs all record sizes
  immediately after the label.
- Georef: PROPERTY MAP group (:2009-2061) — gt0 = (SAMPLE_OFF + 0.5)
  * xdim * -1, gt3 = (LINE_OFF + 0.5) * -ydim, xdim = MAP_SCALE*1000.
- Band nodata 0/-32768/-32768. (BYTE/int/float, :16-18, applied for
  known instruments); M94_HRSC scale/offset from the DLRTO8/HRCAL
  reflectance keywords (:2843-2860).
- Binary prefixes (:96-260): fixed per-BLTYPE schemas from the
  reference's own frmts/pds/data/vicar.json; `hidden` fields skipped.
"""

from __future__ import annotations

import struct

import numpy as np

NODATA = {"BYTE": 0.0, "HALF": -32768.0, "FULL": -32768.0,
          "REAL": -32768.0, "DOUB": -32768.0, "COMP": -32768.0}

# the reference's own binary-prefix schema config (frmts/pds/data/
# vicar.json), trimmed to the fixtures' BLTYPEs
PREFIX_SCHEMAS = {
    "GDAL_AUTOTEST": {
        "size": 29,
        "fields": [
            ("unsigned_char", "unsigned char", False),
            ("unsigned_short", "unsigned short", False),
            ("unsigned_int", "unsigned int", False),
            ("unsigned_int_hidden", "unsigned int", True),
            ("short", "short", False),
            ("int", "int", False),
            ("float", "float", False),
            ("double", "double", False),
        ],
    },
}

_FIELD_FMT = {"unsigned char": ("B", 1), "unsigned byte": ("B", 1),
              "unsigned short": ("H", 2), "unsigned int": ("I", 4),
              "short": ("h", 2), "int": ("i", 4), "float": ("f", 4),
              "double": ("d", 8)}


# ------------------------------------------------------------ label

def _parse_value(tok: str):
    if tok.startswith("'"):
        return tok[1:-1].replace("''", "'")
    if tok.startswith("("):
        return [_parse_value(t.strip())
                for t in tok[1:-1].split(",") if t.strip() != ""]
    try:
        return int(tok)
    except ValueError:
        pass
    try:
        return float(tok)
    except ValueError:
        return tok


def _tokenize(text: str):
    """Yield (key, value-string) over a VICAR label body."""
    i, n = 0, len(text)
    while i < n:
        while i < n and text[i] in " \t\r\n\x00":
            i += 1
        if i >= n or text[i] == "\x00":
            break
        j = text.find("=", i)
        if j < 0:
            break
        key = text[i:j].strip()
        i = j + 1
        while i < n and text[i] in " \t":
            i += 1
        if i < n and text[i] == "'":
            k = i + 1
            while k < n:
                if text[k] == "'":
                    if k + 1 < n and text[k + 1] == "'":
                        k += 2
                        continue
                    break
                k += 1
            val = text[i:k + 1]
            i = k + 1
        elif i < n and text[i] == "(":
            k = text.find(")", i)
            val = text[i:k + 1]
            i = k + 1
        else:
            k = i
            while k < n and text[k] not in " \t\r\n\x00":
                k += 1
            val = text[i:k]
            i = k
        yield key, _parse_value(val)


def parse_label(data: bytes, offset: int = 0) -> dict:
    """Parse one VICAR label at `offset` -> nested dict with top-level
    keys plus PROPERTY/TASK group dicts (the json:VICAR shape)."""
    head = data[offset:offset + 64].decode("ascii", "replace")
    if not head.startswith("LBLSIZE"):
        raise ValueError("not a VICAR label (missing LBLSIZE)")
    lblsize = int(head.split("=", 1)[1].split()[0])
    text = data[offset:offset + lblsize].decode("ascii", "replace")
    out: dict = {"PROPERTY": {}, "TASK": {}}
    scope = out
    for key, val in _tokenize(text):
        if key == "PROPERTY":
            scope = out["PROPERTY"].setdefault(val, {})
        elif key == "TASK":
            scope = out["TASK"].setdefault(val, {})
        elif scope is out:
            out[key] = val
        else:
            scope[key] = val
    return out


def _merge_label(base: dict, eol: dict) -> dict:
    for k, v in eol.items():
        if k in ("PROPERTY", "TASK"):
            for name, grp in v.items():
                base[k].setdefault(name, {}).update(grp)
        elif k != "LBLSIZE":
            base[k] = v
    return base


def get_keyword(label: dict, dotted: str, default=None):
    """GetKeyword('MAP.X') -> PROPERTY or TASK group lookup;
    plain keys hit the top level."""
    if "." in dotted:
        grp, key = dotted.split(".", 1)
        for kind in ("PROPERTY", "TASK"):
            if grp in label[kind] and key in label[kind][grp]:
                return label[kind][grp][key]
        return default
    return label.get(dotted, default)


# ------------------------------------------------------------ VAX

def vax_to_ieee_f4(raw: bytes, count: int) -> np.ndarray:
    """VAX F-float -> IEEE float32, vectorized replica of vax_ieee_r
    (port/cpl_vax.cpp:275-345) including the truncating denormal
    shifts."""
    b = np.frombuffer(raw, np.uint8, count=count * 4).reshape(-1, 4)
    # real_byte_swap: logical order SE1 E2F1 F2 F3
    v = np.empty_like(b)
    v[:, 0] = b[:, 1]
    v[:, 1] = b[:, 0]
    v[:, 2] = b[:, 3]
    v[:, 3] = b[:, 2]
    u = (v[:, 0].astype(np.uint32) << 24) | (v[:, 1].astype(np.uint32) << 16) \
        | (v[:, 2].astype(np.uint32) << 8) | v[:, 3].astype(np.uint32)
    sign = u & 0x80000000
    exp = (u >> 23) & 0xFF
    frac = u & 0x7FFFFF
    out = np.empty(len(u), np.uint32)
    # normal: exponent - 2
    out[:] = sign | ((exp - 2).astype(np.uint32) << 23) | frac
    # exp==2 -> denormal, shift right 1 with restored leading bit
    m = exp == 2
    out[m] = sign[m] | (0x400000 | (frac[m] >> 1))
    # exp==1 -> shift right 2
    m = exp == 1
    out[m] = sign[m] | (0x200000 | (frac[m] >> 2))
    # exp==0: zero, or NaN when the (illegal) sign bit is set
    m = exp == 0
    out[m] = np.where(sign[m] != 0, np.uint32(0x7FFFFFFF), np.uint32(0))
    return out.view(np.float32).astype(np.float32)


def vax_to_ieee_f8(raw: bytes, count: int) -> np.ndarray:
    """VAX D-float -> IEEE float64 per CPLVaxToIEEEDouble
    (port/cpl_vax.cpp:31-121), sticky-OR rounding preserved."""
    b = np.frombuffer(raw, np.uint8, count=count * 8).reshape(-1, 8)
    d = np.empty_like(b)
    d[:, 2] = b[:, 0]
    d[:, 3] = b[:, 1]
    d[:, 0] = b[:, 2]
    d[:, 1] = b[:, 3]
    d[:, 6] = b[:, 4]
    d[:, 7] = b[:, 5]
    d[:, 4] = b[:, 6]
    d[:, 5] = b[:, 7]
    u = np.ascontiguousarray(d).view("<u4").reshape(-1, 2)
    hi = u[:, 0].astype(np.uint64)
    lo = u[:, 1].astype(np.uint64)
    sign = hi & 0x80000000
    exp = (hi >> 23) & 0xFF
    exp = np.where(exp != 0, exp - 129 + 1023, 0)
    rnd = lo & 7
    lo = lo >> np.uint64(3)
    lo = (lo & 0x1FFFFFFF) | ((hi << np.uint64(29)) & 0xFFFFFFFF)
    lo = np.where(rnd != 0, lo | np.uint64(1), lo)
    hi = (hi >> np.uint64(3)) & 0xFFFFF
    hi = hi | (exp << np.uint64(20)) | sign
    return ((hi << np.uint64(32)) | lo).view(np.float64)


# ------------------------------------------------------------ BASIC

_COD1MASK = [0, 0x1, 0x3, 0x7, 0xF, 0x1F, 0x3F, 0x7F, 0xFF]


def basic_decode(code: bytes, ns: int, wid: int) -> bytearray:
    """Direct translation of basic_decode (vicardataset.cpp:643-711):
    byte-planar 3-bit delta stream with run-length escapes."""
    buf = bytearray(ns * wid)
    pos = 0
    bit1 = 0
    cmprtrns1 = (-3, -2, -1, 0, 1, 2, 3)

    def grab(nbit):
        nonlocal pos, bit1
        shift = 8 - nbit - bit1
        if pos >= len(code):
            raise ValueError("BASIC: out of decoding buffer")
        if shift > 0:
            val = (code[pos] >> shift) & _COD1MASK[nbit]
            bit1 += nbit
            return val
        if shift < 0:
            v1 = code[pos] & _COD1MASK[nbit + shift]
            pos += 1
            if pos >= len(code):
                raise ValueError("BASIC: out of decoding buffer")
            v2 = (code[pos] >> (8 + shift)) & _COD1MASK[-shift]
            bit1 = -shift
            return ((v1 << (-shift)) + v2) & 0xFF
        val = code[pos] & _COD1MASK[nbit]
        pos += 1
        bit1 = 0
        return val

    run = -3
    nval = 999999
    old = 0
    ptop = ns * wid
    for iw in range(wid):
        ip = iw
        while ip < ptop:
            if run > -3:
                buf[ip] = nval & 0xFF
                run -= 1
                ip += wid
                continue
            val = grab(3)
            if val < 7:
                nval = (old + cmprtrns1[val]) & 0xFFFFFFFF
                buf[ip] = nval & 0xFF
                old = nval
                ip += wid
                continue
            val = grab(1)
            if val:
                runc = grab(4)
                if runc == 15:
                    runc = grab(8)
                    if runc == 255:
                        p0, p1, p2 = grab(8), grab(8), grab(8)
                        run = p0 | (p1 << 8) | (p2 << 16)
                    else:
                        run = runc + 15
                else:
                    run = runc
                val = grab(3)
                if val < 7:
                    nval = (old + cmprtrns1[val]) & 0xFFFFFFFF
                else:
                    nval = grab(8)
                buf[ip] = nval & 0xFF
                old = nval
            else:
                val = grab(8)
                buf[ip] = val
                old = val
            ip += wid
    return buf


# ------------------------------------------------------------ read

def _dtype(label: dict):
    fmt = label.get("FORMAT", "BYTE")
    intfmt = label.get("INTFMT", "LOW")
    realfmt = label.get("REALFMT", "VAX")
    ien = "<" if intfmt == "LOW" else ">"
    ren = {"IEEE": ">", "RIEEE": "<", "VAX": "VAX"}.get(realfmt, "VAX")
    table = {"BYTE": ("u1", 1, None), "HALF": (ien + "i2", 2, None),
             "WORD": (ien + "i2", 2, None), "FULL": (ien + "i4", 4, None),
             "LONG": (ien + "i4", 4, None),
             "REAL": (ren + "f4" if ren != "VAX" else "VAXF", 4, "real"),
             "DOUB": (ren + "f8" if ren != "VAX" else "VAXD", 8, "real"),
             "COMP": (ren + "f4" if ren != "VAX" else "VAXF", 8, "comp")}
    if fmt not in table:
        raise NotImplementedError(f"VICAR FORMAT {fmt!r}")
    return fmt, table[fmt]


def read_vicar_grid(path: str) -> dict:
    with open(path, "rb") as f:
        data = f.read()
    label = parse_label(data)
    lblsize = label["LBLSIZE"]
    recsize = label["RECSIZE"]
    nbb = label.get("NBB", 0)
    nlb = label.get("NLB", 0)
    ns, nl, nb = label.get("NS", 1), label.get("NL", 1), label.get("NB", 1)
    org = label.get("ORG", "BSQ")
    fmt, (dt, itemsize, kind) = _dtype(label)
    n1 = {"BSQ": ns, "BIL": ns, "BIP": nb}[org]
    nrec = {"BSQ": nl * nb, "BIL": nb * nl, "BIP": ns * nl}[org]
    data_off = lblsize + recsize * nlb
    compress = label.get("COMPRESS", "NONE")
    if label.get("EOL", 0) == 1:
        if compress in ("BASIC", "BASIC2"):
            # compressed data has no fixed record stride: the EOL label
            # offset comes from the EOCI1/EOCI2 64-bit pair
            eol_off = (label.get("EOCI2", 0) << 32) | label.get("EOCI1", 0)
        else:
            eol_off = lblsize + recsize * (nlb + nrec)
        if 0 < eol_off < len(data):
            label = _merge_label(label, parse_label(data, eol_off))
    vals_per = 2 if kind == "comp" else 1
    if compress in ("BASIC", "BASIC2"):
        if org != "BSQ":
            raise NotImplementedError("compressed non-BSQ VICAR")
        nrecords = nl * nb
        rows = []
        if compress == "BASIC":
            off = data_off + 4
            for _r in range(nrecords):
                size = struct.unpack_from("<I", data, off - 4)[0]
                rows.append(basic_decode(
                    data[off:off + size - 4], ns * vals_per,
                    itemsize // vals_per))
                off += size
        else:
            sizes = [struct.unpack_from("<I", data, data_off + 4 * i)[0]
                     for i in range(nrecords)]
            off = data_off + 4 * nrecords
            for size in sizes:
                rows.append(basic_decode(
                    data[off:off + size], ns * vals_per,
                    itemsize // vals_per))
                off += size
        raw = b"".join(bytes(r) for r in rows)
        flat = _convert(raw, dt, kind, nl * nb * ns * vals_per, itemsize)
        cube = flat.reshape(nb, nl, ns * vals_per)
    else:
        payload = bytearray()
        for r in range(nrec):
            start = data_off + r * recsize + nbb
            chunk = data[start:start + n1 * itemsize]
            payload += chunk + b"\x00" * (n1 * itemsize - len(chunk))
        flat = _convert(bytes(payload), dt, kind, nrec * n1 * vals_per,
                        itemsize)
        if org == "BSQ":
            cube = flat.reshape(nb, nl, ns * vals_per)
        elif org == "BIL":
            cube = flat.reshape(nl, nb, ns * vals_per).transpose(1, 0, 2)
        else:  # BIP
            cube = flat.reshape(nl, ns, nb * vals_per)
            cube = np.stack(
                [cube[:, :, b * vals_per:(b + 1) * vals_per]
                 .reshape(nl, ns * vals_per) for b in range(nb)])
    out = {"label": label, "width": ns, "height": nl, "bands": nb,
           "format": fmt, "complex": kind == "comp",
           "values": np.ascontiguousarray(cube),
           "nodata": NODATA[fmt]}
    out.update(_georef(label))
    out.update(_scale_offset(label))
    return out


def _convert(raw: bytes, dt: str, kind, count: int, itemsize: int):
    if dt == "VAXF":
        return vax_to_ieee_f4(raw, count).astype(np.float64)
    if dt == "VAXD":
        return vax_to_ieee_f8(raw, count)
    return np.frombuffer(raw, dt, count=count).astype(np.float64)


def _georef(label: dict) -> dict:
    m = label["PROPERTY"].get("MAP")
    if not m or "MAP_SCALE" not in m:
        return {}
    xdim = float(m["MAP_SCALE"]) * 1000.0
    ydim = float(m["MAP_SCALE"]) * -1000.0
    gt0 = gt3 = 0.5
    if "LINE_PROJECTION_OFFSET" in m:
        gt3 = (float(m["LINE_PROJECTION_OFFSET"]) + 0.5) * -ydim * 1.0
    if "SAMPLE_PROJECTION_OFFSET" in m:
        gt0 = (float(m["SAMPLE_PROJECTION_OFFSET"]) + 0.5) * xdim * -1.0
    return {"gt": (gt0, xdim, 0.0, gt3, 0.0, ydim),
            "projection": m.get("MAP_PROJECTION_TYPE"),
            "target": m.get("TARGET_NAME"),
            "center_lon": m.get("CENTER_LONGITUDE"),
            "radius_m": (float(m["A_AXIS_RADIUS"]) * 1000.0
                         if "A_AXIS_RADIUS" in m else None)}


def _scale_offset(label: dict) -> dict:
    out = {"scale": 1.0, "offset": 0.0}
    if label.get("BLTYPE") == "M94_HRSC":
        s = get_keyword(label, "DLRTO8.REFLECTANCE_SCALING_FACTOR", -1.0)
        if s < 0:
            s = get_keyword(label, "HRCAL.REFLECTANCE_SCALING_FACTOR", 1.0)
        o = get_keyword(label, "DLRTO8.REFLECTANCE_OFFSET", -1.0)
        if o < 0:
            o = get_keyword(label, "HRCAL.REFLECTANCE_OFFSET", 0.0)
        out = {"scale": float(s), "offset": float(o)}
    dtm = label["PROPERTY"].get("DTM")
    if dtm:
        out = {"scale": float(dtm.get("DTM_SCALING_FACTOR", 1.0)),
               "offset": float(dtm.get("DTM_OFFSET", 0.0))}
        if "DTM_MISSING_DN" in dtm:
            out["nodata"] = float(dtm["DTM_MISSING_DN"])
    return out


def read_vicar_prefixes(path: str) -> list[dict]:
    """Binary-prefix records as dicts (the OGR layer view), per the
    BLTYPE schema; hidden fields skipped."""
    with open(path, "rb") as f:
        data = f.read()
    label = parse_label(data)
    bltype = label.get("BLTYPE", "")
    if bltype not in PREFIX_SCHEMAS:
        raise NotImplementedError(f"no prefix schema for BLTYPE {bltype!r}")
    schema = PREFIX_SCHEMAS[bltype]
    nbb = label.get("NBB", 0)
    if schema["size"] > nbb:
        raise ValueError("prefix schema larger than NBB")
    ien = "<" if label.get("BINTFMT", "LOW") == "LOW" else ">"
    realfmt = label.get("BREALFMT", "VAX")
    nrec = label.get("N2", label.get("NL", 1)) * label.get("N3", 1)
    recsize = label["RECSIZE"]
    off0 = label["LBLSIZE"] + recsize * label.get("NLB", 0)
    out = []
    for r in range(nrec):
        base = off0 + r * recsize
        rec = {}
        pos = 0
        for name, typ, hidden in schema["fields"]:
            code, size = _FIELD_FMT[typ]
            chunk = data[base + pos:base + pos + size]
            if code in ("f", "d") and realfmt == "VAX":
                v = float((vax_to_ieee_f4(chunk, 1)
                           if code == "f" else vax_to_ieee_f8(chunk, 1))[0])
            elif code in ("f", "d"):
                ren = ">" if realfmt == "IEEE" else "<"
                v = struct.unpack(ren + code, chunk)[0]
            else:
                v = struct.unpack(ien + code, chunk)[0]
            if not hidden:
                rec[name] = v
            pos += size
        out.append(rec)
    return out


def read_vicar(spark, path: str, band: int = 1):
    """-> (cells DataFrame (bx, by, value), meta); complex bands
    expose (bx, by, re, im)."""
    import pandas as pd

    g = read_vicar_grid(path)
    h, w = g["height"], g["width"]
    by, bx = np.mgrid[0:h, 0:w]
    plane = g["values"][band - 1]
    cols = {"bx": bx.ravel().astype(np.int64),
            "by": (h - 1 - by).ravel().astype(np.int64)}
    if g["complex"]:
        cols["re"] = plane.reshape(h, w, 2)[:, :, 0].ravel()
        cols["im"] = plane.reshape(h, w, 2)[:, :, 1].ravel()
    else:
        cols["value"] = plane.ravel()
    meta = {k: g[k] for k in g if k != "values"}
    return spark.createDataFrame(pd.DataFrame(cols)), meta


# ------------------------------------------------------------ write

_W_FMT = {"BYTE": "u1", "HALF": "<i2", "FULL": "<i4",
          "REAL": "<f4", "DOUB": "<f8"}


def write_vicar(path: str, values, fmt: str = "BYTE",
                properties: dict | None = None) -> str:
    """Minimal conformant writer: BSQ, little-endian (INTFMT=LOW,
    REALFMT=RIEEE), uncompressed; values (NB, NL, NS) or (NL, NS)."""
    arr = np.asarray(values)
    if arr.ndim == 2:
        arr = arr[None, :, :]
    nb, nl, ns = arr.shape
    if fmt not in _W_FMT:
        raise NotImplementedError(f"write FORMAT {fmt!r}")
    itemsize = np.dtype(_W_FMT[fmt]).itemsize
    recsize = ns * itemsize
    pieces = [
        f"FORMAT='{fmt}'", "TYPE='IMAGE'", "BUFSIZ=20480", "DIM=3",
        "EOL=0", f"RECSIZE={recsize}", "ORG='BSQ'", f"NL={nl}",
        f"NS={ns}", f"NB={nb}", f"N1={ns}", f"N2={nl}", f"N3={nb}",
        "N4=0", "NBB=0", "NLB=0", "HOST='X86-64-LINX'", "INTFMT='LOW'",
        "REALFMT='RIEEE'", "BHOST='X86-64-LINX'", "BINTFMT='LOW'",
        "BREALFMT='RIEEE'", "BLTYPE=''", "COMPRESS='NONE'",
    ]
    for name, grp in (properties or {}).items():
        pieces.append(f"PROPERTY='{name}'")
        for k, v in grp.items():
            if isinstance(v, str):
                pieces.append(f"{k}='{v.replace(chr(39), chr(39) * 2)}'")
            elif isinstance(v, (list, tuple)):
                pieces.append(f"{k}=({', '.join(str(x) for x in v)})")
            else:
                pieces.append(f"{k}={v}")
    body = "  ".join(pieces)
    # LBLSIZE must cover the label and be a multiple of RECSIZE
    base = len("LBLSIZE=0000000000  ") + len(body)
    lblsize = ((base + recsize - 1) // recsize) * recsize
    head = f"LBLSIZE={lblsize}".ljust(len("LBLSIZE=0000000000"))
    text = (head + "  " + body).ljust(lblsize, " ")
    with open(path, "wb") as f:
        f.write(text.encode("ascii"))
        f.write(np.ascontiguousarray(arr, _W_FMT[fmt]).tobytes())
    return path
