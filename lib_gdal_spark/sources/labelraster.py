"""Label-driven raw raster formats: ERMapper ERS, NASA PDS3, ISIS2.

Reference semantics (studied, re-expressed — no code copied):
- frmts/ers/ersdataset.cpp + ershdrnode.cpp — Begin/End keyword tree
  with '#' comments outside quotes and {...} multi-line values; BIL
  layout over the sibling data file; geotransform from
  RegistrationCoord (Eastings/Northings, or DMS Latitude/Longitude via
  ERSDMS2Dec) minus the RegistrationCellX/Y offset (:1145-1205);
  CellType ladder; NullCellValue.
- frmts/pds/pdsdataset.cpp — ODL label (OBJECT/GROUP nesting flattened
  to dotted paths like the NASAKeywordHandler), ^IMAGE pointer forms
  (record, <BYTES>, detached file, (file, offset)) (:784-1010), BSQ/
  BIL/BIP BAND_STORAGE_TYPE, SAMPLE_TYPE byte-order table,
  SAMPLE_BITS/LINES/LINE_SAMPLES/BANDS, scaling/offset/missing as
  metadata, and the MAP_SCALE (km default) + SAMPLE/LINE_PROJECTION_
  OFFSET geotransform with the documented 0.5 shifts and -1 sample
  multiplier (:300-400,695).
- frmts/pds/isis2dataset.cpp — ^QUBE pointer, AXIS_NAME layout,
  CORE_ITEMS (ns, nl, nb), CORE_ITEM_BYTES/TYPE (SUN_* = MSB, PC_* =
  LSB), SUFFIX_ITEMS side planes refused like the reference.

Truncated data files read as zero-padded, matching RawRasterBand's
behavior on short reads — the reference autotest fixtures are
deliberately truncated and their checksums assume it.

Spark-first: label parse is driver-side; pixels land in the engine's
(bx, by, value) grid convention (by increases upward).
"""

from __future__ import annotations

import os
import re

import numpy as np
from pyspark.sql import SparkSession

# ------------------------------------------------------------- common


def _zero_padded(path: str, offset: int, count: int,
                 dtype: np.dtype) -> np.ndarray:
    """Read count items at byte offset; short files pad with zeros."""
    isz = dtype.itemsize
    with open(path, "rb") as f:
        f.seek(offset)
        raw = f.read(count * isz)
    if len(raw) < count * isz:
        raw = raw + b"\x00" * (count * isz - len(raw))
    return np.frombuffer(raw, dtype, count=count)


def _cells_df(spark: SparkSession, band: np.ndarray):
    ny, nx = band.shape
    rows = [(x, ny - 1 - y, float(band[y, x]))
            for y in range(ny) for x in range(nx)]
    return spark.createDataFrame(rows, "bx long, by long, value double")


# ----------------------------------------------------------------- ERS

_ERS_TYPES = {
    "unsigned8bitinteger": np.dtype("u1"),
    "signed8bitinteger": np.dtype("i1"),
    "unsigned16bitinteger": np.dtype("<u2"),
    "signed16bitinteger": np.dtype("<i2"),
    "unsigned32bitinteger": np.dtype("<u4"),
    "signed32bitinteger": np.dtype("<i4"),
    "ieee4bytereal": np.dtype("<f4"),
    "ieee8bytereal": np.dtype("<f8"),
}


def _ers_tokenize(text: str):
    """Strip '#' comments outside double-quoted strings. Quote state
    carries ACROSS lines (a quoted value may span lines inside {}), and
    backslash escapes consume the next char so \\\" doesn't toggle."""
    out = []
    res: list[str] = []
    inq = False
    i = 0
    skipping = False
    while i < len(text):
        c = text[i]
        if c == "\n":
            out.append("".join(res))
            res = []
            skipping = False
            i += 1
            continue
        if skipping:
            i += 1
            continue
        if inq and c == "\\" and i + 1 < len(text):
            res.append(c)
            res.append(text[i + 1])
            i += 2
            continue
        if c == '"':
            inq = not inq
        if c == "#" and not inq:
            skipping = True
            i += 1
            continue
        res.append(c)
        i += 1
    if res:
        out.append("".join(res))
    return out


def parse_ers_header(text: str) -> dict:
    """-> flat dict with dotted keys (ERSHdrNode semantics)."""
    lines = _ers_tokenize(text)
    flat = {}
    stack: list[str] = []
    i = 0
    while i < len(lines):
        line = lines[i].strip()
        i += 1
        if not line:
            continue
        m = re.match(r"(\w+)\s+Begin$", line, re.I)
        if m:
            stack.append(m.group(1))
            continue
        m = re.match(r"(\w+)\s+End$", line, re.I)
        if m:
            if stack:
                stack.pop()
            continue
        if "=" in line:
            k, _, v = line.partition("=")
            v = v.strip()
            # brace values may continue over lines until the closing }
            if v.startswith("{") and "}" not in v:
                while i < len(lines) and "}" not in v:
                    v += " " + lines[i].strip()
                    i += 1
            v = v.strip()
            if v.startswith("{") and v.endswith("}"):
                v = v[1:-1].strip()
            if v.startswith('"') and v.endswith('"') and len(v) >= 2:
                v = v[1:-1]
            # keys are case-insensitive in the reference (the
            # caseinsensitive.ers autotest): canonicalize to lowercase
            key = ".".join([*stack[1:], k.strip()]).lower()
            flat[key] = v
    return flat


def _dms2dec(s: str) -> float:
    """ERSDMS2Dec: D:M:S with the sign on the degrees field."""
    parts = s.strip().split(":")
    d = float(parts[0])
    m = float(parts[1]) if len(parts) > 1 else 0.0
    sec = float(parts[2]) if len(parts) > 2 else 0.0
    mag = abs(d) + m / 60.0 + sec / 3600.0
    return -mag if s.strip().startswith("-") else mag


def open_ers(path: str):
    """-> (bands (nb, ny, nx) ndarray, meta with geotransform/nodata)."""
    hdr = parse_ers_header(open(path, "r", errors="replace").read())
    nx = int(hdr["rasterinfo.nrofcellsperline"])
    ny = int(hdr["rasterinfo.nroflines"])
    nb = int(hdr.get("rasterinfo.nrofbands", "1"))
    ct = hdr.get("rasterinfo.celltype", "Unsigned8BitInteger")
    dt = _ERS_TYPES[ct.strip().lower()]
    if hdr.get("byteorder", "LSBFirst").lower() == "msbfirst":
        dt = dt.newbyteorder(">")
    datafile = hdr.get("datafile")
    if datafile:
        data_path = os.path.join(os.path.dirname(path), datafile)
    else:
        data_path = path[:-4] if path.lower().endswith(".ers") else path
    offset = int(float(hdr.get("headeroffset", "0")))
    flat = _zero_padded(data_path, offset, nx * ny * nb, dt)
    # ERS raw layout is BIL: per line, all bands
    bands = flat.reshape(ny, nb, nx).transpose(1, 0, 2)
    bands = bands.astype(dt.newbyteorder("="))

    gt = None
    xd = float(hdr.get("rasterinfo.cellinfo.xdimension", "1.0"))
    yd = float(hdr.get("rasterinfo.cellinfo.ydimension", "1.0"))
    east = hdr.get("rasterinfo.registrationcoord.eastings")
    lat = hdr.get("rasterinfo.registrationcoord.latitude")
    if east is not None:
        gt = [float(east), xd, 0.0,
              float(hdr["rasterinfo.registrationcoord.northings"]),
              0.0, -yd]
    elif lat is not None and "rasterinfo.cellinfo.xdimension" in hdr:
        gt = [_dms2dec(hdr["rasterinfo.registrationcoord.longitude"]),
              xd, 0.0, _dms2dec(lat), 0.0, -yd]
    if gt is not None:
        cx = float(hdr.get("rasterinfo.registrationcellx", "0"))
        cy = float(hdr.get("rasterinfo.registrationcelly", "0"))
        gt[0] -= cx * gt[1] + cy * gt[2]
        gt[3] -= cx * gt[4] + cy * gt[5]
        gt = tuple(gt)
    nodata = hdr.get("rasterinfo.nullcellvalue")
    return bands, {"geotransform": gt,
                   "nodata": float(nodata) if nodata else None,
                   "header": hdr}


def read_ers(spark: SparkSession, path: str, band: int = 1):
    bands, meta = open_ers(path)
    return _cells_df(spark, bands[band - 1]), meta


# ------------------------------------------------------------ ODL/PDS

def _odl_split_statements(text: str):
    """Yield KEY, VALUE statements honoring /* */ comments, quoted
    strings spanning lines, and parenthesised/braced groups."""
    text = re.sub(r"/\*.*?(\*/|$)", "", text, flags=0)  # per-line comments
    lines = text.splitlines()
    i = 0
    while i < len(lines):
        line = lines[i].strip()
        i += 1
        if not line or line == "END":
            continue
        if "=" not in line:
            continue
        k, _, v = line.partition("=")
        v = v.strip()
        # continue while quotes or groups are unbalanced, or the value
        # is empty (value on the next line)
        def unbalanced(s):
            if s.count('"') % 2 == 1:
                return True
            if s.count("(") > s.count(")"):
                return True
            if s.count("{") > s.count("}"):
                return True
            return s == ""
        while i < len(lines) and unbalanced(v):
            v += "\n" + lines[i].strip()
            i += 1
        yield k.strip(), v.strip()


def parse_odl(text: str) -> dict:
    """PDS3/ISIS2 ODL label -> flat dict with dotted OBJECT/GROUP
    paths (NASAKeywordHandler semantics)."""
    flat = {}
    stack: list[str] = []
    for k, v in _odl_split_statements(text):
        ku = k.upper()
        if ku in ("OBJECT", "GROUP"):
            stack.append(v.strip().strip('"'))
            continue
        if ku in ("END_OBJECT", "END_GROUP"):
            if stack:
                stack.pop()
            continue
        key = ".".join([*stack, k])
        if key not in flat:
            flat[key] = v
    return flat


def _odl_num(v: str, default: float = 0.0) -> float:
    m = re.match(r"\s*\"?([-+]?\d+\.?\d*(?:[eE][-+]?\d+)?)", v or "")
    return float(m.group(1)) if m else default


def _odl_unit(v: str) -> str:
    m = re.search(r"<([^>]*)>", v or "")
    return (m.group(1) if m else "").strip().upper()


def _pds_dtype(sample_type: str, bits: int) -> np.dtype:
    st = sample_type.strip().strip('"').upper()
    lsb = any(t in st for t in ("LSB", "PC_", "VAX"))
    order = "<" if lsb else ">"
    if "REAL" in st or "FLOAT" in st:
        return np.dtype(f"{order}f{bits // 8}")
    unsigned = "UNSIGNED" in st or (bits == 8 and "SIGNED" not in st)
    kind = "u" if unsigned else "i"
    return np.dtype(f"{order}{kind}{bits // 8}")


def open_pds(path: str, sample_shift: float = 0.5,
             line_shift: float = 0.5):
    """-> (bands (nb, ny, nx), meta). PDS3 attached or detached label.
    sample_shift/line_shift mirror PDS_SampleProjOffset_Shift /
    PDS_LineProjOffset_Shift (documented PDS3 default 0.5; several
    products need -0.5, as the reference autotests do)."""
    raw = open(path, "rb").read()
    label = raw.decode("latin-1", errors="replace")
    kw = parse_odl(label)
    if "PDS_VERSION_ID" not in kw and "^IMAGE" not in kw:
        raise ValueError("not a PDS3 label")
    # the IMAGE object may nest under UNCOMPRESSED_FILE (osPrefix in
    # pdsdataset.cpp) — flatten that prefix away
    if "IMAGE.LINES" not in kw:
        pref = "UNCOMPRESSED_FILE."
        for k in list(kw):
            if k.startswith(pref) and k[len(pref):] not in kw:
                kw[k[len(pref):]] = kw[k]

    ptr = kw.get("^IMAGE", "")
    record_bytes = int(_odl_num(kw.get("IMAGE.RECORD_BYTES",
                                       kw.get("RECORD_BYTES", "1")), 1))
    data_path = path
    skip = 0
    m = re.match(r'\(\s*"?([^",)]+)"?\s*(?:,\s*(\d+)\s*(<BYTES>)?)?\s*\)',
                 ptr.strip())
    if m:   # ("FILE.IMG", n) / ("FILE.IMG", n <BYTES>) / ("FILE.IMG")
        data_path = os.path.join(os.path.dirname(path), m.group(1))
        n = int(m.group(2) or 1)
        skip = (n - 1) if m.group(3) else (n - 1) * record_bytes
    elif ptr.strip().startswith('"'):
        data_path = os.path.join(os.path.dirname(path),
                                 ptr.strip().strip('"'))
        skip = 0
    elif ptr.strip():
        n = int(_odl_num(ptr))
        skip = (n - 1) if "<BYTES>" in ptr else (n - 1) * record_bytes
    if not os.path.exists(data_path):
        alt = os.path.join(os.path.dirname(data_path),
                           os.path.basename(data_path).lower())
        if os.path.exists(alt):
            data_path = alt
    skip += int(_odl_num(kw.get("IMAGE.LINE_PREFIX_BYTES", "0")))

    nx = int(_odl_num(kw["IMAGE.LINE_SAMPLES"]))
    ny = int(_odl_num(kw["IMAGE.LINES"]))
    nb = int(_odl_num(kw.get("IMAGE.BANDS", "1"), 1))
    bits = int(_odl_num(kw.get("IMAGE.SAMPLE_BITS", "8"), 8))
    dt = _pds_dtype(kw.get("IMAGE.SAMPLE_TYPE", "MSB_INTEGER"), bits)
    flat = _zero_padded(data_path, skip, nx * ny * nb, dt)
    storage = kw.get("IMAGE.BAND_STORAGE_TYPE", "").strip('"').upper()
    if storage == "LINE_INTERLEAVED":      # BIL
        bands = flat.reshape(ny, nb, nx).transpose(1, 0, 2)
    elif storage == "SAMPLE_INTERLEAVED":  # BIP
        bands = flat.reshape(ny, nx, nb).transpose(2, 0, 1)
    else:                                  # BSQ default
        bands = flat.reshape(nb, ny, nx)
    bands = bands.astype(dt.newbyteorder("="))

    # geotransform (pdsdataset.cpp:300-400 with documented defaults)
    gt = None
    pfx = "IMAGE_MAP_PROJECTION."
    scale = kw.get(pfx + "MAP_SCALE")
    if scale is not None:
        xd = _odl_num(scale)
        unit = _odl_unit(scale).split("/")[0]
        if unit in ("M", "METER", "METERS"):
            pass
        elif unit == "CM":
            xd /= 100.0
        else:
            xd *= 1000.0   # km default
        yd = -xd
        sample_off = _odl_num(kw.get(pfx + "SAMPLE_PROJECTION_OFFSET",
                                     "0.5"), 0.5)
        line_off = _odl_num(kw.get(pfx + "LINE_PROJECTION_OFFSET",
                                   "0.5"), 0.5)
        ulx = (sample_off + sample_shift) * xd * -1.0
        uly = (line_off + line_shift) * -yd * 1.0
        if ulx != 0.5 or uly != 0.5 or xd != 1.0:
            gt = (ulx, xd, 0.0, uly, 0.0, yd)
    meta = {
        "geotransform": gt,
        "nodata": (_odl_num(kw["IMAGE.MISSING"]) if "IMAGE.MISSING" in kw
                   else _odl_num(kw["IMAGE.MISSING_CONSTANT"])
                   if "IMAGE.MISSING_CONSTANT" in kw else None),
        "scale": (_odl_num(kw["IMAGE.SCALING_FACTOR"])
                  if "IMAGE.SCALING_FACTOR" in kw else None),
        "offset": (_odl_num(kw["IMAGE.OFFSET"])
                   if "IMAGE.OFFSET" in kw else None),
        "keywords": kw,
    }
    return bands, meta


def read_pds(spark: SparkSession, path: str, band: int = 1):
    bands, meta = open_pds(path)
    return _cells_df(spark, bands[band - 1]), meta


# --------------------------------------------------------------- ISIS2

def open_isis2(path: str):
    """-> (bands (nb, ny, nx), meta). ISIS2 cube (QUBE object)."""
    raw = open(path, "rb").read()
    kw = parse_odl(raw.decode("latin-1", errors="replace"))
    if "^QUBE" not in kw:
        raise ValueError("not an ISIS2 cube (no ^QUBE)")
    record_bytes = int(_odl_num(kw.get("RECORD_BYTES", "512"), 512))
    ptr = kw["^QUBE"].strip()
    data_path = path
    if ptr.startswith('"') or ptr.startswith("("):
        m = re.match(r'\(?\s*"?([^",)]+)"?\s*(?:,\s*(\d+)\s*(<BYTES>)?)?',
                     ptr)
        data_path = os.path.join(os.path.dirname(path), m.group(1))
        n = int(m.group(2) or 1)
        skip = (n - 1) if m.group(3) else (n - 1) * record_bytes
    else:
        n = int(_odl_num(ptr))
        skip = (n - 1) if "<BYTES>" in ptr else (n - 1) * record_bytes
    suffix = kw.get("QUBE.SUFFIX_ITEMS", "(0,0,0)")
    if any(int(x) != 0 for x in re.findall(r"\d+", suffix)):
        raise NotImplementedError(
            "ISIS2 side-plane SUFFIX_ITEMS are not supported "
            "(the reference refuses them too)")
    core = [int(x) for x in re.findall(r"\d+", kw["QUBE.CORE_ITEMS"])]
    nx, ny, nb = core
    ibytes = int(_odl_num(kw.get("QUBE.CORE_ITEM_BYTES", "1"), 1))
    ctype = kw.get("QUBE.CORE_ITEM_TYPE", "SUN_INTEGER").strip().upper()
    lsb = ctype.startswith("PC") or ctype.startswith("LSB") \
        or ctype.startswith("VAX")
    order = "<" if lsb else ">"
    if "REAL" in ctype:
        dt = np.dtype(f"{order}f{ibytes}")
    elif "UNSIGNED" in ctype or ibytes == 1:
        dt = np.dtype(f"{order}u{ibytes}")
    else:
        dt = np.dtype(f"{order}i{ibytes}")
    axes = kw.get("QUBE.AXIS_NAME", "(SAMPLE,LINE,BAND)").upper()
    flat = _zero_padded(data_path, skip, nx * ny * nb, dt)
    if axes.replace(" ", "") == "(SAMPLE,BAND,LINE)":   # BIL
        bands = flat.reshape(ny, nb, nx).transpose(1, 0, 2)
    elif axes.replace(" ", "") == "(BAND,SAMPLE,LINE)":  # BIP
        bands = flat.reshape(ny, nx, nb).transpose(2, 0, 1)
    else:                                               # BSQ
        bands = flat.reshape(nb, ny, nx)
    bands = bands.astype(dt.newbyteorder("="))
    meta = {"base": _odl_num(kw.get("QUBE.CORE_BASE", "0")),
            "multiplier": _odl_num(kw.get("QUBE.CORE_MULTIPLIER", "1"), 1),
            "keywords": kw}
    return bands, meta


def read_isis2(spark: SparkSession, path: str, band: int = 1):
    bands, meta = open_isis2(path)
    return _cells_df(spark, bands[band - 1]), meta
