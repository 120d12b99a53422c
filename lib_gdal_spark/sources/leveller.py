"""Daylon Leveller heightfield (.ter) codec.

Reference: frmts/leveller/levellerdataset.cpp — a 4-byte "trrn"
signature + 1 version byte (4..12 accepted, :1444-1446), then a flat
tag stream: [len:u8][name][datalen:u32le][data] (locate_data,
:981-1025). Load (:1207-1398): hf_w/hf_b int32 sizes; hf_data float32
rows top-down (raw int32/65536 fixed point before v6, :549-554);
version >= 7 reads csclass + the digital-axis pairs (da0 = NS ->
gt3/gt5, da1 = EW -> gt0/gt1; PIXEL_SIZED v0=origin v1=scaling with
the fixedEnd=1 remap) and the optional elevation scale/base; legacy
files center the grid on the hf_worldspacing ground spacing and use it
as the elevation scale. Physical height = raw*scale + base.

The writer emits the version-7 layout of write_header (:713-800):
hf_w/hf_b, csclass local + unit code, elevation scale/base, the two
PIXEL_SIZED digital axes from the N-up geotransform, then hf_data.
"""

from __future__ import annotations

import struct

import numpy as np

_COORDSYS_RASTER, _COORDSYS_LOCAL, _COORDSYS_GEO = 0, 1, 2
_DA_POSITIONED, _DA_SIZED, _DA_PIXEL_SIZED = 0, 1, 2
UNIT_M = 0x6D000000
UNIT_FT = 0x66740000


def _scan_tags(data: bytes) -> dict:
    tags = {}
    pos = 5
    while pos < len(data):
        dl = data[pos]
        pos += 1
        if dl == 0 or dl > 64 or pos + dl + 4 > len(data):
            break
        name = data[pos:pos + dl].decode("ascii", "replace")
        pos += dl
        n = struct.unpack_from("<I", data, pos)[0]
        pos += 4
        tags[name] = (pos, n)
        pos += n
    return tags


def read_leveller_grid(path: str) -> dict:
    with open(path, "rb") as f:
        data = f.read()
    if data[:4].lower() != b"trrn":
        raise ValueError("not a Leveller heightfield")
    version = data[4]
    if not 4 <= version <= 12:
        raise ValueError(f"Leveller: unsupported version {version}")
    tags = _scan_tags(data)

    def geti(name):
        off, _n = tags[name]
        return struct.unpack_from("<i", data, off)[0]

    def getd(name):
        off, _n = tags[name]
        return struct.unpack_from("<d", data, off)[0]

    def gets(name):
        off, n = tags[name + "d"]
        return data[off:off + n].decode("ascii", "replace")

    if "hf_w" not in tags or "hf_b" not in tags or "hf_data" not in tags:
        raise ValueError("Leveller: missing hf_w/hf_b/hf_data")
    w, h = geti("hf_w"), geti("hf_b")
    if w < 2 or h < 2:
        raise ValueError("Leveller: raster too small")
    off, n = tags["hf_data"]
    if n != w * h * 4:
        raise ValueError("Leveller: hf_data size mismatch")
    if version < 6:
        raw = np.frombuffer(data, "<i4", count=w * h, offset=off)
        values = (raw.astype(np.float64) / 65536).astype(np.float32) \
            .astype(np.float64).reshape(h, w)
    else:
        values = np.frombuffer(data, "<f4", count=w * h, offset=off) \
            .astype(np.float64).reshape(h, w)
    gt = [0.0, 1.0, 0.0, 0.0, 0.0, 1.0]
    scale, base, units = 1.0, 0.0, ""
    if version >= 7:
        csclass = geti("csclass") if "csclass" in tags \
            else _COORDSYS_RASTER
        if csclass != _COORDSYS_RASTER:
            def axis(i, pixels):
                style = geti(f"coordsys_da{i}_style")
                fixed = geti(f"coordsys_da{i}_fixedend")
                v0 = getd(f"coordsys_da{i}_v0")
                v1 = getd(f"coordsys_da{i}_v1")
                if fixed == 1:
                    origin = (v1 + v0 if style == _DA_SIZED
                              else v1 + v0 * (pixels - 1))
                else:
                    origin = v0
                if style == _DA_PIXEL_SIZED:
                    scaling = v1 if fixed == 0 else v0
                else:
                    length = (v1 - v0 if style == _DA_POSITIONED else v1)
                    scaling = length / (pixels - 1)
                return origin, scaling
            if all(f"coordsys_da{i}_{k}" in tags
                   for i in (0, 1)
                   for k in ("style", "fixedend", "v0", "v1")):
                gt[3], gt[5] = axis(0, h)
                gt[0], gt[1] = axis(1, w)
        if tags.get("coordsys_haselevm") and geti("coordsys_haselevm"):
            if "coordsys_em_scale" in tags:
                scale = getd("coordsys_em_scale")
            if "coordsys_em_base" in tags:
                base = getd("coordsys_em_base")
    else:
        worldspacing = getd("hf_worldspacing") \
            if "hf_worldspacing" in tags else None
        units = "m"
        if worldspacing is not None:
            if "hf_worldspacinglabell" in tags:
                units = gets("hf_worldspacinglabel").split(" ")[0]
            gt[0] = -0.5 * worldspacing * (w - 1)
            gt[3] = -0.5 * worldspacing * (h - 1)
            gt[1] = worldspacing
            gt[5] = worldspacing
            scale = worldspacing
    return {"width": w, "height": h, "version": version,
            "values": values, "gt": tuple(gt), "scale": scale,
            "base": base, "units": units}


def read_leveller(spark, path: str):
    """-> (cells DataFrame (bx, by, value), meta): RAW float values
    (physical height = value*meta['scale'] + meta['base']), by
    increasing northward (by = height-1-raster_row)."""
    import pandas as pd

    g = read_leveller_grid(path)
    h, w = g["height"], g["width"]
    by, bx = np.mgrid[0:h, 0:w]
    pdf = pd.DataFrame({
        "bx": bx.ravel().astype(np.int64),
        "by": (h - 1 - by).ravel().astype(np.int64),
        "value": g["values"].ravel()})
    meta = {k: g[k] for k in ("width", "height", "version", "gt",
                              "scale", "base", "units")}
    return spark.createDataFrame(pdf), meta


def _tag(name: str, payload: bytes) -> bytes:
    nm = name.encode()
    return bytes([len(nm)]) + nm + struct.pack("<I", len(payload)) + payload


def _tag_i(name, v):
    return _tag(name, struct.pack("<i", v))


def _tag_d(name, v):
    return _tag(name, struct.pack("<d", float(v)))


def write_leveller(path: str, values, gt, *, elev_scale: float = 1.0,
                   elev_base: float = 0.0, unit_code: int = UNIT_M) -> str:
    """Version-7 writer: values (H, W) float32 raster order (row 0 at
    gt[3]); gt the 6-tuple geotransform."""
    arr = np.asarray(values, np.float32)
    h, w = arr.shape
    out = bytearray(b"trrn\x07")
    out += _tag_i("hf_w", w)
    out += _tag_i("hf_b", h)
    out += _tag_i("csclass", _COORDSYS_LOCAL)
    out += _tag_i("coordsys_units", unit_code)
    out += _tag_i("coordsys_haselevm", 1)
    out += _tag_d("coordsys_em_scale", elev_scale)
    out += _tag_d("coordsys_em_base", elev_base)
    out += _tag_i("coordsys_em_units", unit_code)
    out += _tag_i("coordsys_da0_style", _DA_PIXEL_SIZED)
    out += _tag_i("coordsys_da0_fixedend", 0)
    out += _tag_d("coordsys_da0_v0", gt[3])
    out += _tag_d("coordsys_da0_v1", gt[5])
    out += _tag_i("coordsys_da1_style", _DA_PIXEL_SIZED)
    out += _tag_i("coordsys_da1_fixedend", 0)
    out += _tag_d("coordsys_da1_v0", gt[0])
    out += _tag_d("coordsys_da1_v1", gt[1])
    out += _tag("hf_data", np.ascontiguousarray(arr, "<f4").tobytes())
    with open(path, "wb") as f:
        f.write(bytes(out))
    return path
