"""NTv2 datum-shift grid (.gsb) codec.

Reference: frmts/raw/ntv2dataset.cpp — the file is 11 sixteen-byte
header records (NUM_OREC/NUM_SREC/NUM_FILE/GS_TYPE/... with the value
in bytes 8..15), then per sub-grid an 11-record grid header
(SUB_NAME/PARENT/CREATED/UPDATED text records; S_LAT/N_LAT/E_LONG/
W_LONG/LAT_INC/LONG_INC float64 at record+8; GS_COUNT int32) followed
by GS_COUNT points of 4 float32 values (latitude offset, longitude
offset, latitude error, longitude error — arc-seconds, longitudes
POSITIVE WEST). Endianness is sniffed from the NUM_OREC int32 == 11
(ntv2dataset.cpp:289-296); E_LONG/W_LONG are negated on read
(:439-440); raster orientation remaps the file's S->N / E->W point
order to the N-up W-left raster via negative band offsets (:469-477),
i.e. raster[y, x] = file[(H-1-y)*W + (W-1-x)]; the geotransform is
((w - inc/2)/3600, inc/3600, 0, (n + inc/2)/3600, 0, -inc/3600)
(:513-518). The 24-byte-record 6-band velocity variant is refused
(repo convention: NotImplementedError over silent wrong).

Sub-grid dict: {name, parent, created, updated, s_lat, n_lat, e_long,
w_long, lat_inc, long_inc (arc-seconds, east-positive), width, height,
bands: float32 (4, H, W) N-up raster, gt: 6-tuple degrees}.
"""

from __future__ import annotations

import struct

import numpy as np

_REC = 16


def _txt(b: bytes) -> str:
    return b.decode("ascii", "replace").rstrip("\x00 ")


def read_ntv2_grids(path: str) -> list[dict]:
    """Driver-side parse of every sub-grid (grid files are lattices —
    small by construction; the DataFrame view below distributes)."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:8].upper() != b"NUM_OREC":
        raise ValueError("not an NTv2 file (missing NUM_OREC)")
    if data[24:32].upper() == b"NUM_SREC":
        raise NotImplementedError(
            "NTv2 24-byte-record velocity grids are not supported")
    if data[_REC:_REC + 8].upper() != b"NUM_SREC":
        raise ValueError("not an NTv2 file (missing NUM_SREC)")
    le = data[8:12] == b"\x0b\x00\x00\x00"
    be = data[8:12] == b"\x00\x00\x00\x0b"
    if not (le or be):
        raise ValueError("NTv2: NUM_OREC value is not 11")
    en = "<" if le else ">"
    n_file = struct.unpack(en + "i", data[2 * _REC + 8:2 * _REC + 12])[0]
    if not 1 <= n_file <= 1024:
        raise ValueError(f"NTv2: invalid NUM_FILE {n_file}")
    grids = []
    off = 11 * _REC
    for _ in range(n_file):
        hdr = data[off:off + 11 * _REC]
        name = _txt(hdr[8:16])
        parent = _txt(hdr[_REC + 8:_REC + 16])
        created = _txt(hdr[2 * _REC + 8:2 * _REC + 16])
        updated = _txt(hdr[3 * _REC + 8:3 * _REC + 16])
        s_lat, n_lat, e_long, w_long, lat_inc, long_inc = (
            struct.unpack(en + "d", hdr[r * _REC + 8:r * _REC + 16])[0]
            for r in range(4, 10))
        e_long, w_long = -e_long, -w_long
        gs_count = struct.unpack(
            en + "i", hdr[10 * _REC + 8:10 * _REC + 12])[0]
        if long_inc == 0.0 or lat_inc == 0.0:
            raise ValueError("NTv2: zero grid increment")
        width = int(np.floor((e_long - w_long) / long_inc + 1.5))
        height = int(np.floor((n_lat - s_lat) / lat_inc + 1.5))
        if gs_count != width * height:
            raise ValueError(
                f"NTv2: GS_COUNT {gs_count} != {width}x{height}")
        raw = np.frombuffer(
            data, dtype=en + "f4", count=gs_count * 4,
            offset=off + 11 * _REC).reshape(height, width, 4)
        bands = np.ascontiguousarray(
            raw[::-1, ::-1, :].transpose(2, 0, 1))
        grids.append({
            "name": name, "parent": parent, "created": created,
            "updated": updated, "s_lat": s_lat, "n_lat": n_lat,
            "e_long": e_long, "w_long": w_long, "lat_inc": lat_inc,
            "long_inc": long_inc, "width": width, "height": height,
            "bands": bands,
            "gt": ((w_long - long_inc * 0.5) / 3600.0, long_inc / 3600.0,
                   0.0, (n_lat + lat_inc * 0.5) / 3600.0, 0.0,
                   -lat_inc / 3600.0),
        })
        off += (11 + gs_count) * _REC
    return grids


def read_ntv2(spark, path: str, grid: int = 0, band: int = 1):
    """-> (cells DataFrame (bx, by, value), meta). Raster convention:
    by increases northward (by = height-1-row), band 1..4."""
    g = read_ntv2_grids(path)[grid]
    h, w = g["height"], g["width"]
    arr = g["bands"][band - 1].astype(np.float64)
    import pandas as pd

    by, bx = np.mgrid[0:h, 0:w]
    pdf = pd.DataFrame({
        "bx": bx.ravel().astype(np.int64),
        "by": (h - 1 - by).ravel().astype(np.int64),
        "value": arr.ravel()})
    meta = {k: g[k] for k in ("name", "parent", "width", "height", "gt",
                              "s_lat", "n_lat", "e_long", "w_long",
                              "lat_inc", "long_inc")}
    return spark.createDataFrame(pdf), meta


def _rec(key: bytes, val: bytes) -> bytes:
    return key.ljust(8)[:8] + val.ljust(8, b"\x00")[:8]


def _drec(key: bytes, v: float, en: str) -> bytes:
    return key.ljust(8)[:8] + struct.pack(en + "d", v)


def write_ntv2(path: str, grids: list[dict], byte_order: str = "<") -> str:
    """Write sub-grids (same dict shape as read_ntv2_grids; e_long /
    w_long EAST-POSITIVE arc-seconds, bands float32 (4, H, W) N-up)."""
    en = byte_order
    out = bytearray()
    out += b"NUM_OREC" + struct.pack(en + "i", 11) + b"\x00" * 4
    out += b"NUM_SREC" + struct.pack(en + "i", 11) + b"\x00" * 4
    out += b"NUM_FILE" + struct.pack(en + "i", len(grids)) + b"\x00" * 4
    out += _rec(b"GS_TYPE", b"SECONDS")
    out += _rec(b"VERSION", b"NTv2.0")
    out += _rec(b"SYSTEM_F", b"NAD27")
    out += _rec(b"SYSTEM_T", b"NAD83")
    for k in (b"MAJOR_F", b"MINOR_F", b"MAJOR_T", b"MINOR_T"):
        out += _drec(k, 6378137.0, en)
    for g in grids:
        h, w = g["height"], g["width"]
        bands = np.asarray(g["bands"], np.float32)
        assert bands.shape == (4, h, w), bands.shape
        out += _rec(b"SUB_NAME", g.get("name", "GRID").encode())
        out += _rec(b"PARENT", g.get("parent", "NONE").encode())
        out += _rec(b"CREATED", g.get("created", "").encode())
        out += _rec(b"UPDATED", g.get("updated", "").encode())
        out += _drec(b"S_LAT", g["s_lat"], en)
        out += _drec(b"N_LAT", g["n_lat"], en)
        out += _drec(b"E_LONG", -g["e_long"], en)
        out += _drec(b"W_LONG", -g["w_long"], en)
        out += _drec(b"LAT_INC", g["lat_inc"], en)
        out += _drec(b"LONG_INC", g["long_inc"], en)
        out += b"GS_COUNT" + struct.pack(en + "i", h * w) + b"\x00" * 4
        pts = bands.transpose(1, 2, 0)[::-1, ::-1, :]
        out += np.ascontiguousarray(pts, dtype=en + "f4").tobytes()
    out += _rec(b"END", b"")
    with open(path, "wb") as f:
        f.write(bytes(out))
    return path


def ntv2_shift_np(lon, lat, grid: dict):
    """Forward NTv2 datum shift, vectorized: bilinear-interpolate the
    lat/lon offset bands (arc-seconds, lon positive WEST) at each
    point; points outside the cell-center lattice pass through
    unshifted (then lat' = lat + dlat/3600, lon' = lon - dlon/3600).
    Float math is fixed-order +-*/ only, so the duckdb oracle twin can
    replay it bit-for-bit."""
    lon = np.asarray(lon, np.float64)
    lat = np.asarray(lat, np.float64)
    w, ninc = grid["w_long"], grid["long_inc"]
    n, linc = grid["n_lat"], grid["lat_inc"]
    W, H = grid["width"], grid["height"]
    fx = (lon * 3600.0 - w) / ninc
    fy = (n - lat * 3600.0) / linc
    ok = (fx >= 0) & (fx <= W - 1) & (fy >= 0) & (fy <= H - 1)
    x0 = np.clip(np.floor(fx), 0, W - 1).astype(np.int64)
    y0 = np.clip(np.floor(fy), 0, H - 1).astype(np.int64)
    x1 = np.minimum(x0 + 1, W - 1)
    y1 = np.minimum(y0 + 1, H - 1)
    wx = fx - x0
    wy = fy - y0
    la = np.asarray(grid["bands"][0], np.float64)
    lo = np.asarray(grid["bands"][1], np.float64)

    def bil(b):
        return (b[y0, x0] * (1.0 - wx) * (1.0 - wy)
                + b[y0, x1] * wx * (1.0 - wy)
                + b[y1, x0] * (1.0 - wx) * wy
                + b[y1, x1] * wx * wy)

    dlat = np.where(ok, bil(la), 0.0)
    dlon = np.where(ok, bil(lo), 0.0)
    return lon - dlon / 3600.0, lat + dlat / 3600.0, ok
