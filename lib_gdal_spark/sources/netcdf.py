"""netCDF classic (CDF-1/CDF-2) raster/mdim source and sink.

Reference semantics (studied, re-expressed — no code copied):
- frmts/netcdf/netcdfdataset.cpp — variable-as-subdataset model: a 2-D
  (y, x) variable is one band; extra leading dimensions unroll into
  bands (time slices first-dim-major). Geotransform derives from 1-D
  coordinate variables named by the dims: regular spacing, pixel-edge
  origin at coord[0] - res/2. netCDF grids are usually written
  bottom-up (south row first); the driver flips them north-up when the
  y coordinate increases (NCDFIsBottomUp semantics), so band row 0 is
  the northernmost row. scale_factor/add_offset/_FillValue surface as
  band metadata — pixel values stay RAW (GDALTest checksums are over
  raw values; verified by the bug636/byte replays).
- The classic file format itself is the public NetCDF format spec
  (magic CDF\\x01 / CDF\\x02, big-endian XDR-style header: dim_list /
  gatt_list / var_list, 4-byte-aligned data payloads, record variables
  interleaved per record along the UNLIMITED dimension, with the
  single-record-variable no-padding special case).

netCDF-4 (HDF5 container) is out of scope — refused with
NotImplementedError (the repo's refusal-over-silent-wrong convention);
the reference delegates those to libhdf5.

Spark-first: header parse is driver-side (bounded metadata); cell data
lands in the engine's (bx, by, value) grid DataFrame — by increases
upward like every other raster source — so all raster operators
(checksum, warp, dem, contour) compose directly. read_mdarray feeds
operators/mdim for n-D work.
"""

from __future__ import annotations

import struct

import numpy as np
from pyspark.sql import SparkSession

_MAGIC1 = b"CDF\x01"
_MAGIC2 = b"CDF\x02"
_HDF5 = b"\x89HDF"

#: classic external types: nc_type -> (numpy dtype, size)
_TYPES = {1: (np.dtype(">i1"), 1), 2: (np.dtype("S1"), 1),
          3: (np.dtype(">i2"), 2), 4: (np.dtype(">i4"), 4),
          5: (np.dtype(">f4"), 4), 6: (np.dtype(">f8"), 8)}

_NC_DIMENSION = 0x0A
_NC_VARIABLE = 0x0B
_NC_ATTRIBUTE = 0x0C


class _Cursor:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.o = 0

    def u32(self) -> int:
        v = struct.unpack_from(">I", self.buf, self.o)[0]
        self.o += 4
        return v

    def i32(self) -> int:
        v = struct.unpack_from(">i", self.buf, self.o)[0]
        self.o += 4
        return v

    def u64(self) -> int:
        v = struct.unpack_from(">Q", self.buf, self.o)[0]
        self.o += 8
        return v

    def name(self) -> str:
        n = self.u32()
        s = self.buf[self.o:self.o + n].decode("utf-8", errors="replace")
        self.o += n + (-n) % 4   # names pad to 4 bytes
        return s

    def values(self, nc_type: int, n: int):
        dt, sz = _TYPES[nc_type]
        raw = self.buf[self.o:self.o + n * sz]
        self.o += n * sz + (-(n * sz)) % 4
        if nc_type == 2:
            return raw.decode("utf-8", errors="replace")
        arr = np.frombuffer(raw, dt, count=n)
        return arr.tolist() if n > 1 else arr[0].item()


def _read_att_list(cur: _Cursor) -> dict:
    tag = cur.u32()
    n = cur.u32()
    if tag not in (_NC_ATTRIBUTE, 0) or (tag == 0 and n != 0):
        raise ValueError("malformed attribute list")
    atts = {}
    for _ in range(n):
        nm = cur.name()
        t = cur.u32()
        cnt = cur.u32()
        atts[nm] = cur.values(t, cnt)
    return atts


def parse_header(buf: bytes) -> dict:
    """Parse a classic netCDF header -> {version, numrecs, dims,
    gatts, vars} with per-variable begin/vsize/record flags."""
    if buf[:4] == _HDF5 or b"\x89HDF\r\n\x1a\n" in buf[:1024]:
        raise NotImplementedError(
            "netCDF-4/HDF5 container is not supported; "
            "convert to classic (nccopy -k classic)")
    if buf[:3] != b"CDF" or buf[3:4] not in (b"\x01", b"\x02"):
        raise ValueError("not a classic netCDF file")
    version = buf[3]
    cur = _Cursor(buf)
    cur.o = 4
    numrecs = cur.u32()
    # dim_list
    tag = cur.u32()
    ndims = cur.u32()
    dims = []           # (name, size) — size 0 = UNLIMITED (numrecs)
    if tag == _NC_DIMENSION:
        for _ in range(ndims):
            nm = cur.name()
            dims.append((nm, cur.u32()))
    gatts = _read_att_list(cur)
    tag = cur.u32()
    nvars = cur.u32()
    variables = {}
    order = []
    if tag == _NC_VARIABLE:
        for _ in range(nvars):
            nm = cur.name()
            nd = cur.u32()
            dimids = [cur.u32() for _ in range(nd)]
            atts = _read_att_list(cur)
            nc_type = cur.u32()
            vsize = cur.u32()
            begin = cur.u64() if version == 2 else cur.u32()
            shape = [dims[d][1] for d in dimids]
            is_rec = bool(dimids) and dims[dimids[0]][1] == 0
            variables[nm] = {
                "dims": [dims[d][0] for d in dimids],
                "shape": shape, "atts": atts, "nc_type": nc_type,
                "vsize": vsize, "begin": begin, "record": is_rec,
            }
            order.append(nm)
    return {"version": version, "numrecs": numrecs, "dims": dims,
            "gatts": gatts, "vars": variables, "order": order}


def read_array(path: str, var: str) -> tuple[np.ndarray, dict]:
    """Read one variable as a native-order numpy array (record dim
    resolved to numrecs) plus its attributes."""
    buf = open(path, "rb").read()
    hdr = parse_header(buf)
    if var not in hdr["vars"]:
        raise KeyError(f"variable {var!r} not in {hdr['order']}")
    v = hdr["vars"][var]
    dt, sz = _TYPES[v["nc_type"]]
    if not v["record"]:
        n = int(np.prod(v["shape"])) if v["shape"] else 1
        arr = np.frombuffer(buf, dt, count=n, offset=v["begin"])
        arr = arr.reshape(v["shape"]) if v["shape"] else arr
    else:
        # record variables interleave per record; recsize = sum of the
        # record variables' vsize, EXCEPT when there is exactly one
        # record variable (then its slices pack without padding)
        rec_vars = [w for w in hdr["vars"].values() if w["record"]]
        slab = int(np.prod(v["shape"][1:])) if len(v["shape"]) > 1 else 1
        if len(rec_vars) == 1:
            recsize = slab * sz
        else:
            recsize = sum(w["vsize"] for w in rec_vars)
        nrec = hdr["numrecs"]
        out = np.empty((nrec, slab), dt)
        for r in range(nrec):
            off = v["begin"] + r * recsize
            out[r] = np.frombuffer(buf, dt, count=slab, offset=off)
        arr = out.reshape([nrec] + v["shape"][1:])
    meta = dict(v["atts"])
    meta["nc_type"] = v["nc_type"]
    meta["dims"] = v["dims"]
    if v["nc_type"] == 2:
        return arr, meta
    arr = arr.astype(arr.dtype.newbyteorder("="))
    # NC_BYTE with the _Unsigned hint reads as Byte (netcdfdataset.cpp
    # NCDFGetAttr _Unsigned handling; byte.nc replays checksum 4672
    # only with the unsigned view)
    if v["nc_type"] == 1 and str(meta.get("_Unsigned", "")).lower() in (
            "true", "1"):
        arr = arr.view(np.uint8)
    return arr, meta


def _pick_raster_var(hdr: dict) -> str:
    """First variable with >= 2 dims whose trailing dims look like
    (y, x) — the reference's subdataset-default heuristic."""
    for nm in hdr["order"]:
        v = hdr["vars"][nm]
        shape = ([hdr["numrecs"]] + v["shape"][1:] if v["record"]
                 else v["shape"])
        if len(shape) >= 2 and shape[-1] > 1 and shape[-2] > 1:
            return nm
    raise ValueError("no 2-D variable found")


def open_raster(path: str, var: str | None = None):
    """-> (bands ndarray (nbands, ny, nx) NORTH-UP, meta). Extra
    leading dims unroll into bands. meta carries geotransform (when
    coordinate variables allow), scale/offset/_FillValue, bottom_up."""
    buf = open(path, "rb").read()
    hdr = parse_header(buf)
    if var is None:
        var = _pick_raster_var(hdr)
    arr, meta = read_array(path, var)
    if arr.ndim < 2:
        raise ValueError(f"{var} is not raster-shaped")
    ydim, xdim = meta["dims"][-2], meta["dims"][-1]
    ny, nx = arr.shape[-2], arr.shape[-1]
    bands = arr.reshape(-1, ny, nx)

    gt = None
    bottom_up = True   # classic-netCDF default (NCDFIsBottomUp)
    names = hdr["vars"]
    if ydim in names and xdim in names:
        yv, _ = read_array(path, ydim)
        xv, _ = read_array(path, xdim)
        if len(xv) == nx and len(yv) == ny and nx > 1 and ny > 1:
            xres = (float(xv[-1]) - float(xv[0])) / (nx - 1)
            yres = (float(yv[-1]) - float(yv[0])) / (ny - 1)
            bottom_up = yres > 0
            if bottom_up:
                gt = (float(xv[0]) - xres / 2, xres, 0.0,
                      float(yv[-1]) - yres / 2 + yres, 0.0, -yres)
            else:
                gt = (float(xv[0]) - xres / 2, xres, 0.0,
                      float(yv[0]) - yres / 2, 0.0, yres)
    if bottom_up:
        bands = bands[:, ::-1, :]
    meta = {"var": var, "geotransform": gt, "bottom_up": bottom_up,
            "scale": meta.get("scale_factor"),
            "offset": meta.get("add_offset"),
            "nodata": meta.get("_FillValue"),
            "gatts": hdr["gatts"], "atts": meta}
    return bands, meta


def read_netcdf(spark: SparkSession, path: str, var: str | None = None,
                band: int = 1):
    """-> (cells DataFrame (bx, by, value), meta). North-up band in the
    engine's grid convention (by increases upward: by = ny-1 at the top
    row, matching the TIFF/AAIGrid sources)."""
    bands, meta = open_raster(path, var)
    a = bands[band - 1]
    ny, nx = a.shape
    yy, xx = np.mgrid[0:ny, 0:nx]
    rows = np.column_stack([xx.ravel(), (ny - 1 - yy).ravel(),
                            a.ravel().astype(np.float64)])
    df = spark.createDataFrame(
        [(int(x), int(y), float(v)) for x, y, v in rows],
        "bx long, by long, value double")
    return df, meta


def read_mdarray(path: str, var: str):
    """mdim bridge: -> (array, dim names, attributes) for
    operators/mdim (GDALMDArray semantics: native dim order, raw
    values)."""
    arr, meta = read_array(path, var)
    return arr, meta["dims"], {k: v for k, v in meta.items()
                               if k not in ("dims", "nc_type")}


# -------------------------------------------------------------- writer

def _pad4(b: bytes) -> bytes:
    return b + b"\x00" * ((-len(b)) % 4)


def _w_name(nm: str) -> bytes:
    e = nm.encode()
    return struct.pack(">I", len(e)) + _pad4(e)


def _w_atts(atts: dict) -> bytes:
    if not atts:
        return struct.pack(">II", 0, 0)
    out = [struct.pack(">II", _NC_ATTRIBUTE, len(atts))]
    for k, v in atts.items():
        out.append(_w_name(k))
        if isinstance(v, str):
            e = v.encode()
            out.append(struct.pack(">II", 2, len(e)) + _pad4(e))
        elif isinstance(v, float):
            out.append(struct.pack(">IId", 6, 1, v))
        else:
            out.append(struct.pack(">IIi", 4, 1, int(v)))
    return b"".join(out)


def write_netcdf(path: str, arr: np.ndarray, *,
                 var: str = "Band1", xcoords=None, ycoords=None,
                 atts: dict | None = None, gatts: dict | None = None):
    """Write a 2-D double variable as a CDF-1 classic file, bottom-up
    (south row first) with lat/lon coordinate variables — the layout
    the reference's own writer produces for a north-up band. The
    reader flips it back; write->read round-trips bit-exactly."""
    a = np.asarray(arr, np.float64)
    ny, nx = a.shape
    xv = (np.arange(nx, dtype=np.float64) if xcoords is None
          else np.asarray(xcoords, np.float64))
    yv = (np.arange(ny, dtype=np.float64) if ycoords is None
          else np.asarray(ycoords, np.float64))
    dims = [("lat", ny), ("lon", nx)]
    hdr = [b"CDF\x01", struct.pack(">I", 0)]
    hdr.append(struct.pack(">II", _NC_DIMENSION, len(dims)))
    for nm, sz in dims:
        hdr.append(_w_name(nm) + struct.pack(">I", sz))
    hdr.append(_w_atts(gatts or {"Conventions": "CF-1.5"}))

    def varrec(nm, dimids, vatts, nc_type, vsize, begin):
        out = [_w_name(nm), struct.pack(">I", len(dimids))]
        out += [struct.pack(">I", d) for d in dimids]
        out.append(_w_atts(vatts))
        out.append(struct.pack(">III", nc_type, vsize, begin))
        return b"".join(out)

    # size the header with placeholder begins, then emit real offsets
    # (varrec length is begin-independent in CDF-1)
    payloads = [("lat", [0], {"units": "degrees_north"}, 6, ny * 8),
                ("lon", [1], {"units": "degrees_east"}, 6, nx * 8),
                (var, [0, 1], atts or {}, 6, ny * nx * 8)]
    off = sum(len(h) for h in hdr)
    probe = sum(len(varrec(nm, d, va, t, vs, 0))
                for nm, d, va, t, vs in payloads) + 8
    begin = off + probe
    recs = []
    for nm, d, va, t, vs in payloads:
        recs.append(varrec(nm, d, va, t, vs, begin))
        begin += vs
    body = [struct.pack(">II", _NC_VARIABLE, len(payloads))] + recs
    data = (yv.astype(">f8").tobytes() + xv.astype(">f8").tobytes()
            + a[::-1, :].astype(">f8").tobytes())
    with open(path, "wb") as f:
        f.write(b"".join(hdr) + b"".join(body) + data)
