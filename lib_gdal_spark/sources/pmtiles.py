"""PMTiles v3 source + sink (pure stdlib + NumPy).

PMTiles is the single-file successor to MBTiles the reference reads
through ogr/ogrsf_frmts/pmtiles/: a 127-byte header, gzip'd varint
directories keyed by Hilbert-curve tile ids, and a clustered tile-data
section. Layout follows the published v3 spec (the same one the
reference's vendored pmtiles headers implement —
ogr/ogrsf_frmts/pmtiles/pmtiles/pmtiles.hpp):

- tile_id = sum(4^k, k < z) + hilbert_index(z, x, y) — xy flipped
  through the standard Hilbert rotations, y in XYZ (top-down) scheme.
- directories: uvarint count, then tile-id deltas, run lengths,
  lengths, and offsets (0 = previous offset + previous length;
  else value - 1).
- entries with run_length 0 in the root are leaf-directory pointers;
  this writer splits into leaves past `leaf_split` entries.
- internal (directory + JSON metadata) compression: gzip; tile data
  stored raw here (tile_compression none) since PNG payloads are
  already entropy-coded.

Distributed shape: the writer computes Hilbert ids vectorized
(NumPy inside one Arrow batch pass), sorts by tile id with a
DataFrame orderBy (the clustered layout requirement), and drains
partition-at-a-time like every single-file sink here; the reader
fetches the bounded directory driver-side, then executors range-read
their slice of the tile-data section.
"""

from __future__ import annotations

import gzip
import json
import os
import struct

import numpy as np

__all__ = ["read_pmtiles", "write_pmtiles", "tile_id_np", "tile_id_to_zxy"]

_MAGIC = b"PMTiles"
_HDR_LEN = 127


def _zoom_base(z: int) -> int:
    # sum of 4^k for k < z
    return ((1 << (2 * z)) - 1) // 3


def tile_id_np(z, x, y):
    """Vectorized (z, x, y[top-down XYZ]) -> PMTiles v3 tile id
    (Hilbert index at zoom z plus the zoom base)."""
    z = np.asarray(z, dtype=np.int64)
    x = np.asarray(x, dtype=np.int64).copy()
    y = np.asarray(y, dtype=np.int64).copy()
    if z.shape == ():
        z = np.full(x.shape, int(z), dtype=np.int64)
    d = np.zeros(x.shape, dtype=np.int64)
    zmax = int(z.max()) if z.size else 0
    for zz in set(int(v) for v in np.unique(z)):
        m = z == zz
        rx_x, rx_y = x[m], y[m]
        acc = np.zeros(rx_x.shape, dtype=np.int64)
        s = 1 << (zz - 1) if zz > 0 else 0
        xx, yy = rx_x, rx_y
        while s > 0:
            rx = ((xx & s) > 0).astype(np.int64)
            ry = ((yy & s) > 0).astype(np.int64)
            acc += s * s * ((3 * rx) ^ ry)
            # rotate
            swap = ry == 0
            flip = swap & (rx == 1)
            xx_f = np.where(flip, s - 1 - xx, xx)
            yy_f = np.where(flip, s - 1 - yy, yy)
            xx, yy = (np.where(swap, yy_f, xx_f),
                      np.where(swap, xx_f, yy_f))
            s >>= 1
        d[m] = _zoom_base(zz) + acc
    return d


def tile_id_to_zxy(tid: int):
    """Inverse of tile_id_np for one id."""
    z = 0
    while _zoom_base(z + 1) <= tid:
        z += 1
    t = tid - _zoom_base(z)
    x = y = 0
    s = 1
    while s < (1 << z):
        rx = 1 & (t // 2)
        ry = 1 & (t ^ rx)
        # rotate
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - x, s - 1 - y
            x, y = y, x
        x += s * rx
        y += s * ry
        t //= 4
        s <<= 1
    return z, x, y


def _uvarint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_uvarint(buf: bytes, pos: int):
    shift = v = 0
    while True:
        b = buf[pos]
        pos += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, pos
        shift += 7


def _encode_dir(entries) -> bytes:
    """entries: [(tile_id, offset, length, run_length)] sorted by id."""
    out = bytearray(_uvarint(len(entries)))
    last = 0
    for tid, _o, _l, _r in entries:
        out += _uvarint(tid - last)
        last = tid
    for _t, _o, _l, r in entries:
        out += _uvarint(r)
    for _t, _o, length, _r in entries:
        out += _uvarint(length)
    prev_off = prev_len = None
    for _t, off, length, _r in entries:
        if prev_off is not None and off == prev_off + prev_len:
            out += _uvarint(0)
        else:
            out += _uvarint(off + 1)
        prev_off, prev_len = off, length
    return bytes(out)


def _decode_dir(buf: bytes):
    n, pos = _read_uvarint(buf, 0)
    tids, runs, lens, offs = [], [], [], []
    last = 0
    for _ in range(n):
        d, pos = _read_uvarint(buf, pos)
        last += d
        tids.append(last)
    for _ in range(n):
        r, pos = _read_uvarint(buf, pos)
        runs.append(r)
    for _ in range(n):
        ln, pos = _read_uvarint(buf, pos)
        lens.append(ln)
    for i in range(n):
        v, pos = _read_uvarint(buf, pos)
        if v == 0:
            offs.append(offs[i - 1] + lens[i - 1])
        else:
            offs.append(v - 1)
    return list(zip(tids, offs, lens, runs))


_TILE_TYPES = {"mvt": 1, "png": 2, "jpeg": 3, "webp": 4, "avif": 5,
               "bin": 0}


def write_pmtiles(tiles, path: str, *, tile_type: str = "png",
                  metadata: dict | None = None,
                  leaf_split: int = 4096) -> int:
    """DataFrame(z, x, y, data binary), y in XYZ scheme -> a PMTiles v3
    file. Returns the tile count."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from ..session import ship_package

    ship_package(tiles.sparkSession)

    @F.pandas_udf(T.LongType())
    def _tid(z, x, y):
        import pandas as pd
        return pd.Series(tile_id_np(z.to_numpy(), x.to_numpy(),
                                    y.to_numpy()))

    ordered = (tiles.select(
        _tid(F.col("z"), F.col("x"), F.col("y")).alias("tid"),
        "z", "data").orderBy("tid"))

    import tempfile

    # the tile-data section spools to disk while draining (entries are
    # directory-sized by format design; payload bytes never accumulate
    # in driver memory)
    entries = []      # (tile_id, offset, length, 1)
    spool = tempfile.NamedTemporaryFile(delete=False)
    off = 0
    n = 0
    zmin = zmax = None
    try:
        for row in ordered.toLocalIterator():
            blob = bytes(row["data"])
            entries.append((int(row["tid"]), off, len(blob), 1))
            spool.write(blob)
            off += len(blob)
            z = int(row["z"])
            zmin = z if zmin is None else min(zmin, z)
            zmax = z if zmax is None else max(zmax, z)
            n += 1
        spool.flush()
    finally:
        spool.close()

    if len(entries) > leaf_split:
        root_entries = []
        leaf_blob = bytearray()
        for i in range(0, len(entries), leaf_split):
            chunk = entries[i:i + leaf_split]
            enc = gzip.compress(_encode_dir(chunk), mtime=0)
            root_entries.append((chunk[0][0], len(leaf_blob), len(enc), 0))
            leaf_blob += enc
        root = gzip.compress(_encode_dir(root_entries), mtime=0)
        leaf_bytes = bytes(leaf_blob)
    else:
        root = gzip.compress(_encode_dir(entries), mtime=0)
        leaf_bytes = b""

    meta_bytes = gzip.compress(
        json.dumps(metadata or {}, sort_keys=True).encode(), mtime=0)

    root_off = _HDR_LEN
    meta_off = root_off + len(root)
    leaf_off = meta_off + len(meta_bytes)
    data_off = leaf_off + len(leaf_bytes)
    hdr = bytearray(_HDR_LEN)
    hdr[0:7] = _MAGIC
    hdr[7] = 3
    struct.pack_into("<QQQQQQQQ", hdr, 8,
                     root_off, len(root), meta_off, len(meta_bytes),
                     leaf_off, len(leaf_bytes), data_off, off)
    struct.pack_into("<QQQ", hdr, 72, n, n, n)
    hdr[96] = 1                       # clustered
    hdr[97] = 2                       # internal compression: gzip
    hdr[98] = 1                       # tile compression: none
    hdr[99] = _TILE_TYPES[tile_type]
    hdr[100] = zmin or 0
    hdr[101] = zmax or 0
    struct.pack_into("<iiii", hdr, 102,
                     int(-180e7), int(-85e7), int(180e7), int(85e7))
    hdr[118] = zmin or 0
    struct.pack_into("<ii", hdr, 119, 0, 0)

    with open(path, "wb") as f:
        f.write(bytes(hdr))
        f.write(root)
        f.write(meta_bytes)
        f.write(leaf_bytes)
        with open(spool.name, "rb") as s:
            while True:
                chunk = s.read(1 << 22)
                if not chunk:
                    break
                f.write(chunk)
    os.remove(spool.name)
    return n


def read_header(path: str) -> dict:
    with open(path, "rb") as f:
        hdr = f.read(_HDR_LEN)
    if hdr[0:7] != _MAGIC or hdr[7] != 3:
        raise ValueError("not a PMTiles v3 file")
    (root_off, root_len, meta_off, meta_len, leaf_off, leaf_len,
     data_off, data_len) = struct.unpack_from("<QQQQQQQQ", hdr, 8)
    n_addr, n_entries, n_contents = struct.unpack_from("<QQQ", hdr, 72)
    return {"root_off": root_off, "root_len": root_len,
            "meta_off": meta_off, "meta_len": meta_len,
            "leaf_off": leaf_off, "leaf_len": leaf_len,
            "data_off": data_off, "data_len": data_len,
            "n_tiles": n_addr, "clustered": hdr[96] == 1,
            "tile_type": hdr[99], "min_zoom": hdr[100],
            "max_zoom": hdr[101]}


def read_metadata(path: str) -> dict:
    h = read_header(path)
    with open(path, "rb") as f:
        f.seek(h["meta_off"])
        return json.loads(gzip.decompress(f.read(h["meta_len"])))


def _all_entries(path: str, h: dict):
    with open(path, "rb") as f:
        f.seek(h["root_off"])
        root = _decode_dir(gzip.decompress(f.read(h["root_len"])))
        out = []
        for tid, off, ln, run in root:
            if run == 0:              # leaf pointer
                f.seek(h["leaf_off"] + off)
                out.extend(_decode_dir(gzip.decompress(f.read(ln))))
            else:
                out.append((tid, off, ln, run))
    return out


def read_pmtiles(spark, path: str, zoom: int | None = None,
                 num_partitions: int = 0):
    """PMTiles file -> DataFrame(z int, x long, y long, data binary),
    y in XYZ scheme. The directory (metadata-sized by format design)
    loads driver-side; tile payloads range-read in executors."""
    from pyspark.sql import types as T

    from ..session import ship_package

    ship_package(spark)
    h = read_header(path)
    entries = _all_entries(path, h)
    rows = []
    for tid, off, ln, run in entries:
        for k in range(max(1, run)):
            z, x, y = tile_id_to_zxy(tid + k)
            if zoom is None or z == zoom:
                rows.append((z, x, y, off, ln))
    schema = T.StructType([
        T.StructField("z", T.IntegerType()),
        T.StructField("x", T.LongType()),
        T.StructField("y", T.LongType()),
        T.StructField("data", T.BinaryType())])
    if not rows:
        return spark.createDataFrame([], schema)
    if num_partitions <= 0:
        num_partitions = max(1, min(
            int(spark.sparkContext.defaultParallelism),
            (len(rows) + 4095) // 4096))
    data_off = h["data_off"]

    def _fetch(iterator):
        import pandas as pd

        for pdf in iterator:
            out = {"z": [], "x": [], "y": [], "data": []}
            with open(path, "rb") as f:
                for _, r in pdf.iterrows():
                    f.seek(data_off + int(r["off"]))
                    out["z"].append(int(r["z"]))
                    out["x"].append(int(r["x"]))
                    out["y"].append(int(r["y"]))
                    out["data"].append(f.read(int(r["ln"])))
            yield pd.DataFrame(out)

    src = spark.createDataFrame(
        rows, "z int, x long, y long, off long, ln long") \
        .repartition(num_partitions)
    return src.mapInPandas(_fetch, schema=schema)
