"""GeoPackage vector source + sink (stdlib sqlite3, no GDAL/OGR).

Reference: the GPKG driver (/root/reference/ogr/ogrsf_frmts/gpkg/ —
GPB header parse `GPkgHeaderFromWKB`, ogrgeopackageutility.cpp; layer
catalog via gpkg_contents / gpkg_geometry_columns) and the public OGC
GeoPackage spec. A .gpkg file is a SQLite database; the geometry column
holds a StandardGeoPackageBinary blob: magic "GP", version 0, a flags
byte (bit 0 endianness, bits 1-3 envelope indicator, bit 4 empty,
bit 5 extended), int32 srs_id, an optional envelope (2/3/3/4 doubles x2
per indicator 1/2/3/4), then plain WKB — decoded by geo/wkb.

Distributed shape (the 100 TB story): SQLite files are single-node
artifacts, but the READ fans out — the driver inspects the catalog and
min/max rowid, then each Spark task opens the file READ-ONLY
(sqlite3 URI mode=ro supports concurrent readers) and scans its own
rowid range; with the file on shared storage every executor reads only
its slice through SQLite's b-tree (rowid range scans seek, they don't
full-scan). Output rows carry the engine's geometry convention: `wkb`
binary + materialized envelope doubles (taken from the GPB header when
present, else computed from the decoded geometry) so Catalyst bbox
predicates and parquet row-group skipping work downstream.

The writer mirrors the reader (gpkg_contents / gpkg_geometry_columns /
gpkg_spatial_ref_sys + one feature table, GPB flags=0x01 little-endian
no-envelope). SQLite is a single-writer format, so the sink drains
`toLocalIterator()` — partition-at-a-time on the driver, never a full
collect; for corpus-scale output use the parquet sinks and keep .gpkg
for interchange-sized extracts (the reference has the same single-file
bottleneck).
"""

from __future__ import annotations

import sqlite3
import struct

import numpy as np

from ..geo import wkb as _wkb

_ENVELOPE_DIMS = {0: 0, 1: 2, 2: 3, 3: 3, 4: 4}

_SQLITE_TO_SPARK = (
    ("INT", "long"),
    ("CHAR", "string"), ("CLOB", "string"), ("TEXT", "string"),
    ("BLOB", "binary"),
    ("REAL", "double"), ("FLOA", "double"), ("DOUB", "double"),
    ("DATE", "string"),  # ISO strings; cast downstream when needed
    ("BOOL", "long"),
)


def parse_gpb(blob: bytes):
    """StandardGeoPackageBinary -> (wkb_bytes, envelope | None, empty).

    envelope is (xmin, xmax, ymin, ymax) — the GPB order — or None when
    the header carries no envelope (indicator 0)."""
    if blob is None or len(blob) < 8 or blob[0] != 0x47 or blob[1] != 0x50:
        raise ValueError("not a GeoPackage geometry blob")
    if blob[2] != 0:
        raise ValueError(f"unsupported GPB version {blob[2]}")
    flags = blob[3]
    empty = bool((flags >> 4) & 1)
    if (flags >> 5) & 1:
        raise NotImplementedError("extended (non-standard) GPB geometry")
    env_ind = (flags >> 1) & 0x07
    if env_ind not in _ENVELOPE_DIMS:
        raise ValueError(f"invalid GPB envelope indicator {env_ind}")
    ndim = _ENVELOPE_DIMS[env_ind]
    endian = "<" if (flags & 1) else ">"
    header_len = 8 + ndim * 2 * 8
    env = None
    if ndim:
        vals = struct.unpack_from(f"{endian}{ndim * 2}d", blob, 8)
        env = tuple(vals[:4])  # xmin, xmax, ymin, ymax
    return blob[header_len:], env, empty


def encode_gpb(wkb_bytes: bytes, srs_id: int = 0) -> bytes:
    """WKB -> StandardGeoPackageBinary, little-endian, no envelope
    (flags 0x01 — the minimal conformant form the reference also
    accepts everywhere)."""
    return b"GP\x00\x01" + struct.pack("<i", srs_id) + wkb_bytes


def _geom_envelope(kind, data):
    """Envelope from a decoded geometry (fallback when the GPB header
    has none)."""
    def _pts(k, d):
        if k == "point":
            yield np.asarray([d[:2]], dtype=np.float64)
        elif k in ("linestring", "circularstring", "multipoint"):
            yield np.asarray(d, dtype=np.float64)[:, :2]
        elif k in ("polygon", "triangle", "multilinestring"):
            for r in d:
                yield np.asarray(r, dtype=np.float64)[:, :2]
        elif k in ("multipolygon", "polyhedralsurface", "tin"):
            for rings in d:
                for r in rings:
                    yield np.asarray(r, dtype=np.float64)[:, :2]
        elif k == "curvepolygon":
            for r in d:
                if isinstance(r, tuple) and isinstance(r[0], str):
                    yield from _pts(r[0], r[1])
                else:
                    yield np.asarray(r, dtype=np.float64)[:, :2]
        else:  # compoundcurve / multicurve / multisurface / collection
            for k2, d2 in d:
                yield from _pts(k2, d2)

    pts = np.vstack(list(_pts(kind, data)))
    return (float(pts[:, 0].min()), float(pts[:, 0].max()),
            float(pts[:, 1].min()), float(pts[:, 1].max()))


def _spark_type(decl: str) -> str:
    d = (decl or "").upper()
    for frag, t in _SQLITE_TO_SPARK:
        if frag in d:
            return t
    return "string"


def _catalog(path: str):
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        layers = [r[0] for r in con.execute(
            "SELECT table_name FROM gpkg_contents "
            "WHERE data_type = 'features' ORDER BY table_name")]
        geom_cols = {r[0]: r[1] for r in con.execute(
            "SELECT table_name, column_name FROM gpkg_geometry_columns")}
        return layers, geom_cols
    finally:
        con.close()


def list_layers(path: str) -> list:
    """Feature-table names (gpkg_contents data_type='features')."""
    return _catalog(path)[0]


def read_gpkg(spark, path: str, layer: str | None = None,
              num_partitions: int = 0):
    """Read one GeoPackage feature layer -> DataFrame(fid, <attrs>...,
    wkb, xmin, ymin, xmax, ymax).

    Parallel shape: rowid-range partitions; every task opens the file
    read-only and range-scans its slice (a b-tree seek, not a full
    scan)."""
    from pyspark.sql import functions as F, types as T

    from ..session import ship_package

    ship_package(spark)

    layers, geom_cols = _catalog(path)
    if layer is None:
        if len(layers) != 1:
            raise ValueError(f"pick one of layers {layers}")
        layer = layers[0]
    if layer not in geom_cols:
        raise KeyError(f"no geometry column registered for {layer}")
    gcol = geom_cols[layer]

    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        cols = con.execute(f'PRAGMA table_info("{layer}")').fetchall()
        lo_hi = con.execute(
            f'SELECT MIN(rowid), MAX(rowid), COUNT(*) FROM "{layer}"'
        ).fetchone()
    finally:
        con.close()
    # an INTEGER PRIMARY KEY column is an alias of rowid — it IS the
    # fid this reader already emits, so drop it from the attributes
    attr = [(name, _spark_type(decl))
            for _, name, decl, _nn, _dflt, pk in cols
            if name != gcol
            and not (pk and "INT" in (decl or "").upper())]
    lo, hi, n = lo_hi
    if n == 0 or lo is None:
        lo, hi = 0, -1

    if num_partitions <= 0:
        tgt = max(1, ((n or 0) + 9999) // 10000)
        num_partitions = max(
            1, min(int(spark.sparkContext.defaultParallelism), tgt))
    span = max(1, (hi - lo + 1 + num_partitions - 1) // num_partitions)
    ranges = [(lo + i * span, min(hi, lo + (i + 1) * span - 1))
              for i in range(num_partitions)
              if lo + i * span <= hi]

    fields = [T.StructField("fid", T.LongType())]
    for name, t in attr:
        fields.append(T.StructField(
            name, {"long": T.LongType(), "double": T.DoubleType(),
                   "binary": T.BinaryType()}.get(t, T.StringType())))
    fields += [T.StructField("wkb", T.BinaryType()),
               T.StructField("xmin", T.DoubleType()),
               T.StructField("ymin", T.DoubleType()),
               T.StructField("xmax", T.DoubleType()),
               T.StructField("ymax", T.DoubleType())]
    schema = T.StructType(fields)
    attr_names = [a for a, _ in attr]
    sel_cols = ", ".join(
        ["rowid"] + [f'"{a}"' for a in attr_names] + [f'"{gcol}"'])

    def _scan(iterator):
        import pandas as pd

        for pdf in iterator:
            for _, row in pdf.iterrows():
                rlo, rhi = int(row["lo"]), int(row["hi"])
                c = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
                try:
                    rows = c.execute(
                        f'SELECT {sel_cols} FROM "{layer}" '
                        f"WHERE rowid BETWEEN ? AND ?", (rlo, rhi)
                    ).fetchall()
                finally:
                    c.close()
                out = {f.name: [] for f in fields}
                for r in rows:
                    out["fid"].append(int(r[0]))
                    for i, a in enumerate(attr_names):
                        out[a].append(r[1 + i])
                    blob = r[1 + len(attr_names)]
                    if blob is None:
                        out["wkb"].append(None)
                        for kcol in ("xmin", "ymin", "xmax", "ymax"):
                            out[kcol].append(None)
                        continue
                    wkb_bytes, env, empty = parse_gpb(bytes(blob))
                    out["wkb"].append(wkb_bytes)
                    if empty:
                        env4 = (None, None, None, None)
                    elif env is not None:
                        env4 = (env[0], env[2], env[1], env[3])
                    else:
                        xmin, xmax, ymin, ymax = _geom_envelope(
                            *_wkb.decode(wkb_bytes))
                        env4 = (xmin, ymin, xmax, ymax)
                    for kcol, v in zip(("xmin", "ymin", "xmax", "ymax"),
                                       env4):
                        out[kcol].append(v)
                yield pd.DataFrame(out)

    if not ranges:
        return spark.createDataFrame([], schema)
    rng = spark.createDataFrame(ranges, "lo long, hi long") \
        .repartition(len(ranges), "lo")
    return rng.mapInPandas(_scan, schema=schema)


def read_gpkg_raster(spark, path: str, table: str | None = None,
                     zoom: int | None = None, band: int = 1):
    """GeoPackage TILES pyramid -> the engine's (bx, by, value) cell
    grid (by bottom-up, like every raster operator here).

    Reference: the GPKG raster driver
    (ogr/ogrsf_frmts/gpkg/ogrgeopackagedataset.cpp tile pipeline): the
    raster window is gpkg_contents' extent positioned inside the
    gpkg_tile_matrix_set origin at the chosen zoom's pixel size; tile
    blobs are PNG (this engine's pure-stdlib decoder; JPEG/WebP tiles
    raise the documented NotImplementedError). Tiles decode in parallel
    — one task batch per tile row — and padding pixels outside the
    contents window are dropped."""
    from pyspark.sql import types as T

    from ..session import ship_package

    ship_package(spark)

    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        tiles_tabs = [r[0] for r in con.execute(
            "SELECT table_name FROM gpkg_contents WHERE data_type IN "
            "('tiles', '2d-gridded-coverage') ORDER BY table_name")]
        if table is None:
            if len(tiles_tabs) != 1:
                raise ValueError(f"pick one of tile tables {tiles_tabs}")
            table = tiles_tabs[0]
        cminx, cminy, cmaxx, cmaxy = con.execute(
            "SELECT min_x, min_y, max_x, max_y FROM gpkg_contents "
            "WHERE table_name = ?", (table,)).fetchone()
        zooms = [r[0] for r in con.execute(
            "SELECT zoom_level FROM gpkg_tile_matrix WHERE table_name = ?"
            " ORDER BY zoom_level", (table,))]
        if zoom is None:
            zoom = zooms[-1]
        (tile_w, tile_h, psx, psy) = con.execute(
            "SELECT tile_width, tile_height, pixel_x_size, pixel_y_size "
            "FROM gpkg_tile_matrix WHERE table_name = ? AND zoom_level = ?",
            (table, zoom)).fetchone()
        tms_minx, tms_maxy = con.execute(
            "SELECT min_x, max_y FROM gpkg_tile_matrix_set "
            "WHERE table_name = ?", (table,)).fetchone()
        tiles = con.execute(
            f'SELECT tile_column, tile_row FROM "{table}" '
            "WHERE zoom_level = ?", (zoom,)).fetchall()
    finally:
        con.close()

    width = int(round((cmaxx - cminx) / psx))
    height = int(round((cmaxy - cminy) / psy))
    px0 = int(round((cminx - tms_minx) / psx))
    py0 = int(round((tms_maxy - cmaxy) / psy))
    tile_w, tile_h = int(tile_w), int(tile_h)

    schema = T.StructType([
        T.StructField("bx", T.LongType()), T.StructField("by", T.LongType()),
        T.StructField("value", T.DoubleType())])

    def _scan(iterator):
        import pandas as pd

        from ..sources.png import decode_png

        for pdf in iterator:
            for col_, row_ in zip(pdf["tc"], pdf["tr"]):
                c = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
                try:
                    blob = c.execute(
                        f'SELECT tile_data FROM "{table}" WHERE '
                        "zoom_level = ? AND tile_column = ? AND "
                        "tile_row = ?", (zoom, int(col_), int(row_))
                    ).fetchone()[0]
                finally:
                    c.close()
                blob = bytes(blob)
                if not blob.startswith(b"\x89PNG"):
                    raise NotImplementedError(
                        "non-PNG gpkg tile (JPEG/WebP) not supported")
                arr, _meta = decode_png(blob)
                if arr.ndim == 3:
                    arr = arr[band - 1]
                gy, gx = np.mgrid[0:arr.shape[0], 0:arr.shape[1]]
                gx = gx + int(col_) * tile_w
                gy = gy + int(row_) * tile_h
                keep = ((gx >= px0) & (gx < px0 + width)
                        & (gy >= py0) & (gy < py0 + height))
                yield pd.DataFrame({
                    "bx": (gx[keep] - px0).astype("int64"),
                    "by": (height - 1 - (gy[keep] - py0)).astype("int64"),
                    "value": arr[keep].astype("float64")})

    rng = spark.createDataFrame(
        [(int(c_), int(r_)) for c_, r_ in tiles], "tc long, tr long")
    rng = rng.repartition(max(1, min(len(tiles),
                                     spark.sparkContext.defaultParallelism)),
                          "tc", "tr")
    return rng.mapInPandas(_scan, schema=schema)


_GPKG_DDL = """
CREATE TABLE gpkg_spatial_ref_sys (
  srs_name TEXT NOT NULL, srs_id INTEGER PRIMARY KEY,
  organization TEXT NOT NULL, organization_coordsys_id INTEGER NOT NULL,
  definition TEXT NOT NULL, description TEXT);
CREATE TABLE gpkg_contents (
  table_name TEXT PRIMARY KEY, data_type TEXT NOT NULL,
  identifier TEXT UNIQUE, description TEXT DEFAULT '',
  last_change DATETIME, min_x DOUBLE, min_y DOUBLE,
  max_x DOUBLE, max_y DOUBLE, srs_id INTEGER);
CREATE TABLE gpkg_geometry_columns (
  table_name TEXT NOT NULL, column_name TEXT NOT NULL,
  geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL,
  z TINYINT NOT NULL, m TINYINT NOT NULL,
  CONSTRAINT pk_geom_cols PRIMARY KEY (table_name, column_name));
"""


def write_gpkg(df, path: str, layer: str = "layer",
               geom_col: str = "wkb", srs_id: int = 0,
               geometry_type: str = "GEOMETRY") -> int:
    """DataFrame(<attrs>..., wkb binary) -> a conformant .gpkg file.

    Single-writer format: drains toLocalIterator() partition-at-a-time
    (never a whole-DataFrame collect). Returns the feature count."""
    import os

    from ..session import ship_package

    # the drained plan may carry pandas UDFs that unpickle worker-side
    ship_package(df.sparkSession)
    if os.path.exists(path):
        os.remove(path)
    # a `fid` input column becomes the INTEGER PRIMARY KEY itself
    # (round-trip stability with read_gpkg), not a duplicate attribute
    has_fid = "fid" in df.columns
    attrs = [(f.name, f.dataType.simpleString()) for f in df.schema.fields
             if f.name not in (geom_col, "fid")]
    sql_t = {"bigint": "INTEGER", "int": "INTEGER", "smallint": "INTEGER",
             "double": "REAL", "float": "REAL", "string": "TEXT",
             "binary": "BLOB", "boolean": "INTEGER"}
    con = sqlite3.connect(path)
    try:
        con.executescript(_GPKG_DDL)
        con.execute(
            "INSERT INTO gpkg_spatial_ref_sys VALUES "
            "('Undefined Cartesian', 0, 'NONE', 0, 'undefined', NULL)")
        cols_ddl = ", ".join(
            [f'"{n}" {sql_t.get(t, "TEXT")}' for n, t in attrs]
            + [f'"geom" BLOB'])
        con.execute(f'CREATE TABLE "{layer}" '
                    f"(fid INTEGER PRIMARY KEY AUTOINCREMENT, {cols_ddl})")
        con.execute(
            "INSERT INTO gpkg_contents (table_name, data_type, identifier,"
            " srs_id) VALUES (?, 'features', ?, ?)",
            (layer, layer, srs_id))
        con.execute(
            "INSERT INTO gpkg_geometry_columns VALUES (?, 'geom', ?, ?,"
            " 0, 0)", (layer, geometry_type, srs_id))
        ins_cols = (["fid"] if has_fid else []) + \
            [n for n, _ in attrs] + ["geom"]
        placeholders = ", ".join(["?"] * len(ins_cols))
        names = ", ".join(f'"{n}"' for n in ins_cols)
        n_rows = 0
        batch = []
        for row in df.toLocalIterator():
            vals = ([int(row["fid"])] if has_fid else []) + \
                [row[n] for n, _ in attrs]
            blob = row[geom_col]
            vals.append(encode_gpb(bytes(blob), srs_id)
                        if blob is not None else None)
            batch.append(vals)
            n_rows += 1
            if len(batch) >= 10000:
                con.executemany(
                    f'INSERT INTO "{layer}" ({names}) '
                    f"VALUES ({placeholders})", batch)
                batch = []
        if batch:
            con.executemany(
                f'INSERT INTO "{layer}" ({names}) VALUES ({placeholders})',
                batch)
        con.commit()
        return n_rows
    finally:
        con.close()
