"""MBTiles source + sink over stdlib sqlite3.

MBTiles is a single-file SQLite tile pyramid: a ``tiles`` table
(zoom_level, tile_column, tile_row, tile_data BLOB, UNIQUE on the
triple — reference DDL frmts/mbtiles/mbtilesdataset.cpp:3023-3029) plus
a ``metadata`` name/value table whose required keys the reference
writer emits at mbtilesdataset.cpp:3047-3085 (name, type, description,
version, format) with bounds/center/minzoom/maxzoom added on close
(:1104-1202).

The ONE semantic trap is the row axis: MBTiles stores TMS rows (origin
bottom-left) while this engine — like gdal2tiles' default and every
web map — addresses tiles in XYZ (origin top-left). The reference
flips on both paths: ``(1 << zoom) - 1 - y`` reading
(mbtilesdataset.cpp:1665,1747) and writing (:1852). This module does
the same, so DataFrames on either side of the file are always XYZ.

Parallel shape (same as the GeoPackage twin): reads are rowid-range
partitioned b-tree seeks, each task opening the file read-only; the
sink funnels through the driver because SQLite is a single-writer
format (exactly the reference's situation — its writer holds one
sqlite3 handle).
"""

from __future__ import annotations

import sqlite3

__all__ = ["read_mbtiles", "write_mbtiles", "read_metadata", "zoom_levels"]


def read_metadata(path: str) -> dict:
    """The metadata name/value table as a dict."""
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        return dict(con.execute("SELECT name, value FROM metadata"))
    finally:
        con.close()


def zoom_levels(path: str) -> list:
    """Distinct zoom levels present in the tiles table, ascending."""
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        return [r[0] for r in con.execute(
            "SELECT DISTINCT zoom_level FROM tiles ORDER BY zoom_level")]
    finally:
        con.close()


def read_mbtiles(spark, path: str, zoom: int | None = None,
                 num_partitions: int = 0):
    """MBTiles file -> DataFrame(z int, x long, y long, data binary)
    with y in XYZ (top-down) scheme.

    ``zoom=None`` reads every level. Tasks range-scan rowid slices, so
    a billion-tile file splits across executors without any one task
    holding more than its slice."""
    from pyspark.sql import types as T

    from ..session import ship_package

    ship_package(spark)

    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        if zoom is None:
            lo, hi, n = con.execute(
                "SELECT MIN(rowid), MAX(rowid), COUNT(*) FROM tiles"
            ).fetchone()
        else:
            lo, hi, n = con.execute(
                "SELECT MIN(rowid), MAX(rowid), COUNT(*) FROM tiles "
                "WHERE zoom_level = ?", (zoom,)).fetchone()
    finally:
        con.close()
    if n == 0 or lo is None:
        lo, hi = 0, -1

    if num_partitions <= 0:
        tgt = max(1, ((n or 0) + 4095) // 4096)
        num_partitions = max(
            1, min(int(spark.sparkContext.defaultParallelism), tgt))
    span = max(1, (hi - lo + 1 + num_partitions - 1) // num_partitions)
    ranges = [(lo + i * span, min(hi, lo + (i + 1) * span - 1))
              for i in range(num_partitions) if lo + i * span <= hi]

    schema = T.StructType([
        T.StructField("z", T.IntegerType()),
        T.StructField("x", T.LongType()),
        T.StructField("y", T.LongType()),
        T.StructField("data", T.BinaryType())])
    zoom_pred = "" if zoom is None else f" AND zoom_level = {int(zoom)}"

    def _scan(iterator):
        import pandas as pd

        for pdf in iterator:
            for _, row in pdf.iterrows():
                rlo, rhi = int(row["lo"]), int(row["hi"])
                c = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
                try:
                    rows = c.execute(
                        "SELECT zoom_level, tile_column, tile_row, "
                        "tile_data FROM tiles WHERE rowid BETWEEN ? AND ?"
                        + zoom_pred, (rlo, rhi)).fetchall()
                finally:
                    c.close()
                out = {"z": [], "x": [], "y": [], "data": []}
                for zz, tx, ty, blob in rows:
                    out["z"].append(int(zz))
                    out["x"].append(int(tx))
                    # TMS -> XYZ flip, mbtilesdataset.cpp:1665
                    out["y"].append((1 << int(zz)) - 1 - int(ty))
                    out["data"].append(bytes(blob))
                yield pd.DataFrame(out)

    if not ranges:
        return spark.createDataFrame([], schema)
    rng = spark.createDataFrame(ranges, "lo long, hi long") \
        .repartition(len(ranges), "lo")
    return rng.mapInPandas(_scan, schema=schema)


def write_mbtiles(tiles, path: str, *, name: str = "tiles",
                  fmt: str = "png", description: str = "",
                  tile_type: str = "overlay",
                  bounds: tuple | None = None) -> int:
    """DataFrame(z, x, y, data binary) with XYZ y -> a conformant
    .mbtiles file. Returns the tile count.

    Metadata parity with the reference writer
    (mbtilesdataset.cpp:3047-3085 + close-time :1197-1202): name, type,
    description, version, format always written; bounds when supplied;
    minzoom/maxzoom computed from the written tiles. Single-writer
    format: drains toLocalIterator() partition-at-a-time, never a
    whole-DataFrame collect."""
    import os

    from ..session import ship_package

    ship_package(tiles.sparkSession)
    if os.path.exists(path):
        os.remove(path)
    con = sqlite3.connect(path)
    try:
        con.execute("PRAGMA synchronous = OFF")
        con.execute(
            "CREATE TABLE tiles (zoom_level INTEGER NOT NULL,"
            "tile_column INTEGER NOT NULL,"
            "tile_row INTEGER NOT NULL,"
            "tile_data BLOB NOT NULL,"
            "UNIQUE (zoom_level, tile_column, tile_row))")
        con.execute("CREATE TABLE metadata (name TEXT, value TEXT)")
        n_rows = 0
        zmin, zmax = None, None
        batch = []
        for row in tiles.select("z", "x", "y", "data").toLocalIterator():
            z, x, y = int(row["z"]), int(row["x"]), int(row["y"])
            # XYZ -> TMS flip, mbtilesdataset.cpp:1852
            batch.append((z, x, (1 << z) - 1 - y, bytes(row["data"])))
            zmin = z if zmin is None else min(zmin, z)
            zmax = z if zmax is None else max(zmax, z)
            n_rows += 1
            if len(batch) >= 10000:
                con.executemany("INSERT INTO tiles VALUES (?,?,?,?)", batch)
                batch = []
        if batch:
            con.executemany("INSERT INTO tiles VALUES (?,?,?,?)", batch)
        meta = [("name", name), ("type", tile_type),
                ("description", description), ("version", "1.1"),
                ("format", fmt)]
        if bounds is not None:
            meta.append(("bounds", ",".join(repr(float(v)) for v in bounds)))
        if zmin is not None:
            meta += [("minzoom", str(zmin)), ("maxzoom", str(zmax))]
        con.executemany("INSERT INTO metadata VALUES (?,?)", meta)
        con.commit()
        return n_rows
    finally:
        con.close()
