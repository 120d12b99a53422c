"""Arrow IPC (Feather V2 / stream) source + sink.

Reference: the Arrow/Feather drivers
(/root/reference/ogr/ogrsf_frmts/arrow/ — file + stream IPC layouts).
Spark has no native Arrow-IPC file reader, but its Python workers
already speak Arrow, so the distributed shape is natural: the driver
lists files (cheap — only footers are touched for schemas), each task
opens its own file with pyarrow and yields record batches straight into
the pandas-UDF Arrow pipe — data is columnar end-to-end, never
row-pivoted.

Scale shape: one Spark task per file (the Arrow IPC footer indexes
record batches, so a finer batch-range split is possible the same way
read_gpkg splits rowid ranges; file granularity matches how these
datasets are laid out in practice). Schema is taken from the first
file's footer; files with mismatched schemas fail loudly.
"""

from __future__ import annotations

import glob
import os

_ARROW_TO_SPARK = {
    "int8": "byte", "int16": "short", "int32": "int", "int64": "long",
    "uint8": "short", "uint16": "int", "uint32": "long", "uint64": "long",
    "float": "float", "double": "double", "bool": "boolean",
    "string": "string", "large_string": "string",
    "binary": "binary", "large_binary": "binary",
    "date32[day]": "date", "timestamp[us]": "timestamp_ntz",
    "timestamp[ms]": "timestamp_ntz", "timestamp[ns]": "timestamp_ntz",
}


def _open_any(path: str):
    """IPC file (Feather V2, magic ARROW1) or IPC stream."""
    import pyarrow as pa

    with open(path, "rb") as f:
        magic = f.read(6)
    if magic == b"ARROW1":
        return pa.ipc.open_file(path)
    return pa.ipc.open_stream(path)


def _list(path: str) -> list:
    if os.path.isdir(path):
        files = sorted(
            p for p in glob.glob(os.path.join(path, "*"))
            if os.path.isfile(p) and not os.path.basename(p).startswith((
                "_", ".")))
    else:
        files = sorted(glob.glob(path)) or [path]
    if not files:
        raise FileNotFoundError(path)
    return files


def read_arrow_ipc(spark, path: str):
    """path: a file, a glob, or a directory of Arrow IPC files ->
    DataFrame. One task per file; batches stream through Arrow
    without row materialization."""
    from ..session import ship_package

    ship_package(spark)
    files = _list(path)
    schema = _open_any(files[0]).schema

    fields = []
    for f in schema:
        t = str(f.type)
        if t.startswith("list<") or t.startswith("large_list<"):
            inner = t.split("<", 1)[1].rsplit(">", 1)[0]
            inner = inner.split(":", 1)[-1].strip()
            spark_t = f"array<{_ARROW_TO_SPARK.get(inner, 'string')}>"
        else:
            spark_t = _ARROW_TO_SPARK.get(t)
            if spark_t is None:
                raise NotImplementedError(
                    f"arrow type {t} (column {f.name})")
        fields.append(f"{f.name} {spark_t}")
    ddl = ", ".join(fields)

    def _scan(iterator):
        for pdf in iterator:
            for fp in pdf["path"]:
                reader = _open_any(fp)
                if hasattr(reader, "num_record_batches"):
                    batches = (reader.get_batch(i)
                               for i in range(reader.num_record_batches))
                else:
                    batches = iter(reader)
                for b in batches:
                    yield b.to_pandas()

    rng = spark.createDataFrame([(f,) for f in files], "path string") \
        .repartition(len(files), "path")
    return rng.mapInPandas(_scan, schema=ddl)


def write_arrow_ipc(df, path: str) -> int:
    """DataFrame -> a directory of Arrow IPC files, ONE PER PARTITION
    (written executor-side — fully parallel, like the parquet sinks).
    Returns the number of part files written."""
    import os

    from ..session import ship_package

    ship_package(df.sparkSession)
    os.makedirs(path, exist_ok=True)

    def _write(iterator):
        import socket

        import pandas as pd
        import pyarrow as pa
        import pyarrow.feather  # noqa: F401  (registers IPC file writer)
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        frames = list(iterator)
        if frames:
            tbl = pa.Table.from_pandas(pd.concat(frames),
                                       preserve_index=False)
            tmp = os.path.join(path,
                               f".part-{pid:05d}.{socket.gethostname()}"
                               f".{os.getpid()}.tmp")
            with pa.OSFile(tmp, "wb") as sink:
                with pa.ipc.new_file(sink, tbl.schema) as w:
                    w.write_table(tbl)
            # atomic landing (the readStream-watched-directory rule)
            os.rename(tmp, os.path.join(path, f"part-{pid:05d}.arrow"))
            yield pd.DataFrame({"n": [len(tbl)]})
        else:
            yield pd.DataFrame({"n": []})

    df.mapInPandas(_write, schema="n long").count()
    return len([p for p in os.listdir(path) if p.endswith(".arrow")])
