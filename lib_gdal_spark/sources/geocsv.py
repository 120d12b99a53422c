"""CSV vector source/sink — the reference's CSV driver re-expressed.

Reference: ogr/ogrsf_frmts/csv/ (ogrcsvlayer.cpp): a CSV layer's
geometry comes either from a WKT field (GEOM_POSSIBLE_NAMES open
option) or from X/Y point columns (X_POSSIBLE_NAMES/Y_POSSIBLE_NAMES),
attributes stay as typed fields.

Spark recast: `spark.read.csv` already gives a distributed, splittable
scan with schema inference; this module only adds the geometry
materialization — WKT parse or point build into the engine's
WKB + envelope convention (geo/wkb.py docstring) via an Arrow-batched
pandas UDF over the repo's own WKT codec (geo/wkt.py). The attribute
columns pass through untouched, so Catalyst pushdown/pruning on them
is unaffected.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..geo import wkt as wktmod
from .geojson import _reencode

_GEO_FIELDS = ("kind string, wkb binary, xmin double, ymin double, "
               "xmax double, ymax double")


def _flatten(kind: str, data) -> np.ndarray:
    if kind == "point":
        return np.asarray([data], dtype=np.float64)
    if kind in ("linestring", "multipoint"):
        return np.asarray(data, dtype=np.float64)
    if kind in ("polygon", "multilinestring"):
        return np.vstack([np.asarray(r, dtype=np.float64) for r in data])
    return np.vstack([np.asarray(r, dtype=np.float64)
                      for p in data for r in p])  # multipolygon


def _geom_cols(pdf: pd.DataFrame, wkt_col: str | None,
               x_col: str | None, y_col: str | None) -> pd.DataFrame:
    kinds, wkbs, envs = [], [], []
    if wkt_col is not None:
        for s in pdf[wkt_col]:
            if s is None or (isinstance(s, float) and pd.isna(s)):
                kinds.append(None)
                wkbs.append(None)
                envs.append((None,) * 4)
                continue
            kind, data = wktmod.from_wkt(str(s))
            flat = _flatten(kind, data)
            kinds.append(kind)
            wkbs.append(_reencode(kind, data))
            envs.append((float(flat[:, 0].min()), float(flat[:, 1].min()),
                         float(flat[:, 0].max()), float(flat[:, 1].max())))
    else:
        from ..geo.wkb import encode_point

        xs = pd.to_numeric(pdf[x_col])
        ys = pd.to_numeric(pdf[y_col])
        for x, y in zip(xs, ys):
            if pd.isna(x) or pd.isna(y):
                kinds.append(None)
                wkbs.append(None)
                envs.append((None,) * 4)
                continue
            kinds.append("point")
            wkbs.append(encode_point(float(x), float(y)))
            envs.append((float(x), float(y), float(x), float(y)))
    e = pd.DataFrame(envs, columns=["xmin", "ymin", "xmax", "ymax"])
    # the consumed geometry field does not pass through as an attribute
    # (the reference's CSV layer also lifts it out of the field list)
    out = pdf.drop(columns=[wkt_col] if wkt_col is not None else [])
    out["kind"] = kinds
    out["wkb"] = wkbs
    for c in e.columns:
        out[c] = e[c].astype("float64")
    return out


def read_geocsv(spark: SparkSession, path: str, *,
                wkt_col: str | None = None, x_col: str | None = None,
                y_col: str | None = None, **csv_options) -> DataFrame:
    """CSV -> feature DataFrame: all attribute columns plus
    (kind, wkb, xmin, ymin, xmax, ymax). Exactly one of `wkt_col` or
    the (`x_col`, `y_col`) pair selects the geometry source — the CSV
    driver's GEOM_POSSIBLE_NAMES vs X/Y_POSSIBLE_NAMES modes. Rows with
    a null/empty geometry field keep null geometry columns (the
    reference yields geometry-less features there too).

    The scan itself is spark.read.csv — splittable, so a 100 TB CSV
    lake parses fully in parallel; the WKT decode is Arrow-batched."""
    if (wkt_col is None) == (x_col is None or y_col is None):
        raise ValueError("pass wkt_col OR (x_col AND y_col)")
    from ..session import ship_package

    ship_package(spark)
    opts = {"header": "true", "inferSchema": "true", **csv_options}
    raw = spark.read.options(**opts).csv(path)
    keep = [f for f in raw.schema.fields if f.name != wkt_col]
    schema = T.StructType(keep + list(T._parse_datatype_string(_GEO_FIELDS)))

    def conv(batches):
        for pdf in batches:
            yield _geom_cols(pdf, wkt_col, x_col, y_col)

    return raw.mapInPandas(conv, schema=schema)


def write_geocsv(df: DataFrame, path: str, wkt_col: str = "wkt") -> None:
    """Feature DataFrame (kind, wkb + attributes) -> CSV part files with
    geometry serialized as a WKT column (the reference's
    GEOMETRY=AS_WKT layer creation option)."""
    from ..geo import wkb as wkbmod
    from ..session import ship_package

    ship_package(df.sparkSession)
    attrs = [c for c in df.columns
             if c not in ("kind", "wkb", "xmin", "ymin", "xmax", "ymax",
                          wkt_col)]

    @F.pandas_udf(T.StringType())
    def to_wkt_udf(wkb: pd.Series) -> pd.Series:
        out = []
        for buf in wkb:
            if buf is None:
                out.append(None)
                continue
            kind, data = wkbmod.decode(bytes(buf))
            out.append(wktmod.to_wkt(kind, data))
        return pd.Series(out)

    (df.select(*attrs, to_wkt_udf(F.col("wkb")).alias(wkt_col))
       .write.mode("overwrite").option("header", "true").csv(path))
