"""OGR-SQL parity helpers: the reference's SQL semantics on DataFrames.

- first-match LEFT JOIN: OGR SQL's JOIN fetches exactly ONE secondary row
  per primary row (/root/reference/ogr/ogrsf_frmts/generic/
  ogr_gensql.cpp:1507-1537 — `GetNextFeature()` once against the unparsed ON
  filter; both JOIN and LEFT JOIN parse to the same left-outer plan,
  swq_parser.y:1088-1094, unmatched rows keep NULLs). Under a distributed
  shuffle "the first row the driver returns" is nondeterministic, so we pin
  the reference-observable semantics with a deterministic tie-break:
  row_number() over (partition by left key order by right order key) == 1.

- SUMMARY_RECORD aggregates: OGR SQL's whole-table MIN/MAX/AVG/COUNT/SUM/
  STDDEV_POP/STDDEV_SAMP (ogr/ogr_swq.h:67-75) are computed with a
  Kahan-Babuska-Neumaier compensated sum (ogr_swq.h:372-377) and Welford
  online variance (:391-394) to avoid float error. The engine gets the same
  (better) exactness by summing in DECIMAL (exact, order-independent —
  stronger than Kahan) and deriving mean/variance from exact moments; Spark's
  own stddev is Welford-style, and the decimal-moment path makes results
  bit-stable across partitionings AND engines (oracle-checkable).

- DISTINCT list: SWQM_DISTINCT_LIST (ogr_gensql.cpp:647-696) with the
  __OGR_NULL__ sentinel (ogr_swq.h:40) -> distinct() keeping nulls.

- HSTORE_GET_VALUE / a->'key' (ogr/swq_op_general.cpp OGRHStoreGetValue)
  -> get_json_object on JSON-typed string columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def first_match_left_join(left: DataFrame, right: DataFrame, on,
                          left_key: str, right_order) -> DataFrame:
    """LEFT JOIN returning exactly one output row per left row: the match
    with the smallest `right_order` key(s) (deterministic stand-in for the
    reference's physical 'first feature'), NULLs when unmatched.

    right_order: column name or list of names — pass enough columns to make
    the order TOTAL, or results are nondeterministic under shuffle.
    """
    if isinstance(right_order, str):
        right_order = [right_order]
    j = left.join(right, on=on, how="left")
    w = Window.partitionBy(left_key).orderBy(
        *[F.col(c).asc_nulls_last() for c in right_order]
    )
    return j.withColumn("_rn", F.row_number().over(w)).filter("_rn = 1").drop("_rn")


def summary_record(df: DataFrame, col: str, where=None) -> DataFrame:
    """One-row whole-table summary with exact decimal moments.

    Columns: min_v, max_v, count_v, sum_v, avg_v, stddev_pop_v,
    stddev_samp_v (aliases chosen for oracle matching).
    """
    if where is not None:
        df = df.filter(where)
    d = F.col(col).cast("decimal(30,6)")
    d2 = (F.col(col) * F.col(col)).cast("decimal(38,6)")
    base = df.agg(
        F.min(col).alias("min_v"),
        F.max(col).alias("max_v"),
        F.count(col).alias("count_v"),
        F.sum(d).alias("_sum_d"),
        F.sum(d2).alias("_sum_d2"),
    )
    s = F.col("_sum_d").cast("double")
    s2 = F.col("_sum_d2").cast("double")
    n = F.col("count_v").cast("double")
    var_pop = (s2 - s * s / n) / n
    var_samp = (s2 - s * s / n) / (n - 1)
    return base.select(
        "min_v", "max_v", "count_v",
        s.alias("sum_v"),
        (s / n).alias("avg_v"),
        F.sqrt(var_pop).alias("stddev_pop_v"),
        F.sqrt(var_samp).alias("stddev_samp_v"),
    )


def distinct_list(df: DataFrame, col: str) -> DataFrame:
    """SELECT DISTINCT col (nulls included, as the reference's
    __OGR_NULL__ sentinel keeps them)."""
    return df.select(col).distinct()


def hstore_get(df: DataFrame, json_col: str, key: str, out_col: str) -> DataFrame:
    """a->'key' map-get on a JSON string column."""
    return df.withColumn(out_col, F.get_json_object(F.col(json_col), f"$.{key}"))


# WKB geometry-type code -> getGeometryName() string (ogr_core.h:408-444
# base codes; Z/M/ZM and the 0x80000000 2.5-D flag collapse to the same
# name exactly like OGRGeometry::getGeometryName)
_GEOM_NAMES = {
    1: "POINT", 2: "LINESTRING", 3: "POLYGON", 4: "MULTIPOINT",
    5: "MULTILINESTRING", 6: "MULTIPOLYGON", 7: "GEOMETRYCOLLECTION",
    8: "CIRCULARSTRING", 9: "COMPOUNDCURVE", 10: "CURVEPOLYGON",
    11: "MULTICURVE", 12: "MULTISURFACE", 13: "CURVE", 14: "SURFACE",
    15: "POLYHEDRALSURFACE", 16: "TIN", 17: "TRIANGLE",
}


def geometry_type_name_col(wkb_col: str):
    """OGR_GEOMETRY special-field value as PURE Column math: the WKB
    type integer lives in bytes 2-5 (little-endian, this engine's
    encode convention); reorder its hex pairs, mask the 2.5-D flag
    (0x80000000) and the ISO Z/M blocks (type mod 1000), and CASE-map
    to getGeometryName() strings."""
    h = F.hex(F.expr(f"substring({wkb_col}, 2, 4)"))
    le = F.concat(F.substring(h, 7, 2), F.substring(h, 5, 2),
                  F.substring(h, 3, 2), F.substring(h, 1, 2))
    t = F.conv(le, 16, 10).cast("long")
    base = (t.bitwiseAND(F.lit(0x7FFFFFFF)) % 1000).cast("int")
    mapped = None
    for code, name in _GEOM_NAMES.items():
        cond = (base == code, F.lit(name))
        mapped = F.when(*cond) if mapped is None else mapped.when(*cond)
    return mapped.otherwise(F.lit(""))


def with_special_fields(df: DataFrame, wkb_col: str = "wkb",
                        fid_col: str | None = "fid",
                        style_col: str | None = None) -> DataFrame:
    """OGR SQL's five special fields (ogr/ogr_p.h:172-179, values
    ogrfeature.cpp:2445-2495) materialized as columns, so any OGR SQL
    statement using them runs as plain Spark SQL:

    - FID            row id (the layer's fid column)
    - OGR_GEOMETRY   getGeometryName() of the geometry
    - OGR_STYLE      the style string ('' when absent, like the ref)
    - OGR_GEOM_WKT   exportToWkt()
    - OGR_GEOM_AREA  OGR_G_Area() — 0.0 for non-surface geometries

    OGR_GEOMETRY derives from the WKB header in pure Column math; WKT
    and area go through the registered Arrow kernels (register_all
    must have run on this session)."""
    out = df
    if fid_col is not None and fid_col in df.columns:
        out = out.withColumn("FID", F.col(fid_col).cast("long"))
    out = out.withColumn("OGR_GEOMETRY", geometry_type_name_col(wkb_col))
    out = out.withColumn(
        "OGR_STYLE",
        F.col(style_col) if style_col else F.lit(""))
    out = out.withColumn("OGR_GEOM_WKT",
                         F.expr(f"st_astext({wkb_col})"))
    out = out.withColumn(
        "OGR_GEOM_AREA",
        F.coalesce(F.nanvl(F.expr(f"st_area({wkb_col})"), F.lit(0.0)),
                   F.lit(0.0)))
    return out
