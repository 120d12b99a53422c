"""Cardinality sketches: deterministic HyperLogLog over md5.

The 100 TB counting primitive a curation pipeline needs (how many
distinct URLs / shingles / n-grams) without a COUNT(DISTINCT) shuffle
of the full key set: m = 2^p integer registers, mergeable across
partitions and across days.

Unlike library HLLs (Spark's approx_count_distinct is HLL++ with
engine-private hashing), this sketch is built from md5 — available
bit-identically in every engine — so the whole register table is
EXACTLY reproducible in SQL (the duckdb twin in __spark_entry__
hash-matches it; CLAUDE.md's "approximate ops are usually still
deterministic" rule):

- bucket = first p/4 hex chars of md5(value) (p = 12 -> 3 chars);
- rho    = leading-zero count of the NEXT 64 hash bits + 1, computed
  relationally: zeros = length of the leading '0'-run of the 16-char
  hex slice, plus a per-digit CASE for the zero bits inside the first
  non-zero digit (1 -> 3, 2-3 -> 2, 4-7 -> 1, 8-f -> 0); an all-zero
  slice is rho = 65;
- registers = groupBy(bucket).max(rho) — a 4096-group aggregation
  with map-side combine, the only shuffle.

The float estimate (Flajolet et al. 2007 alpha_m * m^2 / sum 2^-rho,
with the small-range linear-counting correction) folds DRIVER-side
over the collected m-row register table in bucket order —
deterministic, never partition-dependent."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

_LZ_IN_DIGIT = {"1": 3, "2": 2, "3": 2, "4": 1, "5": 1, "6": 1,
                "7": 1}


def _digit_val(c):
    """Hex digit column -> value 0..15 via position math (no conv —
    the same expression shape works in the duckdb twin)."""
    return F.instr(F.lit("0123456789abcdef"), c) - 1


def hll_registers(df: DataFrame, col: str, p: int = 12) -> DataFrame:
    """-> (bucket int, rho int) register table, one row per NON-EMPTY
    bucket (absent bucket = register 0)."""
    if p % 4 != 0 or not 4 <= p <= 16:
        raise ValueError("p must be a multiple of 4 in [4, 16]")
    nhex = p // 4
    h = F.md5(F.col(col).cast("string"))
    bucket = F.lit(0)
    for i in range(nhex):
        bucket = bucket * 16 + _digit_val(F.substring(h, i + 1, 1))
    s16 = F.substring(h, nhex + 1, 16)
    zeros = F.length(F.regexp_extract(s16, "^(0*)", 1))
    first = F.substring(s16, zeros + 1, 1)
    dlz = None
    for d, lz in _LZ_IN_DIGIT.items():
        dlz = (F.when(first == d, F.lit(lz)) if dlz is None
               else dlz.when(first == d, F.lit(lz)))
    dlz = dlz.otherwise(F.lit(0))
    rho = F.when(first == "", F.lit(65)) \
        .otherwise(zeros * 4 + dlz + 1)
    return (df.filter(F.col(col).isNotNull())
            .select(bucket.cast("int").alias("bucket"),
                    rho.cast("int").alias("rho"))
            .groupBy("bucket").agg(F.max("rho").alias("rho")))


def hll_estimate(registers, p: int = 12) -> float:
    """Driver-side fold of the (small) register table: the classic
    HLL estimator with the linear-counting small-range correction.
    `registers` may be the DataFrame from hll_registers or a
    collected list of (bucket, rho) rows."""
    if isinstance(registers, DataFrame):
        rows = [(r["bucket"], r["rho"]) for r in registers.collect()]
    else:
        rows = [(int(b), int(r)) for b, r in registers]
    m = 1 << p
    regs = [0] * m
    for b, r in rows:
        regs[b] = max(regs[b], r)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    s = 0.0
    for r in sorted(regs, reverse=True):  # fixed fold order
        s += math.pow(2.0, -r)
    est = alpha * m * m / s
    zeros = regs.count(0)
    if est <= 2.5 * m and zeros > 0:
        est = m * math.log(m / float(zeros))
    return est


def distinct_count_approx(df: DataFrame, col: str,
                          p: int = 12) -> float:
    """Convenience: one-shot estimate."""
    return hll_estimate(hll_registers(df, col, p), p)


def kmv_sketch(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """K-minimum-values sketch: the k smallest md5 hashes of the
    column (Bar-Yossef et al. 2002). Mergeable (union = k smallest of
    the concatenation) and EXACTLY reproducible in SQL
    (ORDER BY md5 LIMIT k), so the driver twin hash-matches the whole
    sketch. One orderBy-limit: Spark plans TakeOrdered (per-partition
    top-k + a k-row merge), never a full sort spill."""
    return (df.filter(F.col(col).isNotNull())
            .select(F.md5(F.col(col).cast("string")).alias("h"))
            .distinct()
            .orderBy("h")
            .limit(k))


def kmv_estimate(sketch_df, k: int = 256) -> float:
    """(k-1) / max_fraction over the 128-bit hash space; fewer than k
    distinct values collected = the exact count."""
    rows = [r["h"] for r in sketch_df.collect()] \
        if isinstance(sketch_df, DataFrame) else list(sketch_df)
    if len(rows) < k:
        return float(len(rows))
    top = max(rows)
    frac = int(top, 16) / float(1 << 128)
    return (k - 1) / frac
