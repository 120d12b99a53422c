"""Deterministic md5 HyperLogLog (operators/sketch.py): hand-computed
register goldens, estimator accuracy on known cardinalities, and the
merge property (registers of a union == elementwise max)."""

import hashlib
import math

import pytest

from lib_gdal_spark.operators import sketch


def _expected_register(value: str, p: int = 12):
    h = hashlib.md5(value.encode()).hexdigest()
    bucket = int(h[: p // 4], 16)
    s16 = h[p // 4: p // 4 + 16]
    v = int(s16, 16)
    if v == 0:
        return bucket, 65
    return bucket, 64 - v.bit_length() + 1


def test_registers_match_hand_hash(spark):
    vals = [f"doc-{i}" for i in range(500)]
    df = spark.createDataFrame([(v,) for v in vals], "t string")
    got = {r["bucket"]: r["rho"] for r in
           sketch.hll_registers(df, "t").collect()}
    exp = {}
    for v in vals:
        b, r = _expected_register(v)
        exp[b] = max(exp.get(b, 0), r)
    assert got == exp


def test_estimate_accuracy(spark):
    n = 20000
    df = spark.createDataFrame(
        [(f"u{i % 5000}",) for i in range(n)], "t string")
    est = sketch.distinct_count_approx(df, "t")
    # p=12 -> ~1.6% standard error; allow 5%
    assert abs(est - 5000) / 5000 < 0.05


def test_merge_is_elementwise_max(spark):
    a = spark.createDataFrame([(f"a{i}",) for i in range(300)],
                              "t string")
    b = spark.createDataFrame([(f"b{i}",) for i in range(300)],
                              "t string")
    ra = {r["bucket"]: r["rho"] for r in
          sketch.hll_registers(a, "t").collect()}
    rb = {r["bucket"]: r["rho"] for r in
          sketch.hll_registers(b, "t").collect()}
    runion = {r["bucket"]: r["rho"] for r in
              sketch.hll_registers(a.union(b), "t").collect()}
    merged = dict(ra)
    for k, v in rb.items():
        merged[k] = max(merged.get(k, 0), v)
    assert runion == merged


def test_bad_p_refused(spark):
    df = spark.createDataFrame([("x",)], "t string")
    with pytest.raises(ValueError, match="multiple of 4"):
        sketch.hll_registers(df, "t", p=10)


def test_kmv_matches_sorted_hashes(spark):
    import hashlib

    vals = [f"v{i % 700}" for i in range(3000)]
    df = spark.createDataFrame([(v,) for v in vals], "t string")
    got = [r["h"] for r in sketch.kmv_sketch(df, "t", k=64).collect()]
    exp = sorted({hashlib.md5(v.encode()).hexdigest()
                  for v in set(vals)})[:64]
    assert got == exp


def test_kmv_estimate_accuracy(spark):
    n = 8000
    df = spark.createDataFrame([(f"u{i % 2000}",) for i in range(n)],
                               "t string")
    est = sketch.kmv_estimate(sketch.kmv_sketch(df, "t", k=256), k=256)
    assert abs(est - 2000) / 2000 < 0.15


def test_kmv_exact_below_k(spark):
    df = spark.createDataFrame([(f"x{i}",) for i in range(40)],
                               "t string")
    assert sketch.kmv_estimate(
        sketch.kmv_sketch(df, "t", k=256), k=256) == 40.0
