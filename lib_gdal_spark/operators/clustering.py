"""Distributed Lloyd k-means over embedding columns — exact, integer.

A training-data-curation operator (semantic clustering ahead of
cluster-balanced sampling / semantic near-dup grouping), first-class in
the same family as operators/dedup.py and operators/similarity.py. The
reference has no k-means; its nearest analog is the coarse quantizer
inside this repo's IVF ANN (similarity.py:ann_ivf), whose deterministic
stride-sample init this reuses (and which itself stands in for the
reference's gridded-NN machinery, alg/gdalgrid.cpp).

Exactness design (CLAUDE.md cross-engine rules):
- float32 embeddings are quantized ONCE to int64 with the shared
  half-rule `floor(x * quant + 0.5)` (float32 -> double is exact and a
  single IEEE multiply is identical in every engine); ALL subsequent
  distances / sums / means are integer arithmetic, so results are
  bit-exact under any partitioning and any engine. The duckdb oracle
  unrolls the fixed iteration count as chained CTEs (the pagerank
  precedent in __spark_entry__.py).
- assignment tie-break: (dist2 asc, centroid index asc), realized as
  array_min over (d, i) structs (lexicographic struct ordering) ==
  the oracle's row_number ORDER BY d2, ci.
- centroid update: per-dimension sum `div` count. Spark `div` and
  duckdb `//` both truncate toward zero (verified for negatives); the
  driver-side Python update below uses an explicit trunc-div helper
  because Python's `//` floors instead.
- empty clusters keep their previous centroid (oracle: LEFT JOIN +
  COALESCE).

Scale notes (100 TB): per iteration the ASSIGNMENT is shuffle-free —
centroids ride along as literal arrays (k*d longs of plan, not data),
argmin is a JVM-side fold — and the UPDATE is ONE map-side-combinable
integer groupBy emitting exactly k rows, of which the driver holds k*d
longs. Iteration count is fixed and every round re-derives from the
persisted quantized base, so lineage does not grow (no checkpoint
discipline needed, unlike sssp/cc). Overflow headroom: |q| <= quant,
dist2 <= d * (2*quant)^2 (6.4e14 at quant=1e6, d=64) and per-cluster
sums <= n_cluster * quant — int64-safe far past 1e9 rows per cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _tdiv(a: int, b: int) -> int:
    """Truncate-toward-zero integer division (Spark `div`, duckdb `//`).
    Python's `//` floors, which differs on negative numerators."""
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


def quantize_vec(vec_col, quant: int):
    """float array -> int64 array via the shared half-rule
    floor(x * quant + 0.5) (identical in duckdb; CLAUDE.md)."""
    qd = float(quant)
    return F.transform(
        vec_col,
        lambda x: F.floor(x.cast("double") * qd + F.lit(0.5)).cast("long"),
    )


def _dist2(qcol, cent: list) -> "F.Column":
    """Squared L2 distance between an int64 array column and a literal
    integer centroid — pure JVM fold, stays long."""
    lit = F.array(*[F.lit(int(v)).cast("long") for v in cent])
    return F.aggregate(
        F.zip_with(qcol, lit, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _best(qcol, cents: list) -> "F.Column":
    """struct(d: long, i: int) of the nearest centroid; lexicographic
    array_min == (dist2 asc, index asc) tie-break."""
    return F.array_min(F.array(*[
        F.struct(_dist2(qcol, c).alias("d"), F.lit(i).alias("i"))
        for i, c in enumerate(cents)
    ]))


def kmeans(points: DataFrame, k: int = 8, iterations: int = 4, *,
           id_col: str = "vec_id", vec_col: str = "embedding",
           quant: int = 10 ** 6, return_centroids: bool = False):
    """Lloyd k-means: (id, cluster: long, dist2: long) after a FIXED
    number of iterations, deterministic and engine-exact (module
    docstring).

    Init = the ann_ivf stride sample: points with ``id % (n div k) == 0``
    ordered by id, first k — a distributed filter that prunes to ~k rows
    executor-side before the bounded collect (never ``limit(n)`` on the
    raw corpus). Assumes reasonably dense ids starting at 0 (the
    testdata contract); a sparse id space falls back to the first k ids
    (still bounded — but then the duckdb twin in __spark_entry__ no
    longer mirrors the init; keep ids dense where parity is claimed).

    The returned frame is shuffle-free on top of the persisted quantized
    base (plan-pinned in tests/test_plans.py); the base stays persisted
    under it — callers that are done with the result clear it with
    ``spark.catalog.clearCache()`` (the bench does).
    """
    from .similarity import stride_sample

    q = points.select(
        F.col(id_col).cast("long").alias(id_col),
        quantize_vec(F.col(vec_col), quant).alias("_q"),
    ).persist()
    # the count inside stride_sample also materializes the persist
    cents = stride_sample(q, id_col, "_q", k, fallback_below=k)
    if len(cents) < k:
        raise ValueError(f"k={k} exceeds the {len(cents)} input points")
    d = len(cents[0])

    for _ in range(iterations):
        assigned = q.select(
            _best(F.col("_q"), cents)["i"].alias("_c"), "_q")
        upd = (
            assigned.groupBy("_c")
            .agg(F.count("*").alias("_n"),
                 *[F.sum(F.col("_q")[j]).alias(f"_s{j}") for j in range(d)])
            .collect()  # exactly k rows (k*d longs) — bounded
        )
        nxt = list(cents)  # empty clusters keep their previous centroid
        for r in upd:
            nxt[r["_c"]] = [_tdiv(int(r[f"_s{j}"]), int(r["_n"]))
                            for j in range(d)]
        cents = nxt

    out = q.select(
        F.col(id_col), _best(F.col("_q"), cents).alias("_best")
    ).select(
        F.col(id_col),
        F.col("_best")["i"].cast("long").alias("cluster"),
        F.col("_best")["d"].alias("dist2"),
    )
    if return_centroids:
        return out, cents
    return out


def _idot(a, b):
    """Integer dot product of two int64 array columns (left fold —
    element-order deterministic, partition-independent)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def semantic_dedup(points: DataFrame, k: int = 8, iterations: int = 4, *,
                   tau_num: int = 40, tau_den: int = 100,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   quant: int = 10 ** 6) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540) recast to
    DataFrames: k-means clusters bound the pair search, then within each
    cluster a vector is a duplicate iff some LOWER-id member has
    cosine >= tau (keep-first rule — deterministic, no connected
    components needed). Returns (id, cluster: long, is_dup: boolean).

    The cosine threshold test is INTEGER-exact, never a float compare at
    the knife edge: on the quantized vectors,
        cos(u, v) >= tau_num/tau_den
    <=> dot > 0 AND tau_den^2 * dot^2 >= tau_num^2 * |u|^2 * |v|^2,
    evaluated in DECIMAL(38,0) (duckdb twin: HUGEINT). Headroom: dot,
    |u|^2 <= d*quant^2 ~ 1.8e13 at d=64 (int64-safe); the squared
    comparison peaks ~3e30 << 1e38.

    Scale notes (100 TB): the all-pairs step is an equi-join on the
    cluster key — pair volume is sum over clusters of s^2/2, bounded by
    choosing k proportional to n (SemDeDup's own regime; the paper uses
    ~sqrt(n)-to-n/100 clusters) — never |corpus|^2. The assignment
    side reuses kmeans' shuffle-free literal-centroid argmin over the
    persisted quantized base.
    """
    _, cents = kmeans(points, k, iterations, id_col=id_col,
                      vec_col=vec_col, quant=quant,
                      return_centroids=True)
    # re-derive (id, cluster, _q, _nsq): the select below is plan-equal
    # to kmeans' internal persisted base, so the cache manager
    # substitutes the InMemoryRelation — one cached scan, no re-fit
    q = points.select(
        F.col(id_col).cast("long").alias(id_col),
        quantize_vec(F.col(vec_col), quant).alias("_q"),
    )
    a = q.select(
        F.col(id_col), F.col("_q"),
        _best(F.col("_q"), cents)["i"].cast("long").alias("cluster"),
        _idot(F.col("_q"), F.col("_q")).alias("_nsq"),
    ).persist()  # scanned 3x (both pair sides + the output leg): persist
    # the narrow all-integer projection so the k*d argmin fold and the
    # self dot product run once per row, not three times
    dec = "decimal(38,0)"
    left = a.select(F.col(id_col).alias("_aid"), F.col("_q").alias("_aq"),
                    "cluster", F.col("_nsq").alias("_ansq"))
    right = a.select(F.col(id_col).alias("_bid"), F.col("_q").alias("_bq"),
                     "cluster", F.col("_nsq").alias("_bnsq"))
    pairs = (
        left.join(right, on="cluster")
        .filter(F.col("_bid") < F.col("_aid"))
        .withColumn("_dot", _idot(F.col("_aq"), F.col("_bq")))
    )
    d = F.col("_dot").cast(dec)
    cond = (F.col("_dot") > 0) & (
        F.lit(tau_den * tau_den).cast(dec) * d * d
        >= F.lit(tau_num * tau_num).cast(dec)
        * F.col("_ansq").cast(dec) * F.col("_bnsq").cast(dec))
    dups = (pairs.filter(cond)
            .select(F.col("_aid").alias(id_col)).distinct()
            .withColumn("is_dup", F.lit(True)))
    return (
        a.select(id_col, "cluster").join(dups, on=id_col, how="left")
        .select(F.col(id_col), F.col("cluster"),
                F.coalesce(F.col("is_dup"), F.lit(False)).alias("is_dup"))
    )


def prototype_prune(points: DataFrame, k: int = 8, iterations: int = 4, *,
                    keep_num: int = 1, keep_den: int = 2,
                    hardest: bool = True,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    quant: int = 10 ** 6) -> DataFrame:
    """Prototypicality-based data pruning (Sorscher et al. 2022,
    "Beyond neural scaling laws", arXiv:2206.14486): rank each point by
    distance to its k-means centroid and keep the keep_num/keep_den
    fraction per cluster — hardest=True keeps the FARTHEST points (the
    paper's choice for large data; easy/prototypical examples prune
    first), hardest=False keeps the nearest.

    Exactness: ranking uses the integer dist2 from the kmeans fit with
    the (dist2, id) deterministic tie-break; the keep test is the
    integer inequality rank * keep_den <= cluster_size * keep_num (no
    float fraction ever computed). The duckdb oracle extends the same
    unrolled kmeans chain with one window.

    Scale: one extra shuffle over (cluster) for the ranking window on
    top of the shuffle-free assignment — the same key the SemDeDup pair
    join uses, so at cluster scale the two curation passes co-partition.
    Returns (id, cluster, dist2, rank, kept).
    """
    asg = kmeans(points, k, iterations, id_col=id_col, vec_col=vec_col,
                 quant=quant)
    from pyspark.sql import Window
    order = (F.col("dist2").desc() if hardest else F.col("dist2").asc())
    w = Window.partitionBy("cluster").orderBy(order, F.col(id_col).asc())
    wc = Window.partitionBy("cluster")
    return (
        asg.withColumn("rank", F.row_number().over(w).cast("long"))
        .withColumn("_n", F.count(F.lit(1)).over(wc))
        .withColumn(
            "kept",
            F.col("rank") * F.lit(int(keep_den))
            <= F.col("_n") * F.lit(int(keep_num)))
        .drop("_n")
    )
