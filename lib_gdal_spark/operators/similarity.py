"""Similarity search over embedding columns (array<float>).

Engine analog of the reference's nearest-neighbor machinery
(alg/gdalgrid.cpp quadtree NN, alg/gdal_interpolateatpoint.cpp) lifted to
high-dimensional vectors — a first-class op for training-data pipelines.

Two paths:
- brute-force cosine top-k: exact baseline. Dot products run JVM-side via
  higher-order functions (zip_with + aggregate) — no Python, no shuffle of
  the big side when the query set is broadcast.
- LSH-bucketed ANN (random hyperplanes): the 100 TB path. Hyperplanes are
  derived deterministically from a seed (splitmix64 -> uniform in [-1,1]),
  sign bits form a bucket key; candidates share a bucket (multi-probe via
  several independent tables); exact cosine re-ranks survivors. Recall is
  tunable with (n_tables, n_bits); candidates-per-query is bounded by bucket
  occupancy, so the join is an equi-join on (table, bucket) — shuffle scales
  with candidates, never |queries| x |corpus|.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v.cast("double"),
    )


def _norm(a):
    # cast BEFORE multiplying: float*float then widen loses bits and would
    # diverge from any double-side oracle computation
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def with_unit_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Pre-normalize vectors (cosine -> plain dot product downstream)."""
    n = _norm(F.col(vec_col))
    unit = F.transform(F.col(vec_col), lambda x: x.cast("double") / n)
    return df.withColumn("_unit", unit)


def stride_sample(df: DataFrame, id_col: str, vec_col: str, n: int, *,
                  fallback_below: int) -> list:
    """Deterministic stride sample of up to n vectors: filter
    ``id % (count div n) == 0`` -> orderBy id -> limit n. The filter
    prunes to ~n rows EXECUTOR-side before the bounded collect — never
    ``limit(count)`` on the raw corpus (a driver OOM at 1e9 rows). For
    dense ids starting at 0 this is the positional [::stride] slice.
    If a sparse/offset id space starves the filter below
    ``fallback_below`` rows, fall back to the first n ids (still a
    bounded collect) — callers that mirror the stride rule in a SQL twin
    (ann_ivf centroid replay, kmeans init) must keep ids dense so the
    fallback never fires where parity is claimed. Shared by
    ann_ivf and clustering.kmeans."""
    total = df.count()
    stride = max(1, total // n)
    rows = (df.filter((F.col(id_col) % stride) == 0)
            .orderBy(id_col).limit(n).select(vec_col).collect())
    if len(rows) < fallback_below:
        rows = df.orderBy(id_col).limit(n).select(vec_col).collect()
    return [list(r[vec_col]) for r in rows]


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int,
                id_col: str = "vec_id", vec_col: str = "embedding",
                qid_col: str = "qid", method: str = "arrow") -> DataFrame:
    """Exact cosine top-k: (qid, vec_id, cos, rank). Query set is small
    (broadcast / driver-collected); the corpus is the big side.

    method='arrow' (DEFAULT — the scale shape): mapInPandas computes each
    Arrow batch's scores as ONE BLAS matmul against the broadcast query
    matrix and keeps only that batch's top-k per query, so the exchange
    into the global ranking window carries ~k * n_batches rows instead of
    |corpus| x |queries| — the per-partition pre-top-k that makes the
    exact baseline usable beyond dimension-table scale. Still exact: any
    global top-k row is inside its batch's top-k (same (cos desc, id asc)
    order locally and globally).

    method='catalyst': pure-JVM fold (zip_with + aggregate) whose
    left-to-right dot-product order matches the duckdb oracle term for
    term — the cross-engine-exact correctness path (the arrow matmul's
    SIMD fold differs in the last ulp)."""
    if method == "catalyst":
        c = with_unit_norm(corpus, vec_col).select(
            F.col(id_col), F.col("_unit").alias("_cu")
        )
        q = with_unit_norm(queries, vec_col).select(
            F.col(qid_col), F.col("_unit").alias("_qu")
        )
        j = c.crossJoin(F.broadcast(q)).withColumn(
            "cos", _dot(F.col("_cu"), F.col("_qu")))
        w = Window.partitionBy(qid_col).orderBy(F.col("cos").desc(),
                                                F.col(id_col).asc())
        return (
            j.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(qid_col, id_col, "cos", "rank")
        )
    if method != "arrow":
        raise ValueError(f"unknown method {method}")
    import pandas as pd

    q_rows = queries.select(qid_col, vec_col).collect()
    qids = np.array([r[0] for r in q_rows])
    Q = np.array([list(r[1]) for r in q_rows], dtype=np.float64)
    Q /= np.linalg.norm(Q, axis=1, keepdims=True)
    bc = corpus.sparkSession.sparkContext.broadcast((qids, Q))
    id_t = corpus.schema[id_col].dataType.simpleString()
    qid_t = queries.schema[qid_col].dataType.simpleString()

    def topk_batches(it):
        bqids, bQ = bc.value
        for pdf in it:
            if len(pdf) == 0:
                continue
            C = np.array(list(pdf[vec_col]), dtype=np.float64)
            C /= np.linalg.norm(C, axis=1, keepdims=True)
            ids = pdf[id_col].to_numpy()
            S = C @ bQ.T                      # (n_batch, n_q)
            kk = min(k, len(ids))
            out_q, out_i, out_c = [], [], []
            for j in range(len(bqids)):
                s = S[:, j]
                # batch top-k by (cos desc, id asc): lexsort is ascending,
                # so sort on (-cos, id) pairs
                order = np.lexsort((ids, -s))[:kk]
                out_q.extend([bqids[j]] * len(order))
                out_i.extend(ids[order])
                out_c.extend(s[order])
            yield pd.DataFrame({qid_col: out_q, id_col: out_i, "cos": out_c})

    cand = corpus.select(id_col, vec_col).mapInPandas(
        topk_batches, schema=f"{qid_col} {qid_t}, {id_col} {id_t}, cos double")
    w = Window.partitionBy(qid_col).orderBy(F.col("cos").desc(),
                                            F.col(id_col).asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid_col, id_col, "cos", "rank")
    )


def _hyperplanes(dim: int, n_bits: int, table: int, seed: int = 42) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes via splitmix64 mixing."""
    idx = np.arange(dim * n_bits, dtype=np.uint64) + np.uint64(
        (seed * 1_000_003 + table) * 0x9E3779B9
    )
    v = idx
    v = (v + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    v ^= v >> np.uint64(30)
    v = (v * np.uint64(0xBF58476D1CE4E5B9)).astype(np.uint64)
    v ^= v >> np.uint64(27)
    v = (v * np.uint64(0x94D049BB133111EB)).astype(np.uint64)
    v ^= v >> np.uint64(31)
    u = v.astype(np.float64) / 2.0 ** 64
    return (u.reshape(n_bits, dim) * 2.0 - 1.0)


def lsh_bucket_col(vec_col, planes: np.ndarray):
    """Sign-bit bucket id of a vector against `planes` — JVM-side: the dot
    product per plane is an aggregate over the array column."""
    bits = None
    for i, p in enumerate(planes):
        terms = F.aggregate(
            F.zip_with(
                vec_col,
                F.array(*[F.lit(float(x)) for x in p]),
                lambda x, w: x.cast("double") * w,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bit = F.when(terms >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        bits = bit if bits is None else bits + bit
    return bits.cast("int")


def ann_lsh(corpus: DataFrame, queries: DataFrame, k: int,
            n_tables: int = 4, n_bits: int = 8, seed: int = 42,
            id_col: str = "vec_id", vec_col: str = "embedding",
            qid_col: str = "qid", broadcast_queries: bool = True) -> DataFrame:
    """Approximate NN: multi-table hyperplane LSH + exact cosine re-rank.

    Output (qid, vec_id, cos, rank) for up to k hits per query (recall<1 by
    design; tests measure recall against cosine_topk).

    broadcast_queries: right for a small query set (the default search
    shape). Pass False when the query side is corpus-sized (the near-dup
    self-join) — the candidate join then runs as a plain shuffle
    equi-join on (table, bucket), which scales with bucket occupancy
    instead of requiring the query side to fit in every executor.
    """
    dim = len(corpus.select(vec_col).first()[0])
    c = with_unit_norm(corpus, vec_col)
    q = with_unit_norm(queries, vec_col)
    c_buckets, q_buckets = [], []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_bits, t, seed)
        c_buckets.append(
            c.select(
                F.col(id_col), F.col("_unit").alias("_cu"),
                F.lit(t).alias("_tbl"), lsh_bucket_col(F.col("_unit"), planes).alias("_bkt"),
            )
        )
        q_buckets.append(
            q.select(
                F.col(qid_col), F.col("_unit").alias("_qu"),
                F.lit(t).alias("_tbl"), lsh_bucket_col(F.col("_unit"), planes).alias("_bkt"),
            )
        )
    cb = c_buckets[0]
    for x in c_buckets[1:]:
        cb = cb.unionByName(x)
    qb = q_buckets[0]
    for x in q_buckets[1:]:
        qb = qb.unionByName(x)
    right = F.broadcast(qb) if broadcast_queries else qb
    cand = (
        cb.join(right, on=["_tbl", "_bkt"], how="inner")
        .dropDuplicates([qid_col, id_col])
        .withColumn("cos", _dot(F.col("_cu"), F.col("_qu")))
    )
    w = Window.partitionBy(qid_col).orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid_col, id_col, "cos", "rank")
    )


def embedding_neardup(df: DataFrame, threshold: float = 0.999,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      method: str = "lsh", k_probe: int = 16,
                      n_tables: int = 4, n_bits: int = 8) -> DataFrame:
    """Embedding-cosine near-duplicate removal: drop the LARGER id of any
    pair with cosine >= threshold (greedy, deterministic — the
    dedup-family discipline of dedup.minhash_dedup).

    method='lsh' (DEFAULT — the 10^9-row path): hyperplane-LSH candidates
    (ann_lsh machinery) then exact cosine verify. Candidate volume is
    bounded by bucket occupancy (band equi-join), never |corpus|^2.
    Recall < 1 in general, but EXACT duplicates are guaranteed candidates
    (identical vectors share every bucket in every table), so duplicate
    REMOVAL at threshold~1 is exact; near-miss recall is measured against
    'exact' in tests.

    method='exact': brute-force O(n^2) pair scan — the correctness oracle
    for the approximate path; only valid at dimension-table scale."""
    n = with_unit_norm(df, vec_col).select(F.col(id_col), F.col("_unit"))
    if method == "exact":
        a = n.select(F.col(id_col).alias("_ia"), F.col("_unit").alias("_ua"))
        b = n.select(F.col(id_col).alias("_ib"), F.col("_unit").alias("_ub"))
        pairs = (
            a.crossJoin(F.broadcast(b))
            .filter(F.col("_ia") < F.col("_ib"))
            .withColumn("_cos", _dot(F.col("_ua"), F.col("_ub")))
        )
    elif method == "lsh":
        q = df.select(F.col(id_col).alias("_q_id"), F.col(vec_col))
        # the "query" side IS the corpus here -> never broadcast it
        cand = ann_lsh(df, q, k=k_probe, n_tables=n_tables, n_bits=n_bits,
                       id_col=id_col, vec_col=vec_col, qid_col="_q_id",
                       broadcast_queries=False)
        # self-join candidates (qid, vec_id, cos); orient a<b
        pairs = cand.filter(F.col("_q_id") != F.col(id_col)).select(
            F.least(F.col("_q_id"), F.col(id_col)).alias("_ia"),
            F.greatest(F.col("_q_id"), F.col(id_col)).alias("_ib"),
            F.col("cos").alias("_cos"),
        ).dropDuplicates(["_ia", "_ib"])
    else:
        raise ValueError(f"unknown method {method}")
    losers = pairs.filter(F.col("_cos") >= threshold).select(
        F.col("_ib").alias(id_col)
    ).distinct()
    return df.join(losers, on=id_col, how="left_anti")


def _centroid_dots(vec_col, centroids):
    """Array<struct<cid,dot>> of the vector against every centroid —
    JVM-side (one aggregate per centroid over the array column)."""
    entries = []
    for cid, c in enumerate(centroids):
        dot = F.aggregate(
            F.zip_with(vec_col, F.array(*[F.lit(float(x)) for x in c]),
                       lambda a, b: a.cast("double") * b),
            F.lit(0.0), lambda acc, v: acc + v,
        )
        entries.append(F.struct(dot.alias("dot"), F.lit(cid).alias("cid")))
    return F.reverse(F.array_sort(F.array(*entries)))  # best dot first


def ann_ivf(corpus: DataFrame, queries: DataFrame, k: int,
            n_lists: int = 16, nprobe: int = 4,
            id_col: str = "vec_id", vec_col: str = "embedding",
            qid_col: str = "qid") -> DataFrame:
    """IVF-style ANN: coarse quantizer + inverted lists + exact re-rank.

    The scale shape of FAISS-style IVF recast to DataFrames:
    - coarse centroids: a deterministic stride sample of the corpus itself
      (unit-normalized) — no iterative k-means needed for bucketing to
      work, and no RNG (reproducible under any partitioning). The sample
      is taken DISTRIBUTED: filter `id % stride == 0` prunes the corpus
      to ~n_lists rows executor-side and only those are collected —
      never `limit(n_corpus).collect()` (a driver-OOM at 10^9 rows).
      For dense ids starting at 0 this picks ids {0, stride, 2*stride,
      ...}, identical to a positional [::stride] slice;
    - every corpus vector is assigned to its nearest centroid (argmax dot,
      pure Catalyst) -> the inverted list id; at 10^9 rows this is one
      narrow map pass and the lists are the shuffle/partition key;
    - each query probes its `nprobe` nearest lists (explode x nprobe) and
      equi-joins the inverted lists — candidates ~ nprobe/n_lists of the
      corpus, never |Q| x |C|;
    - exact cosine re-ranks candidates; recall is tunable via nprobe
      (measured against cosine_topk in tests).
    """
    c = with_unit_norm(corpus, vec_col)
    q = with_unit_norm(queries, vec_col)
    cents = stride_sample(c, id_col, "_unit", n_lists,
                          fallback_below=max(1, n_lists // 2))
    cb = c.withColumn("_list", _centroid_dots(F.col("_unit"), cents)[0]["cid"])
    probes = _centroid_dots(F.col("_unit"), cents)
    qb = q.select(
        F.col(qid_col), F.col("_unit").alias("_qu"),
        F.explode(F.slice(probes, 1, nprobe)["cid"]).alias("_list"),
    )
    cand = (
        cb.select(F.col(id_col), F.col("_unit").alias("_cu"), "_list")
        .join(F.broadcast(qb), on="_list", how="inner")
        .dropDuplicates([qid_col, id_col])
        .withColumn("cos", _dot(F.col("_cu"), F.col("_qu")))
    )
    w = Window.partitionBy(qid_col).orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid_col, id_col, "cos", "rank")
    )
