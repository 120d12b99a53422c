"""kNN via ring expansion over a doubling cell grid + brute-force baseline.

Reference semantics: the gridding nearest-neighbor search walks a quadtree
with a search radius that DOUBLES until enough points are found
(/root/reference/alg/gdalgrid.cpp:879-995, radius doubling :950). The
distributed recast: queries and targets are keyed to a uniform planar grid;
round r uses cell size cs*2^r and joins each query's 3x3 cell neighborhood
(one equi-join after a x9 explode of the surviving queries — never a cross
join). A query retires when it has >= k candidates AND its kth distance is
<= the guaranteed-covered radius (one cell size: any point within cs_r of a
query is inside the 3x3 block). That retire rule makes the result EXACT —
verified against the brute-force oracle in tests.

Scale notes:
- per-round cost is a hash equi-join over the surviving queries only; the
  explode factor is a constant 9;
- density-adaptive: dense regions retire in round 0; the doubling loop only
  carries sparse-region stragglers (the exact long-tail the reference's
  radius doubling exists for);
- grid keys are plain int64 column math — no UDF anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _dist(qx, qy, tx, ty):
    # plain multiplies (not pow) so the arithmetic is bit-identical to the
    # duckdb oracle's (qx-tx)*(qx-tx) expression
    return F.sqrt((qx - tx) * (qx - tx) + (qy - ty) * (qy - ty))


def knn_bruteforce(queries: DataFrame, targets: DataFrame, k: int,
                   qid: str = "qid", tid: str = "tid",
                   qx: str = "qx", qy: str = "qy",
                   tx: str = "tx", ty: str = "ty") -> DataFrame:
    """Exact kNN by broadcast nested-loop join — the right plan when the
    target set is broadcastable; also the correctness oracle.

    Output: (qid, tid, dist, rank), rank 1..k by (dist, tid) — deterministic
    tie-break on tid so results are reproducible under shuffle.
    """
    j = queries.crossJoin(F.broadcast(targets))
    j = j.withColumn("dist", _dist(F.col(qx), F.col(qy), F.col(tx), F.col(ty)))
    w = Window.partitionBy(qid).orderBy(F.col("dist").asc(), F.col(tid).asc())
    return (
        j.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid, tid, "dist", "rank")
    )


_OFFSETS = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]


def knn_ring(queries: DataFrame, targets: DataFrame, k: int,
             cell_size: float, max_rounds: int = 12,
             qid: str = "qid", tid: str = "tid",
             qx: str = "qx", qy: str = "qy",
             tx: str = "tx", ty: str = "ty") -> DataFrame:
    """Exact distributed kNN by ring expansion (doubling cell size).

    cell_size: starting grid pitch in coordinate units — pick roughly the
    expected kth-neighbor distance (too small only adds cheap early rounds).
    """
    offsets = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy")) for dx, dy in _OFFSETS
    ])
    results = None
    remaining = queries.select(qid, qx, qy)
    for r in range(max_rounds):
        cs = cell_size * (2 ** r)
        # query side: explode to the 3x3 neighborhood of its cell
        q_r = (
            remaining
            .withColumn("_o", F.explode(offsets))
            .select(
                F.col(qid), F.col(qx), F.col(qy),
                (F.floor(F.col(qx) / cs) + F.col("_o.dx")).alias("_gx"),
                (F.floor(F.col(qy) / cs) + F.col("_o.dy")).alias("_gy"),
            )
        )
        t_r = targets.select(
            F.col(tid), F.col(tx), F.col(ty),
            F.floor(F.col(tx) / cs).alias("_gx"),
            F.floor(F.col(ty) / cs).alias("_gy"),
        )
        cand = (
            q_r.join(t_r, on=["_gx", "_gy"], how="inner")
            .withColumn("dist", _dist(F.col(qx), F.col(qy), F.col(tx), F.col(ty)))
            # 3x3 blocks of adjacent exploded cells can duplicate (q,t) pairs
            .dropDuplicates([qid, tid])
        )
        w = Window.partitionBy(qid).orderBy(F.col("dist").asc(), F.col(tid).asc())
        ranked = cand.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
        stats = ranked.groupBy(qid).agg(
            F.count(F.lit(1)).alias("_n"), F.max("dist").alias("_kth")
        )
        last_round = r + 1 == max_rounds
        if last_round:
            done_ids = stats.select(qid)  # take what we have
        else:
            done_ids = stats.filter(
                (F.col("_n") >= k) & (F.col("_kth") <= F.lit(float(cs)))
            ).select(qid)
        finished = ranked.join(done_ids, on=qid, how="left_semi").select(
            qid, tid, "dist", "rank"
        )
        results = finished if results is None else results.unionByName(finished)
        remaining = remaining.join(done_ids, on=qid, how="left_anti")
        # eager localCheckpoint from round 3 on: truncate per-round
        # lineage (the plan otherwise grows multiplicatively with rounds
        # and kills analysis on sparse inputs needing many doublings —
        # see operators/graph.py). Dense inputs retire in 1-2 rounds and
        # skip the materialization cost entirely.
        if r >= 2:
            results = results.localCheckpoint()
            remaining = remaining.localCheckpoint()
        if len(remaining.take(1)) == 0:
            break
    return results
