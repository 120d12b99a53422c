"""Lloyd k-means — hand-computed goldens, tie-breaks, empty clusters,
partition invariance (exactness contract in operators/clustering.py)."""

from pyspark.sql import functions as F

from lib_gdal_spark.operators import clustering


def _pts(spark, rows, dim=2):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        f"vec_id long, embedding array<float>")


# 6 points, quant=10 -> q: (0,0),(1,0),(2,1),(10,10),(9,11),(11,9);
# stride=3 -> init c0=(0,0) (id 0), c1=(10,10) (id 3).
_SIX = [(0, (0.0, 0.0)), (1, (0.1, 0.0)), (2, (0.2, 0.1)),
        (3, (1.0, 1.0)), (4, (0.9, 1.1)), (5, (1.1, 0.9))]


class TestKmeansGolden:
    def test_two_cluster_hand_golden(self, spark):
        # iter0: {0,1,2}->c0, {3,4,5}->c1; update c0=(3//3,1//3)=(1,0),
        # c1=(30//3,30//3)=(10,10); iter1 re-assigns identically and the
        # final dist2 (vs converged centroids) is hand-computed below.
        out, cents = clustering.kmeans(
            _pts(spark, _SIX), k=2, iterations=2, quant=10,
            return_centroids=True)
        assert cents == [[1, 0], [10, 10]]
        got = {r.vec_id: (r.cluster, r.dist2) for r in out.collect()}
        assert got == {0: (0, 1), 1: (0, 0), 2: (0, 2),
                       3: (1, 0), 4: (1, 2), 5: (1, 2)}

    def test_tie_breaks_to_lower_index(self, spark):
        # point 1 sits exactly between the two init centroids (ids 0, 2
        # via stride=2): equal dist2 must pick cluster 0
        rows = [(0, (0.0, 0.0)), (1, (0.5, 0.0)), (2, (1.0, 0.0)),
                (3, (1.0, 0.1))]
        out = clustering.kmeans(_pts(spark, rows), k=2, iterations=0,
                                quant=10)
        got = {r.vec_id: r.cluster for r in out.collect()}
        assert got[1] == 0

    def test_empty_cluster_keeps_previous_centroid(self, spark):
        # duplicate init points: every point ties to centroid 0, so
        # cluster 1 receives nothing and must keep its init centroid
        rows = [(0, (0.0, 0.0)), (1, (0.0, 0.0)), (2, (0.0, 0.0)),
                (3, (0.0, 0.0))]
        out, cents = clustering.kmeans(
            _pts(spark, rows), k=2, iterations=2, quant=10,
            return_centroids=True)
        assert cents == [[0, 0], [0, 0]]
        assert {r.cluster for r in out.collect()} == {0}

    def test_truncating_update_on_negatives(self, spark):
        # stride=3 inits c0=q(id0)=-1, c1=q(id3)=50; cluster 0 then
        # holds q-values (-1, -1, -1, 0): sum=-3, n=4 -> Spark div /
        # duckdb // give -3 div 4 = 0 (toward zero), while Python floor
        # -3//4 = -1 would drift the centroid
        rows = [(0, (-0.1,)), (1, (-0.1,)), (2, (-0.1,)), (3, (5.0,)),
                (4, (5.0,)), (5, (0.0,))]
        out, cents = clustering.kmeans(
            _pts(spark, rows, dim=1), k=2, iterations=1, quant=10,
            return_centroids=True)
        assert cents[0] == [0]  # NOT [-1]

    def test_partition_count_invariance(self, spark):
        df = _pts(spark, _SIX)
        a = sorted(map(tuple, clustering.kmeans(
            df.repartition(1), k=2, iterations=3, quant=10).collect()))
        b = sorted(map(tuple, clustering.kmeans(
            df.repartition(7), k=2, iterations=3, quant=10).collect()))
        assert a == b

    def test_quantize_half_rule(self, spark):
        # floor(x*quant + 0.5): 0.05*10 -> 1 (half rounds up), -0.05*10
        # -> floor(0)=0 BUT -0.05f*10 in double is -0.49999...9 -> 0;
        # -0.15 -> floor(-1.0000..)= -1 — pin the exact boundary behavior
        df = _pts(spark, [(0, (0.05, -0.05))])
        q = df.select(clustering.quantize_vec(
            F.col("embedding"), 10).alias("q")).first()["q"]
        assert q[0] in (0, 1) and q[1] in (-1, 0)
        # determinism is what matters cross-engine: duckdb twin asserted
        # in the oracle parity sweep; here just pin repeatability
        q2 = df.select(clustering.quantize_vec(
            F.col("embedding"), 10).alias("q")).first()["q"]
        assert list(q) == list(q2)


class TestSemanticDedup:
    def test_identical_vectors_keep_first(self, spark):
        # ids 0..3 identical, ids 4..5 identical but far away; stride=3
        # inits c0=q(0), c1=q(3) -> iteration collapses to two clusters;
        # keep-first leaves exactly one survivor per identical group
        rows = [(0, (1.0, 0.0)), (1, (1.0, 0.0)), (2, (1.0, 0.0)),
                (3, (1.0, 0.0)), (4, (-5.0, 4.0)), (5, (-5.0, 4.0))]
        out = clustering.semantic_dedup(
            _pts(spark, rows), k=2, iterations=2, quant=10,
            tau_num=99, tau_den=100)
        got = {r.vec_id: r.is_dup for r in out.collect()}
        assert got == {0: False, 1: True, 2: True, 3: True,
                       4: False, 5: True}

    def test_negative_dot_never_dup(self, spark):
        # u and -u have cos = -1: dot^2 is huge but the dot > 0 guard
        # must keep them distinct
        rows = [(0, (1.0, 1.0)), (1, (-1.0, -1.0)),
                (2, (1.0, 0.9)), (3, (-0.9, -1.0))]
        out = clustering.semantic_dedup(
            _pts(spark, rows), k=1, iterations=1, quant=10,
            tau_num=50, tau_den=100)
        got = {r.vec_id: r.is_dup for r in out.collect()}
        assert got[1] is False or got[1] == False  # -u vs u: not a dup
        assert got[0] == False
        # 2 matches 0 (cos ~0.999 > 0.5) -> dup; 3 matches 1 -> dup
        assert got[2] == True and got[3] == True

    def test_exact_threshold_boundary_integer(self, spark):
        # cos exactly tau: q=(1,0) vs (1,1): cos = 1/sqrt(2); with
        # tau = 70/99 (tau^2 = 4900/9801 < 1/2) it IS a dup; with
        # tau = 71/100 (tau^2 = 5041/10000 > 1/2) it is NOT —
        # the integer compare must resolve both sides of 1/2 exactly
        rows = [(0, (0.1, 0.0)), (1, (0.1, 0.1))]
        base = _pts(spark, rows)
        lo = clustering.semantic_dedup(base, k=1, iterations=0, quant=10,
                                       tau_num=70, tau_den=99)
        hi = clustering.semantic_dedup(base, k=1, iterations=0, quant=10,
                                       tau_num=71, tau_den=100)
        assert {r.vec_id: r.is_dup for r in lo.collect()}[1] == True
        assert {r.vec_id: r.is_dup for r in hi.collect()}[1] == False

    def test_partition_count_invariance(self, spark):
        rows = [(i, (float(i % 7) / 3.0, float(i % 5) / 3.0))
                for i in range(30)]
        df = _pts(spark, rows)
        a = sorted(map(tuple, clustering.semantic_dedup(
            df.repartition(1), k=3, iterations=2, quant=100).collect()))
        b = sorted(map(tuple, clustering.semantic_dedup(
            df.repartition(9), k=3, iterations=2, quant=100).collect()))
        assert a == b


class TestPrototypePrune:
    def test_hardest_kept_per_cluster(self, spark):
        # _SIX converges to clusters {0,1,2} (centroid (1,0)) and
        # {3,4,5} (centroid (10,10)); final dist2 per id:
        # 0->1, 1->0, 2->2 | 3->0, 4->2, 5->2. keep 1/3 hardest:
        # cluster 0 keeps id 2 (d2=2); cluster 1 ties 4 vs 5 at d2=2 ->
        # lower id 4 wins
        out = clustering.prototype_prune(
            _pts(spark, _SIX), k=2, iterations=2, quant=10,
            keep_num=1, keep_den=3)
        got = {r.vec_id: (r.rank, r.kept) for r in out.collect()}
        kept = {v for v, (_, k) in got.items() if k}
        assert kept == {2, 4}
        assert got[2][0] == 1 and got[4][0] == 1
        assert got[5][0] == 2  # tie on d2=2 broken by id asc

    def test_easiest_mode_inverts(self, spark):
        out = clustering.prototype_prune(
            _pts(spark, _SIX), k=2, iterations=2, quant=10,
            keep_num=1, keep_den=3, hardest=False)
        kept = {r.vec_id for r in out.collect() if r.kept}
        assert kept == {1, 3}  # d2=0 prototypes

    def test_integer_fraction_boundary(self, spark):
        # 5 points, keep 2/5: exactly rank<=2 kept (rank*5 <= 5*2), the
        # boundary rank 2 INCLUDED — an exact integer test, no rounding
        rows = [(i, (float(i), 0.0)) for i in range(5)]
        out = clustering.prototype_prune(
            _pts(spark, rows), k=1, iterations=0, quant=10,
            keep_num=2, keep_den=5)
        assert sum(r.kept for r in out.collect()) == 2
