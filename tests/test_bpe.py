"""BPE merge learning — the Sennrich et al. 2016 toy corpus golden."""

from pyspark.sql import functions as F

from lib_gdal_spark.operators import bpe


def _corpus(spark):
    words = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    return spark.createDataFrame([(0, " ".join(words))],
                                 "doc_id long, text string")


class TestBpeTrain:
    def test_sennrich_merge_sequence(self, spark):
        # the paper's worked example: es(9), est(9), est</w>(9), lo(7),
        # low(7) — learned order and counts must match exactly
        merges, sym = bpe.bpe_train(_corpus(spark), 5)
        assert merges == [("e", "s", 9), ("es", "t", 9),
                          ("est", "</w>", 9), ("l", "o", 7),
                          ("lo", "w", 7)]
        got = {r.word: list(r.s) for r in sym.collect()}
        assert got["low"] == ["low", "</w>"]
        assert got["lower"] == ["low", "e", "r", "</w>"]
        assert got["newest"] == ["n", "e", "w", "est</w>"]
        assert got["widest"] == ["w", "i", "d", "est</w>"]

    def test_encode_compression(self, spark):
        merges, _ = bpe.bpe_train(_corpus(spark), 5)
        out = bpe.bpe_encode(_corpus(spark), merges).collect()[0]
        # 5*2 + 2*4 + 6*4 + 3*4 = 54 symbols over 16 tokens
        assert (out.n_tokens, out.n_symbols) == (16, 54)

    def test_greedy_left_to_right_overlap(self, spark):
        # 'aaa' + merge (a,a): greedy LTR gives [aa, a, </w>], never
        # [a, aa, </w>] or a double merge
        d = spark.createDataFrame([(0, "aaa")], "doc_id long, text string")
        merges, sym = bpe.bpe_train(d, 1)
        assert merges[0][:2] == ("a", "a")
        assert list(sym.collect()[0].s) == ["aa", "a", "</w>"]

    def test_partition_invariant(self, spark):
        docs = [(i, f"alpha beta gamma{'x' * (i % 3)}") for i in range(40)]
        d = spark.createDataFrame(docs, "doc_id long, text string")
        m1, _ = bpe.bpe_train(d.repartition(1), 4)
        m16, _ = bpe.bpe_train(d.repartition(16), 4)
        assert m1 == m16

    def test_pair_counts_topk(self, spark):
        out = bpe.pair_counts_topk(_corpus(spark), 3).collect()
        # e-s 9, s-t 9, t-</w> 9, w-e 8... top3 by (cnt desc, a, b):
        assert [(r.a, r.b, r.cnt, r.rank) for r in out] == [
            ("e", "s", 9, 1), ("s", "t", 9, 2), ("t", "</w>", 9, 3)]
