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

    def test_batched_equals_sequential(self, spark):
        # VERDICT r4 item 7: the batched trainer must reproduce the
        # batch=1 merge sequence BIT-EXACTLY (same pairs, same counts,
        # same order) while using ~batch x fewer driver rounds.
        words = ["kilo", "mesa", "ruby", "opal", "fern", "dune", "wasp",
                 "yeti", "char", "bolt", "grim", "visa"]
        docs = [(i, " ".join(w * 1 for w in words[:1 + i % len(words)]))
                for i in range(60)]
        d = spark.createDataFrame(docs, "doc_id long, text string")
        seq_stats, bat_stats = {}, {}
        m_seq, _ = bpe.bpe_train(d, 24, batch=1, stats=seq_stats)
        m_bat, _ = bpe.bpe_train(d, 24, batch=16, stats=bat_stats)
        assert m_bat == m_seq
        assert seq_stats["rounds"] == 24
        # consecutive BPE merges often share symbols, so safe batches
        # are modest — but never MORE rounds than sequential
        assert bat_stats["rounds"] <= seq_stats["rounds"]
        # the in-memory vocabulary trainer (the 32k-merge scale path:
        # ONE Spark job, zero per-merge round-trips) is bit-identical
        m_loc = bpe.bpe_train_local(d, 24)
        assert m_loc == m_seq

    def test_local_trainer_matches_distributed_on_real_docs(self, spark):
        d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        stats = {}
        m_bat, _ = bpe.bpe_train(d, 16, batch=16, stats=stats)
        m_loc = bpe.bpe_train_local(d, 16)
        assert m_loc == m_bat
        assert stats["rounds"] < 16  # batching engages on real text

    def test_select_batch_tie_and_collision_guards(self):
        from collections import namedtuple
        R = namedtuple("R", "a b cnt")
        # conflict on shared symbol stops the prefix; tie with the
        # excluded candidate truncates back to strict separation
        cands = [R("a", "b", 9), R("c", "d", 9), R("b", "e", 9)]
        got = bpe._select_batch(cands, 10)
        assert [(r.a, r.b) for r in got] == [("a", "b")]
        # concatenation collision: ('x', 'ab') could GAIN occurrences
        # from merging ('a','b') -> extended-disjoint must reject it
        cands = [R("a", "b", 9), R("x", "ab", 8), R("q", "r", 5)]
        got = bpe._select_batch(cands, 10)
        assert [(r.a, r.b) for r in got] == [("a", "b")]
        # clean strictly-separated disjoint prefix is all accepted
        cands = [R("a", "b", 9), R("c", "d", 8), R("e", "f", 7)]
        got = bpe._select_batch(cands, 10)
        assert [(r.a, r.b) for r in got] == [("a", "b"), ("c", "d"),
                                             ("e", "f")]
