"""Byte-pair-encoding merge learning over the corpus — the tokenizer-
training stage of an LLM data pipeline (Sennrich et al. 2016 word-level
BPE: start from characters + an end-of-word marker, repeatedly merge
the most frequent adjacent symbol pair).

No reference counterpart (the reference's text handling stops at field
values); this sits with the training-data family (token counting in
textops is the "BPE-ish" pre-tokenizer; this learns the merges).

Determinism: pair selection is (count desc, first-symbol asc,
second-symbol asc) — a total order, so the learned merge sequence is
partition-count independent and replayable.

Scale shape: everything after the first groupBy operates on the WORD
VOCABULARY (distinct tokens + frequencies), which is corpus-size-
independent up to vocabulary growth — the 100 TB corpus collapses to
~10^8 vocab rows after one shuffle. Each merge round is one
explode+groupBy over the vocab plus a driver-side top-1 fetch (k rows
via TakeOrdered), and the re-symbolized vocab is localCheckpoint()ed
every round (CLAUDE.md: iterative DataFrame loops MUST eagerly
checkpoint or the plan doubles per round)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import tokens_col

EOW = "</w>"


def word_vocab(df: DataFrame, text_col: str = "text") -> DataFrame:
    """-> (word, freq) over the whole corpus (one shuffle)."""
    return (df.select(F.explode(tokens_col(text_col)).alias("word"))
              .groupBy("word").agg(F.count("*").alias("freq")))


def _init_symbols(vocab: DataFrame) -> DataFrame:
    return vocab.select(
        "word", "freq",
        F.expr(
            "concat(transform(sequence(1, length(word)),"
            f" i -> substring(word, i, 1)), array('{EOW}'))"
        ).alias("s"))


def _pair_counts(sym: DataFrame) -> DataFrame:
    pairs = sym.select(
        "freq",
        F.expr(
            "CASE WHEN size(s) >= 2 THEN "
            "transform(sequence(0, size(s) - 2),"
            " i -> struct(s[i] AS a, s[i+1] AS b)) "
            "ELSE array() END").alias("pp"))
    return (pairs.select(F.explode("pp").alias("p"), "freq")
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").alias("cnt")))


def _merge_expr(a: str, b: str) -> str:
    """Left-to-right greedy merge of adjacent (a, b) into ab — the
    skip-next-after-merge fold; symbols are alnum + the EOW marker, so
    no quoting hazards."""
    ab = a + b
    return f"""aggregate(
      sequence(0, size(s) - 1),
      named_struct('arr', cast(array() as array<string>), 'skip', false),
      (acc, i) -> CASE
        WHEN acc.skip THEN named_struct('arr', acc.arr, 'skip', false)
        WHEN i < size(s) - 1 AND s[i] = '{a}' AND s[i+1] = '{b}'
          THEN named_struct('arr', concat(acc.arr, array('{ab}')),
                            'skip', true)
        ELSE named_struct('arr', concat(acc.arr, array(s[i])),
                          'skip', false) END,
      acc -> acc.arr)"""


def bpe_train(df: DataFrame, n_merges: int,
              text_col: str = "text") -> tuple[list, DataFrame]:
    """Learn `n_merges` BPE merges. -> (merges, symbolized_vocab):
    merges is [(a, b, count), ...] in learned order; symbolized_vocab
    is (word, freq, s array<string>) after all merges."""
    sym = _init_symbols(word_vocab(df, text_col)).localCheckpoint()
    merges: list = []
    for _ in range(n_merges):
        top = (_pair_counts(sym)
               .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
               .limit(1).collect())
        if not top:
            break
        a, b, cnt = top[0].a, top[0].b, top[0].cnt
        merges.append((a, b, int(cnt)))
        sym = sym.select("word", "freq",
                         F.expr(_merge_expr(a, b)).alias("s")) \
                 .localCheckpoint()
    return merges, sym


def bpe_encode(df: DataFrame, merges: list, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Apply a learned merge list to every document's tokens.
    -> (doc_id, n_tokens, n_symbols): the corpus-level compression the
    merge table achieves (n_symbols counts EOW markers, one per word)."""
    base = df.select(F.col(id_col).alias("doc_id"),
                     tokens_col(text_col).alias("t"))
    sym = base.select(
        "doc_id",
        F.expr(
            "flatten(transform(t, w -> concat("
            "transform(sequence(1, length(w)), i -> substring(w, i, 1)),"
            f" array('{EOW}'))))").alias("s"),
        F.size("t").alias("n_tokens"))
    for a, b, _ in merges:
        sym = sym.withColumn("s", F.expr(_merge_expr(a, b)))
    return sym.select("doc_id", "n_tokens",
                      F.size("s").cast("long").alias("n_symbols"))


def pair_counts_topk(df: DataFrame, k: int = 20,
                     text_col: str = "text") -> DataFrame:
    """First-iteration adjacent char-pair counts, top-k by (cnt desc,
    a asc, b asc) — the oracle-able window into the trainer."""
    from pyspark.sql import Window

    # checkpoint the (tiny) symbolized vocab so the pair explode reads
    # it instead of re-running the corpus scan inside its own plan
    sym = _init_symbols(word_vocab(df, text_col)).localCheckpoint()
    counts = (_pair_counts(sym)
              .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b")).limit(k))
    w = Window.orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
    return counts.select("a", "b", "cnt",
                         F.row_number().over(w).alias("rank"))
