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
~10^8 vocab rows after one shuffle. Two trainer faces:
- bpe_train: distributed rounds, each one explode+groupBy over the
  vocab plus a bounded candidate fetch; provably-safe MULTI-merge
  batches per round (_select_batch) cut the driver round-trips while
  staying bit-identical to one-at-a-time; the re-symbolized vocab is
  localCheckpoint()ed every round (CLAUDE.md: iterative DataFrame
  loops MUST eagerly checkpoint or the plan doubles per round).
- bpe_train_local: the 32k-merge scale path — one distributed
  word-count job, then the classic in-memory fast-BPE loop over the
  (vocabulary-bounded, min_freq-prunable) word table; zero per-merge
  Spark jobs and the same learned sequence."""

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


def _merge_expr(*pairs) -> str:
    """Left-to-right greedy merge of every adjacent (a, b) in `pairs`
    into their concatenation — the skip-next-after-merge fold; symbols
    are alnum + the EOW marker, so no quoting hazards. For PAIRWISE
    SYMBOL-DISJOINT pairs one combined pass is exactly equivalent to
    applying the pairs as successive single-pair passes: merge sites of
    different pairs can never overlap or create/destroy each other's
    occurrences (see _select_batch)."""
    match = " OR ".join(f"(s[i] = '{a}' AND s[i+1] = '{b}')"
                        for a, b in pairs)
    return f"""aggregate(
      sequence(0, size(s) - 1),
      named_struct('arr', cast(array() as array<string>), 'skip', false),
      (acc, i) -> CASE
        WHEN acc.skip THEN named_struct('arr', acc.arr, 'skip', false)
        WHEN i < size(s) - 1 AND ({match})
          THEN named_struct('arr',
                            concat(acc.arr, array(concat(s[i], s[i+1]))),
                            'skip', true)
        ELSE named_struct('arr', concat(acc.arr, array(s[i])),
                          'skip', false) END,
      acc -> acc.arr)"""


def _select_batch(cands, limit: int) -> list:
    """Longest prefix of the (cnt desc, a, b)-ordered candidate list
    that is provably safe to merge in ONE round while reproducing the
    sequential Sennrich order exactly:

    - PREFIX with no skips: every pair ranked above an accepted pair is
      itself accepted, so after merging the accepted prefix every
      still-present old pair ranks below the batch.
    - pairwise EXTENDED-disjoint: candidate symbol sets {a, b, a+b}
      must not intersect — plain disjointness makes counts of later
      batch members invariant under earlier merges, and including the
      concatenation kills the string-collision case where pair
      (x, 'ab') would gain occurrences from merging ('a', 'b').
    - STRICT count separation from the first excluded candidate:
      new pairs created by a batch merge have count <= the count of
      some conflicting (hence excluded, hence ranked below) pair, so
      strict separation means no new pair can tie or beat any batch
      member under the total order.

    Under these three conditions the sequential trainer provably picks
    exactly the accepted pairs in prefix order (counts unchanged at
    each step), so the batch replay is bit-identical to one-at-a-time.
    """
    used: set = set()
    accepted = []
    stop_cnt = None
    for row in cands:
        ext = {row.a, row.b, row.a + row.b}
        if ext & used:
            stop_cnt = row.cnt
            break
        if len(accepted) >= limit:
            stop_cnt = row.cnt
            break
        accepted.append(row)
        used |= ext
    if stop_cnt is not None:
        while len(accepted) > 1 and accepted[-1].cnt <= stop_cnt:
            accepted.pop()
    return accepted


def bpe_train(df: DataFrame, n_merges: int, text_col: str = "text",
              batch: int = 64, stats: dict | None = None
              ) -> tuple[list, DataFrame]:
    """Learn `n_merges` BPE merges. -> (merges, symbolized_vocab):
    merges is [(a, b, count), ...] in learned order; symbolized_vocab
    is (word, freq, s array<string>) after all merges.

    `batch` merges per driver round (default 64): each round fetches
    the top candidate window once and applies the _select_batch prefix
    in a single combined pass — identical merge sequence to batch=1
    (proof in _select_batch), but ~batch x fewer sequential Spark jobs,
    the VERDICT r3 32k-merge scheduling fix. `stats`, when given, gets
    {'rounds': N} for test assertions."""
    sym = _init_symbols(word_vocab(df, text_col)).localCheckpoint()
    merges: list = []
    rounds = 0
    while len(merges) < n_merges:
        window = max(2 * batch, 16) + 1
        cands = (_pair_counts(sym)
                 .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
                 .limit(window).collect())
        rounds += 1
        if not cands:
            break
        take = _select_batch(cands, min(batch, n_merges - len(merges)))
        merges.extend((r.a, r.b, int(r.cnt)) for r in take)
        sym = sym.select(
            "word", "freq",
            F.expr(_merge_expr(*[(r.a, r.b) for r in take])).alias("s")
        ).localCheckpoint()
    if stats is not None:
        stats["rounds"] = rounds
    return merges, sym


def bpe_train_local(df: DataFrame, n_merges: int, text_col: str = "text",
                    min_freq: int = 1) -> list:
    """The 32k-merge scale path (VERDICT r3 perf item): ONE distributed
    word-count job, then exact Sennrich training in memory over the
    vocabulary — merges per round-trip go from one Spark job each to
    zero. The vocabulary is corpus-size-independent (10^8 rows at
    100 TB); `min_freq` prunes the long tail when it must fit the
    driver (standard tokenizer-trainer knob; pruned words cannot
    affect the top pair by more than their total mass, and min_freq=1
    is bit-identical to bpe_train).

    Incremental pair bookkeeping: a pair -> words inverted index plus
    per-merge delta updates, so each merge touches only the words that
    contain the merged pair — the classic fast-BPE loop, not a full
    recount. Returns the same (a, b, count) list bpe_train learns."""
    rows = (word_vocab(df, text_col)
            .filter(F.col("freq") >= min_freq).collect())
    words = {}           # wid -> (symbols list, freq)
    for wid, r in enumerate(rows):
        words[wid] = ([*r.word, EOW], int(r.freq))

    from collections import defaultdict

    counts: dict = defaultdict(int)
    index: dict = defaultdict(set)   # pair -> {wid}
    for wid, (s, f) in words.items():
        for i in range(len(s) - 1):
            p = (s[i], s[i + 1])
            counts[p] += f
            index[p].add(wid)

    merges = []
    for _ in range(n_merges):
        if not counts:
            break
        # total order: (count desc, a asc, b asc)
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        if cnt <= 0:
            break
        merges.append((a, b, cnt))
        touched = list(index.get((a, b), ()))
        for wid in touched:
            s, f = words[wid]
            # remove this word's old pair contributions
            for i in range(len(s) - 1):
                p = (s[i], s[i + 1])
                counts[p] -= f
                if counts[p] <= 0:
                    del counts[p]
                ix = index[p]
                ix.discard(wid)
                if not ix:
                    del index[p]
            # greedy left-to-right merge (same fold as _merge_expr)
            out, i = [], 0
            while i < len(s):
                if i < len(s) - 1 and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            words[wid] = (out, f)
            for i in range(len(out) - 1):
                p = (out[i], out[i + 1])
                counts[p] += f
                index[p].add(wid)
    return merges


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
        sym = sym.withColumn("s", F.expr(_merge_expr((a, b))))
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
