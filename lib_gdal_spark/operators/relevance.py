"""Corpus relevance / analysis operators: BM25 scoring and corpus-wide
n-gram statistics.

These are the retrieval/quality-analysis stage of a crawl-to-training
pipeline (rank documents against a probe query; surface the dominant
n-grams for boilerplate detection). No single reference counterpart —
they sit beside the dedup/textops family (SURVEY §2, LLM-pipeline
block) and follow the repo's exactness discipline:

- `bm25_topk`: Okapi BM25 (Robertson/Sparck Jones idf). Everything up
  to the ln() is integer/rational and bit-identical cross-engine; the
  ln itself is transcendental, so the final score is rounded to 6 dp on
  BOTH sides and ranking uses the ROUNDED score (then doc_id) so order
  is deterministic given agreed rounded values — the CLAUDE.md
  transcendental rule. The per-doc fold over query terms is a FIXED
  order sum (conditional aggregation, one term per slot), never a
  data-ordered SUM, so there is no fold-order drift.
- `ngram_topk`: pure integer counts + lexicographic tie-break — exact.

Scale notes (100 TB):
- bm25: explode is filtered to the query terms immediately (token
  volume drops to matches only); docfreq and the 1-row corpus stats are
  broadcast; one groupBy(doc) shuffle; the global top-k is
  orderBy().limit(k) = TakeOrderedAndProject (per-partition heaps +
  driver merge of k rows), NOT a single-partition row_number window.
- ngram: transform() over a STAGED token-array column (CLAUDE.md:
  arrays consumed by higher-order lambdas must be real projected
  columns, or Catalyst re-evaluates the producing expression per
  element), then explode + partial-agg count.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from .dedup import tokens_col

# BM25 free parameters (Robertson et al.; the values every engine
# defaults to). Derived doubles are computed ONCE here in Python so the
# Spark plan and any oracle SQL can share the exact same 64-bit
# constants (repr-injection pattern, CLAUDE.md).
K1 = 1.2
B = 0.75
K1P1 = K1 + 1.0          # 2.2000000000000002
ONE_MINUS_B = 1.0 - B    # 0.25 (exact)


def idf(n_docs: int, df: int) -> float:
    """BM25+ idf: ln(1 + (N - df + 0.5) / (df + 0.5)) — always > 0."""
    return math.log(1.0 + ((n_docs - df) + 0.5) / (df + 0.5))


def bm25_scores(df: DataFrame, terms: list[str], *,
                id_col: str = "doc_id", text_col: str = "text",
                k1: float = K1, b: float = B) -> DataFrame:
    """Per-document BM25 score for an OR-query over `terms`.

    Returns (doc_id, score) with score rounded to 6 dp (see module
    docstring), one row per document containing >= 1 query term.
    """
    terms = list(terms)
    # ONE scan of the corpus: tokenize once, keep only (doc_id, full
    # token count, query-term matches) — a narrow int/short-array row —
    # and persist it so the three consumers (corpus stats, tf, docfreq)
    # don't each re-scan and re-tokenize 100 TB of text. (CLAUDE.md's
    # no-wide-string-cache rule doesn't apply: the text column is
    # dropped before the persist.)
    t = tokens_col(text_col)
    narrow = (df.select(F.col(id_col).alias("doc_id"),
                        F.size(t).alias("dl"), t.alias("t"))
                .select("doc_id", "dl",
                        F.filter("t", lambda x: x.isin(terms)).alias("mt"))
                .persist())
    tok = narrow.select("doc_id", "dl", F.explode("mt").alias("tok"))
    tf = tok.groupBy("doc_id", "dl", "tok").agg(F.count("*").alias("tf"))

    stats = narrow.agg(F.count("*").alias("n_docs"),
                       F.sum("dl").alias("tot_dl"))
    docfreq = tf.groupBy("tok").agg(F.count("*").alias("df"))

    k1p1 = k1 + 1.0
    omb = 1.0 - b
    scored = tf.join(F.broadcast(docfreq), "tok") \
               .crossJoin(F.broadcast(stats))
    # op order mirrored verbatim by the oracle SQL: avgdl is one exact
    # integer division (BIGINT sums are order-independent), idf's
    # argument is rational, only ln() itself is transcendental.
    avgdl = F.col("tot_dl").cast("double") / F.col("n_docs")
    idf_c = F.log(F.lit(1.0) + ((F.col("n_docs") - F.col("df")) + 0.5)
                  / (F.col("df") + 0.5))
    contrib = idf_c * (F.col("tf") * k1p1) / (
        F.col("tf") + k1 * (omb + b * (F.col("dl") / avgdl)))
    scored = scored.select("doc_id", "tok", contrib.alias("c"))

    # fixed-order per-doc fold: one conditional-agg slot per term
    # (groupBy().pivot() would plan TWO shuffles — CLAUDE.md)
    slots = [F.coalesce(F.max(F.when(F.col("tok") == t, F.col("c"))),
                        F.lit(0.0)).alias(f"_c{i}")
             for i, t in enumerate(terms)]
    per_doc = scored.groupBy("doc_id").agg(*slots)
    total = per_doc["_c0"]
    for i in range(1, len(terms)):
        total = total + per_doc[f"_c{i}"]
    return per_doc.select("doc_id", F.round(total, 6).alias("score"))


def bm25_topk(df: DataFrame, terms: list[str], k: int = 10, *,
              id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Global top-k documents by BM25 score (rounded-score desc, doc_id
    asc — total order, partition-count independent). The limit runs as
    TakeOrderedAndProject; the rank window then sees only k rows."""
    from pyspark.sql import Window
    top = (bm25_scores(df, terms, id_col=id_col, text_col=text_col)
           .orderBy(F.desc("score"), F.asc("doc_id")).limit(k))
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return top.select("doc_id", "score",
                      F.row_number().over(w).alias("rank"))


def inverted_postings(df: DataFrame, *, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """The scalable inverted-index form: one (term, doc_id) row per
    distinct term occurrence. This is what a 100 TB index build actually
    materializes (bucketed/sorted by term at the sink so term lookups
    are partition-pruned); `inverted_index` below folds it into
    one-row-per-term posting strings for small result sets / oracles.

    `array_distinct` runs BEFORE the explode so the shuffle carries one
    row per (doc, term), not one per token occurrence."""
    tok = df.select(F.col(id_col).cast("long").alias("doc_id"),
                    tokens_col(text_col).alias("t"))
    return tok.select(
        "doc_id", F.explode(F.array_distinct("t")).alias("term"))


def inverted_index(df: DataFrame, *, id_col: str = "doc_id",
                   text_col: str = "text", min_df: int = 2,
                   k: int = 100) -> DataFrame:
    """Top-k index terms with document frequency and full posting list:
    (term, df, postings, rank), df desc then term asc — a total order.

    postings is the comma-joined ASCENDING doc_id list — deterministic
    under any partitioning (collect_list order is not, sort_array fixes
    it) and bit-exact cross-engine (integer ids, no floats anywhere).

    Scale: TWO passes over the (doc, term) pairs, so the posting
    strings are built ONLY for the <= k surviving terms. Pass 1 counts
    df per term (a count shuffle carries no postings); the min_df +
    top-k filter runs on those counts (TakeOrderedAndProject, <= k
    rows); pass 2 semi-joins the pairs to that broadcast term set and
    only then collect_lists. The naive one-pass shape (aggregate the
    posting string for EVERY term, filter after) materializes an
    O(corpus) row per stopword before dropping it — a guaranteed
    executor OOM on a 100 TB corpus. A full-corpus index should still
    persist `inverted_postings` (pairs, bucketed by term), never one
    giant row per stopword."""
    from pyspark.sql import Window

    pairs = inverted_postings(df, id_col=id_col, text_col=text_col)
    dfc = pairs.groupBy("term").agg(F.count("*").alias("df"))
    top = (dfc.filter(F.col("df") >= min_df)
              .orderBy(F.desc("df"), F.asc("term")).limit(k))
    w = Window.orderBy(F.desc("df"), F.asc("term"))
    ranked = top.select("term", "df",
                        F.row_number().over(w).alias("rank"))
    post = (pairs.join(F.broadcast(ranked), "term")
                 .groupBy("term", "df", "rank")
                 .agg(F.array_join(
                     F.transform(F.sort_array(F.collect_list("doc_id")),
                                 lambda x: x.cast("string")),
                     ",").alias("postings")))
    return post.select("term", "df", "postings", "rank").orderBy("rank")


def pmi_topk(df: DataFrame, k: int = 25, *, min_count: int = 5,
             text_col: str = "text") -> DataFrame:
    """Top-k collocations (adjacent word pairs) by pointwise mutual
    information: (gram, cnt, pmi, rank).

    PMI = ln( (c_xy/M) / ((c_x/N) * (c_y/N)) ) with c_xy the bigram
    count, M total bigrams, c_x/c_y unigram counts, N total tokens —
    the classic phrase-mining score (Church & Hanks 1990). Everything
    up to the ln is counts and divisions in a FIXED parenthesization
    (both engines round each double op identically); the ln is
    transcendental, so the score rounds to 6 dp on BOTH sides and the
    ranking orders on the ROUNDED score then gram (CLAUDE.md rule).
    `min_count` drops hapax pairs (classic PMI degenerates to rare
    pairs; 5 is the usual floor).

    Scale: bigrams via posexplode + lead() (the HOF-trap-safe n-gram
    build, see ngram_topk); ONE groupBy(pair) + ONE groupBy(word)
    shuffle; unigram counts and the 1-row totals broadcast to the
    bigram side; top-k is TakeOrderedAndProject."""
    from pyspark.sql import Window

    tok = df.select(F.monotonically_increasing_id().alias("_doc"),
                    tokens_col(text_col).alias("t")) \
            .select("_doc", F.posexplode("t").alias("pos", "w"))
    uni = tok.groupBy("w").agg(F.count("*").alias("c"))
    tot_n = uni.agg(F.sum("c").alias("n_tok"))

    w = Window.partitionBy("_doc").orderBy("pos")
    pairs = (tok.select(F.col("w").alias("_w0"),
                        F.lead("w", 1).over(w).alias("_w1"))
                .filter(F.col("_w1").isNotNull()))
    big = pairs.groupBy("_w0", "_w1").agg(F.count("*").alias("cnt"))
    tot_m = big.agg(F.sum("cnt").alias("n_big"))

    u0 = uni.select(F.col("w").alias("_w0"), F.col("c").alias("c0"))
    u1 = uni.select(F.col("w").alias("_w1"), F.col("c").alias("c1"))
    j = (big.filter(F.col("cnt") >= min_count)
            .join(F.broadcast(u0), "_w0").join(F.broadcast(u1), "_w1")
            .crossJoin(F.broadcast(tot_m)).crossJoin(F.broadcast(tot_n)))
    ratio = (F.col("cnt").cast("double") / F.col("n_big")) / (
        (F.col("c0").cast("double") / F.col("n_tok"))
        * (F.col("c1").cast("double") / F.col("n_tok")))
    scored = j.select(
        F.concat_ws(" ", "_w0", "_w1").alias("gram"), "cnt",
        F.round(F.log(ratio), 6).alias("pmi"))
    top = scored.orderBy(F.desc("pmi"), F.asc("gram")).limit(k)
    rw = Window.orderBy(F.desc("pmi"), F.asc("gram"))
    return top.select("gram", "cnt", "pmi",
                      F.row_number().over(rw).alias("rank"))


def cosine_pairs(df: DataFrame, *, id_col: str = "doc_id",
                 text_col: str = "text", threshold: float = 0.9,
                 ngram: int = 1, max_df: int | None = None,
                 k: int = 50) -> DataFrame:
    """Top-k document pairs by COUNT-VECTOR cosine over shared terms:
    (id_a, id_b, dot, cos, rank) — the lexical near-duplicate verifier
    (the sparse, exact twin of similarity.embedding_neardup).

    Exactness by construction: the dot product sum(tf_a*tf_b) and both
    squared norms are INTEGER sums (order-independent), and
    cos = dot / (sqrt(ss_a) * sqrt(ss_b)) is one exactly-rounded IEEE
    divide over two exactly-rounded sqrts — bit-identical cross-engine
    with zero rounding tricks (the CLAUDE.md-sanctioned +-*/ / sqrt
    set). Ordering: cos desc, then (id_a, id_b) — total.

    Scale: the pair generation is the classic term-pivot self-join —
    each term with document frequency d contributes d^2 candidate rows,
    so COMMON terms dominate the shuffle. Two independent throttles:
    `ngram > 1` switches the vector space to word n-gram shingles
    (shared shingles are rare outside near-duplicates, so the join
    degenerates to candidates — the right default for dedup), and
    `max_df` drops terms above that document frequency BEFORE the join
    (the standard DIMSUM-style pruning; a dropped term only lowers
    cosines of pairs it connects, which a near-dup caller accepts — at
    corpus scale run minhash LSH first and use this as the exact
    verify stage). The groupBy(pair) dot is map-side combinable."""
    from pyspark.sql import Window

    tok = df.select(F.col(id_col).cast("long").alias("doc_id"),
                    tokens_col(text_col).alias("t"))
    if ngram > 1:
        # HOF-safe shingle build: posexplode + lead windows (never a
        # transform() lambda over the tokenizer — CLAUDE.md HOF trap)
        w = Window.partitionBy("doc_id").orderBy("pos")
        pos = tok.select("doc_id", F.posexplode("t").alias("pos", "w"))
        g = pos.select("doc_id", F.col("w").alias("_w0"),
                       *[F.lead("w", j).over(w).alias(f"_w{j}")
                         for j in range(1, ngram)])
        terms = g.filter(F.col(f"_w{ngram - 1}").isNotNull()).select(
            "doc_id",
            F.concat_ws(" ", *[F.col(f"_w{j}") for j in range(ngram)])
             .alias("term"))
    else:
        terms = tok.select("doc_id", F.explode("t").alias("term"))
    tf = (terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
               .persist())  # reused by the norms and both join sides
    norms = tf.groupBy("doc_id").agg(
        F.sum(F.col("tf") * F.col("tf")).alias("ss"))
    joinable = tf
    if max_df is not None:
        dfreq = tf.groupBy("term").agg(F.count("*").alias("_df"))
        joinable = tf.join(F.broadcast(dfreq.filter(F.col("_df") <= max_df)
                                       .select("term")), "term")
    a = joinable.select("term", F.col("doc_id").alias("id_a"),
                        F.col("tf").alias("tf_a"))
    b = joinable.select("term", F.col("doc_id").alias("id_b"),
                        F.col("tf").alias("tf_b"))
    dots = (a.join(b, "term").filter(F.col("id_a") < F.col("id_b"))
             .groupBy("id_a", "id_b")
             .agg(F.sum(F.col("tf_a") * F.col("tf_b")).alias("dot")))
    na = norms.select(F.col("doc_id").alias("id_a"), F.col("ss").alias("ss_a"))
    nb = norms.select(F.col("doc_id").alias("id_b"), F.col("ss").alias("ss_b"))
    cos = F.col("dot") / (F.sqrt(F.col("ss_a")) * F.sqrt(F.col("ss_b")))
    scored = (dots.join(na, "id_a").join(nb, "id_b")
                  .select("id_a", "id_b", "dot", cos.alias("cos"))
                  .filter(F.col("cos") >= threshold))
    top = scored.orderBy(F.desc("cos"), F.asc("id_a"), F.asc("id_b")).limit(k)
    w = Window.orderBy(F.desc("cos"), F.asc("id_a"), F.asc("id_b"))
    return top.select("id_a", "id_b", "dot", "cos",
                      F.row_number().over(w).alias("rank"))


def ngram_topk(df: DataFrame, n: int = 3, k: int = 25, *,
               text_col: str = "text") -> DataFrame:
    """Corpus-wide top-k word n-grams: (gram, cnt, rank), count desc then
    gram asc (total order — exact cross-engine)."""
    from pyspark.sql import Window

    # n-grams via posexplode + n-1 leads, NOT a transform() lambda:
    # Catalyst inlines the token-array expression into the lambda and
    # re-runs the tokenizer regex per element (CLAUDE.md HOF trap;
    # measured 16.6 s -> ~1 s at sf0.1). Leads are materialized BEFORE
    # any filter so neighbors never shift.
    tok = df.select(F.monotonically_increasing_id().alias("_doc"),
                    tokens_col(text_col).alias("t")) \
            .select("_doc", F.posexplode("t").alias("pos", "w"))
    w = Window.partitionBy("_doc").orderBy("pos")
    g = tok.select(F.col("w").alias("_w0"),
                   *[F.lead("w", j).over(w).alias(f"_w{j}")
                     for j in range(1, n)])
    grams = g.filter(F.col(f"_w{n - 1}").isNotNull()).select(
        F.concat_ws(" ", *[F.col(f"_w{j}") for j in range(n)])
         .alias("gram"))
    counts = (grams.groupBy("gram").agg(F.count("*").alias("cnt"))
                   .orderBy(F.desc("cnt"), F.asc("gram")).limit(k))
    w = Window.orderBy(F.desc("cnt"), F.asc("gram"))
    return counts.select("gram", "cnt",
                         F.row_number().over(w).alias("rank"))


def hybrid_rrf(docs: DataFrame, embeddings: DataFrame, terms: list,
               query_vec_id: int = 0, *, k_each: int = 20,
               k_rrf: int = 60, k: int = 10,
               id_col: str = "doc_id") -> DataFrame:
    """Hybrid retrieval with reciprocal-rank fusion: BM25 text ranks
    and exact-cosine embedding ranks fuse as
    score = 1/(k_rrf + rank_text) + 1/(k_rrf + rank_vec), a missing
    side contributing 0 (Cormack et al. RRF — the standard hybrid
    retrieval fusion in modern search/RAG pipelines).

    Exactness: each term is one 1.0/(k_rrf + integer) division and the
    fusion is a FIXED two-term sum (text + vec, that order), so both
    engines fold identically and the driver hash is bit-exact —
    no rounding needed. Scale shape: both input rankers are already
    top-k-bounded (TakeOrderedAndProject + broadcast query), so the
    fusion join touches at most 2*k_each rows."""
    from pyspark.sql import Window

    from . import similarity

    t = bm25_topk(docs, terms, k_each, id_col=id_col) \
        .select(F.col(id_col).alias("tid"), F.col("rank").alias("rt"))
    q = embeddings.filter(F.col("vec_id") == query_vec_id) \
        .select(F.col("vec_id").alias("qid"), "embedding")
    v = similarity.cosine_topk(embeddings, q, k=k_each,
                               method="catalyst") \
        .select(F.col("vec_id").alias("vid"), F.col("rank").alias("rv"))
    j = t.join(v, t.tid == v.vid, "full_outer")
    fused = j.select(
        F.coalesce(F.col("tid"), F.col("vid")).alias(id_col),
        (F.coalesce(F.lit(1.0) / (F.lit(k_rrf) + F.col("rt")), F.lit(0.0))
         + F.coalesce(F.lit(1.0) / (F.lit(k_rrf) + F.col("rv")),
                      F.lit(0.0))).alias("rrf"),
        F.col("rt").alias("rank_text"), F.col("rv").alias("rank_vec"))
    w = Window.orderBy(F.desc("rrf"), F.asc(id_col))
    return (fused.orderBy(F.desc("rrf"), F.asc(id_col)).limit(k)
            .withColumn("rank", F.row_number().over(w).cast("long")))
