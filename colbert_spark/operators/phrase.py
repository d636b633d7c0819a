"""Positional fulltext queries: phrase match, proximity rerank, boolean.

The reference's retrieval surface is bag-of-terms (late-interaction
MaxSim over per-token embeddings, `colbert/modeling/colbert.py:170-190`);
a production fulltext index additionally answers *positional* queries —
exact phrases, term proximity, boolean constraints. These three
operators add that surface on top of the same ONE-tokenizer-rule view
the BM25 engines share (`functions/analysis.TOKEN_SPLIT_RE`).

Determinism contract (all three DuckDB-replayable):
- phrase_match: tf = number of positions p with tokens[p:p+m] == phrase;
  candidate gate (every phrase term present) short-circuits the window
  scan; rank (-phrase_tf, pid).
- bm25_proximity_topk: Tao & Zhai (SIGIR'07) MinDist — the minimum
  absolute distance between positions of two DIFFERENT matched query
  terms; boost = ln(alpha + exp(-mindist)); docs with <2 distinct
  matched terms get exp(-inf)=0. Rerank is round-6-then-rank like BM25.
- boolean_search: (AND over must) ∧ (OR over should, vacuous if empty)
  ∧ ¬(OR over must_not), scored by BM25 over must ∪ should.

Plan shape at 100 TB:
- phrase_match / the boolean gate are a single corpus scan against a
  BROADCAST query table with pure in-row array codegen — zero shuffles
  before the final tiny rank window. No positional postings are
  materialized; at query rates where that matters, the gate composes
  with the postings index instead (Searcher's allow-list scatter path:
  intersect the phrase terms' posting lists first, then verify
  positions on only the candidate docs).
- bm25_proximity_topk is the classic two-phase funnel: the cheap
  bag-of-terms BM25 funnel picks rerank_depth candidates per query, and
  the positional pass re-reads text for ONLY those K·Q docs (pid-keyed
  join; AQE broadcasts the ranking side).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from colbert_spark import caching
from colbert_spark.functions import analysis, bm25
from colbert_spark.operators import brute


def _phrase_tf(t, qt):
    """Count of positions where the token array `t` contains the phrase
    array `qt` contiguously. Pure in-row codegen; guards m==0 and n<m
    (F.sequence would run DESCENDING for a negative span)."""
    n, m = F.size(t), F.size(qt)
    starts = F.sequence(F.lit(0), n - m)
    cnt = F.size(F.filter(starts, lambda p: F.slice(t, p + 1, m) == qt))
    gate = F.forall(qt, lambda x: F.array_contains(t, x))
    return F.when((m > 0) & (n >= m) & gate, cnt).otherwise(F.lit(0))


def phrase_match(
    docs: DataFrame,
    phrases: DataFrame,
    k: int = 10,
    id_col: str = "pid",
    text_col: str = "text",
    query_maxlen: int | None = 32,
) -> DataFrame:
    """docs(pid, text) × phrases(qid, text) → exact-phrase hits
    (qid, pid, rank, phrase_tf), top-k per phrase by (-tf, pid).

    The whole document token stream is searched (phrases are a
    presentation/match semantic, not a scoring one — mirrors
    kwic_snippets); the phrase itself is truncated at query_maxlen.
    """
    qarr = phrases.select(
        "qid", analysis.tokens(text_col, query_maxlen).alias("qt"))
    j = docs.select(F.col(id_col).alias("pid"),
                    analysis.tokens(text_col).alias("t")).crossJoin(
        F.broadcast(qarr))
    hits = j.select(
        "qid", "pid",
        _phrase_tf(F.col("t"), F.col("qt")).cast("long").alias("phrase_tf"),
    ).filter(F.col("phrase_tf") > 0)
    w = Window.partitionBy("qid").orderBy(F.desc("phrase_tf"), F.asc("pid"))
    return (hits.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k)
            .select("qid", "pid", "rank", "phrase_tf"))


def bm25_proximity_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    rerank_depth: int = 50,
    prox_weight: float = 1.0,
    alpha: float = 1.0,
    id_col: str = "pid",
    text_col: str = "text",
    doc_maxlen: int | None = 220,
    query_maxlen: int | None = 32,
) -> DataFrame:
    """Two-phase proximity-aware ranking → (qid, pid, rank, score).

    Phase 1: plain BM25 top-`rerank_depth` (brute.bm25_topk funnel).
    Phase 2: for those candidates only, MinDist proximity boost
    (Tao & Zhai 2007): score' = round(bm25 + w·ln(alpha + e^{-δ}), 6)
    where δ = min |pi−pj| over matched-query-term positions with
    DIFFERENT terms; δ=∞ (⇒ boost ln(alpha)) when <2 distinct terms
    match. Positions come from the same doc_maxlen view BM25 scored.
    """
    base = brute.bm25_topk(docs, queries, k=rerank_depth, id_col=id_col,
                           text_col=text_col, doc_maxlen=doc_maxlen,
                           query_maxlen=query_maxlen)
    qarr = queries.select(
        "qid",
        F.array_distinct(analysis.tokens(text_col, query_maxlen)).alias("qt"))
    j = (base.join(docs.select(F.col(id_col).alias("pid"),
                               analysis.tokens(text_col, doc_maxlen)
                               .alias("t")), "pid")
         .join(F.broadcast(qarr), "qid"))
    n = F.size("t")
    hitpos = F.filter(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.array_contains(F.col("qt"), F.element_at("t", i + 1)),
    )
    h = j.select("qid", "pid", F.col("score").alias("bm25"),
                 "t", F.when(n > 0, hitpos)
                 .otherwise(F.array().cast("array<int>")).alias("hp"))
    # all |p - q| over hit-position pairs whose TERMS differ
    dists = F.flatten(F.transform(
        F.col("hp"),
        lambda p: F.transform(
            F.filter(F.col("hp"),
                     lambda q: F.element_at("t", q + 1)
                     != F.element_at("t", p + 1)),
            lambda q: F.abs(q - p),
        ),
    ))
    mind = F.array_min(dists)  # null ⇔ <2 distinct matched terms
    boost = F.when(
        mind.isNotNull(),
        F.log(F.lit(float(alpha)) + F.exp(-mind.cast("double"))),
    ).otherwise(F.log(F.lit(float(alpha))))
    scored = h.select(
        "qid", "pid",
        F.round(F.col("bm25") + F.lit(float(prox_weight)) * boost,
                bm25.SCORE_DECIMALS).alias("score"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("pid"))
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k)
            .select("qid", "pid", "rank", "score"))


def boolean_search(
    docs: DataFrame,
    bqueries: DataFrame,
    k: int = 10,
    id_col: str = "pid",
    text_col: str = "text",
    doc_maxlen: int | None = 220,
    query_maxlen: int | None = 32,
    min_should_match: int | None = None,
) -> DataFrame:
    """Boolean-gated BM25 → (qid, pid, rank, score).

    bqueries(qid, must, should, must_not) — three text columns, each
    tokenized with the shared rule. A doc matches iff it contains ALL
    `must` terms, AT LEAST ONE `should` term (vacuously true when the
    should list is empty), and NONE of the `must_not` terms — evaluated
    on the same doc_maxlen token view BM25 scores. Matches are ranked
    by BM25 over must ∪ should (must is required non-empty so every
    match has a positive score).

    min_should_match: Lucene/ES minimum_should_match — when set, a doc
    must contain at least that many DISTINCT `should` terms (0 makes the
    should clause purely score-boosting, the ES default when must is
    non-empty; values above the query's distinct-should count make it
    unmatchable, like ES). None keeps the default at-least-one contract
    above. Still one in-row codegen gate — the count replaces the
    exists() probe, nothing shuffles differently.

    The gate is one corpus scan × broadcast queries, all in-row; the
    scorer is the standard funnel joined to the matched (qid, pid) set
    before the rank window, so ranking work scales with matches.
    """
    barr = bqueries.select(
        "qid",
        F.array_distinct(analysis.tokens("must", query_maxlen)).alias("mu"),
        F.array_distinct(analysis.tokens("should", query_maxlen)).alias("sh"),
        F.array_distinct(analysis.tokens("must_not", query_maxlen))
        .alias("no"),
    )
    t = analysis.tokens(text_col, doc_maxlen)
    g = docs.select(F.col(id_col).alias("pid"), t.alias("t")).crossJoin(
        F.broadcast(barr))
    if min_should_match is None:
        should_ok = (
            (F.size("sh") == 0)
            | F.exists("sh", lambda x: F.array_contains(F.col("t"), x))
        )
    else:
        should_ok = (
            F.size(F.filter("sh", lambda x: F.array_contains(F.col("t"), x)))
            >= min_should_match
        )
    ok = (
        F.forall("mu", lambda x: F.array_contains(F.col("t"), x))
        & should_ok
        & ~F.exists("no", lambda x: F.array_contains(F.col("t"), x))
    )
    matched = g.filter(ok).select("qid", "pid")

    scoring_q = bqueries.select(
        "qid", F.concat_ws(" ", "must", "should").alias("text"))
    token_df = analysis.tokenize_docs(docs, id_col=id_col, text_col=text_col,
                                      maxlen=doc_maxlen).persist()
    n_docs, avgdl = brute.corpus_stats(token_df)
    tstats = brute.term_stats(token_df)
    qt = brute.query_terms(scoring_q, query_maxlen).join(
        tstats, "term", "inner").select(
        "qid", "term", bm25.idf(F.col("df"), n_docs).alias("idf"))
    scored = (
        token_df.join(F.broadcast(qt), "term")
        .select("qid", F.col(id_col).alias("pid"),
                bm25.term_score(F.col("tf"), F.col("doclen"), avgdl,
                                F.col("idf")).alias("s"))
        .groupBy("qid", "pid")
        .agg(F.round(F.sum("s"), bm25.SCORE_DECIMALS).alias("score"))
        .join(matched, ["qid", "pid"])
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("pid"))
    out = (scored.withColumn("rank", F.row_number().over(w).cast("long"))
           .filter(F.col("rank") <= k)
           .select("qid", "pid", "rank", "score"))
    caching.register(token_df, "boolean_search")
    return out
