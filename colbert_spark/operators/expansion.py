"""Pseudo-relevance-feedback query expansion (RM3-style) over BM25.

Two-pass retrieval (Abdul-Jaleel et al. 2004, the RM3 recipe; Robertson
terms it blind feedback): rank once, mine expansion terms from the top
fb_docs documents, re-rank with the weighted expanded query. The
reference expands queries with [MASK] embeddings the model fills in
(colbert/modeling/query_tokenization.py:52-111); PRF is the lexical
engine's counterpart — expansion terms come from the corpus itself.

Determinism contract (both engines replay it): expansion weight =
Σ_fb tf(t) · idf(t) rounded 6, top fb_terms by (weight desc, term asc),
original query terms always weight 1.0, expansion terms fb_weight;
final score = Σ_t w_t · term_score(t) rounded 6 before ranking.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from colbert_spark import caching
from colbert_spark.functions import analysis, bm25
from colbert_spark.operators import brute


def bm25_prf_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    fb_docs: int = 5,
    fb_terms: int = 10,
    fb_weight: float = 0.5,
    id_col: str = "pid",
    text_col: str = "text",
    doc_maxlen: int | None = 220,
    query_maxlen: int | None = 32,
) -> DataFrame:
    """PRF-expanded BM25 top-k → (qid, pid, rank, score).

    Plan shape at scale: ONE tokenize pass feeds both rounds (persisted,
    caching-registered). The feedback stage never touches the corpus —
    fb is fb_docs·Q rows, AQE broadcasts it into the (pid-keyed) join
    that mines candidate terms, and the per-query term election windows
    over fb-doc terms only. Both scoring rounds are the bm25_topk
    funnel: broadcast weighted query terms into the token table, one
    map-side-combined (qid, pid) agg, per-qid rank window. Nothing
    corpus-sized shuffles that bm25_topk itself would not shuffle.
    """
    token_df = analysis.tokenize_docs(
        docs, id_col=id_col, text_col=text_col, maxlen=doc_maxlen
    ).persist()
    caching.register(token_df, "bm25_prf_topk")
    tok = token_df.select(
        F.col(id_col).alias("pid"), "term", "tf", "doclen"
    )
    n, avgdl = brute.corpus_stats(token_df)
    tstats = brute.term_stats(token_df)
    qterms = brute.query_terms(queries, query_maxlen)
    rank_w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("pid"))

    def scored_ranking(wq: DataFrame, kk: int) -> DataFrame:
        qt = wq.join(tstats, "term").select(
            "qid", "term", "w", bm25.idf(F.col("df"), n).alias("idf")
        )
        sc = tok.join(F.broadcast(qt), "term").select(
            "qid", "pid",
            (F.col("w") * bm25.term_score(
                F.col("tf"), F.col("doclen"), avgdl, F.col("idf"))).alias("s"),
        )
        agg = sc.groupBy("qid", "pid").agg(
            F.round(F.sum("s"), bm25.SCORE_DECIMALS).alias("score")
        )
        return (
            agg.withColumn("rank", F.row_number().over(rank_w))
            .filter(F.col("rank") <= kk)
        )

    base = scored_ranking(qterms.withColumn("w", F.lit(1.0)), fb_docs)
    fb = base.select("qid", "pid")

    cand = (
        fb.join(tok, "pid")
        .groupBy("qid", "term")
        .agg(F.sum("tf").alias("ftf"))
        .join(qterms, ["qid", "term"], "left_anti")
        .join(tstats, "term")
        .select(
            "qid", "term",
            F.round(F.col("ftf").cast("double")
                    * bm25.idf(F.col("df"), n), 6).alias("ew"),
        )
    )
    exp_w = Window.partitionBy("qid").orderBy(F.desc("ew"), F.asc("term"))
    top_exp = (
        cand.withColumn("r", F.row_number().over(exp_w))
        .filter(F.col("r") <= fb_terms)
        .select("qid", "term", F.lit(float(fb_weight)).alias("w"))
    )
    wq = qterms.withColumn("w", F.lit(1.0)).unionByName(top_exp)
    return scored_ranking(wq, k).select(
        "qid", "pid", F.col("rank").cast("long").alias("rank"), "score"
    )


def prefix_search_topk(
    docs: DataFrame,
    prefix_queries: DataFrame,
    k: int = 10,
    max_expansions: int = 10,
    id_col: str = "pid",
    text_col: str = "text",
    doc_maxlen: int | None = 220,
) -> DataFrame:
    """Wildcard prefix search (Lucene `pre*` semantics) → ranking.

    prefix_queries(qid, prefix): each prefix expands against the term
    dictionary — top `max_expansions` matching terms by (df desc, term
    asc), Lucene's TopTermsRewrite — and the expanded term set scores as
    an ordinary BM25 OR-query (blended rewrite; documented contract,
    replayed by the oracle). Prefixes matching nothing yield no rows for
    that qid. Repo ranking invariants: float64, round 6 before ranking,
    tiebreak (-score, pid).

    Plan shape: dictionary expansion is a broadcast nested-loop join of
    the (tiny) prefix table against the term dictionary — the dictionary
    never shuffles for the match; the per-qid expansion window runs over
    matched dictionary rows only. Scoring is the bm25_topk funnel (one
    tokenize pass, broadcast expanded-terms join, one combinable agg,
    rank window).
    """
    token_df = analysis.tokenize_docs(
        docs, id_col=id_col, text_col=text_col, maxlen=doc_maxlen
    ).persist()
    caching.register(token_df, "prefix_search_topk")
    n, avgdl = brute.corpus_stats(token_df)
    tstats = brute.term_stats(token_df)

    matched = tstats.join(
        F.broadcast(prefix_queries.select("qid", "prefix")),
        F.col("term").startswith(F.col("prefix")),
    )
    exp_w = Window.partitionBy("qid").orderBy(F.desc("df"), F.asc("term"))
    qt = (
        matched.withColumn("r", F.row_number().over(exp_w))
        .filter(F.col("r") <= max_expansions)
        .select("qid", "term", bm25.idf(F.col("df"), n).alias("idf"))
    )
    scored = token_df.withColumnRenamed(id_col, "pid").join(
        F.broadcast(qt), "term"
    ).select(
        "qid", "pid",
        bm25.term_score(F.col("tf"), F.col("doclen"), avgdl,
                        F.col("idf")).alias("s"),
    )
    agg = scored.groupBy("qid", "pid").agg(
        F.round(F.sum("s"), bm25.SCORE_DECIMALS).alias("score")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("pid"))
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "pid", "rank", "score")
    )


def synonym_bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    synonyms: DataFrame,
    k: int = 10,
    id_col: str = "pid",
    text_col: str = "text",
    doc_maxlen: int | None = 220,
    query_maxlen: int | None = 32,
) -> DataFrame:
    """Query-time synonym expansion (Lucene SynonymFilter semantics,
    query side) → ranking(qid, pid, rank, score).

    synonyms(term, synonym) is a DIRECTED thesaurus: every query term
    that appears as `term` also contributes its `synonym` rows to the
    query's term set (equivalence classes = list both directions).
    Expanded sets are distinct per (qid, term) — a synonym that is
    already a query term adds nothing — and each expanded term scores
    with its own df/idf through the standard BM25 OR funnel (the
    documented "blended" contract, same as prefix expansion). Synonyms
    that never occur in the corpus drop out at the dfreq join.

    Plan shape: the thesaurus and the query term set are both tiny —
    expansion is a broadcast join of broadcast-sized inputs; scoring is
    the bm25_topk funnel (one tokenize pass, broadcast expanded-terms
    join into the token table, one map-side-combined agg, per-qid rank
    window). The corpus never shuffles for the expansion.
    """
    token_df = analysis.tokenize_docs(
        docs, id_col=id_col, text_col=text_col, maxlen=doc_maxlen
    ).persist()
    caching.register(token_df, "synonym_bm25_topk")
    n, avgdl = brute.corpus_stats(token_df)
    tstats = brute.term_stats(token_df)
    qterms = brute.query_terms(queries, query_maxlen)
    syn = F.broadcast(synonyms.select("term", "synonym"))
    expanded = (
        qterms.join(syn, "term")
        .select("qid", F.col("synonym").alias("term"))
        .unionByName(qterms)
        .distinct()
    )
    qt = expanded.join(tstats, "term").select(
        "qid", "term", bm25.idf(F.col("df"), n).alias("idf"))
    scored = token_df.withColumnRenamed(id_col, "pid").join(
        F.broadcast(qt), "term"
    ).select(
        "qid", "pid",
        bm25.term_score(F.col("tf"), F.col("doclen"), avgdl,
                        F.col("idf")).alias("s"),
    )
    agg = scored.groupBy("qid", "pid").agg(
        F.round(F.sum("s"), bm25.SCORE_DECIMALS).alias("score"))
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("pid"))
    return (
        agg.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("qid", "pid", "rank", "score")
    )


def more_like_this(
    docs: DataFrame,
    seed_pids: DataFrame,
    top_terms: int = 10,
    k: int = 10,
    id_col: str = "pid",
    text_col: str = "text",
    doc_maxlen: int | None = 220,
) -> DataFrame:
    """Lucene MoreLikeThis: per seed document, elect its top `top_terms`
    terms by tf·idf (the "interesting terms", weight rounded 6, tiebreak
    term asc) and run them as a BM25 OR query over the corpus, excluding
    the seed itself → (qid, pid, rank, score) with qid = the seed pid.
    The related-pages / "similar articles" feed.

    Plan shape: seeds are a tiny table — term election is a broadcast
    semi-join into the shared token cache plus a per-seed window over
    the seed's own terms; scoring is the bm25_topk funnel (broadcast
    elected-terms join, one combinable agg, per-qid rank window).
    """
    token_df = analysis.tokenize_docs(
        docs, id_col=id_col, text_col=text_col, maxlen=doc_maxlen
    ).persist()
    caching.register(token_df, "more_like_this")
    tok = token_df.withColumnRenamed(id_col, "pid")
    n, avgdl = brute.corpus_stats(token_df)
    tstats = brute.term_stats(token_df)

    seed_terms = (
        tok.join(F.broadcast(seed_pids.select(F.col("pid").alias("qid"))),
                 tok["pid"] == F.col("qid"))
        .join(tstats, "term")
        .select("qid", "term",
                F.round(F.col("tf") * bm25.idf(F.col("df"), n), 6)
                .alias("w"))
    )
    ew = Window.partitionBy("qid").orderBy(F.desc("w"), F.asc("term"))
    qt = (
        seed_terms.withColumn("r", F.row_number().over(ew))
        .filter(F.col("r") <= top_terms)
        .join(tstats, "term")
        .select("qid", "term", bm25.idf(F.col("df"), n).alias("idf"))
    )
    scored = tok.join(F.broadcast(qt), "term").filter(
        F.col("pid") != F.col("qid")
    ).select(
        "qid", "pid",
        bm25.term_score(F.col("tf"), F.col("doclen"), avgdl,
                        F.col("idf")).alias("s"),
    )
    agg = scored.groupBy("qid", "pid").agg(
        F.round(F.sum("s"), bm25.SCORE_DECIMALS).alias("score"))
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("pid"))
    return (
        agg.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("qid", "pid", "rank", "score")
    )
