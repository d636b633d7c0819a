"""Fuzzy term lookup — SymSpell-style spell suggestions over the term
dictionary.

A fulltext engine's "did you mean" path: map a (possibly misspelled)
query term to dictionary terms within edit distance 1, ranked by
(distance, −df, term). The reference has no lexical analog (its
WordPiece vocabulary absorbs typos into subwords); this is the
inverted-index counterpart.

Algorithm (Garbe's SymSpell, public): a pair of strings at Levenshtein
distance ≤ 1 always shares a member of {s} ∪ {1-char deletions of s}.
So both sides expand to that neighborhood, candidates come from ONE
equi-join on the shared variant (never an all-pairs edit-distance
pass), and an exact `levenshtein` filter removes the false positives
the neighborhood admits (e.g. transpositions at distance 2 that share
a deletion).

Scale shape: the dictionary is vocabulary-sized (≪ corpus) and expands
×(1+avg_len); the query side is tiny and broadcast. The join shuffles
only the dictionary neighborhood — at 10^9-doc scale that table is
still millions of rows, not corpus-sized, and it can be materialized
once and reused across queries.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def _deletes(c: F.Column) -> F.Column:
    """array of the |s| single-character-deletion variants of string c."""
    return F.transform(
        F.sequence(F.lit(1), F.length(c)),
        lambda i: F.concat(c.substr(F.lit(1), i - 1),
                           c.substr(i + 1, F.length(c))),
    )


def _neighborhood(c: F.Column) -> F.Column:
    """{s} ∪ deletes(s) (array_union also dedups repeated variants)."""
    return F.array_union(F.array(c), _deletes(c))


def term_suggest(
    dictionary: DataFrame,
    query_terms: DataFrame,
    k: int = 5,
) -> DataFrame:
    """dictionary(term, df) × query_terms(qterm) →
    (qterm, term, dist, df, rank): top-k dictionary terms within edit
    distance 1 of each probe, ranked (dist asc, df desc, term asc).

    `dictionary` is typically brute.term_stats output; exact matches
    rank first (dist 0). Probes with no dictionary term within
    distance 1 simply produce no rows.
    """
    dv = dictionary.select(
        "term", "df",
        F.explode(_neighborhood(F.col("term"))).alias("v"))
    qv = query_terms.select(
        "qterm", F.explode(_neighborhood(F.col("qterm"))).alias("v"))
    cand = (
        qv.join(dv, "v")
        .select("qterm", "term", "df")
        .distinct()
        .withColumn("dist", F.levenshtein("qterm", "term"))
        .filter(F.col("dist") <= 1)
    )
    w = Window.partitionBy("qterm").orderBy(
        F.asc("dist"), F.desc("df"), F.asc("term"))
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("qterm", "term", F.col("dist").cast("long").alias("dist"),
                F.col("df").cast("long").alias("df"), "rank")
    )


def complete_prefix(
    dictionary: DataFrame,
    prefixes: DataFrame,
    k: int = 5,
) -> DataFrame:
    """Autocomplete: dictionary(term, df) × prefixes(prefix) →
    (prefix, term, df, rank) — top-k completions per prefix by
    (df desc, term asc), the search-box suggestion feed. Broadcast
    nested-loop prefix match (the probe side is keystrokes-tiny); the
    dictionary never shuffles for the match.
    """
    m = dictionary.join(
        F.broadcast(prefixes.select("prefix")),
        F.col("term").startswith(F.col("prefix")),
    )
    w = Window.partitionBy("prefix").orderBy(F.desc("df"), F.asc("term"))
    return (
        m.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("prefix", "term", F.col("df").cast("long").alias("df"),
                "rank")
    )


def autocorrect_query_terms(
    dictionary: DataFrame,
    qterms: DataFrame,
) -> DataFrame:
    """Conservative query auto-correction: (qid, term) → (qid, term)
    where in-vocabulary terms pass through untouched and each
    out-of-vocabulary term is replaced by its best distance-1 SymSpell
    suggestion ((df desc, term asc) tiebreak); OOV terms with no
    suggestion drop (they can match nothing anyway). Output is distinct
    per (qid, term) — the "did you mean", applied.
    """
    dict_terms = dictionary.select("term")
    invocab = qterms.join(dict_terms, "term", "left_semi")
    oov = qterms.join(dict_terms, "term", "left_anti")
    sugg = term_suggest(
        dictionary, oov.select(F.col("term").alias("qterm")).distinct(), k=1
    ).filter(F.col("dist") == 1).select(
        F.col("qterm").alias("_bad"), F.col("term").alias("_fix"))
    fixed = oov.join(sugg, oov["term"] == F.col("_bad")).select(
        "qid", F.col("_fix").alias("term"))
    return invocab.select("qid", "term").unionByName(fixed).distinct()


def fuzzy_bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "pid",
    text_col: str = "text",
    doc_maxlen: int | None = 220,
    query_maxlen: int | None = 32,
) -> DataFrame:
    """Fuzzy retrieval (Lucene FuzzyQuery semantics, distance 1): every
    query term — in-vocabulary or not — expands to ALL dictionary terms
    within Levenshtein distance <= 1, and the union of expansions per
    query is scored as a plain BM25 OR query → (qid, pid, rank, score).

    Contrast with autocorrect_bm25_topk: autocorrect REPLACES each OOV
    term with its single best fix; fuzzy keeps the whole neighborhood
    (a search for 'tabel' also matches docs containing 'table' AND
    'label'), the recall-over-precision trade Lucene's fuzzy operator
    makes. Expansion dedups per (qid, term), so a term reachable from
    two query terms scores once.

    The expansion join is the SymSpell deletion-neighborhood equi-join
    (never an all-pairs edit-distance pass) + exact levenshtein filter;
    the DuckDB oracle instead states the brute-force contract directly
    (levenshtein(qterm, term) <= 1 over the whole dictionary), so the
    hash match proves the neighborhood join finds EXACTLY the distance-1
    set — the shared-deletion guarantee, checked end-to-end.
    """
    from colbert_spark import caching
    from colbert_spark.functions import analysis, bm25
    from colbert_spark.operators import brute

    token_df = analysis.tokenize_docs(
        docs, id_col=id_col, text_col=text_col, maxlen=doc_maxlen
    ).persist()
    caching.register(token_df, "fuzzy_bm25_topk")
    n, avgdl = brute.corpus_stats(token_df)
    tstats = brute.term_stats(token_df)
    qterms = brute.query_terms(queries, query_maxlen)

    probes = qterms.select(F.col("term").alias("qterm")).distinct()
    dv = tstats.select(
        "term", F.explode(_neighborhood(F.col("term"))).alias("v"))
    qv = probes.select(
        "qterm", F.explode(_neighborhood(F.col("qterm"))).alias("v"))
    exp = (
        qv.join(dv, "v")
        .select("qterm", "term")
        .distinct()
        .filter(F.levenshtein("qterm", "term") <= 1)
    )
    qt = (
        qterms.withColumnRenamed("term", "qterm")
        .join(exp, "qterm")
        .select("qid", "term")
        .distinct()
        .join(tstats, "term")
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
        F.round(F.sum("s"), bm25.SCORE_DECIMALS).alias("score"))
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("pid"))
    return (
        agg.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("qid", "pid", "rank", "score")
    )


def autocorrect_bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "pid",
    text_col: str = "text",
    doc_maxlen: int | None = 220,
    query_maxlen: int | None = 32,
) -> DataFrame:
    """End-to-end "did you mean, applied" retrieval: tokenize queries,
    auto-correct OOV terms via the SymSpell distance-1 suggester
    (autocorrect_query_terms), then score the corrected term sets with
    the standard BM25 funnel → (qid, pid, rank, score). Queries whose
    every term drops (OOV, uncorrectable) yield no rows.

    Plan: one tokenize pass (persisted, caching-registered) feeds
    stats, dictionary, suggester, and scoring; the suggester works on
    the (tiny) OOV term set against the dictionary's deletion
    neighborhood; scoring is the bm25_topk funnel.
    """
    from colbert_spark.functions import analysis, bm25
    from colbert_spark.operators import brute

    token_df = analysis.tokenize_docs(
        docs, id_col=id_col, text_col=text_col, maxlen=doc_maxlen
    ).persist()
    from colbert_spark import caching
    caching.register(token_df, "autocorrect_bm25_topk")
    n, avgdl = brute.corpus_stats(token_df)
    tstats = brute.term_stats(token_df)
    qt = autocorrect_query_terms(
        tstats, brute.query_terms(queries, query_maxlen))
    qtidf = qt.join(tstats, "term").select(
        "qid", "term", bm25.idf(F.col("df"), n).alias("idf"))
    scored = token_df.withColumnRenamed(id_col, "pid").join(
        F.broadcast(qtidf), "term"
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
