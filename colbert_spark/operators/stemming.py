"""Minimal English stemming analyzer variant of the BM25 funnel.

Lucene's EnglishMinimalStemFilter rule (Savoy's "light" English stemmer,
the conservative plural stripper production engines default to when full
Porter is too aggressive): drop a trailing 's' when the token is at
least 3 chars and the penultimate char is not 'u' or 's' (so "status",
"class", "as" are untouched). The rule is a pure string expression in
the Java-regex ∩ DuckDB subset, so the oracle replays it exactly.

The reference has no stemming (its analyzer is the WordPiece vocab,
colbert/modeling/tokenization/doc_tokenization.py:33-60); this is the
classical-engine analysis-chain feature in its place. Tokenization stays
the ONE repo rule (functions/analysis.tokens); stemming is a mapping
applied AFTER tokenization on both the document and the query side, so
doclen (BM25 |d|) is unchanged while tf/df aggregate over stemmed terms.

Plan shape: stemming happens at the exploded-token level BEFORE the
(pid, term) combine, so the funnel has exactly the same exchanges as
bm25_topk — one map-side-combined tf agg, broadcast query-terms join,
one (qid, pid) score agg, per-qid rank window.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from colbert_spark import caching
from colbert_spark.functions import analysis, bm25
from colbert_spark.operators import brute


def stem_minimal_en(c: Column) -> Column:
    """Minimal English plural stemmer as a codegen expression."""
    pen = c.substr(F.length(c) - 1, F.lit(1))
    return F.when(
        (F.length(c) >= 3) & c.endswith("s") & ~pen.isin("s", "u"),
        c.substr(F.lit(1), F.length(c) - 1),
    ).otherwise(c)


def tokenize_docs_stemmed(
    docs: DataFrame,
    id_col: str = "pid",
    text_col: str = "text",
    maxlen: int | None = None,
) -> DataFrame:
    """docs(id, text) → (id, term, tf, doclen) with stemmed terms.

    doclen is the PRE-stem token count (stemming is 1:1, so identical);
    tf counts the stemmed multiset — plural and singular forms of a word
    collapse into one posting.
    """
    toks = docs.select(
        F.col(id_col),
        analysis.tokens(text_col, maxlen).alias("_terms"),
    ).withColumn("doclen", F.size("_terms"))
    return (
        toks.select(id_col, "doclen", F.explode("_terms").alias("_tok"))
        .withColumn("term", stem_minimal_en(F.col("_tok")))
        .groupBy(id_col, "term", "doclen")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def stemmed_bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "pid",
    text_col: str = "text",
    doc_maxlen: int | None = 220,
    query_maxlen: int | None = 32,
) -> DataFrame:
    """BM25 top-k over the stemmed analysis chain → (qid, pid, rank,
    score). Query terms stem with the same rule, so "scans" matches
    "scan" in either direction; df/idf/avgdl all derive from the stemmed
    term space (df of a collapsed term is the union of its surface
    forms' doc sets)."""
    token_df = tokenize_docs_stemmed(
        docs, id_col=id_col, text_col=text_col, maxlen=doc_maxlen
    ).persist()
    caching.register(token_df, "stemmed_bm25_topk")
    n, avgdl = brute.corpus_stats(token_df)
    tstats = brute.term_stats(token_df)
    qterms = (
        queries.select(
            "qid",
            F.explode(analysis.tokens("text", query_maxlen)).alias("_tok"),
        )
        .select("qid", stem_minimal_en(F.col("_tok")).alias("term"))
        .distinct()
    )
    qt = qterms.join(tstats, "term").select(
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
