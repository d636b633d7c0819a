"""BM25F — field-weighted BM25 (Robertson & Zaragoza 2009 §3.3, the
"simple BM25F" with shared length normalization).

Web pages are fielded documents (title, anchor field, body); BM25F
folds per-field term frequencies into one weighted tf BEFORE saturation
so a title hit saturates jointly with body hits instead of being summed
as an independent score (the classic failure of naive per-field BM25
mixing). The reference scores a single flat passage text
(colbert/modeling/colbert.py:95-115); fielded scoring is the lexical
engine's structured-document counterpart.

Scoring contract (mirrored in the DuckDB oracle):

    tf̃(t,d)  = Σ_f w_f · tf_f(t,d)
    leñ(d)   = Σ_f w_f · len_f(d)
    avgdl̃    = avg over scored docs of leñ
    idf(t)   = ln((N − df + 0.5)/(df + 0.5) + 1)   [doc-level df: term
                present in ANY field; N = docs with ≥1 token anywhere]
    score    = Σ_{t∈q} idf·tf̃·(k1+1)/(tf̃ + k1·(1−b+b·leñ/avgdl̃))

float64, round(score, 6) before ranking, tiebreak (-score, pid).

Plan shape: ONE tokenize pass over the (pid, field, text) rows
(persisted, caching-registered); the field fold is a map-side-combinable
(pid, term) agg; the rest is the bm25_topk funnel — broadcast query
terms, one score agg, per-qid rank window. Field weights ride as a
codegen CASE expression (no extra join).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from colbert_spark import caching
from colbert_spark.functions import analysis, bm25
from colbert_spark.operators import brute


def bm25f_topk(
    fields: DataFrame,
    queries: DataFrame,
    field_weights: dict[str, float],
    k: int = 10,
    id_col: str = "pid",
    field_col: str = "field",
    text_col: str = "text",
    maxlen: int | None = 220,
    query_maxlen: int | None = 32,
) -> DataFrame:
    """fields(pid, field, text) → ranking(qid, pid, rank, score).

    Unknown field names get weight 0.0 (their tokens count for nothing —
    loud alternative considered and rejected: a crawl corpus routinely
    carries extra fields the scorer doesn't rank).
    """
    w_expr = F.lit(0.0)
    for name, w in sorted(field_weights.items()):
        w_expr = F.when(F.col(field_col) == name, F.lit(float(w))) \
            .otherwise(w_expr)

    ftoks = fields.select(
        F.col(id_col).alias("pid"),
        w_expr.alias("w"),
        analysis.tokens(text_col, maxlen).alias("_t"),
    ).withColumn("flen", F.size("_t"))

    ftf = (
        ftoks.select("pid", "w", "flen", F.explode("_t").alias("term"))
        .groupBy("pid", "term")
        .agg(F.sum(F.col("w") * F.lit(1.0)).alias("tfw"))
    )
    # weighted doc length over ALL fields (including term-free ones)
    lens = ftoks.groupBy("pid").agg(
        F.sum(F.col("w") * F.col("flen")).alias("lenw"),
        F.sum("flen").alias("ntok"),
    ).filter(F.col("ntok") > 0).select("pid", "lenw")
    lens = lens.persist()
    caching.register(lens, "bm25f_topk")

    stats = lens.agg(F.count(F.lit(1)).alias("n"),
                     F.avg("lenw").alias("avgdl")).collect()[0]
    n, avgdl = int(stats["n"]), float(stats["avgdl"] or 0.0)
    if n == 0:
        return queries.sparkSession.createDataFrame(
            [], "qid long, pid long, rank long, score double")

    dfreq = ftf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    qterms = brute.query_terms(queries, query_maxlen)
    qt = qterms.join(dfreq, "term").select(
        "qid", "term", bm25.idf(F.col("df"), n).alias("idf"))

    scored = (
        ftf.join(F.broadcast(qt), "term")
        .join(lens, "pid")
        .select(
            "qid", "pid",
            bm25.term_score(F.col("tfw"), F.col("lenw"), avgdl,
                            F.col("idf")).alias("s"),
        )
        .groupBy("qid", "pid")
        .agg(F.round(F.sum("s"), bm25.SCORE_DECIMALS).alias("score"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("pid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "pid", "rank", "score")
    )
