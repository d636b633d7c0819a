"""Query-likelihood ranking with Dirichlet smoothing (Zhai & Lafferty
2001) — the second classical lexical ranking model beside BM25.

The reference scores with MaxSim over token embeddings
(colbert/modeling/colbert.py:95-115); the lexical engine's model zoo is
BM25 (functions/bm25.py) + this QL scorer. Production engines ship both
(Lucene: BM25Similarity / LMDirichletSimilarity).

Scoring contract (mirrored term-for-term in the DuckDB oracle):

    score(q, d) = Σ_{t ∈ q∩d}  ln(1 + tf_{t,d} / (μ·cf_t / C))
                + |q ∩ V| · ln(μ / (|d| + μ))

the rank-equivalent matched-terms form of the full Dirichlet query
likelihood (cf = collection frequency, C = total collection tokens,
V = vocabulary). Out-of-vocabulary query terms drop on both sides;
candidates are docs matching ≥ 1 in-vocab term (inverted-index candidate
semantics — a doc matching nothing is never scored, documented contract).
float64, round(score, 6) before ranking, tiebreak (-score, pid) — the
repo-wide ranking invariants.

Plan shape: identical to brute.bm25_topk's funnel — ONE tokenize pass
(persisted, caching-registered), broadcast query-term join, one
map-side-combined (qid, pid) aggregation, per-qid rank window. The only
extra is a 1-row collection-token count riding the same stats action.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from colbert_spark import caching
from colbert_spark.functions import analysis, bm25
from colbert_spark.operators import brute

#: Dirichlet pseudo-count; Zhai & Lafferty's sweet spot is 500-2500.
DEFAULT_MU = 1500.0


def ql_dirichlet_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    mu: float = DEFAULT_MU,
    id_col: str = "pid",
    text_col: str = "text",
    doc_maxlen: int | None = 220,
    query_maxlen: int | None = 32,
) -> DataFrame:
    """All-queries Dirichlet-QL top-k → ranking(qid, pid, rank, score)."""
    token_df = analysis.tokenize_docs(
        docs, id_col=id_col, text_col=text_col, maxlen=doc_maxlen
    ).persist()
    caching.register(token_df, "ql_dirichlet_topk")

    stats = (
        token_df.groupBy(id_col).agg(F.first("doclen").alias("dl"))
        .agg(F.sum("dl").alias("c")).collect()[0]
    )
    cc = float(stats["c"] or 0)
    if cc == 0.0:
        return queries.sparkSession.createDataFrame(
            [], "qid long, pid long, rank long, score double")

    tstats = brute.term_stats(token_df)          # (term, df, cf)
    qterms = brute.query_terms(queries, query_maxlen)
    qt = qterms.join(tstats, "term").select("qid", "term", "cf")
    qv = qt.groupBy("qid").agg(F.count(F.lit(1)).alias("nv"))

    scored = (
        token_df.withColumnRenamed(id_col, "pid")
        .join(F.broadcast(qt.join(qv, "qid")), "term")
        .groupBy("qid", "pid")
        .agg(
            F.round(
                F.sum(F.log(
                    F.lit(1.0)
                    + F.col("tf") / (F.lit(mu) * F.col("cf") / F.lit(cc))
                ))
                + F.max("nv")
                * F.log(F.lit(mu) / (F.max("doclen") + F.lit(mu))),
                bm25.SCORE_DECIMALS,
            ).alias("score")
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("pid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "pid", "rank", "score")
    )
