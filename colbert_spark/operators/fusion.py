"""Rank fusion — combining retrieval systems' rankings.

Reciprocal Rank Fusion (Cormack, Clarke & Büttcher, SIGIR 2009): the
standard way to merge a lexical ranking with a vector ranking (hybrid
search) or any set of rankers, using only ranks — no score calibration
across systems needed. The reference exposes single-ranker retrieval
(colbert/searcher.py:77-104) and offline ranked-list merge
(colbert/utility/rankings/merge.py); RRF is the online counterpart a
hybrid deployment puts in front of both.
"""

from __future__ import annotations

from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

#: the RRF dampening constant from the paper; 60 is the published default
DEFAULT_K_RRF = 60

RRF_DECIMALS = 6


def rrf_fuse(
    rankings: list[DataFrame],
    k_rrf: int = DEFAULT_K_RRF,
    topk: int = 10,
    qid_col: str = "qid",
    pid_col: str = "pid",
    rank_col: str = "rank",
) -> DataFrame:
    """Fuse rankings (qid, pid, rank) → (qid, pid, rank, rrf_score).

    rrf_score(q, p) = Σ_systems 1 / (k_rrf + rank_s(q, p)) over the
    systems that returned p for q; rounded 6 BEFORE the final rank
    window (the repo-wide cross-engine rule), tiebreak (-score, pid).

    Plan shape at scale: unionByName of the input rankings (no shuffle —
    each input is already a per-query top-k, so the union is K·Q·S rows,
    tiny relative to any corpus) → ONE groupBy(qid, pid) with map-side
    combine → per-qid rank window over ≤ K·S rows per query. Nothing
    here ever touches the corpus; cost scales with the fused lists, not
    the data.
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    contribs = [
        r.select(
            F.col(qid_col).alias("qid"),
            F.col(pid_col).alias("pid"),
            (F.lit(1.0) / (F.lit(float(k_rrf))
                           + F.col(rank_col).cast("double"))).alias("_c"),
        )
        for r in rankings
    ]
    u = reduce(lambda a, b: a.unionByName(b), contribs)
    agg = u.groupBy("qid", "pid").agg(
        F.round(F.sum("_c"), RRF_DECIMALS).alias("rrf_score")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("rrf_score"), F.asc("pid"))
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("qid", "pid", F.col("rank").cast("long").alias("rank"),
                "rrf_score")
    )


#: ln(2) as an exact double literal — BOTH engines use this constant so
#: neither computes ln(2) with its own libm (1-ULP divergence risk)
LN2 = 0.6931471805599453


def time_decay_rerank(
    ranking: DataFrame,
    doc_ts: DataFrame,
    now_ts: float,
    half_life: float,
    k: int = 10,
    ts_col: str = "ts",
) -> DataFrame:
    """Recency-boosted re-ranking: score′ = score · 2^(−age/half_life)
    (exponential half-life decay — the standard freshness prior for news
    and crawl corpora), age = now_ts − ts in the caller's time unit.

    ranking(qid, pid, score) × doc_ts(pid, ts) → (qid, pid, rank,
    boosted_score); round-6 before the rank window, tiebreak
    (-score, pid). The decay is exp(−LN2·age/half_life) with LN2 a
    shared literal (see above); exp() itself is within 1 ULP across
    engines (the softmax surface already relies on this).

    Plan: the ts join touches ranked rows only (K·Q — AQE broadcasts);
    one per-qid rank window. Never corpus-sized.
    """
    j = ranking.select("qid", "pid", "score").join(
        doc_ts.select("pid", F.col(ts_col).alias("_ts")), "pid")
    boosted = j.select(
        "qid", "pid",
        F.round(
            F.col("score")
            * F.exp(F.lit(-LN2) * (F.lit(float(now_ts)) - F.col("_ts"))
                    / F.lit(float(half_life))),
            6,
        ).alias("boosted_score"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("boosted_score"),
                                          F.asc("pid"))
    return (
        boosted.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "pid", "rank", "boosted_score")
    )


def interp_fuse(
    rankings: list[tuple[DataFrame, float]],
    topk: int = 10,
    qid_col: str = "qid",
    pid_col: str = "pid",
    score_col: str = "score",
) -> DataFrame:
    """Weighted-sum fusion with per-query min-max score normalization —
    the other standard hybrid beside RRF (convex combination over
    normalized scores; what most production hybrid search ships as
    "alpha" blending).

    Each system's scores are normalized per query over ITS returned
    list: norm = (s − min)/(max − min), or 1.0 when the list's scores
    are all equal (a constant list carries rank information only).
    Candidates missing from a system contribute 0 for it. fused =
    Σ w_i · norm_i, round-6 before the rank window, tiebreak
    (-score, pid) — mirrored exactly by the DuckDB oracle.

    Plan shape: per-system min/max is a window (or groupBy+join) over
    that system's K·Q rows; the union + fold is one combinable agg.
    Like rrf_fuse, cost scales with the fused lists, never the corpus.
    """
    if not rankings:
        raise ValueError("interp_fuse needs at least one ranking")
    parts = []
    for r, weight in rankings:
        mw = Window.partitionBy(qid_col)
        norm = (
            r.select(
                F.col(qid_col).alias("qid"),
                F.col(pid_col).alias("pid"),
                F.col(score_col).cast("double").alias("_s"),
            )
            .withColumn("_mn", F.min("_s").over(mw))
            .withColumn("_mx", F.max("_s").over(mw))
            .select(
                "qid", "pid",
                (F.lit(float(weight)) * F.when(
                    F.col("_mx") > F.col("_mn"),
                    (F.col("_s") - F.col("_mn"))
                    / (F.col("_mx") - F.col("_mn")),
                ).otherwise(F.lit(1.0))).alias("_c"),
            )
        )
        parts.append(norm)
    u = reduce(lambda a, b: a.unionByName(b), parts)
    agg = u.groupBy("qid", "pid").agg(
        F.round(F.sum("_c"), 6).alias("fused_score"))
    w = Window.partitionBy("qid").orderBy(F.desc("fused_score"),
                                          F.asc("pid"))
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("qid", "pid", F.col("rank").cast("long").alias("rank"),
                "fused_score")
    )
