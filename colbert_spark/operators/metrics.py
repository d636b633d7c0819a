"""Evaluation metrics: MRR@k, Recall@k, Success@k (A8).

DataFrame rebuild of utility/evaluate/msmarco_passages.py:16-91 and
colbert/evaluation/metrics.py:8-99: join ranking × qrels, conditional
window aggregation, mean over queries. Queries with no qrels are excluded
from the denominator (msmarco_passages.py averages over qrels keys).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def _joined(ranking: DataFrame, qrels: DataFrame) -> DataFrame:
    """ranking(qid,pid,rank,score) ⋈ qrels(qid,pid) with hit flags."""
    q = qrels.select("qid", "pid").withColumn("rel", F.lit(1))
    return ranking.join(q, ["qid", "pid"], "left").fillna({"rel": 0})


def mrr_at_k(ranking: DataFrame, qrels: DataFrame, k: int = 10) -> DataFrame:
    """One row (mrr double): mean over qrel-queries of 1/first-relevant-rank
    within top-k (0 when none)."""
    per_q = (
        _joined(ranking, qrels)
        .filter((F.col("rel") == 1) & (F.col("rank") <= k))
        .groupBy("qid")
        .agg((F.lit(1.0) / F.min("rank")).alias("rr"))
    )
    denom = qrels.select("qid").distinct()
    return (
        denom.join(per_q, "qid", "left")
        .fillna({"rr": 0.0})
        .agg(F.round(F.avg("rr"), 6).alias("mrr"))
    )


def recall_at_k(ranking: DataFrame, qrels: DataFrame, k: int = 50) -> DataFrame:
    """One row (recall double): mean over queries of
    |relevant ∩ top-k| / |relevant|."""
    rel_counts = qrels.groupBy("qid").agg(F.count(F.lit(1)).alias("n_rel"))
    hits = (
        _joined(ranking, qrels)
        .filter((F.col("rel") == 1) & (F.col("rank") <= k))
        .groupBy("qid")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return (
        rel_counts.join(hits, "qid", "left")
        .fillna({"n_hit": 0})
        .select((F.col("n_hit") / F.col("n_rel")).alias("r"))
        .agg(F.round(F.avg("r"), 6).alias("recall"))
    )


def success_at_k(ranking: DataFrame, qrels: DataFrame, k: int = 5) -> DataFrame:
    """One row (success double): fraction of queries with ≥1 relevant doc in
    top-k (the e2e_test.py:74-80 quality gate shape)."""
    hit = (
        _joined(ranking, qrels)
        .filter((F.col("rel") == 1) & (F.col("rank") <= k))
        .select("qid")
        .distinct()
        .withColumn("s", F.lit(1.0))
    )
    return (
        qrels.select("qid").distinct()
        .join(hit, "qid", "left")
        .fillna({"s": 0.0})
        .agg(F.round(F.avg("s"), 6).alias("success"))
    )


def map_at_k(ranking: DataFrame, qrels: DataFrame, k: int = 10) -> DataFrame:
    """One row (map double): Mean Average Precision at cutoff k — the
    classic TREC system metric beside MRR/recall/nDCG (the reference's
    eval surface stops at MRR/recall/success,
    utility/evaluate/msmarco_passages.py:16-91; this extends it).

        AP@k = Σ_{relevant hits at rank r ≤ k} P@r / min(n_rel, k)
        P@r  = (number of relevant hits at ranks ≤ r) / r
        map  = mean of AP@k over qrel-queries (0 when no hit), round 6

    Plan: the hit set is at most K·Q rows — the running-hit counter is a
    per-qid window over hits only, never over the full ranking.
    """
    hits = _joined(ranking, qrels).filter(
        (F.col("rel") == 1) & (F.col("rank") <= k))
    hw = Window.partitionBy("qid").orderBy("rank")
    per_q = (
        hits.withColumn("p", F.row_number().over(hw) / F.col("rank"))
        .groupBy("qid")
        .agg(F.sum("p").alias("sp"))
    )
    rel_counts = qrels.groupBy("qid").agg(F.count(F.lit(1)).alias("n_rel"))
    return (
        rel_counts.join(per_q, "qid", "left")
        .fillna({"sp": 0.0})
        .select((F.col("sp")
                 / F.least(F.col("n_rel"), F.lit(k))).alias("ap"))
        .agg(F.round(F.avg("ap"), 6).alias("map"))
    )


def eval_summary(ranking: DataFrame, qrels: DataFrame,
                 ks: tuple[int, ...] = (10, 50, 200, 1000),
                 mrr_k: int = 10) -> DataFrame:
    """ONE row with every metric column (mrr_<k>, recall_<k>, success_<k>):
    the 1-row aggregates crossJoin into a single plan so the CLI
    (colbert_spark.evaluate) materializes the whole summary in one driver
    action instead of 1 + 2·len(ks) serial jobs — the indexer's own
    stats-gathering pattern (plans/indexer.py corpus-stats crossJoin)."""
    out = mrr_at_k(ranking, qrels, mrr_k).withColumnRenamed(
        "mrr", f"mrr_{mrr_k}")
    for k in ks:
        out = out.crossJoin(
            recall_at_k(ranking, qrels, k).withColumnRenamed(
                "recall", f"recall_{k}")
        ).crossJoin(
            success_at_k(ranking, qrels, k).withColumnRenamed(
                "success", f"success_{k}")
        )
    return out


def ndcg_at_k(ranking: DataFrame, qrels: DataFrame, k: int = 10) -> DataFrame:
    """One row (ndcg double): mean over qrel-queries of nDCG@k with
    graded relevance (Järvelin & Kekäläinen 2002; the metric TREC/BEIR
    report beside MRR) — the reference's eval surface is binary
    (utility/evaluate/msmarco_passages.py), so this extends it.

        DCG@k  = Σ_{hits in top-k} (2^rel − 1) / log2(rank + 1)
        IDCG@k = the same sum over the query's relevant docs in ideal
                 order (rel desc, pid asc), positions 1..k
        ndcg   = mean over queries of DCG/IDCG, round 6

    qrels carries (qid, pid, rel); rel are small non-negative ints —
    gains use exact integer 2^rel − 1 (shiftleft), no pow() drift.
    Queries with no ranked hit contribute 0. Plan: K·Q-sized joins and
    per-qid windows only.
    """
    # python F.shiftleft only takes a literal shift — use the SQL form,
    # which accepts a column exponent
    gain = F.expr("cast(shiftleft(1, cast(rel as int)) - 1 as double)")
    hits = (
        ranking.filter(F.col("rank") <= k)
        .join(qrels.select("qid", "pid", "rel"), ["qid", "pid"])
        .groupBy("qid")
        .agg(F.sum(gain / F.log2(F.col("rank") + F.lit(1.0))).alias("dcg"))
    )
    iw = Window.partitionBy("qid").orderBy(F.desc("rel"), F.asc("pid"))
    ideal = (
        qrels.withColumn("_ir", F.row_number().over(iw))
        .filter(F.col("_ir") <= k)
        .groupBy("qid")
        .agg(F.sum(gain / F.log2(F.col("_ir") + F.lit(1.0))).alias("idcg"))
    )
    per_q = ideal.join(hits, "qid", "left").select(
        "qid",
        (F.coalesce(F.col("dcg"), F.lit(0.0)) / F.col("idcg")).alias("n"))
    return per_q.agg(F.round(F.avg("n"), 6).alias("ndcg"))
