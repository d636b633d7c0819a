"""Result diversification: host crowding (the classic SERP rule — at
most N results per site per query, then re-rank the survivors).

The reference returns a flat (pid, rank, score) list per query
(colbert/searcher.py:77-104); every production web ranker post-filters
it so one dominant host can't fill the page (Google's original "host
crowding"). Same machinery generalizes to any grouping column (domain,
source, language).

Plan shape: inputs are K·Q ranked rows; the host join is
AQE-broadcast-sized, both windows partition by (qid[, host]) over ≤ K
rows per query. Cost scales with the result lists, never the corpus.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def host_crowd(
    ranking: DataFrame,
    doc_host: DataFrame,
    max_per_host: int = 2,
    k: int = 10,
    host_col: str = "host",
) -> DataFrame:
    """ranking(qid, pid, score) × doc_host(pid, host) →
    (qid, pid, rank, score, host): keep the best max_per_host results
    per (query, host) by (-score, pid), then the global per-query top-k
    re-ranked with the repo tiebreak. Scores pass through unchanged
    (crowding reorders membership, not scores)."""
    j = ranking.select("qid", "pid", "score").join(
        doc_host.select("pid", F.col(host_col).alias("host")), "pid")
    hw = Window.partitionBy("qid", "host").orderBy(F.desc("score"),
                                                  F.asc("pid"))
    kept = (
        j.withColumn("_hr", F.row_number().over(hw))
        .filter(F.col("_hr") <= max_per_host)
        .drop("_hr")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("pid"))
    return (
        kept.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "pid", F.col("rank").cast("long").alias("rank"),
                "score", "host")
    )
