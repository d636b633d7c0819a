"""KWIC snippet extraction — search-result presentation.

For each ranked (qid, pid) hit, pick the fixed-width token window of the
document containing the most query-term occurrences (tie → earliest
window) and render it. The reference surfaces raw passage text per hit
(`server.py:47-52` returns prob-annotated passages); this adds the
keyword-in-context window every search UI actually shows.

Determinism contract (DuckDB-replayable): candidate windows start at hit
positions (the best window always starts at a hit); per-candidate score
is the plain count of hit positions inside [p, p+width); winner = max
count, then smallest start. Zero-hit rows (allow-list or rerank inputs
can contain them) fall back to the document head window with n_hits 0.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from colbert_spark.functions import analysis


def kwic_snippets(
    ranking: DataFrame,
    docs: DataFrame,
    queries: DataFrame,
    width: int = 8,
    id_col: str = "pid",
    text_col: str = "text",
    query_maxlen: int | None = 32,
) -> DataFrame:
    """ranking(qid, pid, rank) × docs(pid, text) × queries(qid, text) →
    (qid, pid, rank, n_hits, snippet).

    n_hits = query-term occurrences in the winning window; snippet = the
    window's normalized tokens space-joined (the tokenizer's view — the
    same one the scores were computed from).

    Plan shape at scale: the ranking is K·Q rows, so the docs join
    touches only ranked documents (pid-keyed semi-like join; AQE
    broadcasts the ranking side), the query-term arrays broadcast, and
    the whole window election is in-row array codegen — no shuffle
    beyond the two joins, nothing ever scans unranked documents' text
    twice. Cost is O(hits²) per ranked doc, bounded by doc length.
    """
    qarr = queries.select(
        "qid",
        F.array_distinct(analysis.tokens(text_col, query_maxlen)).alias("qt"),
    )
    j = (
        ranking.select("qid", F.col(id_col).alias("pid"), "rank")
        .join(docs.select(F.col(id_col).alias("pid"),
                          analysis.tokens(text_col).alias("t")), "pid")
        .join(F.broadcast(qarr), "qid")
    )
    n = F.size("t")
    hitpos = F.filter(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.array_contains(F.col("qt"), F.element_at("t", i + 1)),
    )
    h = j.select("qid", "pid", "rank", "t", F.when(n > 0, hitpos)
                 .otherwise(F.array().cast("array<int>")).alias("hp"))

    def wcount(p):
        return F.size(F.filter(
            F.col("hp"), lambda x: (x >= p) & (x < p + F.lit(width))))

    maxc = F.array_max(F.transform(F.col("hp"), wcount))
    best = F.array_min(F.filter(F.col("hp"), lambda p: wcount(p) == maxc))
    s = h.select(
        "qid", "pid", "rank",
        F.when(F.size("hp") > 0, maxc).otherwise(F.lit(0))
        .cast("long").alias("n_hits"),
        F.array_join(
            F.slice("t", F.when(F.size("hp") > 0, best).otherwise(F.lit(0))
                    + F.lit(1), width),
            " ",
        ).alias("snippet"),
    )
    return s.select("qid", "pid", F.col("rank").cast("long").alias("rank"),
                    "n_hits", "snippet")
