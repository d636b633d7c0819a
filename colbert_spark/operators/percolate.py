"""Percolation — reverse search: match DOCUMENTS against stored queries.

The alerting primitive (Elasticsearch percolator / Lucene MemoryIndex
use case): users register standing queries ("tell me when a page
mentions X and Y"); each new crawl batch is percolated through the
stored query set and every (document, query) hit becomes an alert.
The reference engine has no analog (its queries are always ad-hoc,
colbert/searcher.py:69-104); a crawl pipeline needs this direction too.

Matching contract (replayed by the oracle):
  mode='all' — every term of the stored query must occur in the doc
               (AND semantics; a query with an out-of-vocabulary term
               can still match if the doc contains it — term presence
               is evaluated against the DOCUMENT, not the dictionary).
  mode='any' — at least one term occurs (OR semantics).

Plan shape at scale: stored queries are broadcast-sized by definition
(a registry, not a corpus). Docs tokenize once (distinct (pid, term));
the broadcast join emits one row per (doc, matched query term) —
bounded by docs × stored terms actually present; the (pid, qid) count
agg is map-side combinable. The corpus never shuffles for the match.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from colbert_spark.functions import analysis


def percolate(
    docs: DataFrame,
    stored_queries: DataFrame,
    mode: str = "all",
    id_col: str = "pid",
    text_col: str = "text",
    doc_maxlen: int | None = 220,
    query_maxlen: int | None = 32,
) -> DataFrame:
    """docs(id, text) × stored_queries(qid, text) → (qid, pid, matched)
    — one row per alert, matched = number of distinct query terms the
    document contains."""
    if mode not in ("all", "any"):
        raise ValueError(f"mode must be 'all' or 'any', got {mode!r}")
    qterms = (
        stored_queries.select(
            "qid",
            F.explode(analysis.tokens("text", query_maxlen)).alias("term"),
        ).distinct()
    )
    qsizes = qterms.groupBy("qid").agg(F.count(F.lit(1)).alias("n_terms"))
    doc_terms = docs.select(
        F.col(id_col).alias("pid"),
        F.explode(analysis.tokens(text_col, doc_maxlen)).alias("term"),
    ).distinct()
    hits = (
        doc_terms.join(F.broadcast(qterms), "term")
        .groupBy("qid", "pid")
        .agg(F.count(F.lit(1)).alias("matched"))
    )
    if mode == "all":
        hits = hits.join(F.broadcast(qsizes), "qid").filter(
            F.col("matched") == F.col("n_terms")).drop("n_terms")
    return hits.select("qid", "pid", F.col("matched").cast("long")
                       .alias("matched"))


def percolate_inrow(
    docs: DataFrame,
    stored_queries: DataFrame,
    mode: str = "all",
    id_col: str = "pid",
    text_col: str = "text",
    doc_maxlen: int | None = 220,
    query_maxlen: int | None = 32,
) -> DataFrame:
    """Stateless percolation — ONE definition for batch and streams.

    Stored queries collapse to one broadcast row per query (qid,
    distinct-term array); each document row computes matched =
    size(array_intersect(its distinct tokens, the query's terms))
    IN-ROW. No explode shuffle, no aggregation, no state — on a
    Structured Streaming source every micro-batch emits its alerts
    immediately (a document row is self-contained, so no watermark is
    needed and nothing accumulates): the continuous-alerting half of
    the percolator (Elasticsearch percolate-on-index use case).

    Output is identical to percolate() for the same inputs
    (pytest-proven, including on a real stream); queries that tokenize
    to zero terms never alert in either shape. Cost is docs × Q in-row
    intersections versus the batch join's docs × matched-terms — the
    right trade for alerting, where Q is a registered standing set, not
    a corpus; percolate() stays the batch-analytics path.
    """
    if mode not in ("all", "any"):
        raise ValueError(f"mode must be 'all' or 'any', got {mode!r}")
    qarr = (
        stored_queries.select(
            "qid",
            F.array_distinct(analysis.tokens("text", query_maxlen))
            .alias("qterms"),
        )
        .withColumn("n_terms", F.size("qterms"))
        .filter(F.col("n_terms") > 0)
    )
    d = docs.select(
        F.col(id_col).alias("pid"),
        F.array_distinct(analysis.tokens(text_col, doc_maxlen))
        .alias("_dt"),
    )
    j = d.crossJoin(F.broadcast(qarr)).select(
        "qid", "pid",
        F.size(F.array_intersect("_dt", "qterms")).alias("matched"),
        "n_terms",
    )
    cond = (
        F.col("matched") == F.col("n_terms") if mode == "all"
        else F.col("matched") > 0
    )
    return j.filter(cond).select(
        "qid", "pid", F.col("matched").cast("long").alias("matched"))


def percolate_topn(
    docs: DataFrame,
    stored_queries: DataFrame,
    n: int = 20,
    mode: str = "all",
    presalt: int = 0,
    **kwargs,
) -> DataFrame:
    """Compact alert digest: per stored query, the first n matching pids
    (pid asc) plus the query's TOTAL match count repeated per row — the
    bounded result shape a driver/dashboard consumes when a hot query
    matches millions of pages.

    Scale: totals are a combinable groupBy agg (never a window), and
    with presalt=s the top-n election is two-phase — per (qid, salt)
    top-n first, so the global per-qid window sorts at most s·n rows
    instead of every match of a hot query (the host_doc_cap remedy;
    identical output for any s, pytest-proven)."""
    hits = percolate(docs, stored_queries, mode=mode, **kwargs)
    totals = hits.groupBy("qid").agg(F.count(F.lit(1)).alias("total"))
    cand = hits
    if presalt:
        sw = Window.partitionBy(
            "qid", F.pmod(F.xxhash64("pid"), F.lit(presalt))
        ).orderBy(F.asc("pid"))
        cand = (
            hits.withColumn("_r", F.row_number().over(sw))
            .filter(F.col("_r") <= n).drop("_r")
        )
    w = Window.partitionBy("qid").orderBy(F.asc("pid"))
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n)
        .join(F.broadcast(totals), "qid")
        .select("qid", "pid", "matched",
                F.col("total").cast("long").alias("total"),
                F.col("rn").cast("long").alias("rn"))
    )
