"""Brute-force distributed BM25 top-k — the flagship end-to-end query.

This is the Spark-first rewrite of Searcher.search_all
(colbert/searcher.py:69-104): where the reference loops queries serially
through dense_search, here ALL queries score in one distributed plan:

    queries --tokenize--> query terms (tiny, broadcast)
    documents --tokenize--> (pid, term, tf, doclen)      [shuffle 1: groupBy]
    postings ⋈ broadcast(qterms) on term                 [broadcast hash join]
    groupBy(qid, pid).sum(term_score)                    [shuffle 2: score agg]
    window rank (-score, pid), filter rank<=k            [shuffle 3: by qid]

Only the two aggregation shuffles touch corpus-sized data; the join is
broadcast (query side is tiny), so no corpus shuffle for the join itself.
Scores are float64, rounded to SCORE_DECIMALS before ranking so rankings
are reproducible across engines (SURVEY.md §7.3); tiebreak (-score, pid)
per reference server.py:34.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from colbert_spark import caching
from colbert_spark.functions import analysis, bm25


def query_terms(queries: DataFrame, query_maxlen: int | None = 32) -> DataFrame:
    """queries(qid, text) → (qid, term) distinct query terms.

    Lexical analog of query encoding (query_tokenization.py:52-111); the
    [MASK] query-expansion has no lexical counterpart (SURVEY.md §2.8 X2).
    """
    return queries.select(
        "qid",
        F.explode(analysis.tokens("text", query_maxlen)).alias("term"),
    ).distinct()


def corpus_stats(token_df: DataFrame) -> tuple[int, float]:
    """(N, avgdl) from the tokenized corpus (pid, term, tf, doclen).

    One pass over distinct pids; analog of the reference's avg_doclen
    estimation + all_reduce (collection_indexer.py:133-183) — exact here,
    Catalyst does partial/final agg across partitions.
    """
    row = (
        token_df.groupBy("pid").agg(F.first("doclen").alias("doclen"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("doclen").alias("avgdl"),
        )
        .collect()[0]
    )
    return int(row["n"]), float(row["avgdl"])


def term_stats(token_df: DataFrame) -> DataFrame:
    """(term, df, cf): document & collection frequency per term — the term
    dictionary (analog of k-means centroid training, SURVEY.md A5)."""
    return token_df.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("cf"),
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "pid",
    text_col: str = "text",
    doc_maxlen: int | None = 220,
    query_maxlen: int | None = 32,
    allowed_pids: DataFrame | None = None,
    allowed_small: bool = False,
) -> DataFrame:
    """All-queries BM25 top-k → ranking(qid, pid, rank, score).

    Self-contained (tokenizes docs on the fly). For repeated querying use
    the Indexer/Searcher pair, which materializes the postings.

    allowed_pids: optional (pid) allow-list, semi-joined onto the scored
    rows BEFORE the rank window (filter-first — the ranking work scales
    with the allowed set, not the corpus; same shape as
    wand.topk_scatter's qid_to_pids handling). allowed_small=True is the
    caller's assertion that the list fits a broadcast; by default the join
    is unhinted (an allow-list can be O(corpus), e.g. a language filter —
    AQE still broadcasts at runtime when it turns out small).

    The tokenized corpus is persisted: the stats action (N, avgdl) inside
    this call materializes it, and the returned plan's scoring pass then
    reads the cache instead of re-tokenizing the corpus (previously three
    tokenize jobs per query). The cached handle is registered with
    caching.register("bm25_topk") so callers can release it with
    caching.drain() after materializing; the indexed path
    (Indexer/Searcher) never caches raw tokens at scale.
    """
    token_df = analysis.tokenize_docs(docs, id_col=id_col, text_col=text_col,
                                      maxlen=doc_maxlen).persist()
    n, avgdl = corpus_stats(token_df)
    tstats = term_stats(token_df)
    qterms = query_terms(queries, query_maxlen)

    # attach idf to the (tiny) query-term side, then broadcast it
    qt = qterms.join(tstats, "term", "inner").select(
        "qid", "term", bm25.idf(F.col("df"), n).alias("idf")
    )

    scored = token_df.join(F.broadcast(qt), "term").select(
        "qid",
        F.col(id_col).alias("pid"),
        bm25.term_score(F.col("tf"), F.col("doclen"), avgdl,
                        F.col("idf")).alias("s"),
    )
    if allowed_pids is not None:
        allow = allowed_pids.select("pid")
        if allowed_small:
            allow = F.broadcast(allow)
        scored = scored.join(allow, "pid", "left_semi")
    agg = scored.groupBy("qid", "pid").agg(
        F.round(F.sum("s"), bm25.SCORE_DECIMALS).alias("score")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("pid"))
    out = (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "pid", "rank", "score")
    )
    caching.register(token_df, "bm25_topk")
    return out


def bm25_search_after(
    docs: DataFrame,
    queries: DataFrame,
    cursors: DataFrame,
    k: int = 10,
    id_col: str = "pid",
    text_col: str = "text",
    doc_maxlen: int | None = 220,
    query_maxlen: int | None = 32,
) -> DataFrame:
    """Keyset ("search_after") pagination — the next page of k results
    strictly after a per-query cursor in the (-score, pid) total order.

    cursors(qid, after_score, after_pid): the last row the client saw
    (typically the k-th row of the previous page). A result row
    qualifies iff score < after_score, or score = after_score and
    pid > after_pid — exactly the continuation of the ranking order, so
    page 2 via a cursor at rank k is row-identical to ranks k+1..2k of
    one big ranking with ranks rebased (the property the oracle checks).
    Queries with no cursor row return no rows (nothing to continue).
    Returned rank is page-local 1..k.

    Why keyset and not offset: deep offset-n paging ranks and discards n
    rows per query per page; the cursor filter prunes everything at or
    above the cursor BEFORE the rank window, so page cost stays O(page),
    not O(depth) — the reason ES deprecated deep from+size in favor of
    search_after. The cursor table is one row per paginating query
    (broadcast by definition). Reference has no pagination surface
    (colbert/searcher.py returns one fixed-k list).
    """
    token_df = analysis.tokenize_docs(docs, id_col=id_col, text_col=text_col,
                                      maxlen=doc_maxlen).persist()
    caching.register(token_df, "bm25_search_after")
    n, avgdl = corpus_stats(token_df)
    qt = query_terms(queries, query_maxlen).join(
        term_stats(token_df), "term", "inner"
    ).select("qid", "term", bm25.idf(F.col("df"), n).alias("idf"))
    agg = (
        token_df.join(F.broadcast(qt), "term")
        .select("qid", F.col(id_col).alias("pid"),
                bm25.term_score(F.col("tf"), F.col("doclen"), avgdl,
                                F.col("idf")).alias("s"))
        .groupBy("qid", "pid")
        .agg(F.round(F.sum("s"), bm25.SCORE_DECIMALS).alias("score"))
    )
    cur = cursors.select("qid", "after_score", "after_pid")
    page = agg.join(F.broadcast(cur), "qid").filter(
        (F.col("score") < F.col("after_score"))
        | ((F.col("score") == F.col("after_score"))
           & (F.col("pid") > F.col("after_pid")))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("pid"))
    return (
        page.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "pid", "rank", "score")
    )


def bm25_explain(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "pid",
    text_col: str = "text",
    doc_maxlen: int | None = 220,
    query_maxlen: int | None = 32,
) -> DataFrame:
    """Lucene-explain analog: the per-term score breakdown for every
    (query, top-k doc) pair → (qid, pid, rank, term, tf, df, idf,
    term_score, score). `score` repeats the document's total so a user
    can read "why did this doc rank" in one row group; idf/term_score
    round-6 (the repo rule). The reference exposes no per-term
    diagnostics at all (scores leave colbert/modeling/colbert.py:95-115
    pre-summed); this is the operational debugging surface every
    production engine ships.

    Plan: the bm25_topk funnel once for the ranking, then ONE extra
    broadcast join of the (K·Q-sized) ranking against the scored term
    rows — the corpus-sized token table is shared (persisted) between
    the two passes.
    """
    token_df = analysis.tokenize_docs(docs, id_col=id_col, text_col=text_col,
                                      maxlen=doc_maxlen).persist()
    caching.register(token_df, "bm25_explain")
    n, avgdl = corpus_stats(token_df)
    tstats = term_stats(token_df)
    qterms = query_terms(queries, query_maxlen)
    qt = qterms.join(tstats, "term").select(
        "qid", "term", "df", bm25.idf(F.col("df"), n).alias("idf"))

    contrib = token_df.withColumnRenamed(id_col, "pid").join(
        F.broadcast(qt), "term"
    ).select(
        "qid", "pid", "term", "tf", "df",
        F.round(F.col("idf"), 6).alias("idf"),
        F.round(bm25.term_score(F.col("tf"), F.col("doclen"), avgdl,
                                F.col("idf")), 6).alias("term_score"),
        bm25.term_score(F.col("tf"), F.col("doclen"), avgdl,
                        F.col("idf")).alias("_s"),
    )
    agg = contrib.groupBy("qid", "pid").agg(
        F.round(F.sum("_s"), bm25.SCORE_DECIMALS).alias("score"))
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("pid"))
    ranked = (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
    return ranked.join(contrib.drop("_s"), ["qid", "pid"]).select(
        "qid", "pid", F.col("rank").cast("long").alias("rank"),
        "term", "tf", "df", "idf", "term_score", "score")
