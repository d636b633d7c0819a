"""Faceted search counts — aggregate result-set metadata per query.

Every search UI shows facet counts ("142 hits in lang=en, 37 in
lang=de ...") next to the ranked list. The reference returns bare
(pid, rank, score) triples (`colbert/searcher.py:77-104`); this
operator folds the ranked candidate set over one or more metadata
columns of the collection.

Plan shape: the ranking is K·Q rows, so the metadata join touches only
ranked documents (AQE broadcasts the ranking side against the docs
scan — column-pruned to id + facet columns); the unpivot and count agg
are over K·Q·#facets rows, never corpus-sized.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def facet_counts(
    ranking: DataFrame,
    docs: DataFrame,
    facet_cols: list[str],
    id_col: str = "pid",
) -> DataFrame:
    """ranking(qid, pid, ...) × docs(pid, <facets...>) →
    (qid, facet, value, n_hits): per query and facet dimension, how many
    ranked hits carry each value. NULL facet values count under the
    literal string 'null' (so the count total always equals the ranked
    set size). Facet values are stringified for a uniform schema.
    """
    if not facet_cols:
        raise ValueError("facet_cols must be non-empty")
    meta = docs.select(F.col(id_col).alias("pid"),
                       *[F.col(c) for c in facet_cols])
    j = ranking.select("qid", "pid").join(meta, "pid")
    pairs = F.array(*[
        F.struct(F.lit(c).alias("facet"),
                 F.coalesce(F.col(c).cast("string"), F.lit("null"))
                 .alias("value"))
        for c in facet_cols
    ])
    return (
        j.select("qid", F.explode(pairs).alias("fv"))
        .groupBy("qid", F.col("fv.facet").alias("facet"),
                 F.col("fv.value").alias("value"))
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


def significant_terms(
    ranking: DataFrame,
    docs: DataFrame,
    k: int = 10,
    min_fg_df: int = 3,
    id_col: str = "pid",
    text_col: str = "text",
    maxlen: int | None = 220,
) -> DataFrame:
    """Elasticsearch-style significant-terms aggregation over each
    query's result set: terms over-represented in the ranked documents
    relative to the corpus background, scored with JLH
    ((fgp − bgp) · fgp/bgp, fgp = fraction of foreground docs containing
    the term, bgp = df/N) — "what is this result set ABOUT".

    → (qid, term, fg_df, jlh) top-k per query by (jlh desc, term asc),
    jlh round-6. min_fg_df gates one-off noise (the ES default shape).

    Plan shape: the foreground is K·Q docs — its tokenize touches only
    ranked documents (semi-join pushes the pid set into the scan side);
    the background df table is the corpus dictionary, joined unhinted on
    term (AQE broadcasts small vocabs). Background N and per-query
    foreground sizes are 1-row/Q-row broadcast aggregates. Nothing
    corpus-sized shuffles beyond the dictionary build itself.
    """
    from colbert_spark.functions import analysis

    base = docs.select(F.col(id_col).alias("pid"), F.col(text_col))
    token_df = analysis.tokenize_docs(base, id_col="pid",
                                      text_col=text_col, maxlen=maxlen)
    n = token_df.select("pid").distinct().count()
    if n == 0:
        return ranking.sparkSession.createDataFrame(
            [], "qid long, term string, fg_df long, jlh double")
    bg = token_df.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    rk = ranking.select("qid", "pid")
    fg_n = rk.groupBy("qid").agg(F.count(F.lit(1)).alias("fg_n"))
    fg = (
        rk.join(token_df.select("pid", "term"), "pid")
        .groupBy("qid", "term").agg(F.count(F.lit(1)).alias("fg_df"))
        .filter(F.col("fg_df") >= min_fg_df)
    )
    scored = (
        fg.join(bg, "term")
        .join(F.broadcast(fg_n), "qid")
        .select(
            "qid", "term", "fg_df",
            F.round(
                ((F.col("fg_df") / F.col("fg_n"))
                 - (F.col("df") / F.lit(float(n))))
                * ((F.col("fg_df") / F.col("fg_n"))
                   / (F.col("df") / F.lit(float(n)))),
                6,
            ).alias("jlh"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("jlh"), F.asc("term"))
    return (
        scored.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= k).drop("_r")
        .select("qid", "term", F.col("fg_df").cast("long").alias("fg_df"),
                "jlh")
    )
