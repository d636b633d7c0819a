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
from pyspark.sql import DataFrame


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
