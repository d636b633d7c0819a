"""Fuzzy term lookup — SymSpell-style spell suggestions over the term
dictionary.

A fulltext engine's "did you mean" path: map a (possibly misspelled)
query term to dictionary terms within edit distance 1, ranked by
(distance, −df, term). The reference has no lexical analog (its
WordPiece vocabulary absorbs typos into subwords); this is the
inverted-index counterpart.

Algorithm (Garbe's SymSpell, public): a pair of strings at Levenshtein
distance ≤ 1 always shares a member of {s} ∪ {1-char deletions of s}.
So both sides expand to that neighborhood, candidates come from ONE
equi-join on the shared variant (never an all-pairs edit-distance
pass), and an exact `levenshtein` filter removes the false positives
the neighborhood admits (e.g. transpositions at distance 2 that share
a deletion).

Scale shape: the dictionary is vocabulary-sized (≪ corpus) and expands
×(1+avg_len); the query side is tiny and broadcast. The join shuffles
only the dictionary neighborhood — at 10^9-doc scale that table is
still millions of rows, not corpus-sized, and it can be materialized
once and reused across queries.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def _deletes(c: F.Column) -> F.Column:
    """array of the |s| single-character-deletion variants of string c."""
    return F.transform(
        F.sequence(F.lit(1), F.length(c)),
        lambda i: F.concat(c.substr(F.lit(1), i - 1),
                           c.substr(i + 1, F.length(c))),
    )


def _neighborhood(c: F.Column) -> F.Column:
    """{s} ∪ deletes(s) (array_union also dedups repeated variants)."""
    return F.array_union(F.array(c), _deletes(c))


def term_suggest(
    dictionary: DataFrame,
    query_terms: DataFrame,
    k: int = 5,
) -> DataFrame:
    """dictionary(term, df) × query_terms(qterm) →
    (qterm, term, dist, df, rank): top-k dictionary terms within edit
    distance 1 of each probe, ranked (dist asc, df desc, term asc).

    `dictionary` is typically brute.term_stats output; exact matches
    rank first (dist 0). Probes with no dictionary term within
    distance 1 simply produce no rows.
    """
    dv = dictionary.select(
        "term", "df",
        F.explode(_neighborhood(F.col("term"))).alias("v"))
    qv = query_terms.select(
        "qterm", F.explode(_neighborhood(F.col("qterm"))).alias("v"))
    cand = (
        qv.join(dv, "v")
        .select("qterm", "term", "df")
        .distinct()
        .withColumn("dist", F.levenshtein("qterm", "term"))
        .filter(F.col("dist") <= 1)
    )
    w = Window.partitionBy("qterm").orderBy(
        F.asc("dist"), F.desc("df"), F.asc("term"))
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("qterm", "term", F.col("dist").cast("long").alias("dist"),
                F.col("df").cast("long").alias("df"), "rank")
    )
