"""DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): score every raw-corpus document by how target-like
its hashed n-gram profile is, so a pretraining pipeline can resample
toward a quality/domain target without training a classifier.

log w(d) = Σ_{g ∈ grams(d)} [ ln p̂_target(b(g)) − ln p̂_raw(b(g)) ]

where grams = word unigrams + bigrams of the shared-tokenizer view,
b(g) hashes a gram into `n_buckets` (portable md5-based hash — the
same 60-bit `dedup.md5_hash64` the dedup family uses, so a DuckDB
oracle replays bucketing bit-for-bit), and p̂ are Laplace-smoothed
bucket frequencies ((count_b + 1) / (total + n_buckets)).

Plan shape at 100 TB: the two bucket-frequency tables are n_buckets
rows each (one map-side-combined agg per side — the target side is
usually tiny anyway); the per-bucket log-ratio table BROADCASTS; the
per-doc score is one map-side-combinable (id, bucket) count agg joined
to the broadcast ratios and folded per id. Nothing corpus-sized ever
shuffles except (id, bucket-hash) pairs. Hot loop is pure JVM codegen.

Determinism: bucket counts are exact integers; the per-doc fold sums
count·ratio doubles and is rounded to 6 decimals before any ranking
(the repo-wide cross-engine summation-order rule).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from colbert_spark.functions import analysis
from colbert_spark.operators.dedup import md5_hash64


def _gram_buckets(df: DataFrame, id_col: str, text_col: str,
                  n_buckets: int, maxlen: int | None) -> DataFrame:
    """(id, bucket) — one row per unigram+bigram occurrence."""
    t = analysis.tokens(text_col, maxlen)
    bigrams = F.when(
        F.size(t) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - 1),
            lambda i: F.concat_ws(" ", F.element_at(t, i),
                                  F.element_at(t, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = F.concat(t, bigrams)
    return df.select(
        F.col(id_col).alias("id"), F.explode(grams).alias("gram")
    ).select("id", F.pmod(md5_hash64(F.col("gram")),
                          F.lit(n_buckets)).alias("bucket"))


def dsir_log_weights(
    corpus: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 128,
    maxlen: int | None = 220,
) -> DataFrame:
    """corpus(id, text) × target(id, text) → (id, log_weight): per-doc
    hashed-n-gram importance log-weight toward the target distribution.
    Positive ⇒ more target-like than the raw average. Resample by
    ranking on (log_weight desc, id) or by Gumbel-top-k on the weights;
    the registry entry caps to a ranked head for the oracle.
    """
    cg = _gram_buckets(corpus, id_col, text_col, n_buckets, maxlen)
    tg = _gram_buckets(target, id_col, text_col, n_buckets, maxlen)

    raw = cg.groupBy("bucket").agg(F.count(F.lit(1)).alias("cr"))
    tgt = tg.groupBy("bucket").agg(F.count(F.lit(1)).alias("ct"))
    # dense bucket spine so zero-count buckets still get smoothed mass
    spine = corpus.sparkSession.range(n_buckets).select(
        F.col("id").cast("long").alias("bucket"))
    totals = raw.agg(F.sum("cr").alias("tr")).crossJoin(
        tgt.agg(F.sum("ct").alias("tt")))
    ratio = (
        spine.join(raw, "bucket", "left").join(tgt, "bucket", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            (F.log((F.coalesce(F.col("ct"), F.lit(0)) + 1.0)
                   / (F.col("tt") + F.lit(float(n_buckets))))
             - F.log((F.coalesce(F.col("cr"), F.lit(0)) + 1.0)
                     / (F.col("tr") + F.lit(float(n_buckets)))))
            .alias("lr"),
        )
    )
    per_doc = cg.groupBy("id", "bucket").agg(F.count(F.lit(1)).alias("c"))
    return (
        per_doc.join(F.broadcast(ratio), "bucket")
        .groupBy("id")
        .agg(F.round(F.sum(F.col("c") * F.col("lr")), 6)
             .alias("log_weight"))
        .select(F.col("id").alias(id_col), "log_weight")
    )
