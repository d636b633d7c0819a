"""Corpus-curation funnel: the end-to-end shape a training-data pipeline
runs over raw web text before indexing/training — exact dedup (keep
first), quality gate, language filter — composed so the corpus is
TOKENIZED ONCE.

Calling the individual operators (`exact_dedup_keep_first`,
`quality_features`, `lang_id_heuristic`) in sequence tokenizes the corpus
three times; at 100 TB the tokenize is the dominant scan cost, so the
funnel projects fingerprint + all features in one pass and then applies
the gates. The dedup shuffle carries only (fp, id, 3 small features) —
never text or tokens.

No reference counterpart (the reference loads a pre-cleaned collection
as-is, colbert/data/collection.py:14-33); this is the standard
CCNet/C4-style funnel re-expressed as one Spark plan.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from colbert_spark.functions import analysis
from colbert_spark.operators.textstats import _stop_array


def curate_corpus(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", min_tokens: int = 5,
                  max_tokens: int = 500, max_stopword_ratio: float = 0.5,
                  require_lang: str | None = None) -> DataFrame:
    """Survivors (id, n_tokens, stopword_ratio, lang_pred) of:

    1. exact dedup, keep lowest id per identical normalized text
       (fingerprint = md5 of the space-joined token stream — same
       identity as `textstats.doc_fingerprint`);
    2. quality gate: min_tokens ≤ n_tokens ≤ max_tokens and rounded
       stopword_ratio < max_stopword_ratio (same thresholds/semantics as
       `textstats.quality_features`);
    3. optional language gate: keep `lang_pred == require_lang`
       (`textstats.lang_id_heuristic` rule — 'en' iff the unrounded
       stopword-occurrence ratio ≥ 0.05).

    Identical text yields identical features, so gate order does not
    change the surviving set; dedup-first is kept for the canonical
    funnel shape (drop copies before paying anything further).
    """
    t = docs.select(F.col(id_col), analysis.tokens(text_col).alias("_t"))
    stop_occ = F.size(F.filter("_t", lambda x: F.array_contains(_stop_array(), x)))
    ratio = F.when(
        F.size("_t") > 0, stop_occ.cast("double") / F.size("_t")
    ).otherwise(F.lit(0.0))
    feat = t.select(
        F.col(id_col),
        F.md5(F.encode(F.array_join("_t", " "), "UTF-8")).alias("_fp"),
        F.size("_t").cast("long").alias("n_tokens"),
        F.round(ratio, 6).alias("stopword_ratio"),
        F.when(ratio >= 0.05, F.lit("en")).otherwise(F.lit("unk"))
        .alias("lang_pred"),
    )
    # keep-first via a window, not groupBy+semi-join: the join shape
    # re-scans (re-tokenizes) the corpus for its second side, while the
    # window is ONE scan + ONE shuffle on the 32-char fingerprint
    # (plan-audited: 1 FileScan, 1 Exchange)
    from pyspark.sql import Window

    w = Window.partitionBy("_fp")
    out = (
        feat.withColumn("_keep", F.min(id_col).over(w))
        .filter(F.col(id_col) == F.col("_keep"))
        .drop("_keep")
        .filter(
            (F.col("n_tokens") >= min_tokens)
            & (F.col("n_tokens") <= max_tokens)
            & (F.col("stopword_ratio") < max_stopword_ratio)
        )
    )
    if require_lang is not None:
        out = out.filter(F.col("lang_pred") == require_lang)
    return out.drop("_fp")
