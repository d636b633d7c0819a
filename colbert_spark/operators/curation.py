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


def remove_boilerplate_lines(
    docs: DataFrame,
    group_col: str = "source",
    threshold: float = 0.3,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_group_size: int = 2,
) -> DataFrame:
    """Per-group boilerplate line removal (the C4/RefinedWeb template
    stripper): a line occurring in ≥ threshold of its group's documents
    (group = host / source) is template chrome — cookie banners, nav
    footers — and is dropped from every document; empty lines always
    survive (they carry structure, not content). Lines are compared
    exactly (no normalization; documented contract).

    → (doc_id, n_lines_in, n_lines_kept, clean_text) with clean_text the
    surviving lines re-joined by newline in original order.

    Plan shape: lines explode once; the boilerplate vote shuffles ONE
    md5 line-fingerprint per distinct (doc, line) — never the line text
    — and the group doc-count join is unhinted (AQE broadcasts while the host table is small, shuffles on uniform host keys when it is not); reconstruction is a
    combinable (doc) agg over in-doc positions. At 10^12 docs every key
    is uniform (fingerprints) or group-sized (host), the same shapes as
    line_dedup.
    """
    base = docs.select(
        F.col(id_col), F.col(group_col).alias("_g"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("_pos", "_line"),
    ).withColumn("_h", F.md5(F.col("_line")))

    gsize = docs.groupBy(F.col(group_col).alias("_g")).agg(
        F.count(F.lit(1)).alias("_gn")).filter(
        F.col("_gn") >= min_group_size)

    linedf = (
        base.filter(F.col("_line") != "")
        .select(F.col(id_col), "_g", "_h").distinct()
        .groupBy("_g", "_h").agg(F.count(F.lit(1)).alias("_df"))
        .join(gsize, "_g")
        .filter(F.col("_df") / F.col("_gn") >= F.lit(threshold))
        .select("_g", "_h", F.lit(True).alias("_bp"))
    )

    marked = base.join(linedf, ["_g", "_h"], "left")
    kept = marked.filter(F.col("_bp").isNull())
    return (
        marked.groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_lines_in"))
        .join(
            kept.groupBy(id_col).agg(
                F.count(F.lit(1)).alias("n_lines_kept"),
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(
                            F.struct(F.col("_pos"), F.col("_line")))),
                        lambda s: s["_line"],
                    ), "\n",
                ).alias("clean_text"),
            ),
            id_col, "left",
        )
        .select(
            id_col,
            F.col("n_lines_in").cast("long").alias("n_lines_in"),
            F.coalesce(F.col("n_lines_kept"), F.lit(0)).cast("long")
            .alias("n_lines_kept"),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        )
    )
