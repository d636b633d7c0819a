"""Benchmark decontamination + cross-corpus dedup for training corpora.

Before a web corpus feeds an LLM, two exclusion passes run against every
held-out set (eval benchmarks, a previous crawl generation):

  ngram_decontaminate — flag/drop corpus docs sharing any n-gram with the
    eval set (the GPT-3/Gopher 13-gram rule, scaled down to the fixture's
    short docs). The eval side is small by nature (benchmarks are 10^3-10^6
    items), so its distinct n-gram set is BROADCAST and the corpus is never
    shuffled for the membership test; the only exchange is the per-doc hit
    aggregation, keyed by doc id (uniform).

  exact_cross_dedup — drop corpus docs whose normalized-text fingerprint
    appears in another corpus (dedup across crawl generations). Both sides
    reduce to 16-byte md5 fingerprints before the anti-join; at 10^12 docs
    this is a hash-keyed shuffle of fingerprints, never text.

No reference counterpart (the reference consumes pre-cleaned collections,
colbert/data/collection.py:14-33); these are the standard exclusion passes
a 100-TB pipeline runs between crawling and indexing.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from colbert_spark.functions import analysis
from colbert_spark.operators.dedup import _doc_shingles, normalized_text


def eval_ngram_set(eval_docs: DataFrame, n: int, text_col: str = "text"
                   ) -> DataFrame:
    """Distinct n-gram shingles of the eval/benchmark set → one `shingle`
    column. Kept as a DataFrame (not a collected set) so the caller can
    persist/broadcast it across many corpus partitions."""
    toks = eval_docs.select(analysis.tokens(text_col).alias("_t")).filter(
        F.size("_t") >= n
    )
    from colbert_spark.operators.dedup import shingle_expr

    return toks.select(
        F.explode(F.array_distinct(shingle_expr("_t", n))).alias("shingle")
    ).distinct()


def ngram_decontaminate(
    corpus: DataFrame,
    eval_docs: DataFrame,
    n: int = 3,
    min_overlap: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "flag",
) -> DataFrame:
    """Contamination pass of `corpus` against `eval_docs`.

    mode='flag'  → (id, n_doc_ngrams, n_hit_ngrams) for docs with
                   n_hit_ngrams ≥ min_overlap (the contamination report a
                   pipeline audits before dropping);
    mode='clean' → the surviving corpus rows (anti-join of the flagged set).

    n-grams are DISTINCT per doc (set semantics, like the Jaccard family),
    so a doc repeating one leaked n-gram 50 times counts once.

    Plan shape (plan-audited): ONE corpus scan → per-doc distinct
    shingles → broadcast LEFT join against the eval n-gram set with a hit
    indicator → ONE groupBy(id) computing total and hit counts together.
    The corpus text is never shuffled; 'clean' mode adds the id-keyed
    anti-join back onto the corpus rows — at scale prefer 'flag' + a
    downstream id-keyed exclusion (the tombstone path) over re-shuffling
    the text.
    """
    if mode not in ("flag", "clean"):
        raise ValueError(f"mode must be 'flag' or 'clean', got {mode!r}")
    sh = _doc_shingles(corpus, id_col, text_col, n)
    ev = eval_ngram_set(eval_docs, n, text_col).withColumn("_hit", F.lit(1))
    flagged = (
        sh.join(F.broadcast(ev), "shingle", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_doc_ngrams"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("long")
            .alias("n_hit_ngrams"),
        )
        .filter(F.col("n_hit_ngrams") >= min_overlap)
    )
    if mode == "clean":
        return corpus.join(flagged.select(id_col), id_col, "left_anti")
    return flagged


def embedding_decontaminate(
    corpus_emb: DataFrame,
    eval_emb: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    mode: str = "flag",
) -> DataFrame:
    """Semantic (SemDeDup-style) decontamination: corpus vectors whose
    cosine similarity to ANY eval/benchmark vector reaches `threshold` —
    catches paraphrased leaks the lexical n-gram gate misses.

    mode='flag'  → (id, max_sim, n_hits) for hit docs (max_sim over the
                   hit set, per-pair sims rounded like the ANN family);
    mode='clean' → surviving corpus rows.

    Plan: the eval side is BROADCAST (benchmarks are small by nature) and
    every corpus partition scores locally — linear in |corpus|·|eval|
    with zero corpus shuffle before the per-id fold. For an eval set too
    large to broadcast, block both sides with the LSH machinery
    (similarity.cosine_near_pairs) instead of this exact pass."""
    from colbert_spark.operators.similarity import SIM_DECIMALS, _dot, _norm

    if mode not in ("flag", "clean"):
        raise ValueError(f"mode must be 'flag' or 'clean', got {mode!r}")
    it = corpus_emb.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v")
    ).withColumn("_nv", _norm(F.col("_v")))
    q = eval_emb.select(
        F.col(vec_col).cast("array<double>").alias("_qv")
    ).withColumn("_nq", _norm(F.col("_qv")))
    sim = F.round(
        _dot(F.col("_v"), F.col("_qv")) / (F.col("_nv") * F.col("_nq")),
        SIM_DECIMALS,
    )
    hits = (
        it.join(F.broadcast(q))
        .select(id_col, sim.alias("_sim"))
        .filter(F.col("_sim") >= threshold)
        .groupBy(id_col)
        .agg(
            F.max("_sim").alias("max_sim"),
            F.count(F.lit(1)).cast("long").alias("n_hits"),
        )
    )
    if mode == "clean":
        return corpus_emb.join(hits.select(id_col), id_col, "left_anti")
    return hits


def exact_cross_dedup(
    corpus: DataFrame,
    other: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus rows whose normalized text does NOT appear in `other`
    (cross-generation exact dedup). Fingerprint = md5 of the space-joined
    token stream — the same content identity as textstats.doc_fingerprint,
    so exclusion survives whitespace/punctuation re-encoding between
    crawls. Both sides shuffle 16-byte hashes only."""
    fp = F.md5(F.encode(normalized_text(text_col), "UTF-8"))
    corp = corpus.withColumn("_fp", fp)
    seen = other.select(fp.alias("_fp")).distinct()
    return corp.join(seen, "_fp", "left_anti").drop("_fp")
