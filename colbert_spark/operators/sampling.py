"""Deterministic corpus sampling for training-data pipelines.

Sampling at 100 TB must be (a) reproducible at any parallelism — no RNG
state threaded through tasks — and (b) shuffle-free: the keep/drop
decision is a pure function of the row. Both operators here hash the doc
id with a seed and threshold the hash, so the same (id, seed) keeps the
same rows on 1 core or 1000 executors, and the plan is a FileScan +
Filter (predicate-pushdown friendly, zero exchanges).

No reference counterpart beyond the qid subsampling utilities
(utility/supervision/dev_subsample.py:11-29, re-expressed exactly in
sources/tuning.split_queries_holdout) — per-STRATUM rate control is the
training-data-pipeline generalization.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from colbert_spark.operators.dedup import md5_hash64

# threshold denominator: hash buckets per unit of sampling probability
_DENOM = 1_000_000


def _raw_hash(id_col: str, seed: int, portable: bool):
    """Full-width hash of (id, seed) — md5-based in portable mode so a
    DuckDB oracle replays the exact values. Consumers that need a small
    modulus (stream assignment, ordering keys) should mod THIS, not the
    1e6-bucket keep-hash: double-modding through 1e6 makes the residue
    non-uniform whenever the outer modulus doesn't divide 1e6."""
    tagged = F.concat_ws(":", F.col(id_col).cast("string"), F.lit(str(seed)))
    return md5_hash64(tagged) if portable else F.xxhash64(tagged)


def _keep_hash(id_col: str, seed: int, portable: bool):
    """Uniform bucket in [0, _DENOM) from (id, seed)."""
    return F.pmod(_raw_hash(id_col, seed, portable), F.lit(_DENOM))


def sample_fraction(docs: DataFrame, fraction: float, id_col: str = "doc_id",
                    seed: int = 42, portable_hash: bool = False) -> DataFrame:
    """Deterministic Bernoulli-style sample: keep iff
    pmod(hash(id:seed), 1e6) < fraction * 1e6."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction {fraction} outside [0, 1]")
    # round, don't truncate: int(0.29 * 1e6) is 289999 from binary-float
    # error — one bucket short of the advertised rate
    return docs.filter(
        _keep_hash(id_col, seed, portable_hash) < int(round(fraction * _DENOM))
    )


def stratified_sample(docs: DataFrame, fractions: dict[str, float],
                      strata_col: str = "source", id_col: str = "doc_id",
                      seed: int = 42, default_fraction: float = 0.0,
                      portable_hash: bool = False) -> DataFrame:
    """Per-stratum deterministic sampling — the source-mixing knob of a
    pretraining data recipe (e.g. keep 100% of wiki, 10% of crawl).

    The per-stratum threshold rides a literal CASE expression (strata
    maps are small by nature — they are human-written recipes), so the
    plan stays FileScan + Filter: no join, no shuffle, and the same rows
    survive at any cluster size.
    """
    for s, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction {f} for stratum {s!r} outside [0, 1]")
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError(f"default_fraction {default_fraction} outside [0, 1]")
    thresh = F.lit(int(round(default_fraction * _DENOM)))
    for s, f in sorted(fractions.items()):
        thresh = F.when(F.col(strata_col) == s,
                        F.lit(int(round(f * _DENOM)))).otherwise(thresh)
    return docs.filter(_keep_hash(id_col, seed, portable_hash) < thresh)


def mix_by_token_budget(docs: DataFrame, budgets: dict[str, int],
                        strata_col: str = "source", id_col: str = "doc_id",
                        text_col: str = "text", default_budget: int | None = None,
                        seed: int = 42, portable_hash: bool = False,
                        summary: bool = True) -> DataFrame:
    """Data-recipe mixing by TOKEN budget, not row fraction: per stratum,
    keep a deterministic hash-sample sized so expected kept tokens ≈ the
    stratum's budget (keep everything when the budget covers the stratum;
    default_budget=None keeps unlisted strata whole).

    Two-phase, skew-free: (1) a tiny per-stratum token-total aggregate;
    (2) keep_ppm = floor(least(1, budget/total) * 1e6) broadcast back onto
    the scan as a hash-threshold filter. The corpus is never window-sorted
    per source (a per-stratum cumulative-sum trim would funnel each
    source's 100 TB through one partition); the budget is met in
    expectation with hash-uniform doc selection, which is what mixture
    recipes actually specify. The only corpus exchanges are the two
    stratum aggregates, keyed by the (small) strata column with map-side
    combine.

    summary=True → (stratum, n_docs, total_tokens, budget_tokens,
    keep_ppm, kept_docs, kept_tokens); summary=False → the kept doc rows.
    """
    from colbert_spark.functions import analysis

    for s, b in budgets.items():
        if b < 0:
            raise ValueError(f"budget {b} for stratum {s!r} negative")
    base = docs.select(
        F.col(strata_col), F.col(id_col),
        analysis.doclen(text_col).cast("long").alias("_n"),
        _keep_hash(id_col, seed, portable_hash).alias("_bucket"),
    )
    totals = base.groupBy(strata_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_n").alias("total_tokens"),
    )
    budget = (F.lit(None).cast("long") if default_budget is None
              else F.lit(int(default_budget)).cast("long"))
    for s, b in sorted(budgets.items()):
        budget = F.when(F.col(strata_col) == s, F.lit(int(b))).otherwise(budget)
    # NULL budget (unlisted stratum, no default) or an all-empty-docs
    # stratum (total 0 — division semantics differ across engines) →
    # keep everything
    ppm = F.when(
        budget.isNull() | (F.col("total_tokens") == 0), F.lit(_DENOM)
    ).otherwise(
        F.floor(F.least(F.lit(1.0), budget / F.col("total_tokens")) * _DENOM)
    ).cast("long")
    totals = totals.select(
        strata_col, "n_docs", "total_tokens",
        budget.alias("budget_tokens"), ppm.alias("keep_ppm"),
    )
    kept_rows = base.join(F.broadcast(totals.select(strata_col, "keep_ppm")),
                          strata_col).filter(F.col("_bucket") < F.col("keep_ppm"))
    if not summary:
        return docs.join(kept_rows.select(id_col), id_col, "left_semi")
    kept = kept_rows.groupBy(strata_col).agg(
        F.count(F.lit(1)).alias("kept_docs"),
        F.sum("_n").alias("kept_tokens"),
    )
    return totals.join(kept, strata_col, "left").select(
        strata_col, "n_docs", "total_tokens", "budget_tokens", "keep_ppm",
        F.coalesce("kept_docs", F.lit(0)).cast("long").alias("kept_docs"),
        F.coalesce("kept_tokens", F.lit(0)).cast("long").alias("kept_tokens"),
    )


def mix_by_temperature(docs: DataFrame, alpha: float, total_budget: int,
                       strata_col: str = "source", id_col: str = "doc_id",
                       text_col: str = "text", seed: int = 42,
                       portable_hash: bool = False,
                       summary: bool = True) -> DataFrame:
    """Temperature-based mixture sampling (the XLM-R / multilingual-LM
    recipe, Conneau et al. 2020 §3.1): stratum i's share of a
    `total_budget` tokens is q_i = p_i^alpha / Σ_j p_j^alpha with
    p_i the stratum's token share — alpha=1 keeps natural proportions,
    alpha→0 flattens toward uniform (upweighting tail sources), values
    between trade the two. Sampling is without replacement, so a stratum
    whose target exceeds its size caps at keep-everything (the standard
    caveat — temperature upsampling of tiny sources needs epoch
    repetition, which is a training-loader concern, not a corpus one).

    Same two-phase skew-free shape as mix_by_token_budget: one tiny
    per-stratum token-total aggregate, then a broadcast ppm threshold on
    the hash-uniform scan — the corpus never window-sorts per source.

    Cross-engine determinism: pow() is not correctly-rounded in every
    libm, so the share chain rounds at fixed points (share to 9
    decimals, target via round-6-then-floor) before the ppm floor —
    the repo's round-before-rank rule applied to thresholds; a 1-ulp
    pow() wobble cannot flip a bucket unless the true value sits within
    5e-13 of a rounding boundary. The DuckDB oracle replays the exact
    chain.

    summary=True → (stratum, n_docs, total_tokens, share, target_tokens,
    keep_ppm, kept_docs, kept_tokens); summary=False → the kept doc rows.
    """
    from colbert_spark.functions import analysis

    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    if total_budget < 0:
        raise ValueError(f"total_budget must be >= 0, got {total_budget}")
    base = docs.select(
        F.col(strata_col), F.col(id_col),
        analysis.doclen(text_col).cast("long").alias("_n"),
        _keep_hash(id_col, seed, portable_hash).alias("_bucket"),
    )
    totals = base.groupBy(strata_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_n").alias("total_tokens"),
    )
    w = F.pow(F.col("total_tokens").cast("double"), F.lit(float(alpha)))
    totals = totals.withColumn("_w", w)
    # Σ weights as a 1-row crossJoin (the indexer's stats pattern — the
    # totals table is #strata rows, no full-partition window idiom)
    wsum = totals.agg(F.sum("_w").alias("_wsum"))
    totals = totals.crossJoin(F.broadcast(wsum))
    share = F.round(F.col("_w") / F.col("_wsum"), 9)
    target = F.floor(F.round(F.lit(int(total_budget)) * share, 6))
    ppm = F.when(
        F.col("total_tokens") == 0, F.lit(_DENOM)
    ).otherwise(
        F.floor(F.least(F.lit(1.0),
                        F.round(target / F.col("total_tokens"), 9))
                * _DENOM)
    ).cast("long")
    totals = totals.select(
        strata_col, "n_docs", "total_tokens",
        F.round(share, 6).alias("share"),
        target.cast("long").alias("target_tokens"),
        ppm.alias("keep_ppm"),
    )
    kept_rows = base.join(
        F.broadcast(totals.select(strata_col, "keep_ppm")), strata_col
    ).filter(F.col("_bucket") < F.col("keep_ppm"))
    if not summary:
        return docs.join(kept_rows.select(id_col), id_col, "left_semi")
    kept = kept_rows.groupBy(strata_col).agg(
        F.count(F.lit(1)).alias("kept_docs"),
        F.sum("_n").alias("kept_tokens"),
    )
    return totals.join(kept, strata_col, "left").select(
        strata_col, "n_docs", "total_tokens", "share", "target_tokens",
        "keep_ppm",
        F.coalesce("kept_docs", F.lit(0)).cast("long").alias("kept_docs"),
        F.coalesce("kept_tokens", F.lit(0)).cast("long").alias("kept_tokens"),
    )
