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
