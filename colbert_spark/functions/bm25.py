"""BM25 scoring math — one definition shared by every scorer and oracle.

Replaces the reference's MaxSim interaction (colbert/modeling/colbert.py:132-177):
the max-then-sum over query tokens becomes sum-of-term-scores; candidate
pruning upper bounds (colbert/search/index_storage.py:111-166) become
per-block max term scores (block-max WAND).

Constants fixed & documented (SURVEY.md §7.3): k1=1.2, b=0.75,
idf = ln((N - df + 0.5)/(df + 0.5) + 1)  (the Lucene/ATIRE non-negative
variant). All math in float64 everywhere — Spark, numpy, DuckDB, Python —
so rankings are rank-identical across engines with the (-score, pid)
total order (reference tiebreak: server.py:34).
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import Column

K1 = 1.2
B = 0.75

#: round scores to this many decimals before ranking/compare so ULP-level
#: summation-order differences across engines can't flip ranks.
SCORE_DECIMALS = 6


def idf(df_col: Column, num_docs: Column | int) -> Column:
    """ln((N - df + 0.5) / (df + 0.5) + 1) as a Spark column (float64)."""
    n = F.lit(float(num_docs)) if isinstance(num_docs, int) else num_docs.cast("double")
    d = df_col.cast("double")
    return F.log((n - d + F.lit(0.5)) / (d + F.lit(0.5)) + F.lit(1.0))


def term_score(tf_col: Column, doclen_col: Column, avgdl: Column | float,
               idf_col: Column) -> Column:
    """idf * tf*(k1+1) / (tf + k1*(1 - b + b*doclen/avgdl))  (float64)."""
    a = F.lit(float(avgdl)) if isinstance(avgdl, float) else avgdl.cast("double")
    tf = tf_col.cast("double")
    dl = doclen_col.cast("double")
    denom = tf + F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * dl / a)
    return idf_col * tf * F.lit(K1 + 1.0) / denom


def py_idf(df: int, num_docs: int) -> float:
    """Python mirror (test oracle / numpy kernels)."""
    return math.log((num_docs - df + 0.5) / (df + 0.5) + 1.0)


def py_term_score(tf: float, doclen: float, avgdl: float, idf_val: float) -> float:
    return idf_val * tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * doclen / avgdl))


def py_max_term_score(idf_val: float, tf: float, doclen: float, avgdl: float) -> float:
    """Upper bound of a term's score over a set of (tf, doclen) pairs is NOT
    monotone in tf alone; callers pass the max of py_term_score over the
    block instead. Kept for documentation symmetry."""
    return py_term_score(tf, doclen, avgdl, idf_val)
