"""DPR answer matching — the annotate_EM harness, Spark-first.

Reference semantics (not code) from utility/utils/dpr.py: DPR_tokenize
NFD-normalizes, then emits maximal runs of Unicode letters/digits/marks
(SimpleTokenizer's ALPHA_NUM `[\\p{L}\\p{N}\\p{M}]+`, dpr.py:144) or single
non-separator/non-control characters (NON_WS `[^\\p{Z}\\p{C}]`, dpr.py:145);
DPR_normalize lowercases (dpr.py:222-223). has_answer (dpr.py:185-193) is
token-subsequence containment. annotate_EM (utility/evaluate/annotate_EM.py
+ annotate_EM_helpers.py) labels every (qid, pid, rank) with has_answer and
reports success@cutoff / counts@cutoff.

Spark shape: normalization is an Arrow-batched pandas UDF (pure
unicodedata — Spark has no NFD builtin); containment runs JVM-side as a
`contains` over space-joined token strings (token-subsequence equality ==
substring match once tokens are space-delimited, because tokens never
contain spaces). The per-row Python is confined to tokenization; the join,
label, and metric aggregation stay in whole-stage codegen.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

EM_CUTOFFS = (1, 5, 10, 20, 30, 50, 100, 1000)


def dpr_tokens(text: str) -> list[str]:
    """Pure-Python DPR tokenization: NFD → maximal L*/N*/M* runs or single
    non-Z*/non-C* chars, lowercased. Char-category scan is equivalent to
    the reference's leftmost-longest regex alternation."""
    out: list[str] = []
    cur: list[str] = []
    for ch in unicodedata.normalize("NFD", text or ""):
        cat0 = unicodedata.category(ch)[0]
        if cat0 in ("L", "N", "M"):
            cur.append(ch)
            continue
        if cur:
            out.append("".join(cur).lower())
            cur = []
        if cat0 not in ("Z", "C"):
            out.append(ch.lower())
    if cur:
        out.append("".join(cur).lower())
    return out


def dpr_normalize_str(text: str) -> str:
    """Space-joined normalized tokens — the containment-ready form."""
    return " ".join(dpr_tokens(text))


@pandas_udf(StringType())
def dpr_normalize_udf(texts: pd.Series) -> pd.Series:
    return texts.map(dpr_normalize_str)


def has_answer_col(passage_norm, answer_norm):
    """Token-subsequence containment as a codegen expression over
    normalized (space-joined) strings; empty answers never match
    (reference iterates token windows — an empty answer list yields no
    window)."""
    padded_p = F.concat(F.lit(" "), passage_norm, F.lit(" "))
    padded_a = F.concat(F.lit(" "), answer_norm, F.lit(" "))
    return F.when(
        answer_norm.isNull() | (answer_norm == ""), F.lit(False)
    ).otherwise(F.contains(padded_p, padded_a))


def annotate_ranking(ranking: DataFrame, collection: DataFrame,
                     answers: DataFrame) -> DataFrame:
    """(qid, pid, rank, label): has_answer per ranked passage
    (annotate_EM.py:30-36 assign_label_to_passage). A query with multiple
    answer strings matches if ANY matches.

    ranking: (qid, pid, rank); collection: (pid, text);
    answers: (qid, answer) — one row per answer string.
    """
    ans_norm = answers.select(
        "qid", dpr_normalize_udf(F.col("answer")).alias("_a")
    )
    labeled = (
        ranking.join(collection.select("pid", "text"), "pid")
        .withColumn("_p", dpr_normalize_udf(F.col("text")))
        .join(F.broadcast(ans_norm), "qid")
        .select(
            "qid", "pid", "rank",
            has_answer_col(F.col("_p"), F.col("_a")).alias("_hit"),
        )
        .groupBy("qid", "pid", "rank")
        .agg(F.max(F.col("_hit").cast("int")).cast("long").alias("label"))
    )
    return labeled


def em_metrics(labeled: DataFrame, cutoffs=EM_CUTOFFS) -> DataFrame:
    """success@k (any hit in top-k) and counts@k (hits in top-k), averaged
    over judged queries (annotate_EM_helpers.py:37-66). One row per
    cutoff: (cutoff, success, counts)."""
    per_q = [
        labeled.filter(F.col("rank") <= c).groupBy("qid").agg(
            F.max("label").alias("any_hit"), F.sum("label").alias("n_hits")
        ).agg(
            F.lit(c).cast("long").alias("cutoff"),
            F.round(F.avg("any_hit"), 6).alias("success"),
            F.round(F.avg("n_hits"), 6).alias("counts"),
        )
        for c in cutoffs
    ]
    out = per_q[0]
    for df in per_q[1:]:
        out = out.unionByName(df)
    return out
