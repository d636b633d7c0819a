"""Training-triples mining from labeled rankings — (qid, pos, neg) rows.

Reference semantics from utility/supervision/triples.py:39-72
(sample_for_query) re-expressed relationally:

- Positives (the greedy slot rule, :53-57): walking label-1 rows in rank
  order with counter c, a row at rank r is taken iff c < M(r), where
  M(r) = max{maxBest : maxDepth ≥ r} over the (maxBest, maxDepth) slots.
  With the reference's nested specs (e.g. "5,50 1,1000") M is
  NONINCREASING in r, so the takes form a PREFIX of the label-1 rows —
  which turns the sequential loop into two window functions: a positive
  index and an all-prior-rows-ok cumulative flag. (Non-nested specs where
  M increases are rejected — the prefix identity wouldn't hold.)
- Negatives (:20-36): per positive, num_negatives sampled from the
  label-0 rows at depth. The reference uses seeded random.sample, which
  no distributed engine can replay; here sampling = the first
  num_negatives negatives by a deterministic per-(qid, pid) hash order —
  uniform over negatives, reproducible at any parallelism, and
  DuckDB-replayable with the portable md5 hash. `biased=B` mirrors the
  reference's 50/50 split between the top-B negatives (by rank) and the
  rest, applied when the rest is at least as large (:30-34).
- `permissive` mode (:57-66): refused label-1 rows become extra positives
  paired with 5 negatives drawn past their rank position — implemented
  (see create_triples docstring for the counter-semantics collapse).

Everything is joins + window functions — no per-row Python, no driver
loop; group state never exceeds `depth` rows per query.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from colbert_spark.operators.dedup import md5_hash64


def _max_best_expr(positives: tuple[tuple[int, int], ...]):
    """M(rank) = max(maxBest) over slots whose maxDepth >= rank."""
    expr = F.lit(0)
    for max_best, max_depth in positives:
        expr = F.greatest(
            expr,
            F.when(F.col("rank") <= max_depth, F.lit(max_best)).otherwise(0),
        )
    return expr


def _neg_hash(seed: int, portable_hash: bool):
    if portable_hash:
        return md5_hash64(F.concat_ws("-", F.lit(seed), "qid", "pid"))
    return F.xxhash64(F.lit(seed), "qid", "pid")


def create_triples(
    labeled: DataFrame,
    positives: tuple[tuple[int, int], ...] = ((5, 50), (1, 1000)),
    depth: int = 1000,
    num_negatives: int = 100,
    biased: int | None = None,
    seed: int = 42,
    portable_hash: bool = False,
    permissive: bool = False,
    permissive_negatives: int = 5,
) -> DataFrame:
    """labeled(qid, pid, rank, label∈{0,1}) → triples(qid, pos, neg).

    permissive (triples.py:57-66): label-1 rows REFUSED by the greedy rule
    still become positives, each paired with permissive_negatives (:66
    num_sampled=5) negatives drawn from the negatives at list position >
    its rank (:61 `negatives[neg_start:]`), unbiased (:68 biased_=None).
    In permissive mode the reference's positives counter grows on EVERY
    label-1 row (:58/:61 both append), so the strict-take rule collapses
    to `positive-index < M(rank)` — no prefix/once-refused machinery.
    """
    slots = sorted(positives, key=lambda s: s[1])
    for (b1, d1), (b2, d2) in zip(slots, slots[1:]):
        if b2 > b1:
            raise ValueError(
                f"positive specs must be nested (deeper slot allows fewer "
                f"bests): {positives}"
            )
    r = labeled.filter(F.col("rank") <= depth)

    pos = r.filter(F.col("label") == 1)
    w = Window.partitionBy("qid").orderBy("rank")
    pos = pos.withColumn("_i", F.row_number().over(w) - 1)
    pos = pos.withColumn("_ok", F.col("_i") < _max_best_expr(positives))
    if permissive:
        taken = pos.filter(F.col("_ok")).select("qid", F.col("pid").alias("pos"))
        refused = pos.filter(~F.col("_ok")).select(
            "qid", F.col("pid").alias("pos"), F.col("rank").alias("_neg_start")
        )
    else:
        wprev = w.rowsBetween(Window.unboundedPreceding, -1)
        pos = pos.withColumn(
            "_bad_before",
            F.coalesce(
                F.sum(F.when(~F.col("_ok"), 1).otherwise(0)).over(wprev),
                F.lit(0),
            ),
        )
        taken = pos.filter(F.col("_ok") & (F.col("_bad_before") == 0)).select(
            "qid", F.col("pid").alias("pos")
        )

    negs = r.filter(F.col("label") == 0).select("qid", "pid", "rank")
    horder = Window.partitionBy("qid").orderBy(
        _neg_hash(seed, portable_hash), "pid"
    )
    if biased is None:
        sel = (
            negs.withColumn("_h", F.row_number().over(horder))
            .filter(F.col("_h") <= num_negatives)
        )
    else:
        if num_negatives % 2:
            raise ValueError("biased sampling needs an even num_negatives")
        nrank = Window.partitionBy("qid").orderBy("rank")
        negs = negs.withColumn("_nr", F.row_number().over(nrank))
        half = num_negatives // 2
        # reference guard (:32-34): bias only when the tail is at least as
        # large as the top-B pool; otherwise plain sampling
        counts = negs.groupBy("qid").agg(
            F.sum(F.when(F.col("_nr") <= biased, 1).otherwise(0)).alias("n_top"),
            F.sum(F.when(F.col("_nr") > biased, 1).otherwise(0)).alias("n_rest"),
        )
        negs = negs.join(F.broadcast(counts), "qid")
        use_bias = (F.col("n_top") < F.col("n_rest"))
        horder_grp = Window.partitionBy(
            "qid", F.col("_nr") <= biased
        ).orderBy(_neg_hash(seed, portable_hash), "pid")
        negs = negs.withColumn("_hg", F.row_number().over(horder_grp))
        negs = negs.withColumn("_h", F.row_number().over(horder))
        sel = negs.filter(
            F.when(
                use_bias,
                F.when(F.col("_nr") <= biased, F.col("_hg") <= half)
                .otherwise(F.col("_hg") <= num_negatives - half),
            ).otherwise(F.col("_h") <= num_negatives)
        )
    sel = sel.select("qid", F.col("pid").alias("neg"))
    strict = taken.join(sel, "qid").select("qid", "pos", "neg")
    if not permissive:
        return strict
    # permissive positives: negatives at list position > the positive's
    # rank (triples.py:61 `negatives[neg_start:]` — neg_start IS the rank),
    # permissive_negatives per positive by per-positive hash order.
    # Bounded: ≤ depth label-1 × depth label-0 rows per query pre-filter.
    nrank = Window.partitionBy("qid").orderBy("rank", "neg")
    negs_ord = (
        r.filter(F.col("label") == 0)
        .select("qid", F.col("pid").alias("neg"), "rank")
        .withColumn("_nr", F.row_number().over(nrank))
    )
    cand = refused.join(negs_ord, "qid").filter(
        F.col("_nr") > F.col("_neg_start")
    )
    if portable_hash:
        ph = md5_hash64(F.concat_ws("-", F.lit(seed), "qid", "pos", "neg"))
    else:
        ph = F.xxhash64(F.lit(seed), "qid", "pos", "neg")
    wperm = Window.partitionBy("qid", "pos").orderBy(ph, "neg")
    perm = (
        cand.withColumn("_pr", F.row_number().over(wperm))
        .filter(F.col("_pr") <= permissive_negatives)
        .select("qid", "pos", "neg")
    )
    return strict.unionByName(perm)


def create_triples_self(
    ranking: DataFrame,
    npositives: int = 1,
    depth_positive: int = 10,
    cutoff_negative: int = 50,
    depth_negative: int = 1000,
    num_sampled: int = 100,
    biased: bool = False,
    seed: int = 42,
    portable_hash: bool = False,
) -> DataFrame:
    """Self-training triples mined from the ranking ALONE — no qrels
    (utility/supervision/self_training.py:28-57 sample_for_query):

    - positives = pids at rank ≤ depth_positive (:44-45);
    - negatives = pids at cutoff_negative < rank ≤ depth_negative
      (:40-47), num_sampled of them per query (:49-51);
    - per sampled negative, npositives positives drawn per-negative
      (:52-55) — here by deterministic hash order keyed on
      (seed, qid, neg, pos), the same seeded-random.sample replacement
      create_triples uses (reproducible at any parallelism,
      DuckDB-replayable with the portable md5 hash);
    - biased=True mirrors sample_negatives' 50/50 split between the
      first-100 negatives and the rest (:19-25); requires even
      num_sampled (:21). Pools smaller than their quota yield what they
      have (the reference's random.sample would raise instead —
      documented softening).

    Joins + windows only; per-query state ≤ depth_negative rows.
    Returns (qid, pos, neg); for npositives > 1, pos is a sorted
    array<long> (the reference emits a list, :54).
    """
    if not npositives <= depth_positive < cutoff_negative < depth_negative:
        raise ValueError(
            "need npositives <= depth_positive < cutoff_negative < "
            f"depth_negative, got {npositives}, {depth_positive}, "
            f"{cutoff_negative}, {depth_negative}"
        )
    pos_pool = ranking.filter(F.col("rank") <= depth_positive).select(
        "qid", F.col("pid").alias("pos")
    )
    negs = ranking.filter(
        (F.col("rank") > cutoff_negative) & (F.col("rank") <= depth_negative)
    ).select("qid", "pid", "rank")
    horder = Window.partitionBy("qid").orderBy(
        _neg_hash(seed, portable_hash), "pid"
    )
    if not biased:
        sel = (
            negs.withColumn("_h", F.row_number().over(horder))
            .filter(F.col("_h") <= num_sampled)
        )
    else:
        if num_sampled % 2:
            raise ValueError("biased sampling needs an even num_sampled")
        half = num_sampled // 2
        nrank = Window.partitionBy("qid").orderBy("rank", "pid")
        negs = negs.withColumn("_nr", F.row_number().over(nrank))
        horder_grp = Window.partitionBy(
            "qid", F.col("_nr") <= 100
        ).orderBy(_neg_hash(seed, portable_hash), "pid")
        negs = negs.withColumn("_hg", F.row_number().over(horder_grp))
        sel = negs.filter(
            F.when(F.col("_nr") <= 100, F.col("_hg") <= half)
            .otherwise(F.col("_hg") <= num_sampled - half)
        )
    pairs = sel.select("qid", F.col("pid").alias("neg")).join(pos_pool, "qid")
    if portable_hash:
        ph = md5_hash64(F.concat_ws("-", F.lit(seed), "qid", "neg", "pos"))
    else:
        ph = F.xxhash64(F.lit(seed), "qid", "neg", "pos")
    wp = Window.partitionBy("qid", "neg").orderBy(ph, "pos")
    pairs = pairs.withColumn("_pr", F.row_number().over(wp)).filter(
        F.col("_pr") <= npositives
    )
    if npositives == 1:
        return pairs.select("qid", "pos", "neg")
    return (
        pairs.groupBy("qid", "neg")
        .agg(F.sort_array(F.collect_list("pos")).alias("pos"))
        .select("qid", "pos", "neg")
    )
