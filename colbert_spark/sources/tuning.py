"""Run-selection + query-split utilities (reference parity, driver-side by
design — these operate on handfuls of metadata files / qids, not data).

- tune_best_run: utility/rankings/tune.py:10-46 — across runs' metrics
  JSONs, pick the run maximizing a dotted metric path (e.g. "success.20").
  The reference then resolves a model checkpoint; this engine's artifact
  is the run/metadata path itself, returned alongside all scores.
- split_queries_holdout: utility/preprocess/queries_split.py:15-60 —
  deterministic seeded holdout split of a query set. Same algorithm
  (random.sample over ordinal positions, seed 12345 default); positions
  are assigned by qid order, the sampled index set (size = holdout) is
  broadcast into a semi-join, so the split is distributed-safe while
  staying bit-compatible with the reference's selection given the same
  query order.
"""

from __future__ import annotations

import json
import random
from pathlib import Path

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def tune_best_run(metrics_paths: list[str], metric_key: str,
                  output: str | None = None) -> tuple[str, dict[str, float]]:
    """(best_path, {path: score}) — max over runs of the dotted metric
    (tune.py:19-25 walks the same nested keys). Writes best_path (+ .meta
    with all scores) when output is given, mirroring tune.py:36-42."""
    scores: dict[str, float] = {}
    for path in metrics_paths:
        obj = json.loads(Path(path).read_text())
        for part in metric_key.split("."):
            obj = obj[part]
        # JSON integers (e.g. "success": 1) are legitimate scores the
        # reference's tune.py accepts; bool is an int subclass — reject it
        if isinstance(obj, bool) or not isinstance(obj, (int, float)):
            raise TypeError(f"{path}: {metric_key} is {type(obj).__name__}, "
                            "expected a number")
        scores[path] = float(obj)
    best = max(scores, key=lambda p: scores[p])
    if output is not None:
        out = Path(output)
        out.parent.mkdir(parents=True, exist_ok=True)
        out.write_text(best)
        Path(output + ".meta").write_text(
            json.dumps({"metric": metric_key, "scores": scores},
                       indent=2, sort_keys=True)
        )
    return best, scores


def split_queries_holdout(queries: DataFrame, holdout: int,
                          seed: int = 12345) -> tuple[DataFrame, DataFrame]:
    """(main, holdout) query DataFrames. Selection = seeded
    random.sample(range(n), holdout) over qid-ordered positions — the
    reference's exact sampling rule; only the index set (size = holdout)
    crosses the driver."""
    n = queries.count()
    if not 0 < holdout < n:
        raise ValueError(f"holdout must be in (0, {n}), got {holdout}")
    picked = set(random.Random(seed).sample(range(n), holdout))
    w = Window.orderBy("qid")
    pos = queries.withColumn("_pos", F.row_number().over(w) - 1)
    spark = queries.sparkSession
    picked_df = spark.createDataFrame([(int(i),) for i in picked],
                                      "_pos long")
    hold = pos.join(F.broadcast(picked_df), "_pos", "left_semi").drop("_pos")
    main = pos.join(F.broadcast(picked_df), "_pos", "left_anti").drop("_pos")
    return main, hold


def sample_minicorpus(
    collection: DataFrame,
    ranking: DataFrame,
    queries: DataFrame,
    n_queries: int,
    topk: int = 30,
    seed: int = 12345,
) -> tuple[DataFrame, DataFrame]:
    """(mini_collection, mini_queries): a debugging-scale corpus slice
    (colbert/utilities/minicorpus.py:11-57 semantics) — sample n_queries
    query ids (split_queries_holdout's deterministic rule), keep every
    passage in their top-k rankings. The pid set and sampled qids are
    broadcast semi-joins; the collection is never collected."""
    _, sampled_q = split_queries_holdout(queries, holdout=n_queries,
                                         seed=seed)
    kept_pids = (
        ranking.filter(F.col("rank") <= topk)
        .join(F.broadcast(sampled_q.select("qid")), "qid", "left_semi")
        .select("pid").distinct()
    )
    mini_collection = collection.join(F.broadcast(kept_pids), "pid",
                                      "left_semi")
    return mini_collection, sampled_q
