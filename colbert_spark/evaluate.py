"""Evaluation CLI — the utility.evaluate.msmarco_passages analog.

    python -m colbert_spark.evaluate --ranking r.tsv --qrels q.tsv \
        [--ks 10,50,200,1000]

Prints MRR@10 and Recall@k / Success@k per the reference harness
(utility/evaluate/msmarco_passages.py:16-91, README.md:150-154).
"""

from __future__ import annotations

import argparse
import json

from colbert_spark.operators import metrics
from colbert_spark.session import get_spark
from colbert_spark.sources.queries import load_qrels_tsv
from colbert_spark.sources.ranking import Ranking


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ranking", required=True)
    ap.add_argument("--qrels", required=True)
    ap.add_argument("--ks", default="10,50,200,1000")
    args = ap.parse_args()

    spark = get_spark(app_name="colbert-spark-eval")
    spark.sparkContext.setLogLevel("ERROR")
    ranking = Ranking.load(spark, args.ranking).df
    qrels = load_qrels_tsv(spark, args.qrels)

    ks = tuple(int(x) for x in args.ks.split(","))
    # one driver action for the whole summary (metrics.eval_summary)
    row = metrics.eval_summary(ranking, qrels, ks=ks, mrr_k=10).first()
    out = {"mrr@10": row["mrr_10"]}
    for k in ks:
        out[f"recall@{k}"] = row[f"recall_{k}"]
        out[f"success@{k}"] = row[f"success_{k}"]
    print(json.dumps(out, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
