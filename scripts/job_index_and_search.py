"""spark-submit entry point: index a parquet corpus, answer a query TSV.

    spark-submit --master local[8] \\
        --py-files colbert_spark.zip \\
        scripts/job_index_and_search.py \\
        --corpus /data/docs.parquet --index-root /data/idx --index web \\
        --queries queries.tsv --k 10 --output ranking.tsv

This is the cluster launch path (north_rule: "run via spark-submit
--py-files on a multi-executor cluster"); scripts/submit.sh packages the
engine and invokes it. The job uses ONLY the SparkSession given by
spark-submit — no session factory — so the same file runs unchanged under
YARN/K8s masters.
"""

from __future__ import annotations

import argparse

import pyspark.sql.functions as F
from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True, help="parquet with (pid,text) or (url,...,text)")
    ap.add_argument("--index-root", required=True)
    ap.add_argument("--index", default="web")
    ap.add_argument("--queries", required=True, help="qid \\t text TSV")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--output", required=True)
    ap.add_argument("--overwrite", default="resume")
    args = ap.parse_args()

    spark = SparkSession.builder.getOrCreate()

    from colbert_spark.plans.config import ColBERTConfig
    from colbert_spark.plans.indexer import Indexer
    from colbert_spark.plans.searcher import Searcher
    from colbert_spark.sources.collection import assign_pids
    from colbert_spark.sources.queries import load_queries_tsv

    docs = spark.read.parquet(args.corpus)
    if "pid" not in docs.columns:
        docs = assign_pids(docs, order_col="url")
    docs = docs.select("pid", "text")

    cfg = ColBERTConfig(index_root=args.index_root)
    ow = {"true": True, "false": False}.get(args.overwrite, args.overwrite)
    Indexer(cfg).index(args.index, docs, overwrite=ow)

    queries = load_queries_tsv(spark, args.queries)
    ranking = Searcher(args.index, spark, cfg).search_all(queries, k=args.k)
    path = ranking.save(args.output)
    n = ranking.df.count()
    print(f"#> wrote {n} ranking rows to {path}")
    spark.stop()


if __name__ == "__main__":
    main()
