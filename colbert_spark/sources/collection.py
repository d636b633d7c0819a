"""Collection: the document corpus with deterministic pid assignment.

Reference parity: colbert/data/collection.py:14-98 — a Collection is an
ordered list of passages whose pid IS the position (asserted at
colbert/evaluation/loaders.py:166). In Spark there is no ambient order, so
pid := row_number() over a stable total order on `url` − 1 (SURVEY.md §1.1).

At 10^12 docs a single-window row_number is a 1-task sort; assign_pids uses
a two-phase range-partitioned scheme instead: sort by url into range
partitions, count per partition, broadcast cumulative offsets, then
partition-local row numbers — the same global order, no single-task stage.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def assign_pids(docs: DataFrame, order_col: str = "url",
                num_partitions: int | None = None) -> DataFrame:
    """Add pid: dense 0-based rank of order_col (deterministic total order).

    Two-phase: repartitionByRange(order_col) + sortWithinPartitions gives a
    globally ordered layout; per-partition counts (tiny, collected) become
    broadcast offsets; spark_partition_id + local row_number yields the
    global position. Equivalent to row_number().over(orderBy(order_col))-1
    but scales to arbitrarily many partitions.
    """
    n = num_partitions or docs.sparkSession.sparkContext.defaultParallelism
    ranged = docs.repartitionByRange(n, F.col(order_col)).sortWithinPartitions(order_col)
    part = ranged.withColumn("_part", F.spark_partition_id())
    # tiny: one row per partition
    counts = part.groupBy("_part").count().collect()
    offsets = {}
    acc = 0
    for row in sorted(counts, key=lambda r: r["_part"]):
        offsets[row["_part"]] = acc
        acc += row["count"]
    offmap = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )
    w = Window.partitionBy("_part").orderBy(order_col)
    return (
        part.withColumn("_local", F.row_number().over(w) - 1)
        .withColumn("pid", (offmap[F.col("_part")] + F.col("_local")).cast("long"))
        .drop("_part", "_local")
    )


def load_collection_tsv(spark, path: str) -> DataFrame:
    """pid \\t passage [\\t title] — title concatenated 'title | passage'
    (colbert/evaluation/loaders.py:155-176)."""
    df = spark.read.csv(path, sep="\t", inferSchema=False)
    cols = df.columns
    out = df.select(
        F.col(cols[0]).cast("long").alias("pid"),
        F.col(cols[1]).alias("passage"),
        *([F.col(cols[2]).alias("title")] if len(cols) > 2 else []),
    )
    if "title" in out.columns:
        out = out.select(
            "pid",
            F.when(
                F.col("title").isNotNull(),
                F.concat_ws(" | ", "title", "passage"),
            ).otherwise(F.col("passage")).alias("text"),
        )
    else:
        out = out.select("pid", F.col("passage").alias("text"))
    return out


def load_collection_jsonl(spark, path: str) -> DataFrame:
    """JSONL collection (S2 — declared but unimplemented in the reference,
    colbert/data/collection.py:38-39): lines with {pid?, text/passage}."""
    df = spark.read.json(path)
    text_col = "text" if "text" in df.columns else "passage"
    if "pid" in df.columns:
        return df.select(F.col("pid").cast("long").alias("pid"),
                         F.col(text_col).alias("text"))
    return assign_pids(df.select(F.col(text_col).alias("text"))
                       .withColumn("url", F.md5("text")), "url") \
        .select("pid", "text")


def save_collection_tsv(docs: DataFrame, path: str) -> None:
    """Write pid \\t text (colbert/data/collection.py:47-57)."""
    docs.select("pid", "text").orderBy("pid").coalesce(1).write.mode(
        "overwrite"
    ).csv(path, sep="\t")
