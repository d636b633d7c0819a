"""Ranking — (qid, pid, rank, score) results (colbert/data/ranking.py:25-94).

Wraps a DataFrame; provides the reference's views: flat tuples, per-qid
grouped dict (groupby_first_item analog, colbert/utils/utils.py:227-235),
TSV sink with provenance .meta sidecar (ranking.py:63-81; provenance.py).
"""

from __future__ import annotations

import json
from pathlib import Path

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


class Ranking:
    def __init__(self, df: DataFrame, provenance: dict | None = None):
        self.df = df.select("qid", "pid", "rank", "score")
        self.provenance = provenance or {}

    def flat_ranking(self) -> list[tuple]:
        """Flat (qid, pid, rank, score) tuples ordered by (qid, rank)."""
        return [
            (r["qid"], r["pid"], r["rank"], r["score"])
            for r in self.df.orderBy("qid", "rank").collect()
        ]

    def todict(self) -> dict[int, list[tuple[int, int, float]]]:
        """{qid: [(pid, rank, score), ...]} (Ranking.todict, ranking.py:45-47)."""
        out: dict[int, list] = {}
        for qid, pid, rank, score in self.flat_ranking():
            out.setdefault(qid, []).append((pid, rank, score))
        return out

    def save(self, path: str) -> str:
        """TSV qid \\t pid \\t rank \\t score + .meta provenance JSON."""
        p = Path(path)
        p.parent.mkdir(parents=True, exist_ok=True)
        rows = self.flat_ranking()
        with open(p, "w") as f:
            for qid, pid, rank, score in rows:
                f.write(f"{qid}\t{pid}\t{rank}\t{score}\n")
        meta = {"provenance": self.provenance, "num_rows": len(rows)}
        Path(str(p) + ".meta").write_text(json.dumps(meta, indent=2, sort_keys=True))
        return str(p)

    def save_distributed(self, path: str, partition_by_qid_buckets: int = 0
                         ) -> str:
        """Large-Q×k sink: executors write TSV shards directly (no driver
        collect — save() is reference-parity for small rankings; this is
        the 100-TB path). Optional qid-bucket partitioning gives readers
        per-bucket pruning. Returns the directory path; .meta sidecar as
        in save()."""
        line = F.concat_ws("\t", "qid", "pid", "rank", "score").alias("value")
        if partition_by_qid_buckets > 0:
            (
                self.df.select(
                    F.pmod("qid", F.lit(partition_by_qid_buckets))
                    .alias("qbucket"), line
                )
                .write.mode("overwrite").partitionBy("qbucket").text(path)
            )
        else:
            self.df.select(line).write.mode("overwrite").text(path)
        meta = {"provenance": self.provenance}
        Path(path + ".meta").write_text(
            json.dumps(meta, indent=2, sort_keys=True)
        )
        return path

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "Ranking":
        """Numericize TSV fields (load_ranking, ranking.py:18-43)."""
        df = spark.read.csv(path, sep="\t").select(
            F.col("_c0").cast("long").alias("qid"),
            F.col("_c1").cast("long").alias("pid"),
            F.col("_c2").cast("int").alias("rank"),
            F.col("_c3").cast("double").alias("score"),
        )
        return cls(df)


def split_by_queries(ranking: DataFrame, qid_sets: dict[str, list[int]],
                     out_dir: str) -> dict[str, str]:
    """Partition a ranking by query-set membership (U5,
    utility/rankings/split_by_queries.py:13-46): one TSV-style parquet dir
    per named set; qids in no set land in '_rest'. Membership is a
    broadcast join, the write is partitioned — no driver loop over rows."""
    spark = ranking.sparkSession
    rows = [(name, int(q)) for name, qs in qid_sets.items() for q in qs]
    member = spark.createDataFrame(rows, "split string, qid long")
    tagged = ranking.join(F.broadcast(member), "qid", "left").fillna(
        {"split": "_rest"}
    )
    tagged.write.mode("overwrite").partitionBy("split").parquet(out_dir)
    names = set(qid_sets) | {"_rest"}
    return {n: f"{out_dir}/split={n}" for n in names}


def split_by_offset(ranking: DataFrame, gap: int,
                    names: tuple[str, ...] = ("train", "dev", "test")
                    ) -> dict[str, DataFrame]:
    """Recover per-split rankings from a merged query set (U5,
    utility/rankings/split_by_offset.py:11-30): split i owns qids in
    [gap·(i+1), gap·(i+2)), and its original qid is qid mod gap. One
    filter + column rewrite per split — no shuffle, the scan prunes on the
    qid range."""
    out = {}
    for i, name in enumerate(names):
        lo = gap * (i + 1)
        out[name] = (
            ranking.filter((F.col("qid") >= lo) & (F.col("qid") < lo + gap))
            .withColumn("qid", (F.col("qid") - lo).cast("long"))
        )
    return out
