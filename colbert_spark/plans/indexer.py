"""Indexer — build the inverted index (API parity: colbert/indexer.py).

``Indexer.index(name, collection, overwrite=...)`` with the reference's
five overwrite modes (colbert/indexer.py:60-82):
    False                    — fail if the index exists
    True                     — warn + delete + rebuild
    'force_silent_overwrite' — delete + rebuild, no warning
    'reuse'                  — return the existing index path untouched
    'resume'                 — rebuild ONLY buckets missing from the manifest
                               (analog of chunk-exists skip,
                               collection_indexer.py:360-363 +
                               index_saver.py:30-50)

Build phases mirror CollectionIndexer.run (collection_indexer.py:61-78):
setup (plan.json) → train (term dict + corpus stats) → index (salted block
build) → finalize (manifest + metadata.json). Per-bucket manifest rows
carry lineage + metrics (north_rule): input fingerprint, block/posting
counts, encoded bytes, wall time.
"""

from __future__ import annotations

import time
from dataclasses import asdict

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from colbert_spark.operators import builder
from colbert_spark.plans.config import ColBERTConfig
from colbert_spark.sources.catalog import IndexCatalog

MANIFEST_SCHEMA = (
    "bucket long, input_fingerprint string, num_blocks long, "
    "num_postings long, bytes_written long, wall_ms long, status string"
)


class Indexer:
    def __init__(self, config: ColBERTConfig | None = None):
        self.config = ColBERTConfig.from_existing(config)

    def index(
        self,
        name: str,
        collection: DataFrame,
        overwrite: bool | str = False,
    ) -> str:
        assert overwrite in (True, False, "reuse", "resume",
                             "force_silent_overwrite")
        cfg = self.config
        cfg.index_name = name
        cat = IndexCatalog(cfg.index_path())

        if cat.exists():
            if overwrite is False:
                raise FileExistsError(
                    f"index {cat.root} exists; pass overwrite=True/'reuse'/'resume'"
                )
            if overwrite == "reuse":
                return str(cat.root)
            if overwrite in (True, "force_silent_overwrite"):
                if overwrite is True:
                    print(f"#> overwriting index at {cat.root}")
                cat.delete()
        elif overwrite == "resume" and not cat.plan_exists():
            # nothing to resume — fresh build
            overwrite = True

        spark = collection.sparkSession
        t0 = time.monotonic()

        # ---- setup + train: tokens, corpus stats, term dictionary --------
        # job-count discipline: each driver action costs ~0.5-2s of fixed
        # scheduling latency regardless of cluster size, which is exactly
        # what erodes N→4N scaling efficiency. Stats are folded into as few
        # actions as possible.
        token_df = builder.tokenize(collection, cfg)
        if cfg.cache_tokens:
            token_df = token_df.persist()
        # doc stats straight from the source (map-only), not via token_df —
        # no shuffle, and it doesn't force an early token materialization
        from colbert_spark.functions.analysis import doclen as _doclen

        doc_stats_df = collection.select(
            F.col("pid"), _doclen("text", cfg.doc_maxlen).alias("doclen")
        ).persist()
        row = doc_stats_df.agg(
            F.count(F.lit(1)).alias("n"), F.avg("doclen").alias("avgdl")
        ).collect()[0]
        num_docs, avgdl = int(row["n"]), float(row["avgdl"])
        term_dict = builder.build_term_dict(token_df, num_docs).persist()
        n_terms, n_term_ids, num_postings = (
            term_dict.agg(
                F.count("term"), F.countDistinct("term_id"), F.sum("df")
            ).collect()[0]
        )
        if n_terms != n_term_ids:  # xxhash64 collision — fail loudly
            raise RuntimeError(
                f"term_id hash collision: {n_terms} terms → {n_term_ids} ids"
            )

        cat.write_json(
            "plan.json",
            {
                "config": asdict(cfg),
                "num_docs": num_docs,
                "avg_doclen": avgdl,
                "num_terms": int(n_terms),
                "num_postings_est": int(num_postings),
                "num_buckets": cfg.index_partitions,
            },
        )

        # ---- resume: which buckets still need building? -------------------
        all_buckets = set(range(cfg.index_partitions))
        done: set[int] = set()
        if overwrite == "resume" and cat.table_exists("manifest"):
            done = {
                r["bucket"]
                for r in cat.read(spark, "manifest")
                .filter(F.col("status") == "ok")
                .collect()
            }
        todo = sorted(all_buckets - done)

        # ---- index: salted posting-block build ---------------------------
        blocks = builder.build_postings(token_df, term_dict, avgdl, cfg)
        if done:
            blocks = blocks.filter(F.col("bucket").isin(todo))
        mode = "append" if done else "overwrite"
        (
            blocks.repartition(cfg.index_partitions, "bucket")
            .sortWithinPartitions("term_id", "block_id")
            .write.mode(mode)
            .partitionBy("bucket")
            .parquet(cat.path("postings"))
        )

        # ---- finalize: stats tables, manifest, metadata -------------------
        cat.write(term_dict, "term_dict")
        cat.write(doc_stats_df, "doc_stats")
        stats_df = spark.createDataFrame(
            [(num_docs, avgdl, int(n_terms), int(num_postings))],
            "num_docs long, avg_doclen double, num_terms long, num_postings long",
        )
        cat.write(stats_df, "corpus_stats")

        wall_ms = int((time.monotonic() - t0) * 1000)
        # single read-back pass: per-bucket lineage metrics + content
        # fingerprint (bit_xor: order-independent, overflow-free). The build
        # is deterministic, so the segment-content fingerprint doubles as an
        # input-drift detector for resume.
        per_bucket = (
            cat.read(spark, "postings")
            .groupBy("bucket")
            .agg(
                F.count(F.lit(1)).alias("num_blocks"),
                F.sum("num_postings").alias("num_postings"),
                F.sum("enc_bytes").alias("bytes_written"),
                F.bit_xor(
                    F.xxhash64("term_id", "block_id", "first_pid", "num_postings")
                ).alias("fp"),
            )
        )
        # every bucket gets a row, even if empty (resume contract)
        manifest = (
            spark.range(cfg.index_partitions).withColumnRenamed("id", "bucket")
            .join(per_bucket, "bucket", "left")
            .select(
                F.col("bucket").cast("long"),
                F.coalesce(F.col("fp").cast("string"), F.lit("empty")).alias(
                    "input_fingerprint"
                ),
                F.coalesce("num_blocks", F.lit(0)).alias("num_blocks"),
                F.coalesce("num_postings", F.lit(0)).alias("num_postings"),
                F.coalesce("bytes_written", F.lit(0)).alias("bytes_written"),
                F.lit(wall_ms).alias("wall_ms"),
                F.lit("ok").alias("status"),
            )
        )
        cat.write(manifest, "manifest")
        cat.write_json(
            "metadata.json",
            {
                "config": asdict(cfg),
                "num_docs": num_docs,
                "avg_doclen": avgdl,
                "num_terms": int(n_terms),
                "num_postings": int(num_postings),
                "buckets_built_this_run": todo,
                "wall_ms": wall_ms,
            },
        )
        if cfg.cache_tokens:
            token_df.unpersist()
        doc_stats_df.unpersist()
        term_dict.unpersist()
        return str(cat.root)
