"""IndexUpdater — incremental index maintenance without a rebuild.

Parity: colbert/index_updater.py:28-274 (add :97-148, remove :57-95,
persist_to_disk :176-273). The reference appends compressed embeddings and
patches the IVF in memory, WITHOUT retraining centroids; our analog
appends posting segments computed against FROZEN corpus statistics
(N, avgdl, idf unchanged) and removes docs via tombstones. Scores for new
docs therefore use the stats frozen at build time — the exact same
approximation the reference makes by not re-running k-means. A periodic
`coalesce` (operators/builder.coalesce_index) folds tombstones + appended
segments back into clean blocks (analog of utils/coalesce.py).

remove(pids)  → tombstone rows; search excludes them at decode time.
add(docs)     → build blocks for the new docs with frozen stats; append
                as new segments (salt namespace 1<<20 avoids block_id
                collisions); re-adding a tombstoned pid clears its
                tombstone (reference re-add semantics,
                index_updater_test.py:50-208).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from colbert_spark.operators import builder
from colbert_spark.plans.config import ColBERTConfig
from colbert_spark.sources.catalog import make_catalog

_ADD_SALT_BASE = 1 << 20  # keeps appended block_ids disjoint from build-time


class IndexUpdater:
    def __init__(self, index: str, spark: SparkSession,
                 config: ColBERTConfig | None = None):
        self.spark = spark
        cfg = ColBERTConfig.from_existing(config)
        cfg.index_name = index
        self.config = cfg
        self.catalog = make_catalog(cfg)
        meta = self.catalog.read_json("metadata.json")
        self.num_docs: int = meta["num_docs"]
        self.avgdl: float = meta["avg_doclen"]
        #: surgery evidence from the last targeted re-add purge
        #: ({"files_rewritten", "files_total", "pids"}), None otherwise
        self.last_purge: dict | None = None

    # -- remove ------------------------------------------------------------
    def remove(self, pids: list[int]) -> None:
        new = self.spark.createDataFrame([(int(p),) for p in pids], "pid long")
        if self.catalog.table_exists("tombstones"):
            old = self.catalog.read(self.spark, "tombstones")
            merged = old.unionByName(new).dropDuplicates(["pid"])
        else:
            merged = new.dropDuplicates(["pid"])
        # replace() avoids read-from/write-to-same-path (the union reads
        # the existing tombstones table); tombstone tables can be large —
        # never collected to the driver (Searcher applies a size guard too)
        self.catalog.replace(merged, "tombstones")
        self.catalog.refresh(self.spark)

    # -- add ---------------------------------------------------------------
    def add(self, docs: DataFrame, id_col: str = "pid",
            text_col: str = "text") -> None:
        """Append postings for new docs under frozen corpus stats.

        A pid may be added only if absent from the live index. Re-adding a
        previously removed pid physically purges its old postings first —
        clearing the tombstone alone would resurrect them alongside the new
        ones. Up to config.max_purge_pids re-adds this is BLOCK-TARGETED
        (builder.purge_pids rewrites only the posting files whose block
        ranges intersect the re-added pids — the reference updater's
        patch-only-affected-chunks shape, colbert/index_updater.py:176-273);
        past the threshold a full coalesce is cheaper (compaction debt) and
        on catalogs without file surgery (Iceberg, until the row-level
        DELETE path is cluster-validated) the coalesce fallback keeps the
        semantics.
        """
        cfg = self.config
        self.catalog.recover_pending_rewrite(self.spark)
        added = docs.select(F.col(id_col).alias("pid")).distinct()
        if self.catalog.table_exists("tombstones"):
            tombs = self.catalog.read(self.spark, "tombstones")
            readded = tombs.join(added, "pid", "left_semi").count()
        else:
            tombs, readded = None, 0
        if readded and (readded > cfg.max_purge_pids
                        or not self.catalog.supports_file_rewrite):
            # compaction-debt / no-surgery fallback: fold the WHOLE
            # tombstone set in one O(index) pass. localCheckpoint (not
            # toPandas) keeps the tombstone set on the executors —
            # tombstone tables can be large (remove()'s own contract) and
            # the checkpoint stays valid after coalesce deletes the
            # underlying table
            removed = tombs.localCheckpoint(eager=True)
            builder.coalesce_index(self.catalog, cfg, self.avgdl)
            tombs = None
        elif readded:
            # targeted surgery: purge ONLY the re-added pids' postings
            # (bounded driver list — readded <= max_purge_pids by the
            # branch above), keep everyone else's tombstones lazy
            readded_pids = [
                r["pid"]
                for r in tombs.join(added, "pid", "left_semi").collect()
            ]
            self.last_purge = builder.purge_pids(
                self.catalog, cfg, self.avgdl, readded_pids,
                max_file_fraction=cfg.purge_fallback_file_fraction,
            )
            if self.last_purge["fallback_recommended"]:
                # the pid set's block ranges flag ~every posting file —
                # surgery would rewrite the table without a shuffle for
                # about the cost of the full fold, so take the fold and
                # its complete debt reset instead
                removed = tombs.localCheckpoint(eager=True)
                builder.coalesce_index(self.catalog, cfg, self.avgdl)
                tombs = None
            else:
                remaining = tombs.join(added, "pid", "left_anti") \
                    .localCheckpoint(eager=True)
                if remaining.take(1):
                    self.catalog.replace(remaining, "tombstones")
                    tombs = remaining  # checkpoint survives the table swap
                else:
                    self.catalog.delete_table("tombstones")
                    tombs = None
                self.catalog.refresh(self.spark)
                removed = self.spark.createDataFrame(
                    [(int(p),) for p in readded_pids], "pid long"
                )
        else:
            removed = None
        live = self.catalog.read(self.spark, "doc_stats").select("pid")
        if tombs is not None:
            live = live.join(tombs, "pid", "left_anti")
        if removed is not None:
            live = live.join(removed, "pid", "left_anti")
        clash = live.join(added, "pid", "left_semi").count()
        if clash:
            raise ValueError(
                f"{clash} pid(s) already live in the index; remove() them first"
            )
        token_df = builder.tokenize(docs, cfg, id_col=id_col, text_col=text_col)
        if id_col != "pid":
            token_df = token_df.withColumnRenamed(id_col, "pid")

        term_dict = self.catalog.read(self.spark, "term_dict")
        # frozen idf for known terms; brand-new terms get idf at df=0 under
        # the frozen N (max idf — consistent with "stats not retrained")
        from colbert_spark.functions import bm25 as bm25f

        known = term_dict.select("term", "term_id", "idf")
        enriched = token_df.join(F.broadcast(known), "term", "left").select(
            F.coalesce("term_id", F.xxhash64("term")).alias("term_id"),
            "pid", "tf", "doclen",
            F.coalesce(
                "idf", bm25f.idf(F.lit(0), self.num_docs)
            ).alias("idf"),
            F.lit(0).cast("long").alias("salt"),
        )
        # reuse the build kernel, but in a disjoint block_id namespace
        kernel = builder._make_block_builder(cfg.block_size, self.avgdl,
                                             cfg.k1, cfg.b)
        from colbert_spark.sources.catalog import POSTINGS_SCHEMA

        blocks = (
            enriched.withColumn("salt", F.lit(_ADD_SALT_BASE))
            .repartition(cfg.shuffle_partitions, "term_id")
            .groupBy("term_id", "salt")
            .applyInPandas(kernel, schema=POSTINGS_SCHEMA)
            .withColumn(
                "bucket", F.pmod(F.col("term_id"), F.lit(cfg.index_partitions))
            )
        )
        self.catalog.write(blocks, "postings", mode="append",
                           partition_by=["bucket"])
        # brand-new terms must enter the dictionary or they're unsearchable;
        # their idf stays the frozen-stats df=0 value used for their blocks
        new_terms = (
            token_df.select("term").distinct()
            .join(term_dict.select("term"), "term", "left_anti")
            .select(
                "term",
                F.xxhash64("term").alias("term_id"),
                F.lit(0).cast("long").alias("df"),
                F.lit(0).cast("long").alias("cf"),
                bm25f.idf(F.lit(0), self.num_docs).alias("idf"),
            )
        )
        self.catalog.write(new_terms, "term_dict", mode="append")
        # doc_stats: drop any stale row for re-added pids, append the new
        # ones; catalog.replace keeps the swap atomic-ish and distributed
        old_stats = self.catalog.read(self.spark, "doc_stats").join(
            added, "pid", "left_anti"
        )
        merged_stats = old_stats.unionByName(builder.doc_stats(token_df))
        self.catalog.replace(merged_stats, "doc_stats")
        # parquet layout mutated files behind Spark's back — drop any cached
        # listings so same-session readers see the swapped table
        self.catalog.refresh(self.spark)

    # -- maintenance -------------------------------------------------------
    def segment_debt(self) -> dict:
        """Compaction debt from block metadata only (column-pruned scan —
        block_id alone; binaries never read): the fraction of blocks in the
        appended-segment namespace (salt = block_id >> 32 ≥ _ADD_SALT_BASE,
        i.e. written by add() under frozen stats rather than by the salted
        build/compaction) and the tombstoned fraction of docs. Both grow
        monotonically between coalesce runs and both degrade query time —
        appended segments are small and unsorted relative to the builds'
        pid-runs; tombstones are filtered at decode."""
        blocks = self.catalog.read(self.spark, "postings").select("block_id")
        row = blocks.agg(
            F.count(F.lit(1)).alias("blocks"),
            F.sum(
                F.when(
                    F.shiftright("block_id", 32) >= _ADD_SALT_BASE, 1
                ).otherwise(0)
            ).alias("appended"),
        ).first()
        n_tombs = (
            self.catalog.read(self.spark, "tombstones").count()
            if self.catalog.table_exists("tombstones") else 0
        )
        blocks_n = int(row["blocks"] or 0)
        return {
            "blocks": blocks_n,
            "appended_blocks": int(row["appended"] or 0),
            "appended_fraction": (
                int(row["appended"] or 0) / blocks_n if blocks_n else 0.0
            ),
            "tombstones": n_tombs,
            "tombstone_fraction": (
                n_tombs / self.num_docs if self.num_docs else 0.0
            ),
        }

    def maintain(self, max_appended_fraction: float = 0.2,
                 max_tombstone_fraction: float = 0.2) -> bool:
        """Debt-driven compaction: coalesce the index iff the appended or
        tombstoned fraction exceeds its threshold; returns True when a
        compaction ran. This is the policy wrapper around coalesce_index —
        call it on a schedule (or let stream_index_append's auto_maintain
        call it per applied batch) so long-running maintenance never needs
        a human to decide when the fold is due (the reference leaves the
        analogous decision to the operator re-running the indexer)."""
        debt = self.segment_debt()
        if (debt["appended_fraction"] <= max_appended_fraction
                and debt["tombstone_fraction"] <= max_tombstone_fraction):
            return False
        builder.coalesce_index(self.catalog, self.config, self.avgdl)
        return True

    def persist_to_disk(self) -> None:
        """No-op: every mutation above is already durable (the reference
        buffers in memory and flushes here, index_updater.py:176-273; Spark
        writes are immediate)."""
