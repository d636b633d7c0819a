"""Index storage layout — the engine's on-disk catalog.

Plain Parquet with an Iceberg-compatible layout (SURVEY.md §7.0: the
sandbox has no Iceberg runtime jar; this module is the single abstraction
point — swap `read`/`write` for `spark.read.table` / `df.writeTo(...)` on a
real cluster and nothing else changes).

Layout under <index_root>/<index_name>/ (analog of the reference's index
directory of {chunk}.codes.pt / ivf.pid.pt / metadata.json,
colbert/indexing/collection_indexer.py:346-356,484-497):

    term_dict/      (term, term_id, df, cf, idf)            small
    corpus_stats/   (num_docs, avg_doclen, num_terms, num_postings)  1 row
    doc_stats/      (pid, doclen)                           1 row/doc
    postings/       bucket=<b>/ part-*.parquet              the index
        (term_id, block_id, first_pid, last_pid, num_postings,
         max_block_score, pids bin, tfs bin, dls bin)
    manifest/       (bucket, input_fingerprint, num_blocks, num_postings,
                     bytes_written, wall_ms, status)        resume/lineage
    metadata.json   config + global stats
    plan.json       build plan (written before work starts; drives resume)

`bucket = pmod(term_id, index_partitions)` and postings files are sorted by
(term_id, block_id) within each bucket, so query-time reads prune both at
the partition level (bucket=) and the row-group level (term_id min/max).
"""

from __future__ import annotations

import json
import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

POSTINGS_SCHEMA = (
    "term_id long, block_id long, first_pid long, last_pid long, "
    "num_postings int, max_block_score double, pids binary, tfs binary, "
    "dls binary, enc_bytes int"
)


class IndexCatalog:
    def __init__(self, index_path: str):
        self.root = Path(index_path)

    # --- paths -----------------------------------------------------------
    def path(self, table: str) -> str:
        return str(self.root / table)

    @property
    def metadata_path(self) -> Path:
        return self.root / "metadata.json"

    @property
    def plan_path(self) -> Path:
        return self.root / "plan.json"

    def exists(self) -> bool:
        return self.metadata_path.exists()

    def plan_exists(self) -> bool:
        return self.plan_path.exists()

    def table_exists(self, table: str) -> bool:
        """Cheap existence probe so optional tables (tombstones, manifest)
        don't go through a logged-and-caught AnalysisException."""
        return (self.root / table).exists()

    # --- tables ----------------------------------------------------------
    def read(self, spark: SparkSession, table: str) -> DataFrame:
        return spark.read.parquet(self.path(table))

    def write(self, df: DataFrame, table: str, mode: str = "overwrite",
              partition_by: list[str] | None = None) -> None:
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self.path(table))

    def replace(self, df: DataFrame, table: str,
                partition_by: list[str] | None = None) -> None:
        """Atomically-ish swap a table's contents with df (compaction /
        doc_stats rewrite). Parquet: write to <table>_tmp, then rename over
        the old dir — readers between the rmtree and rename can fail, which
        is the known parquet-layout limitation Iceberg's snapshot swap
        removes (IcebergIndexCatalog.replace is truly atomic)."""
        import shutil

        tmp = self.path(f"{table}_tmp")
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(tmp)
        if Path(self.path(table)).exists():
            shutil.rmtree(self.path(table))
        Path(tmp).rename(self.path(table))

    def delete_table(self, table: str) -> None:
        import shutil

        if Path(self.path(table)).exists():
            shutil.rmtree(self.path(table))

    def refresh(self, spark: SparkSession) -> None:
        """Drop Spark's cached file listings under the index root — required
        after any rename/delete that mutates files behind the FileStatusCache
        (no-op for a real table catalog, which versions snapshots)."""
        spark.catalog.refreshByPath(str(self.root))

    # --- targeted file rewrite (block-level index surgery) -----------------
    #: parquet layout supports swapping individual data files; a snapshot
    #: catalog (Iceberg) replaces this with row-level DELETE + append
    supports_file_rewrite = True
    _REWRITE_JOURNAL = "rewrite_pending.json"

    @staticmethod
    def _fs_path(f: str) -> Path:
        """input_file_name() yields URIs (file:///…); deletion needs paths."""
        from urllib.parse import urlparse

        return Path(urlparse(f).path) if "://" in f else Path(f)

    def rewrite_files(self, spark: SparkSession, table: str,
                      old_files: list[str], new_df: DataFrame,
                      partition_by: list[str] | None = None) -> None:
        """Replace exactly `old_files` of `table` with the rows of `new_df`,
        leaving every other data file untouched (the bounded-I/O primitive
        behind builder.purge_pids — the analog of the reference updater
        patching only affected chunks, colbert/index_updater.py:176-273).

        Crash-safe via a redo journal: new files are staged first, then a
        journal (staged paths + files-to-delete) is written atomically,
        then moves+deletes execute. A crash mid-mutation leaves the journal,
        and recover_pending_rewrite() re-executes the (idempotent) moves and
        deletes — the only reader-visible window is old+new files coexisting
        (transient double-count), strictly smaller than replace()'s
        documented whole-table rename window. Local-fs rename here; on
        HDFS/S3 the same sequence runs through the FileSystem API."""
        staging = Path(self.path(f"_{table}_rewrite_staging"))
        if staging.exists():
            import shutil

            shutil.rmtree(staging)  # abandoned pre-journal attempt
        w = new_df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(str(staging))
        self.write_json(self._REWRITE_JOURNAL, {
            "table": table,
            "delete": [str(self._fs_path(f)) for f in old_files],
        })
        self._redo_rewrite(spark)

    def has_pending_rewrite(self) -> bool:
        return (self.root / self._REWRITE_JOURNAL).exists()

    def recover_pending_rewrite(self, spark: SparkSession) -> bool:
        """Complete a crashed rewrite_files (no-op without a journal).
        Called by IndexUpdater/Searcher/purge entry points; safe to race —
        every step skips already-done work."""
        if not self.has_pending_rewrite():
            return False
        self._redo_rewrite(spark)
        return True

    def _redo_rewrite(self, spark: SparkSession) -> None:
        import shutil

        j = self.read_json(self._REWRITE_JOURNAL)
        table = j["table"]
        staging = Path(self.path(f"_{table}_rewrite_staging"))
        dest = Path(self.path(table))
        if staging.exists():
            # move staged part files in, preserving partition dirs; a redo
            # finds already-moved sources gone and skips them
            for f in sorted(staging.rglob("part-*")):
                rel = f.relative_to(staging)
                target = dest / rel
                target.parent.mkdir(parents=True, exist_ok=True)
                f.replace(target)
        for f in j["delete"]:
            p = Path(f)
            if p.exists():
                p.unlink()
            # Hadoop's LocalFileSystem writes a .{name}.crc checksum sibling
            # per data file; deleting only the data file strands the crc
            # forever (measured ~620 orphans after one forced full-surgery
            # purge), silently bloating every directory listing. HDFS/S3
            # keep checksums internally, so this sibling exists on local fs
            # only — unlink it alongside.
            (p.parent / f".{p.name}.crc").unlink(missing_ok=True)
        (self.root / self._REWRITE_JOURNAL).unlink(missing_ok=True)
        if staging.exists():
            shutil.rmtree(staging, ignore_errors=True)
        self.refresh(spark)

    # --- json sidecars -----------------------------------------------------
    def write_json(self, name: str, obj: dict) -> None:
        """Atomic: write-then-rename, so a crash mid-write can never leave
        a torn sidecar (the stream-append ledger is re-read on every
        micro-batch — a truncated JSON would wedge the stream until
        hand-repaired)."""
        self.root.mkdir(parents=True, exist_ok=True)
        tmp = self.root / f"{name}.{os.getpid()}.tmp"
        tmp.write_text(json.dumps(obj, indent=2, sort_keys=True))
        tmp.replace(self.root / name)

    def read_json(self, name: str) -> dict:
        return json.loads((self.root / name).read_text())

    def delete(self) -> None:
        import shutil

        if self.root.exists():
            shutil.rmtree(self.root)


class IcebergIndexCatalog(IndexCatalog):
    """Iceberg-backed index storage (SURVEY.md §1.1 S13 / §2.9 mapping).

    Selected by make_catalog when ColBERTConfig.iceberg_catalog names a
    configured Spark catalog (spark.sql.catalog.<name> =
    org.apache.iceberg.spark.SparkCatalog). Tables live at
    <catalog>.<namespace>.<table>; JSON sidecars (plan/metadata) stay on
    the filesystem at index_root — they gate resume before any Spark job
    runs. Differences from the parquet layout:

    - replace() is a snapshot swap (createOrReplace) — truly atomic,
      concurrent readers keep the old snapshot (the parquet rename window
      disappears);
    - compaction can additionally use the engine-native
      `CALL <catalog>.system.rewrite_data_files` (compact_files());
    - refresh() is a no-op — snapshot isolation replaces the
      FileStatusCache workarounds.

    The sandbox has no Iceberg runtime jar, so this class is exercised
    only when one is on the classpath (tests skip otherwise, documented).
    """

    def __init__(self, index_path: str, catalog: str, namespace: str):
        super().__init__(index_path)
        self.catalog_name = catalog
        # iceberg identifiers: letters/digits/underscore
        self.ns = "".join(c if c.isalnum() else "_" for c in namespace)

    def ident(self, table: str) -> str:
        return f"{self.catalog_name}.{self.ns}.{table}"

    def _spark(self) -> SparkSession:
        return SparkSession.getActiveSession()

    def table_exists(self, table: str) -> bool:
        return self._spark().catalog.tableExists(self.ident(table))

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        return spark.read.table(self.ident(table))

    def write(self, df: DataFrame, table: str, mode: str = "overwrite",
              partition_by: list[str] | None = None) -> None:
        import pyspark.sql.functions as F

        w = df.writeTo(self.ident(table))
        if partition_by:
            w = w.partitionedBy(*[F.col(c) for c in partition_by])
        if mode == "append" and self.table_exists(table):
            w.append()
        else:
            w.createOrReplace()

    def replace(self, df: DataFrame, table: str,
                partition_by: list[str] | None = None) -> None:
        self.write(df, table, "overwrite", partition_by)

    #: Iceberg has no stable file identity to swap from the outside; the
    #: engine-native targeted purge is row-level DELETE (hit rows) + append
    #: (rewritten rows) under snapshot isolation — unexercised here (no
    #: runtime jar on this box), so builder.purge_pids falls back to the
    #: snapshot-atomic full coalesce on this backend until a cluster run
    #: validates the row-level path.
    supports_file_rewrite = False

    def compact_files(self, table: str = "postings") -> None:
        """Engine-native file compaction (small-file merge; orthogonal to
        coalesce_index's logical tombstone fold)."""
        self._spark().sql(
            f"CALL {self.catalog_name}.system.rewrite_data_files"
            f"('{self.ns}.{table}')"
        )

    def delete_table(self, table: str) -> None:
        self._spark().sql(f"DROP TABLE IF EXISTS {self.ident(table)}")

    def refresh(self, spark: SparkSession) -> None:
        pass  # snapshot isolation — nothing to invalidate

    def delete(self) -> None:
        import pyspark.sql.functions as F

        spark = self._spark()
        # the namespace may not exist yet (e.g. a crashed first build left
        # only json sidecars, then overwrite=True deletes before any table
        # write) — SHOW TABLES throws on a missing namespace
        ns_exists = spark.sql(
            f"SHOW NAMESPACES IN {self.catalog_name}"
        ).filter(F.col("namespace") == self.ns).count() > 0
        if not ns_exists:
            super().delete()
            return
        for row in spark.sql(
            f"SHOW TABLES IN {self.catalog_name}.{self.ns}"
        ).collect():
            spark.sql(
                f"DROP TABLE IF EXISTS "
                f"{self.catalog_name}.{self.ns}.{row['tableName']}"
            )
        super().delete()  # json sidecars


def make_catalog(config) -> IndexCatalog:
    """The single selection point between storage backends: Iceberg when
    config.iceberg_catalog names a configured catalog, parquet otherwise."""
    if getattr(config, "iceberg_catalog", ""):
        return IcebergIndexCatalog(
            config.index_path(), config.iceberg_catalog, config.index_name
        )
    return IndexCatalog(config.index_path())
