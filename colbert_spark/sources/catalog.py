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

    # --- json sidecars -----------------------------------------------------
    def write_json(self, name: str, obj: dict) -> None:
        self.root.mkdir(parents=True, exist_ok=True)
        (self.root / name).write_text(json.dumps(obj, indent=2, sort_keys=True))

    def read_json(self, name: str) -> dict:
        return json.loads((self.root / name).read_text())

    def delete(self) -> None:
        import shutil

        if self.root.exists():
            shutil.rmtree(self.root)
