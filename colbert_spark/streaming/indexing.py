"""Continuous index maintenance: Structured Streaming micro-batches
appended to a live index through IndexUpdater.add — the streaming driver
for the §2.9 incremental-maintenance surface (reference
colbert/index_updater.py:97-148 add + :176-273 persist, cycled by a
stream instead of explicit calls).

Each micro-batch appends postings segments under the index's FROZEN
corpus stats (N/avgdl/idf unchanged — the same approximation the
reference makes by not retraining centroids); a periodic
`builder.coalesce_index` folds the accumulated segments, exactly as in
batch maintenance.

Exactly-once across restarts: Spark's streaming checkpoint guarantees a
failed micro-batch is RE-DELIVERED with the same batch_id, but
IndexUpdater.add is deliberately not idempotent (re-adding a live pid
raises). The appender therefore keeps a batch-id ledger in the index
sidecar (stream_append.json): a batch already in the ledger is skipped,
so re-delivery after a crash between the postings append and the
checkpoint commit cannot double-append. The ledger is written AFTER the
append — a crash between the two leaves the batch applied-but-unrecorded,
the one window where re-delivery would raise "already live" instead of
silently duplicating postings (fail-loud beats double-count; documented).

Pids must be unique across the stream's lifetime (dedup upstream with
stream_exact_dedup / dropDuplicatesWithinWatermark); a duplicate pid
fails the batch with the updater's "already live" error.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from colbert_spark.plans.config import ColBERTConfig
from colbert_spark.sources.catalog import make_catalog

_LEDGER = "stream_append.json"


def _apply_batch(cfg: ColBERTConfig, index: str, batch_df: DataFrame,
                 batch_id: int, id_col: str, text_col: str,
                 stream_key: str = "") -> bool:
    """Idempotently apply one micro-batch; returns True if it appended.
    Module-level so tests can drive re-delivery directly.

    Ledger entries are keyed (stream_key, batch_id), NOT bare batch_id:
    Spark numbers every stream incarnation's batches from 0, so a second
    stream (new checkpoint, new source) against the same index would
    collide with the first stream's entries and silently drop its early
    batches. stream_index_append passes its checkpoint_dir as the key —
    one checkpoint == one batch-numbering domain."""
    from colbert_spark.plans.index_updater import IndexUpdater

    catalog = make_catalog(cfg)
    try:
        ledger = catalog.read_json(_LEDGER)
    except FileNotFoundError:
        ledger = {"applied": []}
    entry = f"{stream_key}#{batch_id}"
    if entry in set(ledger["applied"]):
        return False
    if batch_df.take(1):
        IndexUpdater(index, batch_df.sparkSession, cfg).add(
            batch_df, id_col=id_col, text_col=text_col
        )
    ledger["applied"].append(entry)
    catalog.write_json(_LEDGER, ledger)
    return True


def stream_index_append(
    stream_docs: DataFrame,
    index: str,
    config: ColBERTConfig,
    checkpoint_dir: str,
    id_col: str = "pid",
    text_col: str = "text",
    available_now: bool = True,
):
    """Start the appender; returns the StreamingQuery.

    available_now=True drains the current source backlog and stops (the
    batch-backfill trigger); False runs continuously. The checkpoint_dir
    must be dedicated to this (index, source) pair — reusing it against a
    rebuilt index replays nothing (Spark considers the source consumed)
    while the rebuilt index has no ledger, so pair their lifetimes. The
    checkpoint_dir doubles as the ledger's stream key, so distinct
    streams (distinct checkpoints) never collide on batch numbering.
    """
    cfg = ColBERTConfig.from_existing(config)
    cfg.index_name = index

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        _apply_batch(cfg, index, batch_df, batch_id, id_col, text_col,
                     stream_key=checkpoint_dir)

    writer = (
        stream_docs.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
