"""Streaming index maintenance + event-time aggregation.

The reference has NO streaming operators (SURVEY.md §2.9) — its closest
analog is IndexUpdater's in-memory append (colbert/index_updater.py) and
the async chunk saver thread (index_saver.py:52-67). This module is the
Spark-native extension of that capability: a WARC-crawl-style document
stream lands in the same posting-segment format via foreachBatch →
IndexUpdater.add, which is exactly how a 100 TB crawl would feed the index
continuously (each micro-batch appends segments; periodic coalesce_index
compacts).

Also provides the standard event-time rollup (watermark + tumbling window)
over an events stream, since a training-data pipeline needs late-data-safe
ingestion metrics.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql.streaming import StreamingQuery

from colbert_spark.plans.config import ColBERTConfig
from colbert_spark.plans.index_updater import IndexUpdater


def stream_index(
    stream_docs: DataFrame,
    index: str,
    config: ColBERTConfig,
    checkpoint_dir: str,
    available_now: bool = True,
    id_col: str = "pid",
    text_col: str = "text",
) -> StreamingQuery:
    """Continuously append a document stream to an existing index.

    stream_docs: a streaming DataFrame with (pid, text). Each micro-batch
    appends posting segments under the index's frozen corpus stats
    (IndexUpdater.add semantics). Exactly-once per batch is delegated to
    the checkpoint: a replayed batch would trip add()'s duplicate-pid guard,
    so reprocessing is loud, not silent.
    """
    spark = stream_docs.sparkSession

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        IndexUpdater(index, spark, config).add(
            batch_df, id_col=id_col, text_col=text_col
        )

    writer = (
        stream_docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
    slide: str | None = None,
) -> DataFrame:
    """Late-data-safe windowed rollup over a (streaming or batch) events
    table: (window_start, window_end, key, n, sum_value). Tumbling by
    default; pass slide (e.g. "30 minutes") for sliding windows — each
    event then lands in window/slide overlapping windows (Spark expands
    them; the aggregation stays one shuffle).

    On a stream, the watermark bounds state: windows older than the
    watermark are finalized and evicted (append mode emits exactly once).
    The same expression works in batch for backfills — one definition,
    two execution modes.
    """
    df = events
    if df.isStreaming:
        # watermarks require TIMESTAMP (not NTZ); session TZ pinned to UTC
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        df = df.withWatermark(ts_col, watermark)
    win = (F.window(F.col(ts_col), window, slide) if slide
           else F.window(F.col(ts_col), window))
    return (
        df.groupBy(win.alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col, "n", "sum_value",
        )
    )


def stream_exact_dedup(
    docs: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup: drop documents whose normalized-text hash was
    already seen within the watermark horizon — the streaming twin of
    dedup.exact_dedup_keep_first for continuous ingestion pipelines.

    State is ONE 16-byte md5 per distinct text (never the text itself),
    and dropDuplicatesWithinWatermark evicts hashes older than the
    watermark, so state is bounded by distinct-docs-per-horizon rather
    than corpus size. In batch mode (backfills are finite) the survivor
    per duplicate group is the deterministic earliest row — min (ts, then
    remaining columns) via a window, matching exact_dedup_keep_first's
    keep-first contract; a bare dropDuplicates would keep an arbitrary
    row that varies with partitioning.
    """
    from colbert_spark.operators.dedup import normalized_text

    df = docs.withColumn("_h", F.md5(F.encode(normalized_text(text_col),
                                              "UTF-8")))
    if df.isStreaming:
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        df = df.withWatermark(ts_col, watermark)
        return df.dropDuplicatesWithinWatermark(["_h"]).drop("_h")
    # batch backfills without a timestamp column still get a deterministic
    # survivor: min over the remaining columns (a ts-less batch has no
    # "earliest", so lexicographic-min is the keep-first analog)
    lead = [F.asc(ts_col)] if ts_col in docs.columns else []
    order_cols = lead + [
        F.asc(c) for c in docs.columns if c not in (ts_col, "_h")
    ]
    w = Window.partitionBy("_h").orderBy(*order_cols)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_h", "_rn")
    )
