"""Streaming index maintenance (streaming/indexing.py): micro-batch
appends through IndexUpdater under frozen stats, exactly-once via the
batch-id ledger."""

from __future__ import annotations

import pathlib

import numpy as np
import pyspark.sql.functions as F

from colbert_spark.plans.config import ColBERTConfig
from colbert_spark.plans.indexer import Indexer
from colbert_spark.plans.index_updater import IndexUpdater
from colbert_spark.plans.searcher import Searcher
from colbert_spark.sources.catalog import IndexCatalog
from colbert_spark.sources.datagen import gen_docs_pdf, gen_queries_pdf
from colbert_spark.streaming.indexing import _apply_batch, stream_index_append


def _env(spark, tmp_path, name):
    cfg = ColBERTConfig(
        index_root=str(tmp_path), index_name=name, block_size=32,
        index_partitions=8, max_group_postings=50, shuffle_partitions=8,
    )
    docs_pdf = gen_docs_pdf(np.arange(150))
    docs_pdf["pid"] = np.arange(150)
    docs = spark.createDataFrame(docs_pdf[["pid", "text"]])
    queries = spark.createDataFrame(gen_queries_pdf(np.arange(10)))
    Indexer(cfg).index(name, docs, overwrite=True)
    return cfg, docs, queries


def _rank(spark, cfg, name, queries):
    return sorted(map(tuple, Searcher(name, spark, cfg)
                      .search_all(queries, k=10).df.collect()))


def test_stream_append_restores_removed_docs(spark, tmp_path):
    """Full build → remove 30 pids → stream the same 30 docs back in TWO
    micro-batches (file-per-trigger source) → rankings equal the original
    full-corpus build bit-for-bit (frozen stats = full stats, the
    search_after_update identity). A restart on the same checkpoint must
    be a no-op (source drained, ledger intact)."""
    cfg, docs, queries = _env(spark, tmp_path, "st1")
    before = _rank(spark, cfg, "st1", queries)

    up = IndexUpdater("st1", spark, cfg)
    victims = list(range(30))
    up.remove(victims)
    assert _rank(spark, cfg, "st1", queries) != before

    src = tmp_path / "stream_src"
    readd = docs.filter(F.col("pid") < 30)
    readd.filter(F.col("pid") < 15).coalesce(1).write.mode("overwrite") \
        .parquet(str(src))
    readd.filter(F.col("pid") >= 15).coalesce(1).write.mode("append") \
        .parquet(str(src))
    stream = (
        spark.readStream.schema(readd.schema)
        .option("maxFilesPerTrigger", 1).parquet(str(src))
    )
    ckpt = str(tmp_path / "stream_ckpt")
    q = stream_index_append(stream, "st1", cfg, ckpt)
    assert q.awaitTermination(180)  # False = timeout, fail loudly
    assert _rank(spark, cfg, "st1", queries) == before

    cat = IndexCatalog(str(pathlib.Path(cfg.index_root) / "st1"))
    applied = cat.read_json("stream_append.json")["applied"]
    assert len(applied) >= 2  # file-per-trigger → at least two batches

    # restart on the same checkpoint: source already consumed, no change
    n_blocks = cat.read(spark, "postings").count()
    q2 = stream_index_append(
        spark.readStream.schema(readd.schema)
        .option("maxFilesPerTrigger", 1).parquet(str(src)),
        "st1", cfg, ckpt,
    )
    assert q2.awaitTermination(120)
    assert cat.read(spark, "postings").count() == n_blocks
    assert _rank(spark, cfg, "st1", queries) == before


def test_apply_batch_redelivery_is_idempotent(spark, tmp_path):
    """Crash-redelivery contract: the same (batch_df, batch_id) applied
    twice appends exactly once — the second call hits the ledger and
    no-ops."""
    cfg, docs, queries = _env(spark, tmp_path, "st2")
    cat = IndexCatalog(str(pathlib.Path(cfg.index_root) / "st2"))
    new = spark.createDataFrame(
        [(1000, "zzstreamterm alpha beta"), (1001, "zzstreamterm gamma")],
        "pid long, text string",
    )
    assert _apply_batch(cfg, "st2", new, 7, "pid", "text") is True
    n_blocks = cat.read(spark, "postings").count()
    assert _apply_batch(cfg, "st2", new, 7, "pid", "text") is False
    assert cat.read(spark, "postings").count() == n_blocks
    pids, _, _ = Searcher("st2", spark, cfg).search("zzstreamterm", k=5)
    assert set(pids) == {1000, 1001}


def test_second_stream_incarnation_gets_fresh_batch_ids(spark, tmp_path):
    """Spark numbers every stream incarnation's batches from 0; the
    ledger keys on (stream_key, batch_id), so a NEW stream (new
    checkpoint) against the same index must not collide with the first
    stream's batch 0 — before the key, its first batches were silently
    dropped."""
    cfg, docs, queries = _env(spark, tmp_path, "st3")
    cat = IndexCatalog(str(pathlib.Path(cfg.index_root) / "st3"))
    a = spark.createDataFrame([(2000, "zzfirststream only")],
                              "pid long, text string")
    b = spark.createDataFrame([(3000, "zzsecondstream only")],
                              "pid long, text string")
    assert _apply_batch(cfg, "st3", a, 0, "pid", "text",
                        stream_key="ckptA") is True
    # second incarnation, same batch_id 0, different stream → must apply
    assert _apply_batch(cfg, "st3", b, 0, "pid", "text",
                        stream_key="ckptB") is True
    s = Searcher("st3", spark, cfg)
    assert s.search("zzsecondstream", k=5)[0] == [3000]
    # and re-delivery within each incarnation still no-ops
    assert _apply_batch(cfg, "st3", b, 0, "pid", "text",
                        stream_key="ckptB") is False
