"""Index segment merging — N independently built indexes → ONE index
with globally exact statistics.

The distributed-build complement of the Indexer: shard corpora build in
parallel (per crawl slice, per pid range), then merge_indexes folds the
shards bottom-up into one searchable index — Lucene's segment-merge
semantics at the index level. Unlike appending (IndexUpdater.add, which
FREEZES the base index's statistics), a merge recomputes every global
statistic exactly — num_docs, avgdl, per-term df/cf/idf, block-max
scores — so searching the merged index is bit-identical to having
indexed the union corpus in one build (the driver-checked contract of
the `search_after_merge` oracle entry).

No id remapping is needed anywhere: term_id is content-derived
(xxhash64 of the term, builder.term_dict_from_agg), so the same term in
two shards already carries the same id, and shard pid spaces are
required to be disjoint (guarded — a collision would silently merge two
documents' postings).

Reference analog: the reference merges sharded RANKINGS
(utility/rankings/merge.py, ranking_shard_merge entry) but has no index
merge — its single-machine index never shards. At 10^12 documents the
build itself must shard; this is the fold step.

Plan shape (r6 hybrid payload feed): the stats pass reads per-block
(df, cf) partials from the tf payloads (builder.block_term_stats — one
row per BLOCK shuffles, not per posting), and the re-blockify ships
single-salt terms' blocks through the (term_id, salt) exchange STILL
ENCODED (~1-2 bytes/posting) — only multi-salt (hot) terms' postings
flatten to rows; tombstones fold inside the kernel epoch-bounded
(builder._payload_blockify, byte-identical to the flat path by pytest).
When the union of source tombstones exceeds the task-closure bound the
original shape runs instead: per shard ONE flat block decode
(builder.live_flat_postings — mapInPandas, no grouping, tombstones
anti-joined) into the df-proportional salted re-blockify
(builder._salted_blockify), one corpus-sized exchange of 5 longs/row.
"""

from __future__ import annotations

import time
from dataclasses import asdict
from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from colbert_spark.functions import bm25
from colbert_spark.operators import builder
from colbert_spark.plans.config import ColBERTConfig
from colbert_spark.plans.indexer import MANIFEST_SCHEMA
from colbert_spark.sources.catalog import make_catalog


def _live_doc_stats(catalog, spark: SparkSession) -> DataFrame:
    """(pid, doclen) minus actively-tombstoned pids (readded stays)."""
    d = catalog.read(spark, "doc_stats").select("pid", "doclen")
    if catalog.table_exists("tombstones"):
        t = catalog.read(spark, "tombstones")
        gone = (
            t.filter(F.col("readded").isNull()) if "readded" in t.columns
            else t
        ).select("pid")
        d = d.join(gone, "pid", "left_anti")
    return d


def merge_indexes(
    spark: SparkSession,
    source_names: list[str],
    dest_name: str,
    config: ColBERTConfig | None = None,
    overwrite: bool = False,
) -> str:
    """Merge the named source indexes into a fresh index `dest_name`.

    Every global statistic is recomputed from the union of live
    postings, so frozen-stats drift from the shards' builds (or from
    appends into them) is erased — the merged index scores exactly as a
    fresh full-corpus build. Sources are untouched. Returns the dest
    index root.

    A SINGLE source is the optimize / stats-refresh merge (Lucene
    forceMerge(1) analog): after a run of IndexUpdater appends and
    removals, merging the index into a fresh name folds the tombstones
    physically AND erases the frozen-stats approximation in one pass —
    the finishing step of an incremental-crawl cycle (the
    `incremental_crawl_search` oracle entry drives it end-to-end).
    """
    if not source_names:
        raise ValueError("merge_indexes needs at least one source index")
    cfg = ColBERTConfig.from_existing(config)
    cfg.index_name = dest_name
    dest = make_catalog(cfg)
    if dest.exists():
        if not overwrite:
            raise FileExistsError(
                f"index {dest.root} exists; pass overwrite=True")
        dest.delete()

    srcs = []
    for nm in source_names:
        c = ColBERTConfig.from_existing(config)
        c.index_name = nm
        cat = make_catalog(c)
        if not cat.exists():
            raise FileNotFoundError(f"source index {cat.root} not found")
        meta = cat.read_json("metadata.json")
        src_maxlen = meta.get("config", {}).get("doc_maxlen")
        if src_maxlen is not None and src_maxlen != cfg.doc_maxlen:
            # tf/doclen are analyzer products — merging across analyzer
            # settings would mix incomparable statistics
            raise ValueError(
                f"source {nm} was built with doc_maxlen={src_maxlen}, "
                f"dest config has {cfg.doc_maxlen}")
        srcs.append(cat)

    t0 = time.monotonic()
    # hybrid payload feed (r6): when the union of source tombstones fits
    # a task closure, postings never flatten into per-row form — the
    # stats pass reads per-block tf partials and the re-blockify ships
    # single-salt terms' blocks through the exchange still encoded
    # (builder._payload_blockify). Otherwise the original flat-decode
    # path runs (its anti-join handles tombstone sets of any size).
    tomb = builder._collect_tombstones(srcs, spark)
    flat = None
    if tomb is not None:
        blocks_all = reduce(
            DataFrame.unionByName,
            [cat.read(spark, "postings")
             .select("term_id", "block_id", "pids", "tfs", "dls")
             for cat in srcs],
        )
        tagg = builder.block_term_stats(blocks_all, tomb).persist()
    else:
        flat = reduce(
            DataFrame.unionByName,
            [builder.live_flat_postings(cat, spark) for cat in srcs],
        )
        if cfg.cache_tokens:
            # the flat decode feeds BOTH the stats pass and the
            # re-blockify — same persist knob as the Indexer's token cache
            flat = flat.persist()
        tagg = flat.groupBy("term_id").agg(
            F.count(F.lit(1)).alias("df"),
            F.sum("tf").alias("cf"),
        ).persist()
    doc_stats_df = reduce(
        DataFrame.unionByName, [_live_doc_stats(c, spark) for c in srcs]
    ).persist()

    # ONE driver action for every merged statistic (the Indexer's stats
    # discipline): corpus stats × term-level totals
    row = (
        doc_stats_df.agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("pid").alias("n_pids"),
            F.avg("doclen").alias("avgdl"),
        )
        .crossJoin(tagg.agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum("df").alias("num_postings"),
        ))
        .collect()[0]
    )
    num_docs = int(row["n"])
    if num_docs == 0:
        raise ValueError("merged indexes contain no live documents")
    if int(row["n_pids"]) != num_docs:
        raise ValueError(
            f"pid spaces of merged indexes must be disjoint: {num_docs} "
            f"doc rows, {int(row['n_pids'])} distinct pids")
    avgdl = float(row["avgdl"])
    n_terms = int(row["n_terms"] or 0)
    num_postings = int(row["num_postings"] or 0)

    # merged dictionary: term strings from the shard dicts (identical
    # term_id for the same term — content-derived), stats recomputed;
    # terms whose postings are all tombstoned drop at the inner join
    terms = reduce(
        DataFrame.unionByName,
        [c.read(spark, "term_dict").select("term", "term_id") for c in srcs],
    ).distinct()
    term_dict = terms.join(tagg, "term_id").select(
        "term", "term_id", "df", "cf",
        bm25.idf(F.col("df"), num_docs).alias("idf"),
    ).persist()

    dict_slice = term_dict.select(
        "term_id",
        F.greatest(
            F.lit(1),
            F.ceil(F.col("df") / F.lit(cfg.max_group_postings)),
        ).cast("long").alias("n_salts"),
    )
    if tomb is not None:
        merged = builder._payload_blockify(
            blocks_all, dict_slice, term_dict.select("term_id", "idf"),
            avgdl, cfg, tomb,
        )
    else:
        enriched = flat.join(F.broadcast(dict_slice), "term_id").select(
            "term_id", "pid", "tf", "doclen",
            F.pmod(F.xxhash64("pid"), F.col("n_salts")).alias("salt"),
        )
        merged = builder._salted_blockify(
            enriched, avgdl, cfg,
            idf_table=term_dict.select("term_id", "idf"),
        )
    # overlap the three stats-table writes with the postings write (none
    # depends on the postings; their tasks back-fill the write's tail —
    # the Indexer's r6 finalize discipline). Manifest needs the written
    # postings and metadata.json stays last.
    from concurrent.futures import ThreadPoolExecutor

    stats_df = spark.createDataFrame(
        [(num_docs, avgdl, n_terms, num_postings)],
        "num_docs long, avg_doclen double, num_terms long, num_postings long",
    )
    with ThreadPoolExecutor(max_workers=4) as pool:
        futures = [
            pool.submit(dest.write, term_dict, "term_dict"),
            pool.submit(dest.write, doc_stats_df, "doc_stats"),
            pool.submit(dest.write, stats_df, "corpus_stats"),
            pool.submit(
                dest.write,
                merged.repartition(cfg.index_partitions, "bucket")
                .sortWithinPartitions("term_id", "block_id"),
                "postings", "overwrite", ["bucket"],
            ),
        ]
        for fut in futures:
            fut.result()

    # finalize: manifest via one column-pruned read-back (never touches
    # the binary posting columns), small tables in one overlapped pool
    wall_ms = int((time.monotonic() - t0) * 1000)
    per_bucket = {
        r["bucket"]: r
        for r in dest.read(spark, "postings")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("num_blocks"),
            F.sum("num_postings").alias("num_postings"),
            F.sum("enc_bytes").alias("bytes_written"),
            F.bit_xor(
                F.xxhash64("term_id", "block_id", "first_pid",
                           "num_postings")
            ).alias("fp"),
        )
        .collect()
    } if num_postings > 0 else {}
    manifest = spark.createDataFrame(
        [
            (
                int(bkt),
                (str(per_bucket[bkt]["fp"]) if bkt in per_bucket else "empty"),
                int(per_bucket[bkt]["num_blocks"]) if bkt in per_bucket else 0,
                int(per_bucket[bkt]["num_postings"]) if bkt in per_bucket else 0,
                int(per_bucket[bkt]["bytes_written"]) if bkt in per_bucket else 0,
                wall_ms,
                "ok",
            )
            for bkt in range(cfg.index_partitions)
        ],
        MANIFEST_SCHEMA,
    )
    dest.write(manifest, "manifest")
    meta = {
        "config": asdict(cfg),
        "num_docs": num_docs,
        "avg_doclen": avgdl,
        "num_terms": n_terms,
        "num_postings": num_postings,
        "buckets_built_this_run": list(range(cfg.index_partitions)),
        "wall_ms": wall_ms,
        "merged_from": list(source_names),
    }
    dest.write_json("plan.json", meta)
    dest.write_json("metadata.json", meta)
    if flat is not None and cfg.cache_tokens:
        flat.unpersist()
    doc_stats_df.unpersist()
    tagg.unpersist()
    term_dict.unpersist()
    dest.refresh(spark)
    return str(dest.root)
