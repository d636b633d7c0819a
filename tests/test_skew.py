"""Skew handling evidence (north_rule): the head term (present in ≥60% of
docs, FIXTURES.md) must be built as multiple bounded salted runs, and no
single build group may exceed max_group_postings."""

from __future__ import annotations

import numpy as np
import pytest
import pyspark.sql.functions as F

from colbert_spark.plans.config import ColBERTConfig
from colbert_spark.plans.indexer import Indexer
from colbert_spark.plans.searcher import Searcher
from colbert_spark.sources.catalog import IndexCatalog
from colbert_spark.sources.datagen import HEAD_TERM, gen_docs_pdf, gen_queries_pdf


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    cfg = ColBERTConfig(
        index_root=str(tmp_path_factory.mktemp("idx")),
        index_partitions=8, max_group_postings=64, block_size=32,
        shuffle_partitions=8,
    )
    docs_pdf = gen_docs_pdf(np.arange(400))
    docs_pdf["pid"] = np.arange(400)
    docs = spark.createDataFrame(docs_pdf[["pid", "text"]])
    path = Indexer(cfg).index("skew", docs, overwrite=True)
    cat = IndexCatalog(path)
    return cfg, cat, docs_pdf


def test_head_term_is_salted_proportionally(spark, built):
    cfg, cat, docs_pdf = built
    term_dict = {r["term"]: r for r in cat.read(spark, "term_dict").collect()}
    head = term_dict[HEAD_TERM]
    assert head["df"] >= 0.5 * 400  # the fixture's forced skew is real
    blocks = (
        cat.read(spark, "postings")
        .filter(F.col("term_id") == head["term_id"])
        .select("block_id", "num_postings")
        .collect()
    )
    salts = {b["block_id"] >> 32 for b in blocks}
    expected_salts = -(-head["df"] // cfg.max_group_postings)  # ceil
    assert len(salts) == expected_salts and expected_salts >= 2


def test_no_build_group_exceeds_bound(spark, built):
    cfg, cat, _ = built
    # per (term_id, salt) postings — reconstruct group sizes from block ids
    per_group = (
        cat.read(spark, "postings")
        .groupBy("term_id", F.expr("shiftright(block_id, 32)").alias("salt"))
        .agg(F.sum("num_postings").alias("n"))
    )
    too_big = per_group.filter(
        # hash salting is uniform, not exact — allow 2x headroom
        F.col("n") > 2 * cfg.max_group_postings
    ).count()
    assert too_big == 0


def test_skewed_query_is_exact(spark, built):
    """Queries containing the head term remain rank-exact (salting must not
    change scoring)."""
    cfg, _, docs_pdf = built
    from tests.oracle import bm25_topk as oracle_topk

    queries_pdf = gen_queries_pdf(np.arange(40))
    head_queries = queries_pdf[queries_pdf["text"].str.contains(HEAD_TERM)]
    if head_queries.empty:
        head_queries = queries_pdf.head(3).copy()
        head_queries["text"] = HEAD_TERM + " " + head_queries["text"]
    queries = spark.createDataFrame(head_queries)
    got = Searcher("skew", spark, cfg).search_all(queries, k=10).todict()
    exp = oracle_topk(
        dict(zip(docs_pdf["pid"], docs_pdf["text"])),
        dict(zip(head_queries["qid"], head_queries["text"])),
        k=10,
    )
    for qid, e in exp.items():
        assert [(p, r) for p, r, _ in got.get(qid, [])] == \
               [(p, r) for p, r, _ in e], f"qid={qid}"


def test_many_queries_sharing_head_term_scatter_equals_gather(spark, built):
    """The shuffle-amplification scenario: many queries all containing the
    head term (≥60% df). Scatter (decode-once) and gather (per-query
    groups) must produce identical rankings — and auto mode must pick
    scatter for a batch this large."""
    cfg, _, _ = built
    searcher = Searcher("skew", spark, cfg)
    queries = spark.createDataFrame(
        [(q, f"{HEAD_TERM} t{q % 19:05d}") for q in range(100)],
        "qid long, text string",
    )
    g = sorted(searcher.search_all(queries, k=10, mode="gather")
               .flat_ranking())
    s = sorted(searcher.search_all(queries, k=10, mode="scatter")
               .flat_ranking())
    assert g == s and len(g) > 0
    auto = searcher.search_all(queries, k=10, mode="auto")
    assert auto.provenance["mode"] == "scatter"  # 100 queries > threshold
    assert sorted(auto.flat_ranking()) == g
