"""Sources: TSV round-trips, format validation, pid assignment, splitter."""

from __future__ import annotations

import numpy as np
import pytest
import pyspark.sql.functions as F

from colbert_spark.sources.collection import (
    assign_pids,
    load_collection_tsv,
    save_collection_tsv,
)
from colbert_spark.sources.queries import (
    docs2passages,
    load_qrels_tsv,
    load_queries_tsv,
    save_queries_tsv,
)
from colbert_spark.sources.ranking import Ranking


def test_assign_pids_dense_and_deterministic(spark):
    rows = [(f"https://x.org/{i:05d}", f"doc {i}") for i in (5, 3, 9, 1, 7)]
    docs = spark.createDataFrame(rows, "url string, text string")
    a = {r["url"]: r["pid"] for r in assign_pids(docs, "url", 3).collect()}
    b = {r["url"]: r["pid"] for r in
         assign_pids(docs.repartition(5), "url", 2).collect()}
    assert a == b  # partitioning-independent
    urls = sorted(a)
    assert [a[u] for u in urls] == [0, 1, 2, 3, 4]  # dense, order-of-url


def test_collection_tsv_roundtrip_and_title_concat(spark, tmp_path):
    p = tmp_path / "col.tsv"
    p.write_text("0\tfirst passage\tTitle A\n1\tsecond passage\tTitle B\n")
    df = load_collection_tsv(spark, str(p))
    rows = {r["pid"]: r["text"] for r in df.collect()}
    # title concatenated 'title | passage' (loaders.py:164)
    assert rows[0] == "Title A | first passage"
    out = tmp_path / "out"
    save_collection_tsv(df, str(out))
    back = spark.read.csv(str(out), sep="\t").count()
    assert back == 2


def test_queries_tsv_uniqueness_enforced(spark, tmp_path):
    p = tmp_path / "q.tsv"
    p.write_text("1\talpha\n1\tbeta\n")
    with pytest.raises(ValueError, match="unique"):
        load_queries_tsv(spark, str(p))
    p2 = tmp_path / "q2.tsv"
    p2.write_text("1\talpha\n2\tbeta\n")
    assert load_queries_tsv(spark, str(p2)).count() == 2


def test_qrels_format_validated(spark, tmp_path):
    good = tmp_path / "good.tsv"
    good.write_text("1\t0\t10\t1\n1\t0\t10\t1\n2\t0\t20\t1\n")
    df = load_qrels_tsv(spark, str(good))
    assert df.count() == 2  # deduped
    bad = tmp_path / "bad.tsv"
    bad.write_text("1\t9\t10\t1\n")
    with pytest.raises(ValueError, match="format"):
        load_qrels_tsv(spark, str(bad))


def test_ranking_tsv_roundtrip_with_meta(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, 10, 1, 3.5), (1, 11, 2, 2.5)],
        "qid long, pid long, rank int, score double",
    )
    r = Ranking(df, provenance={"k": 2})
    path = r.save(str(tmp_path / "r.tsv"))
    assert (tmp_path / "r.tsv.meta").exists()
    back = Ranking.load(spark, path)
    assert back.flat_ranking() == [(1, 10, 1, 3.5), (1, 11, 2, 2.5)]
    assert back.todict() == {1: [(10, 1, 3.5), (11, 2, 2.5)]}


def test_docs2passages_windows(spark):
    docs = spark.createDataFrame(
        [(0, " ".join(f"w{i}" for i in range(45))), (1, "short doc")],
        "pid long, text string",
    )
    out = docs2passages(docs, max_words=20).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["passage_idx"], r["passage"]))
    assert len(by_doc[0]) == 3  # 20 + 20 + 5
    assert by_doc[0][0][1].startswith("w0 ") and by_doc[0][2][1].endswith("w44")
    assert len(by_doc[1]) == 1


def test_unicode_and_degenerate_docs(spark, tmp_path):
    """Robustness: unicode, empty, punctuation-only docs index and search
    without errors and never appear for unrelated queries."""
    from colbert_spark.plans.config import ColBERTConfig
    from colbert_spark.plans.indexer import Indexer
    from colbert_spark.plans.searcher import Searcher

    docs = spark.createDataFrame(
        [(0, "Héllo wörld ünïcode text"), (1, ""), (2, "!!! ??? ..."),
         (3, "plain english words here"), (4, "数据 处理 引擎")],
        "pid long, text string",
    )
    cfg = ColBERTConfig(index_root=str(tmp_path), index_partitions=4,
                        shuffle_partitions=4)
    Indexer(cfg).index("uni", docs, overwrite=True)
    s = Searcher("uni", spark, cfg)
    pids, _, _ = s.search("english words", k=5)
    assert pids == [3]
    # the ascii-token rule splits on non-alnum: 'h' 'llo' 'w' 'rld'...
    pids2, _, _ = s.search("llo", k=5)
    assert pids2 == [0]


def test_split_by_queries(spark, tmp_path):
    from colbert_spark.sources.ranking import split_by_queries

    ranking = spark.createDataFrame(
        [(q, 10 + q, 1, 5.0) for q in range(6)],
        "qid long, pid long, rank int, score double",
    )
    paths = split_by_queries(
        ranking, {"dev": [0, 1], "test": [2, 3]}, str(tmp_path / "splits")
    )
    dev = {r["qid"] for r in spark.read.parquet(paths["dev"]).collect()}
    rest = {r["qid"] for r in spark.read.parquet(paths["_rest"]).collect()}
    assert dev == {0, 1} and rest == {4, 5}
