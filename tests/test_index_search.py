"""Indexer + Searcher end-to-end: the real (varint/block-max) engine must be
rank-identical to the brute-force scorer AND the Python oracle; gather and
scatter modes must agree; overwrite modes must follow indexer.py:60-82."""

from __future__ import annotations

import numpy as np
import pytest

from colbert_spark.operators.brute import bm25_topk
from colbert_spark.plans.config import ColBERTConfig
from colbert_spark.plans.indexer import Indexer
from colbert_spark.plans.searcher import Searcher
from colbert_spark.sources.datagen import gen_docs_pdf, gen_queries_pdf
from tests.oracle import bm25_topk as oracle_topk

N_DOCS = 300
N_QUERIES = 30


@pytest.fixture(scope="module")
def cfg(tmp_path_factory):
    return ColBERTConfig(
        index_root=str(tmp_path_factory.mktemp("indexes")),
        block_size=32,            # small blocks → exercise multi-block paths
        index_partitions=8,
        max_group_postings=50,   # head term (df≈200) gets 4+ salts
        shuffle_partitions=8,
    )


@pytest.fixture(scope="module")
def built(spark, cfg):
    docs_pdf = gen_docs_pdf(np.arange(N_DOCS))
    docs_pdf["pid"] = np.arange(N_DOCS)
    docs = spark.createDataFrame(docs_pdf[["pid", "text"]])
    queries_pdf = gen_queries_pdf(np.arange(N_QUERIES))
    queries = spark.createDataFrame(queries_pdf)
    Indexer(cfg).index("t1", docs, overwrite=True)
    searcher = Searcher("t1", spark, cfg)
    return docs, queries, docs_pdf, queries_pdf, searcher


def _todict(rows):
    out = {}
    for r in rows:
        out.setdefault(r["qid"], []).append((r["pid"], r["rank"], r["score"]))
    return out


def test_gather_matches_oracle(spark, built):
    _, queries, docs_pdf, queries_pdf, searcher = built
    got = _todict(searcher.search_all(queries, k=10).df.orderBy("qid", "rank").collect())
    exp = oracle_topk(
        dict(zip(docs_pdf["pid"], docs_pdf["text"])),
        dict(zip(queries_pdf["qid"], queries_pdf["text"])),
        k=10,
    )
    for qid, e in exp.items():
        g = got.get(qid, [])
        assert [(p, r) for p, r, _ in g] == [(p, r) for p, r, _ in e], f"qid={qid}"
        for (gp, _, gs), (_, _, es) in zip(g, e):
            assert gs == pytest.approx(es, abs=1e-6)


def test_scatter_equals_gather(spark, built):
    _, queries, _, _, searcher = built
    a = _todict(searcher.search_all(queries, k=10, mode="gather").df.collect())
    b = _todict(searcher.search_all(queries, k=10, mode="scatter").df.collect())
    assert a == b


def test_index_engine_equals_brute(spark, built):
    docs, queries, _, _, searcher = built
    brute = _todict(bm25_topk(docs, queries, k=10).collect())
    eng = _todict(searcher.search_all(queries, k=10).df.collect())
    assert eng == brute


def test_single_query_api(spark, built):
    _, _, _, queries_pdf, searcher = built
    text = queries_pdf["text"].iloc[0]
    pids, ranks, scores = searcher.search(text, k=5)
    assert ranks == list(range(1, len(pids) + 1))
    assert scores == sorted(scores, reverse=True)
    assert len(pids) <= 5


def test_pid_allowlist_filter(spark, built):
    _, _, docs_pdf, queries_pdf, searcher = built
    text = queries_pdf["text"].iloc[1]
    full_pids, _, _ = searcher.search(text, k=10)
    assert len(full_pids) >= 3
    allowed = full_pids[2:]  # drop the top-2 docs
    pids, _, _ = searcher.search(text, k=10, pids=allowed)
    assert set(pids).issubset(set(allowed))
    assert pids[0] == full_pids[2]


def test_search_after_indexed_both_modes(spark, built):
    """Indexed keyset pagination: page 2 via a rank-5 cursor must equal
    ranks 6-10 of the deep ranking rebased, in BOTH gather and scatter
    modes, and match brute.bm25_search_after row-for-row. Queries
    without a cursor are not searched (continue-only contract)."""
    import pyspark.sql.functions as F

    from colbert_spark.operators.brute import bm25_search_after

    docs, queries, _, _, searcher = built
    deep = searcher.search_all(queries, k=15).df.collect()
    by_q: dict[int, list] = {}
    for r in sorted(deep, key=lambda r: (r.qid, r.rank)):
        by_q.setdefault(r.qid, []).append((r.pid, r.score))
    cur_rows = [(q, rows[4][1], rows[4][0])
                for q, rows in by_q.items() if len(rows) >= 5]
    assert len(cur_rows) >= 5  # fixture sanity: enough deep queries
    # drop one cursor: that qid must disappear from every page-2 result
    dropped = cur_rows[0][0]
    cursors = spark.createDataFrame(
        cur_rows[1:], "qid long, after_score double, after_pid long")

    want = sorted(
        (q, i + 1, rows[5 + i][0], rows[5 + i][1])
        for q, rows in by_q.items()
        if len(rows) >= 5 and q != dropped
        for i in range(min(5, len(rows) - 5)))

    for mode in ("gather", "scatter"):
        got = sorted(
            (r.qid, r.rank, r.pid, r.score)
            for r in searcher.search_all(queries, k=5, mode=mode,
                                         after=cursors).df.collect())
        assert got == want, mode
        assert all(q != dropped for q, *_ in got)

    brute_got = sorted(
        (r.qid, r.rank, r.pid, r.score)
        for r in bm25_search_after(docs, queries, cursors, k=5).collect())
    assert brute_got == want


def test_overwrite_modes(spark, built, cfg):
    docs, _, _, _, _ = built
    with pytest.raises(FileExistsError):
        Indexer(cfg).index("t1", docs, overwrite=False)
    p = Indexer(cfg).index("t1", docs, overwrite="reuse")
    assert p.endswith("t1")


def test_empty_query_and_oov(spark, built):
    _, _, _, _, searcher = built
    pids, ranks, scores = searcher.search("zzabsent qqmissing", k=5)
    assert pids == [] and ranks == [] and scores == []


def test_auto_mode_selects_and_matches(spark, built):
    _, queries, _, _, searcher = built
    auto = _todict(searcher.search_all(queries, k=10, mode="auto").df.collect())
    gather = _todict(searcher.search_all(queries, k=10, mode="gather").df.collect())
    assert auto == gather
    # huge batch heuristic: many queries → scatter (results identical anyway)
    searcher2 = searcher
    old = searcher2._AUTO_SCATTER_QUERIES
    try:
        searcher2._AUTO_SCATTER_QUERIES = 1
        forced = _todict(searcher2.search_all(queries, k=10, mode="auto").df.collect())
        assert forced == gather
    finally:
        searcher2._AUTO_SCATTER_QUERIES = old


def test_degenerate_corpora(spark, tmp_path):
    """Empty collection → clear ValueError; a corpus that tokenizes to
    nothing (binary-only/punctuation pages) builds an empty-postings
    index and searches cleanly."""
    import pytest as _pytest

    from colbert_spark.plans.config import ColBERTConfig
    from colbert_spark.plans.indexer import Indexer
    from colbert_spark.plans.searcher import Searcher

    cfg = ColBERTConfig(index_root=str(tmp_path / "idx"),
                        index_partitions=8, shuffle_partitions=4)
    empty = spark.createDataFrame([], "pid long, text string")
    with _pytest.raises(ValueError, match="empty collection"):
        Indexer(cfg).index("empty", empty, overwrite=True)

    punct = spark.createDataFrame(
        [(i, "!!! ... ???") for i in range(5)], "pid long, text string")
    Indexer(cfg).index("punct", punct, overwrite=True)
    s = Searcher("punct", spark, cfg)
    assert s.search("anything", k=3) == ([], [], [])
    assert s.num_docs == 5 and s.avgdl == 0.0


def test_duplicate_pids_rejected(spark, tmp_path):
    import pytest as _pytest

    from colbert_spark.plans.config import ColBERTConfig
    from colbert_spark.plans.indexer import Indexer

    cfg = ColBERTConfig(index_root=str(tmp_path / "idx"),
                        index_partitions=8, shuffle_partitions=4)
    dups = spark.createDataFrame(
        [(1, "a b c"), (1, "d e f"), (2, "g h i")], "pid long, text string")
    with _pytest.raises(ValueError, match="pids must be unique"):
        Indexer(cfg).index("dups", dups, overwrite=True)
