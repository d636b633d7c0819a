"""End-to-end: brute-force Spark BM25 vs the pure-Python oracle —
rank-identical docIDs AND scores at k=10 (BASELINE.json north_rule)."""

from __future__ import annotations

import pytest

from colbert_spark.operators.brute import bm25_topk
from colbert_spark.sources.datagen import gen_docs_pdf, gen_queries_pdf
from tests.oracle import bm25_topk as oracle_topk

import numpy as np

N_DOCS = 400
N_QUERIES = 40


@pytest.fixture(scope="module")
def corpus(spark):
    docs_pdf = gen_docs_pdf(np.arange(N_DOCS))
    docs_pdf["pid"] = np.arange(N_DOCS)  # urls sort in doc_id order by construction
    queries_pdf = gen_queries_pdf(np.arange(N_QUERIES))
    docs = spark.createDataFrame(docs_pdf[["pid", "url", "text"]])
    queries = spark.createDataFrame(queries_pdf)
    return docs, queries, docs_pdf, queries_pdf


def test_rank_identical_to_oracle(spark, corpus):
    docs, queries, docs_pdf, queries_pdf = corpus
    got = (
        bm25_topk(docs, queries, k=10)
        .orderBy("qid", "rank")
        .collect()
    )
    expected = oracle_topk(
        dict(zip(docs_pdf["pid"], docs_pdf["text"])),
        dict(zip(queries_pdf["qid"], queries_pdf["text"])),
        k=10,
    )
    got_by_qid: dict[int, list] = {}
    for r in got:
        got_by_qid.setdefault(r["qid"], []).append((r["pid"], r["rank"], r["score"]))

    for qid, exp in expected.items():
        g = got_by_qid.get(qid, [])
        assert [(p, r) for p, r, _ in g] == [(p, r) for p, r, _ in exp], (
            f"qid={qid} rank mismatch\n got={g}\n exp={exp}"
        )
        for (gp, gr, gs), (ep, er, es) in zip(g, exp):
            assert gs == pytest.approx(es, abs=1e-6), f"qid={qid} pid={gp}"


def test_empty_postings_query_returns_partial_or_no_rows(spark, corpus):
    # queries containing only OOV terms must produce no rows, not errors
    docs, _, _, _ = corpus
    q = spark.createDataFrame([(999, "zzabsent qqmissing")], "qid long, text string")
    assert bm25_topk(docs, q, k=10).count() == 0


def test_deterministic_across_runs(spark, corpus):
    docs, queries, _, _ = corpus
    a = sorted(map(tuple, bm25_topk(docs, queries, k=5).collect()))
    b = sorted(map(tuple, bm25_topk(docs, queries, k=5).collect()))
    assert a == b


def test_search_after_equals_offset_pages(spark, corpus):
    """Keyset page 2/3 (cursor = last row of the previous page) must be
    row-identical to ranks r+1..r+k of one deep ranking, rebased."""
    import pyspark.sql.functions as F

    from colbert_spark.operators.brute import bm25_search_after

    docs, queries, _, _ = corpus
    deep = bm25_topk(docs, queries, k=30).collect()
    by_q: dict[int, list] = {}
    for r in sorted(deep, key=lambda r: (r.qid, r.rank)):
        by_q.setdefault(r.qid, []).append((r.pid, r.score))

    for page_start in (5, 10):
        cur_rows = [(q, rows[page_start - 1][1], rows[page_start - 1][0])
                    for q, rows in by_q.items() if len(rows) >= page_start]
        cursors = spark.createDataFrame(
            cur_rows, "qid long, after_score double, after_pid long")
        got = sorted(
            (r.qid, r.rank, r.pid, r.score)
            for r in bm25_search_after(docs, queries, cursors, k=5).collect())
        want = sorted(
            (q, i + 1, rows[page_start + i][0], rows[page_start + i][1])
            for q, rows in by_q.items() if len(rows) >= page_start
            for i in range(min(5, len(rows) - page_start)))
        assert got == want, page_start


def test_search_after_tie_boundary(spark):
    """Cursor landing inside a score tie: pids above the cursor pid stay
    excluded, pids after it qualify (the (score, pid) keyset contract)."""
    from colbert_spark.operators.brute import bm25_search_after

    # four identical docs tie exactly; one weaker doc ranks last
    docs = spark.createDataFrame(
        [(0, "apple pie"), (1, "apple pie"), (2, "apple pie"),
         (3, "apple pie"), (4, "apple and a lot of other words here")],
        "pid long, text string")
    q = spark.createDataFrame([(0, "apple")], "qid long, text string")
    deep = sorted(bm25_topk(docs, q, k=10).collect(), key=lambda r: r.rank)
    assert [r.pid for r in deep] == [0, 1, 2, 3, 4]
    tie_score = deep[0].score
    assert deep[1].score == tie_score  # genuine tie

    cursors = spark.createDataFrame(
        [(0, tie_score, 1)], "qid long, after_score double, after_pid long")
    got = sorted((r.rank, r.pid) for r in
                 bm25_search_after(docs, q, cursors, k=10).collect())
    assert got == [(1, 2), (2, 3), (3, 4)]
