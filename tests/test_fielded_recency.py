"""BM25F, time-decay rerank, boilerplate removal — hand-case tests."""

from __future__ import annotations

import math

import pytest

from colbert_spark import caching
from colbert_spark.functions import bm25
from colbert_spark.operators import fusion
from colbert_spark.operators.curation import remove_boilerplate_lines
from colbert_spark.operators.fielded import bm25f_topk


def test_bm25f_title_hit_outranks_body_hit(spark):
    # same term, same total token counts; doc 0 has it in the title
    fields = spark.createDataFrame(
        [
            (0, "title", "target word"), (0, "body", "filler text here"),
            (1, "title", "other word"), (1, "body", "target text here"),
            (2, "title", "nothing"), (2, "body", "unrelated stuff"),
        ],
        "pid long, field string, text string",
    )
    qs = spark.createDataFrame([(0, "target")], "qid long, text string")
    out = bm25f_topk(fields, qs, {"title": 2.0, "body": 1.0}, k=10)
    rows = sorted((r.rank, r.pid) for r in out.collect())
    caching.drain()
    assert [p for _, p in rows] == [0, 1]


def test_bm25f_replay_single_doc_score(spark):
    fields = spark.createDataFrame(
        [(0, "title", "a b"), (0, "body", "a c c"),
         (1, "title", "x"), (1, "body", "y z")],
        "pid long, field string, text string",
    )
    qs = spark.createDataFrame([(0, "a")], "qid long, text string")
    out = {r.pid: r.score
           for r in bm25f_topk(fields, qs, {"title": 2.0, "body": 1.0},
                               k=10).collect()}
    caching.drain()
    # hand replay: tf~(a,0)=2*1+1*1=3 ; len~(0)=2*2+1*3=7 ; len~(1)=2+2=4
    # avgdl=5.5 ; df(a)=1, N=2 → idf=ln((2-1+.5)/(1+.5)+1)=ln(2)
    tfw, lenw, avgdl = 3.0, 7.0, 5.5
    idf = math.log((2 - 1 + 0.5) / (1 + 0.5) + 1.0)
    want = round(idf * tfw * (bm25.K1 + 1.0)
                 / (tfw + bm25.K1 * (1 - bm25.B + bm25.B * lenw / avgdl)), 6)
    assert out == {0: want}


def test_time_decay_rerank_flips_order(spark):
    ranking = spark.createDataFrame(
        [(0, 10, 5.0), (0, 20, 4.9)], "qid long, pid long, score double")
    ts = spark.createDataFrame(
        [(10, 0.0), (20, 300.0)], "pid long, ts double")
    out = fusion.time_decay_rerank(ranking, ts, now_ts=365.0,
                                   half_life=100.0, k=10)
    rows = [(r.rank, r.pid, r.boosted_score) for r in
            sorted(out.collect(), key=lambda r: r.rank)]
    # doc 20 is 300 days fresher: 4.9·2^-0.65 beats 5.0·2^-3.65
    assert [p for _, p, _ in rows] == [20, 10]
    want20 = round(4.9 * math.exp(-fusion.LN2 * 65.0 / 100.0), 6)
    assert rows[0][2] == pytest.approx(want20, abs=1e-9)


def test_boilerplate_removal_hand_case(spark):
    docs = spark.createDataFrame(
        [
            (0, "h", "banner\nunique zero\n\nfooter"),
            (1, "h", "banner\nunique one\nfooter"),
            (2, "h", "banner\nunique two\nfooter"),
            (3, "g", "banner\nonly doc in g keeps everything"),
        ],
        "doc_id long, source string, text string",
    )
    out = {r.doc_id: (r.n_lines_in, r.n_lines_kept, r.clean_text)
           for r in remove_boilerplate_lines(
               docs, group_col="source", threshold=0.5).collect()}
    # group h: 'banner'/'footer' in 3/3 docs → dropped; empty line kept
    assert out[0] == (4, 2, "unique zero\n")
    assert out[1] == (3, 1, "unique one")
    assert out[2] == (3, 1, "unique two")
    # group g has one doc — below min_group_size, exempt from the vote
    assert out[3] == (2, 2, "banner\nonly doc in g keeps everything")


def test_interp_fuse_hand_case(spark):
    # system A: scores 10..8 for pids 1..3 ; system B: constant scores
    # (falls back to norm 1.0) and covers pid 3 + a new pid 4
    a = spark.createDataFrame(
        [(0, 1, 10.0), (0, 2, 9.0), (0, 3, 8.0)],
        "qid long, pid long, score double")
    b = spark.createDataFrame(
        [(0, 3, 5.0), (0, 4, 5.0)], "qid long, pid long, score double")
    out = {r.pid: (r.rank, r.fused_score)
           for r in fusion.interp_fuse([(a, 0.7), (b, 0.3)],
                                       topk=10).collect()}
    # norms A: 1→1.0, 2→0.5, 3→0.0 ; norms B (constant): 3→1.0, 4→1.0
    assert out[1] == (1, 0.7)
    assert out[2] == (2, 0.35)
    assert out[3] == (3, 0.3)   # 0.7·0.0 + 0.3·1.0
    assert out[4] == (4, 0.3)   # pid tiebreak puts 3 before 4
    assert out[3][0] < out[4][0]


def test_ndcg_at_k_hand_case(spark):
    from colbert_spark.operators import metrics

    # q0: rel-3 doc at rank 2, rel-1 doc at rank 1, rel-2 doc unranked
    ranking = spark.createDataFrame(
        [(0, 100, 1, 9.0), (0, 200, 2, 8.0), (1, 300, 1, 5.0)],
        "qid long, pid long, rank long, score double")
    qrels = spark.createDataFrame(
        [(0, 200, 3), (0, 100, 1), (0, 400, 2),
         (2, 500, 3)],                       # q2 never ranked → ndcg 0
        "qid long, pid long, rel long")
    got = metrics.ndcg_at_k(ranking, qrels, k=10).collect()[0]["ndcg"]
    dcg0 = 1.0 / math.log2(2.0) + 7.0 / math.log2(3.0)
    idcg0 = 7.0 / math.log2(2.0) + 3.0 / math.log2(3.0) + 1.0 / math.log2(4.0)
    want = round((dcg0 / idcg0 + 0.0) / 2.0, 6)
    assert got == pytest.approx(want, abs=1e-9)
