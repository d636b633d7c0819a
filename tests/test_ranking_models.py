"""Dirichlet query-likelihood + prefix search vs pure-Python replays."""

from __future__ import annotations

import math

import pytest
import pyspark.sql.functions as F

from colbert_spark import caching
from colbert_spark.functions.analysis import python_tokenize
from colbert_spark.operators import expansion, lm

DOCS = [
    (0, "apple banana apple cherry"),
    (1, "banana cherry date"),
    (2, "apple apple apple banana banana cherry date elder"),
    (3, "fig grape"),
    (4, "apple fig"),
]
QUERIES = [(0, "apple banana"), (1, "date"), (2, "zzmissing apple")]


def _ql_py(docs, queries, mu=1500.0, k=10):
    toks = {pid: python_tokenize(t, 220) for pid, t in docs}
    dl = {p: len(t) for p, t in toks.items()}
    cf: dict[str, int] = {}
    for t in toks.values():
        for w in t:
            cf[w] = cf.get(w, 0) + 1
    cc = float(sum(dl.values()))
    out = {}
    for qid, qtext in queries:
        qterms = sorted({w for w in python_tokenize(qtext, 32) if w in cf})
        nv = len(qterms)
        scores = {}
        for pid, t in toks.items():
            matched = [w for w in qterms if w in t]
            if not matched:
                continue
            s = sum(
                math.log(1.0 + t.count(w) / (mu * cf[w] / cc))
                for w in matched
            ) + nv * math.log(mu / (dl[pid] + mu))
            scores[pid] = round(s, 6)
        ranked = sorted(scores.items(), key=lambda x: (-x[1], x[0]))[:k]
        out[qid] = [(p, i + 1, s) for i, (p, s) in enumerate(ranked)]
    return out


def test_ql_dirichlet_matches_python_replay(spark):
    docs = spark.createDataFrame(DOCS, "pid long, text string")
    qs = spark.createDataFrame(QUERIES, "qid long, text string")
    got = lm.ql_dirichlet_topk(docs, qs, k=10)
    rows = {(r.qid, r.pid, r.rank, r.score) for r in got.collect()}
    caching.drain()
    want = {
        (qid, p, r, s)
        for qid, lst in _ql_py(DOCS, QUERIES).items()
        for p, r, s in lst
    }
    assert rows == want


def test_ql_oov_only_query_yields_no_rows(spark):
    docs = spark.createDataFrame(DOCS, "pid long, text string")
    qs = spark.createDataFrame([(9, "zz yy")], "qid long, text string")
    assert lm.ql_dirichlet_topk(docs, qs, k=10).count() == 0
    caching.drain()


def test_prefix_search_expansion_cap_and_no_match(spark):
    docs = spark.createDataFrame(DOCS, "pid long, text string")
    pq = spark.createDataFrame(
        [(0, "a"), (1, "zz"), (2, "fig")], "qid long, prefix string")
    out = expansion.prefix_search_topk(docs, pq, k=10, max_expansions=1)
    rows = [(r.qid, r.pid) for r in out.collect()]
    caching.drain()
    qids = {q for q, _ in rows}
    assert 1 not in qids                      # no term starts with zz
    # qid 0 with cap 1 expands to 'apple' only (highest df among a*)
    got0 = sorted(p for q, p in rows if q == 0)
    assert got0 == [0, 2, 4]                  # docs containing apple
    got2 = sorted(p for q, p in rows if q == 2)
    assert got2 == [3, 4]                     # docs containing fig


def test_prefix_search_ranks_like_bm25_on_single_term(spark):
    """A prefix expanding to exactly one term must equal bm25 on it."""
    from colbert_spark.operators import brute

    docs = spark.createDataFrame(DOCS, "pid long, text string")
    pq = spark.createDataFrame([(0, "date")], "qid long, prefix string")
    got = {(r.pid, r.rank, r.score)
           for r in expansion.prefix_search_topk(docs, pq, k=10).collect()}
    qs = spark.createDataFrame([(0, "date")], "qid long, text string")
    want = {(r.pid, r.rank, r.score)
            for r in brute.bm25_topk(docs, qs, k=10).collect()}
    caching.drain()
    assert got == want


def test_synonym_search_empty_map_is_bm25_and_expansion_matches(spark):
    """Empty thesaurus ≡ bm25_topk; a directed synonym pulls in docs the
    raw query can't match, and an OOV synonym is a provable no-op."""
    from colbert_spark.operators import brute

    docs = spark.createDataFrame(DOCS, "pid long, text string")
    qs = spark.createDataFrame([(0, "grape"), (1, "date")],
                               "qid long, text string")
    empty = spark.createDataFrame([], "term string, synonym string")
    got = {(r.qid, r.pid, r.rank, r.score)
           for r in expansion.synonym_bm25_topk(docs, qs, empty,
                                                k=10).collect()}
    want = {(r.qid, r.pid, r.rank, r.score)
            for r in brute.bm25_topk(docs, qs, k=10).collect()}
    assert got == want

    syn = spark.createDataFrame(
        [("grape", "fig"), ("date", "zzoov")], "term string, synonym string")
    out = expansion.synonym_bm25_topk(docs, qs, syn, k=10)
    rows = [(r.qid, r.pid) for r in out.collect()]
    caching.drain()
    # q0 "grape" now also matches fig docs 3, 4 (doc 3 has both)
    assert sorted(p for q, p in rows if q == 0) == [3, 4]
    # q1's OOV synonym adds nothing: still exactly the 'date' docs
    assert sorted(p for q, p in rows if q == 1) == [1, 2]


def test_stem_minimal_en_rule_and_bidirectional_match(spark):
    """Golden stem cases (Lucene EnglishMinimalStemFilter rule) + the
    collapsed term space matches plural↔singular both ways; 'ss'/'us'
    endings and len<3 are untouched."""
    import pyspark.sql.functions as F
    from colbert_spark.operators import stemming

    words = ["scans", "keys", "as", "class", "status", "is", "xs", "s"]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = dict(
        df.select("w", stemming.stem_minimal_en(F.col("w")).alias("st"))
        .collect())
    assert got == {"scans": "scan", "keys": "key", "as": "as",
                   "class": "class", "status": "status", "is": "is",
                   "xs": "xs", "s": "s"}

    docs = spark.createDataFrame(
        [(0, "apple apples apples"), (1, "apples banana"), (2, "cherry")],
        "pid long, text string")
    qs = spark.createDataFrame([(0, "apples"), (1, "apple")],
                               "qid long, text string")
    out = stemming.stemmed_bm25_topk(docs, qs, k=10)
    rows = [(r.qid, r.pid, r.rank) for r in out.collect()]
    caching.drain()
    # both surface forms retrieve both apple docs; doc 0 (tf 3) first
    assert [(p, r) for q, p, r in rows if q == 0] == [(0, 1), (1, 2)]
    assert [(p, r) for q, p, r in rows if q == 1] == [(0, 1), (1, 2)]


def test_map_at_k_hand_case(spark):
    from colbert_spark.operators import metrics

    # q0: rel docs {100, 300, 400}; hits at ranks 1 and 3 →
    #     AP = (1/1 + 2/3) / min(3, 10)
    # q1: rel doc {500} never ranked → AP 0
    ranking = spark.createDataFrame(
        [(0, 100, 1, 9.0), (0, 200, 2, 8.0), (0, 300, 3, 7.0),
         (1, 600, 1, 5.0)],
        "qid long, pid long, rank long, score double")
    qrels = spark.createDataFrame(
        [(0, 100), (0, 300), (0, 400), (1, 500)], "qid long, pid long")
    got = metrics.map_at_k(ranking, qrels, k=10).collect()[0]["map"]
    want = round(((1.0 + 2.0 / 3.0) / 3.0 + 0.0) / 2.0, 6)
    assert got == pytest.approx(want, abs=1e-9)


def test_percolate_all_vs_any_and_topn_digest(spark):
    """AND vs OR semantics, OOV-term queries never fully match, and the
    top-n digest's total/rn contract."""
    from colbert_spark.operators import percolate

    docs = spark.createDataFrame(DOCS, "pid long, text string")
    sq = spark.createDataFrame(
        [(0, "apple banana"), (1, "zz apple"), (2, "fig")],
        "qid long, text string")

    got_all = {(r.qid, r.pid, r.matched)
               for r in percolate.percolate(docs, sq, mode="all").collect()}
    assert got_all == {(0, 0, 2), (0, 2, 2), (2, 3, 1), (2, 4, 1)}

    got_any = {(r.qid, r.pid)
               for r in percolate.percolate(docs, sq, mode="any").collect()}
    assert got_any == {(0, 0), (0, 1), (0, 2), (0, 4),
                       (1, 0), (1, 2), (1, 4), (2, 3), (2, 4)}

    digest = percolate.percolate_topn(docs, sq, n=1, mode="all").collect()
    by_q = {r.qid: (r.pid, r.total, r.rn) for r in digest}
    assert by_q == {0: (0, 2, 1), 2: (3, 2, 1)}

    with pytest.raises(ValueError, match="mode"):
        percolate.percolate(docs, sq, mode="fuzzy")


def test_percolate_inrow_batch_and_stream_parity(spark, tmp_path):
    """The stateless in-row percolation must equal the explode+join
    percolate() in batch (both modes, incl. an empty query never
    alerting), and produce the same alerts when the documents arrive as
    a two-micro-batch Structured Stream."""
    from colbert_spark.operators import percolate

    docs_rows = [(i, t) for i, t in DOCS]
    docs = spark.createDataFrame(docs_rows, "pid long, text string")
    sq = spark.createDataFrame(
        [(0, "apple banana"), (1, "zz apple"), (2, "fig"), (3, "  ...  ")],
        "qid long, text string")

    want = {}
    for mode in ("all", "any"):
        want[mode] = sorted(
            map(tuple, percolate.percolate(docs, sq, mode=mode).collect()))
        got = sorted(map(tuple, percolate.percolate_inrow(
            docs, sq, mode=mode).collect()))
        assert got == want[mode], mode
    # qid 3 tokenizes to nothing: must alert nowhere in either shape
    assert all(r[0] != 3 for r in want["all"] + want["any"])

    # stream the same docs in two micro-batches through the same op
    src = str(tmp_path / "src")
    docs.filter(F.col("pid") < 2).coalesce(1).write.parquet(src)
    docs.filter(F.col("pid") >= 2).coalesce(1).write.mode("append") \
        .parquet(src)
    stream = (spark.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    alerts = percolate.percolate_inrow(stream, sq, mode="all")
    q = (alerts.writeStream.format("memory").queryName("percolate_sink")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .outputMode("append").start())
    q.processAllAvailable()
    q.stop()
    got_stream = sorted(map(tuple,
                            spark.table("percolate_sink").collect()))
    assert got_stream == want["all"]


def test_percolate_topn_presalt_identical(spark):
    """The two-phase presalted election must be output-identical to the
    single-window digest for every salt count (first-n-by-pid is a
    prefix property, so per-salt prefixes cover the global prefix)."""
    from colbert_spark.operators import percolate

    docs = spark.createDataFrame(DOCS, "pid long, text string")
    sq = spark.createDataFrame(
        [(0, "apple"), (1, "cherry banana")], "qid long, text string")

    def rows(df):
        return sorted((r.qid, r.pid, r.matched, r.total, r.rn)
                      for r in df.collect())

    for mode in ("all", "any"):
        base = rows(percolate.percolate_topn(docs, sq, n=2, mode=mode))
        assert base  # non-trivial fixture
        for s in (1, 2, 7):
            got = rows(percolate.percolate_topn(
                docs, sq, n=2, mode=mode, presalt=s))
            assert got == base, (mode, s)


def test_more_like_this_excludes_seed_and_scores_like_bm25(spark):
    """Seed 0's distinct terms all fit in top_terms, so MLT must equal
    BM25 on that term set with the seed dropped and ranks recomputed."""
    from colbert_spark.operators import brute, expansion

    docs = spark.createDataFrame(DOCS, "pid long, text string")
    seeds = spark.createDataFrame([(0,)], "pid long")
    got = sorted(
        (r.rank, r.pid, r.score)
        for r in expansion.more_like_this(docs, seeds, top_terms=10,
                                          k=10).collect())
    qs = spark.createDataFrame([(0, "apple banana cherry")],
                               "qid long, text string")
    base = [(r.pid, r.score)
            for r in brute.bm25_topk(docs, qs, k=10).collect()
            if r.pid != 0]
    base.sort(key=lambda x: (-x[1], x[0]))
    want = sorted((i + 1, p, s) for i, (p, s) in enumerate(base))
    caching.drain()
    assert got == want
    assert all(p != 0 for _, p, _ in got)
