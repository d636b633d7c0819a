"""r5 pipeline additions: decontamination, cross-corpus dedup, repetition
stats, PII scrub, token-budget mixing — hand-built inputs with exact
expected outputs (the DuckDB oracles in entry_queries cover the fixture
tables; these pin the operator semantics on adversarial corners)."""

from __future__ import annotations

import hashlib
import math

import pyspark.sql.functions as F
import pytest

from colbert_spark.operators import decontam, textstats
from colbert_spark.operators.sampling import mix_by_token_budget


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        # shares the full eval sentence (many 3-gram hits)
        (10, "alpha beta gamma delta epsilon zeta"),
        # repeats ONE leaked 3-gram twice — distinct semantics counts it once
        (11, "alpha beta gamma x y z alpha beta gamma"),
        # single leaked 3-gram only
        (12, "q w e beta gamma delta r t"),
        # clean
        (13, "one two three four five six seven"),
        # too short for any 3-gram
        (14, "tiny doc"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def eval_set(spark):
    return spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta")], "doc_id long, text string"
    )


def test_decontaminate_flag_counts_distinct_hits(spark, corpus, eval_set):
    out = {
        r["doc_id"]: (r["n_doc_ngrams"], r["n_hit_ngrams"])
        for r in decontam.ngram_decontaminate(corpus, eval_set, n=3).collect()
    }
    # doc 10: 4 distinct 3-grams, all leaked
    assert out[10] == (4, 4)
    # doc 11: "alpha beta gamma" appears twice but counts ONCE (distinct);
    # its other 3-grams are clean
    assert out[11][1] == 1
    # doc 12: exactly one leaked 3-gram ("beta gamma delta")
    assert out[12] == (6, 1)
    assert 13 not in out and 14 not in out


def test_decontaminate_min_overlap_and_clean_mode(spark, corpus, eval_set):
    flagged = decontam.ngram_decontaminate(
        corpus, eval_set, n=3, min_overlap=2
    )
    assert {r["doc_id"] for r in flagged.collect()} == {10}
    clean = decontam.ngram_decontaminate(
        corpus, eval_set, n=3, min_overlap=1, mode="clean"
    )
    assert {r["doc_id"] for r in clean.collect()} == {13, 14}


def test_cross_dedup_normalized_identity(spark):
    # punctuation/case differences must NOT defeat the cross-corpus match
    corpus = spark.createDataFrame(
        [(100, "Hello, World! Again"), (101, "fresh unseen content here")],
        "doc_id long, text string",
    )
    other = spark.createDataFrame(
        [(1, "hello world again"), (2, "something else entirely")],
        "doc_id long, text string",
    )
    surv = decontam.exact_cross_dedup(corpus, other)
    assert [r["doc_id"] for r in surv.collect()] == [101]


def test_repetition_stats_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            # 2-grams: "a b"×3, "b a"×2 → n=5, distinct=2, top=3
            (0, "a b a b a b"),
            # all distinct 2-grams
            (1, "p q r s"),
            # below n — omitted
            (2, "solo"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in textstats.repetition_stats(docs, n=2).collect()}
    r0 = out[0]
    assert (r0["n_ngrams"], r0["n_distinct"], r0["top_ngram_count"]) == (5, 2, 3)
    assert r0["dup_ngram_ratio"] == 1.0
    assert r0["top_ngram_ratio"] == 0.6
    r1 = out[1]
    assert (r1["n_ngrams"], r1["n_distinct"]) == (3, 3)
    assert r1["dup_ngram_ratio"] == 0.0
    assert 2 not in out


def test_pii_stats_counts_and_redaction_order(spark):
    docs = spark.createDataFrame(
        [
            (0, "mail a.b-c@host.example.org or x@y.io and ip 192.168.0.1 ok"),
            (1, "call +555 123-4567 or 555 123 4567 done"),
            (2, "no pii at all in this row"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in textstats.pii_stats(docs).collect()}
    assert (out[0]["n_email"], out[0]["n_ipv4"], out[0]["n_phone"]) == (2, 1, 0)
    assert out[0]["redacted"] == "mail <EMAIL> or <EMAIL> and ip <IP> ok"
    # both phone spellings ( - and space separators) match; redaction keeps
    # the surrounding text intact
    assert out[1]["n_phone"] == 2
    assert out[1]["redacted"] == "call <PHONE> or <PHONE> done"
    assert (out[2]["n_email"], out[2]["n_ipv4"], out[2]["n_phone"]) == (0, 0, 0)
    assert out[2]["redacted"] == "no pii at all in this row"


def _keep_ppm_py(doc_id: int, seed: int = 42) -> int:
    h = hashlib.md5(f"{doc_id}:{seed}".encode()).hexdigest()[:15]
    return int(h, 16) % 1_000_000


def test_mix_by_token_budget_exact_python_replay(spark):
    # 2 sources × 50 docs of 4 tokens each → 200 tokens per source
    rows = [(i, "srcA" if i < 50 else "srcB", "w x y z") for i in range(100)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    summ = {
        r["source"]: r
        for r in mix_by_token_budget(
            docs, {"srcA": 100}, default_budget=1_000_000, portable_hash=True
        ).collect()
    }
    # srcB's budget covers it → everything kept
    b = summ["srcB"]
    assert (b["keep_ppm"], b["kept_docs"], b["kept_tokens"]) == (1_000_000, 50, 200)
    # srcA: keep_ppm = floor(100/200 * 1e6) = 500000; replay the hash rule
    a = summ["srcA"]
    assert a["keep_ppm"] == 500_000
    expect = [i for i in range(50) if _keep_ppm_py(i) < 500_000]
    assert a["kept_docs"] == len(expect)
    assert a["kept_tokens"] == 4 * len(expect)
    # row mode returns exactly the replayed doc set (srcA subset + all srcB)
    kept_rows = mix_by_token_budget(
        docs, {"srcA": 100}, default_budget=1_000_000, portable_hash=True,
        summary=False,
    )
    got = sorted(r["doc_id"] for r in kept_rows.collect())
    assert got == sorted(expect + list(range(50, 100)))


def test_mix_unlisted_stratum_without_default_keeps_all(spark):
    docs = spark.createDataFrame(
        [(0, "s", "a b c"), (1, "s", "d e f")], "doc_id long, source string, text string"
    )
    out = mix_by_token_budget(docs, {"other": 1}, portable_hash=True).collect()
    assert out[0]["keep_ppm"] == 1_000_000 and out[0]["kept_docs"] == 2


def test_shared_ngram_stats_hand_computed(spark):
    from colbert_spark import caching
    from colbert_spark.operators.dedup import shared_ngram_stats

    docs = spark.createDataFrame(
        [
            (0, "a b c d e"),        # 3-grams: abc bcd cde — abc shared
            (1, "z a b c q"),        # zab abc bcq — abc shared
            (2, "m n o p q r"),      # all unique corpus-wide
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in shared_ngram_stats(docs, n=3).collect()}
    caching.drain(owner="shared_ngram_stats")
    assert (out[0]["n_doc_ngrams"], out[0]["n_shared_ngrams"]) == (3, 1)
    assert out[0]["shared_ratio"] == round(1 / 3, 6)
    assert (out[1]["n_doc_ngrams"], out[1]["n_shared_ngrams"]) == (3, 1)
    assert (out[2]["n_doc_ngrams"], out[2]["n_shared_ngrams"]) == (4, 0)
    assert out[2]["shared_ratio"] == 0.0


def test_unigram_logprob_hand_computed(spark):
    import math

    docs = spark.createDataFrame(
        [(0, "a a b"), (1, "b b b a")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in textstats.unigram_logprob(docs).collect()}
    # cf: a=3, b=4, total=7
    b0 = (2 * -math.log2(3 / 7) + 1 * -math.log2(4 / 7)) / 3
    b1 = (3 * -math.log2(4 / 7) + 1 * -math.log2(3 / 7)) / 4
    assert out[0]["doclen"] == 3 and out[0]["bits_per_token"] == round(b0, 6)
    assert out[1]["doclen"] == 4 and out[1]["bits_per_token"] == round(b1, 6)


def test_embedding_decontaminate_flag_and_clean(spark):
    corpus = spark.createDataFrame(
        [
            (10, [1.0, 0.0]),      # hits both eval vecs (sim 1.0 and ~0.995)
            (11, [3.0, 0.0]),      # same direction, scale-invariant
            (12, [0.0, 1.0]),      # orthogonal to both → clean
            (13, [-1.0, 0.0]),     # opposite → clean
        ],
        "vec_id long, embedding array<double>",
    )
    ev = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [10.0, 1.0])], "vec_id long, embedding array<double>"
    )
    out = {
        r["vec_id"]: r
        for r in decontam.embedding_decontaminate(corpus, ev, threshold=0.9).collect()
    }
    assert set(out) == {10, 11}
    assert out[10]["n_hits"] == 2 and out[10]["max_sim"] == 1.0
    assert out[11]["n_hits"] == 2 and out[11]["max_sim"] == 1.0
    clean = decontam.embedding_decontaminate(
        corpus, ev, threshold=0.9, mode="clean"
    )
    assert {r["vec_id"] for r in clean.collect()} == {12, 13}


def test_mix_by_temperature_python_replay_and_limits(spark):
    """alpha=0.5 replayed exactly (shares, targets, ppm, kept sets);
    alpha=1 reduces to proportional shares; alpha=0 to uniform shares;
    an over-targeted tiny stratum caps at keep-everything."""
    from colbert_spark.operators.sampling import mix_by_temperature

    # srcA 160 tokens (40 docs x 4), srcB 40 tokens (10 docs x 4)
    rows = [(i, "srcA" if i < 40 else "srcB", "w x y z") for i in range(50)]
    docs = spark.createDataFrame(rows,
                                 "doc_id long, source string, text string")

    def replay(alpha, budget):
        tot = {"srcA": 160, "srcB": 40}
        ws = {s: t ** alpha for s, t in tot.items()}
        wsum = sum(ws.values())
        out = {}
        for s, t in tot.items():
            share = round(ws[s] / wsum, 9)
            target = math.floor(round(budget * share, 6))
            ppm = math.floor(min(1.0, round(target / tot[s], 9)) * 1_000_000)
            out[s] = (round(share, 6), target, ppm)
        return out

    for alpha, budget in ((0.5, 100), (1.0, 100), (0.0, 100), (0.5, 10_000)):
        summ = {r["source"]: r for r in mix_by_temperature(
            docs, alpha, budget, portable_hash=True).collect()}
        want = replay(alpha, budget)
        for s, (share, target, ppm) in want.items():
            r = summ[s]
            assert (r["share"], r["target_tokens"], r["keep_ppm"]) == \
                (share, target, ppm), (alpha, budget, s)

    # alpha=1: shares proportional to token mass
    s1 = {r["source"]: r["share"] for r in mix_by_temperature(
        docs, 1.0, 100, portable_hash=True).collect()}
    assert s1 == {"srcA": 0.8, "srcB": 0.2}
    # alpha=0: uniform shares regardless of mass
    s0 = {r["source"]: r["share"] for r in mix_by_temperature(
        docs, 0.0, 100, portable_hash=True).collect()}
    assert s0 == {"srcA": 0.5, "srcB": 0.5}
    # big budget: every stratum caps at keep-everything
    cap = {r["source"]: r["keep_ppm"] for r in mix_by_temperature(
        docs, 0.5, 10_000, portable_hash=True).collect()}
    assert cap == {"srcA": 1_000_000, "srcB": 1_000_000}

    # row mode = exact replayed kept set at alpha=0.5, budget=100
    want_half = replay(0.5, 100)
    expect = sorted(
        i for i, s in ((i, "srcA" if i < 40 else "srcB") for i in range(50))
        if _keep_ppm_py(i) < want_half[s][2])
    got = sorted(r["doc_id"] for r in mix_by_temperature(
        docs, 0.5, 100, portable_hash=True, summary=False).collect())
    assert got == expect

    with pytest.raises(ValueError, match="alpha"):
        mix_by_temperature(docs, -1.0, 100)
