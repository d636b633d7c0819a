"""r6: the one-pass Arrow SimHash kernel must be bit-identical to the
relational (JVM-fold) formulation it replaced — both hash modes, both
widths, unicode included. Also pins the JVM-exact xxhash64 replica in
functions.hashing directly against F.xxhash64 (single- and two-arg)."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest

from colbert_spark.functions import hashing
from colbert_spark.operators import dedup


def _rand_docs(spark, n=80, seed=7):
    rng = np.random.Generator(np.random.Philox(key=seed))
    vocab = [f"w{i}" for i in range(60)] + ["İstanbul", "héllo", "日本語",
                                            "ÄÖÜ", "мир"]
    rows = []
    for doc_id in range(n):
        ln = int(rng.integers(1, 60))
        words = [vocab[int(i)] for i in rng.integers(0, len(vocab), ln)]
        rows.append((doc_id, " ".join(words)))
    rows.append((n, ""))            # zero-token doc: absent from output
    rows.append((n + 1, "...!!!"))  # punctuation-only: ditto
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.mark.parametrize("portable", [False, True])
def test_simhash64_kernel_matches_sql(spark, portable):
    docs = _rand_docs(spark)
    got = {r["doc_id"]: r["simhash"]
           for r in dedup.simhash64(docs, portable_hash=portable).collect()}
    ref = {r["doc_id"]: r["simhash"]
           for r in dedup.simhash64_sql(docs, portable_hash=portable).collect()}
    assert got == ref and len(got) == 80


@pytest.mark.parametrize("portable", [False, True])
def test_simhash128_kernel_matches_sql(spark, portable):
    docs = _rand_docs(spark, seed=11)
    got = {r["doc_id"]: (r["simhash_lo"], r["simhash_hi"])
           for r in dedup.simhash128(docs, portable_hash=portable).collect()}
    ref = {r["doc_id"]: (r["simhash_lo"], r["simhash_hi"])
           for r in dedup.simhash128_sql(docs, portable_hash=portable).collect()}
    assert got == ref and len(got) == 80


def test_xxhash64_replica_matches_jvm(spark):
    terms = ["", "a", "ab", "abc", "abcd", "abcdefg", "abcdefgh",
             "abcdefghi", "x" * 31, "x" * 32, "x" * 33, "x" * 100,
             "İstanbul", "héllo wörld", "日本語のテキスト", "мир труд май",
             "the", "scan", "w0", "term123"]
    df = spark.createDataFrame([(t,) for t in terms], "term string")
    rows = df.select("term", F.xxhash64("term").alias("h1"),
                     F.xxhash64("term", F.lit(1)).alias("h2")).collect()
    for r in rows:
        assert hashing.spark_xxhash64_str(r["term"]) == r["h1"], r["term"]
        assert hashing.spark_xxhash64_str_int(r["term"], 1) == r["h2"], r["term"]
