"""Tokenizer determinism + HTML extraction invariant (input_hint).

Mirrors the reference's only golden-output test surface
(colbert/tests/tokenizers_test.py): fixed inputs → exact expected tokens.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from colbert_spark.functions.analysis import (
    extract_text_from_html,
    python_tokenize,
    tokens,
    with_extracted_text,
)
from colbert_spark.sources.datagen import gen_docs_pdf


GOLDEN = [
    ("Hello, World!", ["hello", "world"]),
    ("  a--b_c  1.5x ", ["a", "b", "c", "1", "5x"]),
    ("ALLCAPS lower 123", ["allcaps", "lower", "123"]),
    ("", []),
    ("...", []),
]


def test_python_tokenizer_golden():
    for text, exp in GOLDEN:
        assert python_tokenize(text) == exp


def test_spark_tokenizer_matches_python(spark):
    df = spark.createDataFrame([(i, t) for i, (t, _) in enumerate(GOLDEN)],
                               "i long, text string")
    rows = df.select("i", tokens("text").alias("toks")).orderBy("i").collect()
    for row, (_, exp) in zip(rows, GOLDEN):
        assert row["toks"] == exp


def test_maxlen_truncation(spark):
    df = spark.createDataFrame([("a b c d e",)], "text string")
    assert df.select(tokens("text", 3).alias("t")).first()["t"] == ["a", "b", "c"]


def test_extract_text_pure_function():
    html = b"<html><head><style>p{}</style></head><body><p>Hi &amp; bye</p><!--x--></body></html>"
    a = extract_text_from_html(html)
    b = extract_text_from_html(html)
    assert a == b == "Hi & bye"


def test_extraction_byte_identical_per_url_across_parallelism(spark):
    """input_hint invariant: extracted text byte-identical per url, at two
    partition counts (the same-input/different-parallelism check)."""
    pdf = gen_docs_pdf(np.arange(60))
    results = {}
    for parts in (2, 8):
        docs = spark.createDataFrame(pdf[["url", "html"]]).repartition(parts)
        out = with_extracted_text(docs, out_col="etext").select("url", "etext")
        results[parts] = {r["url"]: r["etext"] for r in out.collect()}
    assert results[2] == results[8]
    # and the generator's html wraps text losslessly
    expected = dict(zip(pdf["url"], pdf["text"]))
    assert results[2] == expected


def test_arrow_tokenize_equals_relational(spark):
    from colbert_spark.functions.analysis import (
        tokenize_docs_arrow,
        tokenize_docs_relational,
    )

    pdf = gen_docs_pdf(np.arange(80))
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(pdf["text"])] + [(999, ""), (998, "...")],
        "pid long, text string",
    )
    a = sorted(map(tuple,
                   tokenize_docs_relational(docs, maxlen=220)
                   .select("pid", "term", "doclen", "tf").collect()))
    b = sorted(map(tuple,
                   tokenize_docs_arrow(docs, maxlen=220)
                   .select("pid", "term", "doclen", "tf").collect()))
    assert len(a) == len(b)
    assert set(a) == set(b)


def test_tokenize_kernels_equivalent_including_unicode():
    """The vectorized Arrow kernel must equal the Python-re kernel on
    every input class, including the Unicode full-vs-simple lowercasing
    trap (U+0130 routes through the re kernel)."""
    from collections import Counter

    from colbert_spark.functions.analysis import (
        _tokenize_batch_pyarrow,
        _tokenize_batch_re,
    )

    cases = ["hello world hello", "", None, "   !!!   ",
             "Grüße aus MÜNCHEN — café ÉTÉ", "ΑΒΓ ΔΕΖ αβγ",
             "İstanbul I ı", "mixed123 and-hyphens_underscores",
             "a" * 3000 + " b c",
             " ".join(f"t{i % 7}" for i in range(500))]

    def norm(dl, di, flat):
        return tuple(dl), Counter(zip(di.tolist(), flat.tolist()))

    for maxlen in (None, 1, 3, 220):
        a = norm(*_tokenize_batch_re(cases, maxlen))
        b = norm(*_tokenize_batch_pyarrow(cases, maxlen))
        assert a == b, maxlen
