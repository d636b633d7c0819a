"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §1-2).

Schema matches BASELINE.json input_hint exactly:
    documents(url string, warc_ts timestamp, html binary, text string, lang string)

Determinism contract: every value is a pure function of (seed, doc_id) via a
counter-based Philox stream — independent of partitioning, platform hash
seeds, or row order. The same doc_id yields byte-identical html/text at any
parallelism level (the input_hint per-row invariant).

Generation is distributed (spark.range → mapInPandas) so the generator
itself scales with the cluster; no driver-side materialization.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

VOCAB_SIZE = 5000
ZIPF_S = 1.07
SEED = 42
HEAD_TERM = "t00000"

_VOCAB = np.array([f"t{i:05d}" for i in range(VOCAB_SIZE)])
_WEIGHTS = 1.0 / np.arange(1, VOCAB_SIZE + 1) ** ZIPF_S
_PROBS = _WEIGHTS / _WEIGHTS.sum()

DOCS_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"
QUERIES_SCHEMA = "qid long, text string"


def _rng(doc_id: int, stream: int = 0) -> np.random.Generator:
    """Counter-based per-row RNG: Philox keyed by seed, counter by row id."""
    return np.random.Generator(
        np.random.Philox(key=SEED + stream, counter=[0, 0, 0, int(doc_id)])
    )


def gen_docs_pdf(doc_ids: np.ndarray) -> pd.DataFrame:
    """Generate document rows for the given ids (pure function)."""
    urls, tss, htmls, texts, langs = [], [], [], [], []
    for did in doc_ids:
        did = int(did)
        rng = _rng(did)
        dl = int(np.clip(np.round(rng.lognormal(np.log(60.0), 0.5)), 5, 220))
        toks = _VOCAB[rng.choice(VOCAB_SIZE, size=dl, p=_PROBS)]
        # forced head-term skew: t00000 present in ~65% of docs (FIXTURES.md)
        if rng.random() < 0.65:
            toks[0] = HEAD_TERM
        text = " ".join(toks.tolist())
        lang = "de" if did % 20 == 0 else "en"
        urls.append(f"https://example.org/{lang}/{did:08d}")
        tss.append(np.datetime64("2024-01-01T00:00:00") + np.timedelta64(did, "s"))
        htmls.append(b"<html><body><p>" + text.encode() + b"</p></body></html>")
        texts.append(text)
        langs.append(lang)
    return pd.DataFrame(
        {"url": urls, "warc_ts": tss, "html": htmls, "text": texts, "lang": langs}
    )


def gen_queries_pdf(qids: np.ndarray) -> pd.DataFrame:
    """Reference-style query set (FIXTURES.md §2): 2-6 terms from the same
    Zipf vocabulary; ~10% include the head term; ~5% include an
    out-of-vocabulary term (empty-postings path)."""
    rows = []
    for qid in qids:
        qid = int(qid)
        rng = _rng(qid, stream=1)
        n = int(rng.integers(2, 7))
        toks = _VOCAB[rng.choice(VOCAB_SIZE, size=n, p=_PROBS)].tolist()
        r = rng.random()
        if r < 0.10:
            toks[0] = HEAD_TERM
        elif r < 0.15:
            toks[-1] = "zzabsent"
        rows.append((qid, " ".join(toks)))
    return pd.DataFrame(rows, columns=["qid", "text"])


def generate_documents(spark: SparkSession, num_docs: int,
                       partitions: int | None = None) -> DataFrame:
    """Distributed corpus generation: documents(url, warc_ts, html, text, lang)."""
    parts = partitions or max(spark.sparkContext.defaultParallelism, 4)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield gen_docs_pdf(pdf["id"].to_numpy())

    return spark.range(0, num_docs, numPartitions=parts).mapInPandas(
        run, schema=DOCS_SCHEMA
    )


def generate_queries(spark: SparkSession, num_queries: int) -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield gen_queries_pdf(pdf["id"].to_numpy())

    return spark.range(0, num_queries, numPartitions=4).mapInPandas(
        run, schema=QUERIES_SCHEMA
    )
