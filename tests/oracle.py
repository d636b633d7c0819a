"""Pure-Python BM25 oracle (FIXTURES.md §6) — the rank-identity reference.

Independent implementation: no Spark, no numpy vectorization tricks — a
straight transcription of the BM25 formula with the same constants and the
(-score, pid) total order, used to validate every Spark scorer.
"""

from __future__ import annotations

import math
from collections import Counter

from colbert_spark.functions.analysis import python_tokenize
from colbert_spark.functions.bm25 import B, K1, SCORE_DECIMALS


def bm25_topk(
    docs: dict[int, str],
    queries: dict[int, str],
    k: int = 10,
    doc_maxlen: int | None = 220,
    query_maxlen: int | None = 32,
) -> dict[int, list[tuple[int, int, float]]]:
    """→ {qid: [(pid, rank, score), ...]} rank-ordered, rounded scores."""
    tfs: dict[int, Counter] = {}
    doclens: dict[int, int] = {}
    df: Counter = Counter()
    for pid, text in docs.items():
        toks = python_tokenize(text, doc_maxlen)
        tfs[pid] = Counter(toks)
        doclens[pid] = len(toks)
        df.update(set(toks))
    n = len(docs)
    avgdl = sum(doclens.values()) / n

    out: dict[int, list[tuple[int, int, float]]] = {}
    for qid, qtext in queries.items():
        qterms = set(python_tokenize(qtext, query_maxlen))
        scores: dict[int, float] = {}
        for term in qterms:
            if df[term] == 0:
                continue
            idf = math.log((n - df[term] + 0.5) / (df[term] + 0.5) + 1.0)
            for pid, c in tfs.items():
                tf = c.get(term, 0)
                if tf == 0:
                    continue
                s = idf * tf * (K1 + 1.0) / (
                    tf + K1 * (1.0 - B + B * doclens[pid] / avgdl)
                )
                scores[pid] = scores.get(pid, 0.0) + s
        ranked = sorted(
            ((round(s, SCORE_DECIMALS), pid) for pid, s in scores.items()),
            key=lambda t: (-t[0], t[1]),
        )[:k]
        out[qid] = [(pid, i + 1, s) for i, (s, pid) in enumerate(ranked)]
    return out
