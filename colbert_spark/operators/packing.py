"""Sequence packing for LLM pretraining: concatenate-and-slice token
framing over independent hash-assigned streams.

The standard pretraining layout concatenates documents into a stream and
slices it into fixed-token-budget training sequences (docs straddle
boundaries). A single global concatenation order is inherently serial —
an all-rows window is ONE task regardless of cluster size — so the
corpus is first split into `n_streams` independent streams by id hash;
each stream packs under its own prefix-sum window. Scale by raising
n_streams (≥ executor-core count): the shuffle is one hash exchange on
the stream key, and per-stream state is a running sum, not the text.

No reference counterpart (the reference trains per-passage,
colbert/modeling/tokenization/doc_tokenization.py pads each passage);
this is the T5/GPT-style packed layout as a Spark plan.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from colbert_spark.functions import analysis


def pack_sequences(docs: DataFrame, budget: int = 2048, n_streams: int = 64,
                   id_col: str = "doc_id", text_col: str = "text",
                   seed: int = 42, portable_hash: bool = False) -> DataFrame:
    """(id, stream, start_tok, n_tokens, seq_first, seq_last): each doc's
    token span in its stream's concatenation, in deterministic
    (hash, id) order within the stream.

    start_tok is the exclusive prefix sum of token counts; training
    sequence k of a stream is token slice [k*budget, (k+1)*budget), so a
    doc occupies seq_first = start_tok // budget through
    seq_last = (start_tok + n_tokens - 1) // budget (straddling docs are
    split by the consumer exactly as concatenate-and-slice demands;
    empty docs occupy seq_first = seq_last = start_tok // budget).
    """
    if budget <= 0:
        raise ValueError(f"budget {budget} must be positive")
    from colbert_spark.operators.sampling import _raw_hash

    # stream from the RAW hash: double-modding through the sampler's 1e6
    # keep-buckets made streams measurably non-uniform whenever n_streams
    # didn't divide 1e6 (e.g. 48), and capped stream entropy at 1e6
    rows = docs.select(
        F.col(id_col),
        F.pmod(_raw_hash(id_col, seed, portable_hash), F.lit(n_streams))
        .alias("stream"),
        analysis.doclen(text_col).cast("long").alias("n_tokens"),
    )
    # deterministic intra-stream order: an independent raw hash
    # (decorrelated from id order), id as tiebreak
    order = _raw_hash(id_col, seed + 1, portable_hash)
    w = (
        Window.partitionBy("stream")
        .orderBy(order.asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = rows.select(
        id_col, "stream", "n_tokens",
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).alias("start_tok"),
    )
    # integer division (`div`), not double-divide-and-cast: oracle parity
    # (DuckDB CAST(double AS BIGINT) rounds; Spark's cast truncates)
    return out.select(
        id_col, "stream", "start_tok", "n_tokens",
        F.expr(f"start_tok div {int(budget)}").alias("seq_first"),
        F.expr(f"greatest(start_tok + n_tokens - 1, start_tok) "
               f"div {int(budget)}").alias("seq_last"),
    )
