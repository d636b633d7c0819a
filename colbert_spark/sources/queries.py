"""Queries / Qrels / TopK loaders & sinks (TSV + JSONL).

Parity: colbert/data/queries.py:11-121 (Queries), evaluation/loaders.py:
15-30 (load_queries), :33-56 (load_qrels), :59-152 (load_topK),
queries.py:84-93 (save).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def load_queries_tsv(spark: SparkSession, path: str) -> DataFrame:
    """qid \\t text; qid uniqueness enforced (loaders.py:27: 'Query QID must
    be unique')."""
    df = spark.read.csv(path, sep="\t").select(
        F.col("_c0").cast("long").alias("qid"),
        F.col("_c1").alias("text"),
    )
    n, nd = df.agg(F.count("qid"), F.countDistinct("qid")).first()
    if n != nd:
        raise ValueError(f"Query QIDs must be unique: {n} rows, {nd} distinct")
    return df


def load_queries_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """lines {qid, question, ...} (queries.py:50-67 QA path)."""
    df = spark.read.json(path)
    qcol = "question" if "question" in df.columns else "text"
    return df.select(F.col("qid").cast("long").alias("qid"),
                     F.col(qcol).alias("text"))


def save_queries_tsv(queries: DataFrame, path: str) -> None:
    queries.select("qid", "text").orderBy("qid").coalesce(1).write.mode(
        "overwrite"
    ).csv(path, sep="\t")


def load_qrels_tsv(spark: SparkSession, path: str) -> DataFrame:
    """qid \\t 0 \\t pid \\t 1, deduped per qid (loaders.py:33-56; the
    format constants are asserted there at :43)."""
    df = spark.read.csv(path, sep="\t").select(
        F.col("_c0").cast("long").alias("qid"),
        F.col("_c1").cast("int").alias("x"),
        F.col("_c2").cast("long").alias("pid"),
        F.col("_c3").cast("int").alias("label"),
    )
    bad = df.filter((F.col("x") != 0) | (F.col("label") != 1)).count()
    if bad:
        raise ValueError(f"qrels format: expected 'qid 0 pid 1', {bad} bad rows")
    return df.select("qid", "pid").dropDuplicates(["qid", "pid"])


def load_topk_tsv(spark: SparkSession, path: str) -> DataFrame:
    """qid \\t pid \\t query \\t passage (rerank candidates, loaders.py:59-152)."""
    return spark.read.csv(path, sep="\t").select(
        F.col("_c0").cast("long").alias("qid"),
        F.col("_c1").cast("long").alias("pid"),
        F.col("_c2").alias("query"),
        F.col("_c3").alias("passage"),
    )


def docs2passages_wrap(docs: DataFrame, id_col: str = "pid",
                       text_col: str = "text", nwords: int = 180,
                       overlap: int = 0) -> DataFrame:
    """Document → passage splitter with reference-exact semantics
    (utility/preprocess/docs2passages.py:26-34): whitespace words, stride
    nwords − overlap, and WRAPAROUND — when the doc is longer than nwords
    the word list is doubled so the last passage borrows its tail from the
    doc's start and is never short. Every passage has exactly nwords words
    (or len(words) when the doc is shorter than nwords).

    Output: (doc_id, passage_idx, passage) — one JVM-side pass, no UDF.
    """
    if not 0 <= overlap < nwords:
        raise ValueError(f"need 0 <= overlap < nwords, got {overlap}/{nwords}")
    stride = nwords - overlap
    w = F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != F.lit(""))
    n = F.size(w)
    doubled = F.when(n > nwords, F.concat(w, w)).otherwise(w)
    # range(0, len(words) - overlap, stride): empty when n <= overlap
    starts = F.when(
        n - overlap >= 1,
        F.sequence(F.lit(0), n - F.lit(overlap) - 1, F.lit(stride)),
    ).otherwise(F.array().cast("array<int>"))
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            doubled.alias("_w"),
            F.posexplode(starts).alias("passage_idx", "_start"),
        )
        .select(
            "doc_id",
            F.col("passage_idx").cast("long").alias("passage_idx"),
            F.array_join(
                F.slice("_w", F.col("_start") + 1, nwords), " "
            ).alias("passage"),
        )
    )


def docs2passages(docs: DataFrame, id_col: str = "pid", text_col: str = "text",
                  max_words: int = 180, overlap: bool = False) -> DataFrame:
    """Document → passage splitter (S14, utility/preprocess/docs2passages.py:
    19-53): fixed word windows; with overlap=True, stride max_words/2.
    Plain windows (the last passage may be short) — for the reference's
    wraparound semantics use docs2passages_wrap.

    Output: (doc_id, passage_idx, passage). posexplode keeps it one
    JVM-side pass — no UDF.
    """
    stride = max_words // 2 if overlap else max_words
    words = F.split(F.col(text_col), " ")
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.size(words) - 1, F.lit(0)),
        F.lit(stride),
    )
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            words.alias("_w"),
            F.posexplode(starts).alias("passage_idx", "_start"),
        )
        .select(
            "doc_id", "passage_idx",
            F.array_join(
                F.slice("_w", F.col("_start") + 1, max_words), " "
            ).alias("passage"),
        )
        .filter(F.col("passage") != "")
    )


def load_qas_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """LoTTE/OpenQA qas.jsonl → (qid, question, answer_pids array<long>)
    (utility/evaluate/evaluate_lotte_rankings.py:30-40 reads qid +
    answer_pids; utility/utils/qa_loaders.py the train-side analog)."""
    df = spark.read.json(path)
    cols = {c.lower(): c for c in df.columns}
    question = cols.get("question") or cols.get("query")
    out = df.select(
        F.col(cols["qid"]).cast("long").alias("qid"),
        (F.col(question) if question else F.lit(None).cast("string"))
        .alias("question"),
        F.col(cols["answer_pids"]).cast("array<long>").alias("answer_pids"),
    )
    return out


def lotte_success_at_k(ranking: DataFrame, qas: DataFrame, k: int = 5
                       ) -> DataFrame:
    """Success@k against answer_pids sets, averaged over ALL judged
    queries (a judged qid missing from the ranking counts as a miss —
    evaluate_lotte_rankings.py:31-43). One row: (k, success)."""
    answers = qas.select("qid", F.explode("answer_pids").alias("pid"))
    hits = (
        ranking.filter(F.col("rank") <= k)
        .join(answers, ["qid", "pid"], "left_semi")
        .select("qid").distinct()
        .withColumn("hit", F.lit(1))
    )
    per_q = qas.select("qid").distinct().join(hits, "qid", "left").fillna(
        {"hit": 0}
    )
    return per_q.agg(
        F.lit(k).cast("long").alias("k"),
        F.round(F.avg("hit"), 6).alias("success"),
    )


def load_examples_jsonl(spark: SparkSession, path: str,
                        nway: int | None = None) -> DataFrame:
    """Training-examples JSONL → (qid, pid_pos, pid_negs array<long>).
    Each line is a JSON array [qid, pid+, pid−, ...] truncated to nway+1
    entries (colbert/data/examples.py:23-32). The flat-array lines parse
    as array<long> via the text reader + from_json — no schema inference
    pass over mixed-length arrays."""
    raw = spark.read.text(path).select(
        F.from_json(F.col("value"), "array<long>").alias("a")
    )
    if nway is not None:
        raw = raw.select(F.slice("a", 1, nway + 1).alias("a"))
    return raw.select(
        F.col("a")[0].alias("qid"),
        F.col("a")[1].alias("pid_pos"),
        F.slice("a", 3, F.greatest(F.size("a") - 2, F.lit(0)))
        .alias("pid_negs"),
    )
