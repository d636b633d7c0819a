"""Training-data pipeline ops: property-based verification for operators
whose oracles aren't SQL-expressible (MinHash/SimHash/LSH), plus metric
sanity on hand-built rankings."""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F

from colbert_spark.operators import dedup, metrics, multimodal, similarity


@pytest.fixture(scope="module")
def dup_docs(spark):
    """Corpus with planted near-duplicates."""
    base = "the quick brown fox jumps over the lazy dog and runs far away home"
    rows = [
        (0, base),
        (1, base),                                   # exact dup of 0
        (2, base.replace("lazy", "sleepy")),         # near dup of 0
        (3, "completely different words about spark query engines and data"),
        (4, "another unrelated document mentioning tables joins and shuffles"),
        (5, base + " with a small suffix added here"),  # near dup of 0
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark, dup_docs):
    row = dedup.exact_dedup_summary(dup_docs).collect()[0]
    assert row["num_docs"] == 6
    assert row["num_distinct_texts"] == 5
    assert row["num_dup_docs"] == 1
    kept = dedup.exact_dedup_keep_first(dup_docs).select("doc_id").collect()
    ids = sorted(r["doc_id"] for r in kept)
    assert ids == [0, 2, 3, 4, 5]  # doc 1 removed, doc 0 kept


def test_ngram_jaccard_finds_planted_pairs(spark, dup_docs):
    pairs = {
        (r["a"], r["b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(dup_docs, n=2, threshold=0.5).collect()
    }
    assert pairs[(0, 1)] == 1.0          # exact dup
    assert (0, 2) in pairs               # near dup
    assert (3, 4) not in pairs           # unrelated


def test_minhash_estimates_jaccard(spark, dup_docs):
    exact = {
        (r["a"], r["b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(dup_docs, n=2, threshold=0.0).collect()
    }
    est = {
        (r["a"], r["b"]): r["est_jaccard"]
        for r in dedup.minhash_lsh_pairs(
            dup_docs, num_perm=64, bands=16, threshold=0.3
        ).collect()
    }
    assert (0, 1) in est and est[(0, 1)] == 1.0
    assert (0, 2) in est
    for pair, e in est.items():
        assert abs(e - exact.get(pair, 0.0)) < 0.35  # 64-perm estimator noise


def test_simhash_properties(spark, dup_docs):
    sigs = {r["doc_id"]: r["simhash"]
            for r in dedup.simhash64(dup_docs).collect()}
    assert sigs[0] == sigs[1]  # identical text → identical simhash
    ham_near = bin(sigs[0] ^ sigs[2]).count("1")
    ham_far = bin(sigs[0] ^ sigs[3]).count("1")
    assert ham_near < ham_far
    pairs = {(r["a"], r["b"]) for r in
             dedup.simhash_near_pairs(dup_docs, max_hamming=10).collect()}
    assert (0, 1) in pairs


def test_lsh_ann_recall_vs_brute(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    brute_rows = similarity.cosine_topk_brute(emb, queries, k=5).collect()
    lsh_rows = similarity.cosine_topk_lsh(emb, queries, k=5, n_planes=8).collect()
    brute_sets = {}
    for r in brute_rows:
        brute_sets.setdefault(r["qid"], set()).add(r["vec_id"])
    lsh_sets = {}
    for r in lsh_rows:
        lsh_sets.setdefault(r["qid"], set()).add(r["vec_id"])
    recalls = [
        len(brute_sets[q] & lsh_sets.get(q, set())) / len(brute_sets[q])
        for q in brute_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.5  # multi-probe 8-plane LSH


def test_multimodal_features(spark, dup_docs):
    blobs = multimodal.attach_blob(dup_docs)
    feats = {r["doc_id"]: r for r in multimodal.extract_features(blobs).collect()}
    text0 = dup_docs.filter("doc_id = 0").first()["text"]
    assert feats[0]["n_bytes"] == len(text0.encode())
    assert feats[0]["byte_checksum"] == sum(text0.encode())
    assert feats[0]["width"] == (len(text0.encode()) % 640) + 1
    assert not feats[0]["decoded"]
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\xff\xd8fake")


def test_metrics_hand_built(spark):
    ranking = spark.createDataFrame(
        [(1, 10, 1, 5.0), (1, 11, 2, 4.0), (1, 12, 3, 3.0),
         (2, 20, 1, 5.0), (2, 21, 2, 4.0),
         (3, 30, 1, 5.0)],
        "qid long, pid long, rank int, score double",
    )
    qrels = spark.createDataFrame(
        [(1, 11), (2, 99), (3, 30), (3, 31)], "qid long, pid long"
    )
    assert metrics.mrr_at_k(ranking, qrels, 10).first()["mrr"] == pytest.approx(
        (0.5 + 0.0 + 1.0) / 3, abs=1e-6
    )
    assert metrics.recall_at_k(ranking, qrels, 10).first()["recall"] == pytest.approx(
        (1.0 + 0.0 + 0.5) / 3, abs=1e-6
    )
    assert metrics.success_at_k(ranking, qrels, 1).first()["success"] == pytest.approx(
        1.0 / 3, abs=1e-6
    )


def test_ivf_ann_recall_vs_brute(spark):
    from colbert_spark.operators.similarity import cosine_topk_brute, cosine_topk_ivf

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    brute_sets, ivf_sets = {}, {}
    for r in cosine_topk_brute(emb, queries, k=5).collect():
        brute_sets.setdefault(r["qid"], set()).add(r["vec_id"])
    for r in cosine_topk_ivf(emb, queries, k=5, n_clusters=16, n_probe=6).collect():
        ivf_sets.setdefault(r["qid"], set()).add(r["vec_id"])
    recalls = [
        len(brute_sets[q] & ivf_sets.get(q, set())) / len(brute_sets[q])
        for q in brute_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.5
