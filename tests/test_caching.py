"""The session-scoped cache registry (colbert_spark/caching.py).

Operators that persist an intermediate register it; callers drain after
materializing results. Replaces the old `result.cached_deps` attribute,
which any subsequent DataFrame transformation silently dropped.
"""

import pyspark.sql.functions as F

from colbert_spark import caching
from colbert_spark.operators import dedup, similarity


def test_minhash_registers_and_drain_unpersists(spark):
    caching.drain()  # clean slate from other tests
    docs = spark.createDataFrame(
        [(i, f"the quick brown fox {i % 3}") for i in range(30)],
        "doc_id long, text string",
    )
    out = dedup.minhash_lsh_pairs(docs, num_perm=16, bands=4, threshold=0.5)
    out.collect()
    deps = caching.registered("minhash_lsh_pairs")
    assert len(deps) == 1
    assert deps[0].storageLevel.useMemory  # actually persisted
    assert caching.drain(owner="minhash_lsh_pairs", blocking=True) == 1
    assert not deps[0].storageLevel.useMemory
    # registry is empty for that owner now; a second drain is a no-op
    assert caching.drain(owner="minhash_lsh_pairs") == 0


def test_near_pairs_lsh_registers_slim_table(spark):
    caching.drain()
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet") \
        .filter(F.col("vec_id") < 50).select("vec_id", "embedding")
    similarity.cosine_near_pairs(emb, threshold=0.99, blocking="lsh").collect()
    deps = caching.registered("cosine_near_pairs")
    assert len(deps) == 1
    # the slim table is (vec_id, v, nv) — id + vector + norm, nothing else
    assert set(deps[0].columns) == {"vec_id", "v", "nv"}
    assert caching.drain(blocking=True) >= 1
    assert caching.registered() == []
