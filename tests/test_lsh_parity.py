"""r6: the Arrow matmul LSH banding kernel must produce the SAME buckets
as the literal-expression form on real fixture embeddings — the auto
threshold now routes the fixture dim (64 × 8 × 6 = 3072 literal terms)
through the kernel, and the ann_lsh_top5 oracle replays the expr
semantics, so bucket parity is the load-bearing invariant."""

from __future__ import annotations

import pyspark.sql.functions as F

from colbert_spark.operators import similarity


def test_pandas_buckets_equal_expr_buckets(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet") \
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    dim = len(emb.select("v").first()[0])
    n_planes, n_tables = 8, 6
    tables = [similarity._hyperplanes(dim, n_planes, seed=42 + 97 * t)
              for t in range(n_tables)]
    expr = emb.select(
        "vec_id",
        F.explode(F.array(*[
            similarity.lsh_signature_col("v", tables[t]) + F.lit(t << n_planes)
            for t in range(n_tables)
        ])).alias("bucket"),
    )
    kern = similarity._lsh_buckets_pandas(
        emb.select("vec_id", "v"), "vec_id", "v", tables, n_planes,
        flip_bits=False, include_vec=False)
    a = sorted(map(tuple, expr.collect()))
    b = sorted(map(tuple, kern.collect()))
    assert a == b
