"""r6: the map-only strict-fold PQ/IVF kernels must be ROW-IDENTICAL to
the relational formulations they replaced — the ann_pq_top5 /
ann_ivfpq_top5 / ann_ivf_top5 oracles replay the relational semantics in
DuckDB (strict left-to-right folds, argmax csim tie → lowest cell,
argmin dist tie → lowest cid), so exact parity on real fixture
embeddings is the load-bearing invariant, same discipline as
test_lsh_parity / test_simhash_kernel."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import Window

from colbert_spark.operators import similarity
from colbert_spark.operators.similarity import _dot, _norm


def _base(spark, path="/root/testdata/sf0.001/embeddings.parquet"):
    return spark.read.parquet(path).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"))


def test_pq_encode_kernel_equals_relational(spark):
    base = _base(spark)
    m, k_sub = 8, 16
    dim = len(base.select("v").first()[0])
    sub = dim // m
    cb_rows = similarity._pq_codebook_rows(
        spark, base, m, sub, k_sub, "first_k", seed=42)
    cb = similarity._pq_codebook_df(spark, cb_rows)
    rel = similarity._pq_encode(base, cb, m, sub)
    kern = similarity._pq_encode_kernel(base, cb_rows, m, sub)
    a = sorted(map(tuple, rel.collect()))
    b = sorted(map(tuple, kern.collect()))
    assert a == b        # codes AND the exact cn doubles


def test_cell_assign_kernel_equals_window(spark):
    base = _base(spark)
    n_clusters = 16
    cent_rows = base.orderBy("vec_id").limit(n_clusters).collect()
    cent_df = spark.createDataFrame(
        [(int(r["vec_id"]), list(r["v"])) for r in cent_rows],
        "cell int, cv array<double>",
    )
    # the relational formulation the kernel replaced (and the oracle
    # replays): explode vs every centroid, window (csim DESC, cell ASC)
    ic = base.join(F.broadcast(cent_df)).select(
        "vec_id", "v", "cell",
        (_dot(F.col("v"), F.col("cv"))
         / (_norm(F.col("v")) * _norm(F.col("cv")))).alias("csim"),
    )
    wa = Window.partitionBy("vec_id").orderBy(F.desc("csim"), F.asc("cell"))
    rel = (
        ic.withColumn("r", F.row_number().over(wa)).filter(F.col("r") == 1)
        .withColumn("nv", _norm(F.col("v")))
        .select("vec_id", "cell", "nv")
    )
    kern = similarity._assign_cells_first_k(
        base, cent_rows, include_vec=True).select("vec_id", "cell", "nv")
    a = sorted(map(tuple, rel.collect()))
    b = sorted(map(tuple, kern.collect()))
    assert a == b        # cells AND the exact nv doubles


def test_assign_kernel_nan_ranks_first_like_spark_desc(spark):
    # a NaN COMPONENT makes csim NaN without a zero divisor (no ANSI
    # divide-by-zero): Spark's DESC sort puts NaN above every number,
    # tie → lowest cell — the kernel's comparison mask must agree.
    nan = float("nan")
    rows = [(0, [1.0, 0.25]), (1, [0.5, nan]),     # centroid 1 → NaN csim
            (50, [0.5, 0.5]), (51, [nan, 1.0])]    # item 51 all-NaN csims
    base = spark.createDataFrame(rows, "vec_id long, v array<double>")
    cent_rows = base.orderBy("vec_id").limit(2).collect()
    cent_df = spark.createDataFrame(
        [(int(r["vec_id"]), list(r["v"])) for r in cent_rows],
        "cell int, cv array<double>",
    )
    ic = base.join(F.broadcast(cent_df)).select(
        "vec_id", "cell",
        (_dot(F.col("v"), F.col("cv"))
         / (_norm(F.col("v")) * _norm(F.col("cv")))).alias("csim"),
    )
    wa = Window.partitionBy("vec_id").orderBy(F.desc("csim"), F.asc("cell"))
    rel = sorted(map(tuple, (
        ic.withColumn("r", F.row_number().over(wa)).filter(F.col("r") == 1)
        .select("vec_id", "cell")).collect()))
    kern = sorted(map(tuple, similarity._assign_cells_first_k(
        base, cent_rows, include_vec=False).collect()))
    assert rel == kern
    assert dict(kern)[51] == 0    # all-NaN csims tie → lowest cell
    assert dict(kern)[50] == 1    # NaN beats every finite csim (DESC)


def test_assign_kernel_zero_norm_raises_like_ansi(spark):
    # the relational csim division raises DIVIDE_BY_ZERO under ANSI on a
    # zero-norm vector; the kernel must fail loudly too, not emit NaN
    import pytest

    rows = [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (50, [0.0, 0.0])]
    base = spark.createDataFrame(rows, "vec_id long, v array<double>")
    cent_rows = base.orderBy("vec_id").limit(2).collect()
    with pytest.raises(Exception, match="zero-norm"):
        similarity._assign_cells_first_k(
            base, cent_rows, include_vec=False).collect()


def test_strict_folds_match_catalyst_bitwise(spark):
    rng = np.random.default_rng(7)
    V = rng.standard_normal((40, 24))
    C = rng.standard_normal((5, 24))
    base = spark.createDataFrame(
        [(i, [float(x) for x in V[i]]) for i in range(len(V))],
        "vec_id long, v array<double>")
    cents = spark.createDataFrame(
        [(j, [float(x) for x in C[j]]) for j in range(len(C))],
        "cell int, cv array<double>")
    got = {
        (r["vec_id"], r["cell"]): (r["d"], r["nv"])
        for r in base.join(F.broadcast(cents)).select(
            "vec_id", "cell", _dot(F.col("v"), F.col("cv")).alias("d"),
            _norm(F.col("v")).alias("nv")).collect()
    }
    dots = similarity._strict_dot_matrix(V, C)
    nvs = np.sqrt(similarity._strict_sq_norms(V))
    for i in range(len(V)):
        for j in range(len(C)):
            d, nv = got[(i, j)]
            assert d == dots[i, j]      # bitwise, not approx
            assert nv == nvs[i]
