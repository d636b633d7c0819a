"""Similarity search over embedding columns (array<float>).

brute-force cosine top-k — the exact baseline: broadcast the (small) query
side, JVM-side dot products (zip_with + aggregate, whole-stage codegen),
window rank. One shuffle (the rank), no Python.

LSH-bucketed ANN — the scale path: deterministic random-hyperplane
signatures bucket the corpus; candidates = bucket equi-join; exact cosine
only within buckets. Probe multiple "nearby" buckets (bit flips) for
recall. At 10^12 rows the bucket join replaces the O(Q·N) scan.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from .. import caching

SIM_DECIMALS = 6


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_topk_brute(
    items: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
) -> DataFrame:
    """Exact cosine top-k: (qid, vec_id, rank, sim). Excludes self-matches
    when ids collide. All math float64 JVM-side."""
    it = items.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("nv", _norm(F.col("v")))
    q = queries.select(
        F.col(qid_col).alias("qid"),
        F.col(qvec_col).cast("array<double>").alias("qv"),
    ).withColumn("nq", _norm(F.col("qv")))
    scored = it.join(F.broadcast(q)).filter(F.col("vec_id") != F.col("qid")).select(
        "qid", "vec_id",
        F.round(
            _dot(F.col("v"), F.col("qv")) / (F.col("nv") * F.col("nq")),
            SIM_DECIMALS,
        ).alias("sim"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "vec_id", F.col("rank").cast("long").alias("rank"), "sim")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.Generator(np.random.Philox(key=seed))
    return rng.standard_normal((n_planes, dim))


def lsh_signature_col(vec_col, planes: np.ndarray):
    """Bit-signature column: bit j = 1 if dot(v, plane_j) > 0. Pure JVM
    expressions built from literal plane arrays (no UDF)."""
    bits = []
    for j, plane in enumerate(planes):
        lit = F.array(*[F.lit(float(x)) for x in plane])
        bits.append(
            F.when(_dot(F.col(vec_col).cast("array<double>"), lit) > 0,
                   F.lit(1 << j)).otherwise(F.lit(0))
        )
    sig = bits[0]
    for b in bits[1:]:
        sig = sig + b
    return sig.cast("long")


#: past this many plane-literal terms (dim × planes × tables), the
#: literal-expression form for sign(dot) loses to one Arrow matmul pass
#: (V @ P.T) per partition. r6: measured on the sf embeddings (dim 64 ×
#: 8 planes × 6 tables = 3072 literal terms), Catalyst analysis+codegen
#: of the 3072-term tree dominated the whole near-pair probe; the matmul
#: kernel computes identical buckets (sign parity pytested) in one
#: vectorized pass, so the expr path is now reserved for genuinely tiny
#: plane sets.
_LSH_EXPR_LIMIT = 512


def _lsh_buckets_pandas(df: DataFrame, id_name: str, vec_name: str,
                        tables: list[np.ndarray], n_planes: int,
                        flip_bits: bool, include_vec: bool = True) -> DataFrame:
    """One row per (row, table[, probe]) — bucket signatures via a single
    numpy matmul per Arrow batch instead of dim × planes × tables literal
    expressions. flip_bits adds the single-bit multi-probe buckets (query
    side). Every production caller (near-pair self-join AND both top-k
    sides, r5) bands include_vec=False — only (id, bucket) rows, vectors
    re-attach post-dedup via the slim-table join — so the fat payload is
    never np.repeat-ed per bucket row; include_vec=True remains for the
    footprint-ratio test."""
    if include_vec:
        schema = f"{id_name} long, {vec_name} array<double>, bucket long"
    else:
        schema = f"{id_name} long, bucket long"
    gen = _make_lsh_bucket_kernel(id_name, vec_name, tables, n_planes,
                                  flip_bits, include_vec)
    return df.mapInPandas(gen, schema=schema)


def _make_lsh_bucket_kernel(id_name: str, vec_name: str,
                            tables: list[np.ndarray], n_planes: int,
                            flip_bits: bool, include_vec: bool):
    """The Arrow banding kernel, factored out so tests can drive it with a
    raw pandas batch and measure the output footprint directly."""
    import pandas as pd

    planes = np.vstack(tables)  # (T*J, dim)
    n_tab = len(tables)
    weights = (1 << np.arange(n_planes, dtype=np.int64))
    offsets = (np.arange(n_tab, dtype=np.int64) << n_planes)

    def gen(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            vecs = np.asarray(pdf[vec_name].tolist(), dtype=np.float64)
            signs = (vecs @ planes.T) > 0  # (n, T*J)
            buckets = (
                signs.reshape(len(pdf), n_tab, n_planes).astype(np.int64)
                @ weights + offsets
            )  # (n, T)
            if flip_bits:
                flipped = buckets[:, :, None] ^ weights[None, None, :]
                buckets = np.concatenate(
                    [buckets[:, :, None], flipped], axis=2
                ).reshape(len(pdf), -1)
            n_rep = buckets.shape[1]
            cols = {id_name: np.repeat(pdf[id_name].to_numpy(), n_rep)}
            if include_vec:
                cols[vec_name] = np.repeat(pdf[vec_name].to_numpy(), n_rep)
            cols["bucket"] = buckets.reshape(-1)
            yield pd.DataFrame(cols)

    return gen


def cosine_topk_lsh(
    items: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 6,
    n_tables: int = 6,
    probe_flips: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
    dim: int | None = None,
    signature_impl: str = "auto",
) -> DataFrame:
    """ANN cosine top-k via multi-table random-hyperplane LSH.

    L independent tables of J hyperplanes each; a corpus row lands in one
    bucket per table, a query probes its bucket per table plus single-bit
    flips (multi-probe). Exact cosine runs only on bucket-colliding
    candidates — at 10^12 rows this replaces the O(Q·N) brute scan with
    L equi-joins whose fan-in is the bucket occupancy.

    Tuning: per-plane collision prob is 1 − θ/π. The defaults (J=6, L=6,
    1-bit probes) target ~0.7+ recall@5 even when true neighbors sit at
    ~70° (the hard, near-orthogonal regime); raise J / lower L for tighter
    clusters to cut candidate fan-in.

    signature_impl: "expr" (literal plane columns, whole-stage codegen —
    right for small dim, and the oracle-replayable form), "pandas" (one
    Arrow matmul per batch — right when dim × planes × tables would blow
    up codegen, e.g. real 128-1536-dim embeddings), or "auto".

    Pandas-path shuffle/memory shape: the banding kernel emits ONLY
    (id, bucket) on BOTH sides — at dim 1536 float64 a vector is ~12 KB,
    and np.repeat-ing it per bucket row multiplied corpus-side Arrow
    batches ×n_tables and probe-side ×n_tables·(1+n_planes) (~6× / ~54×
    at defaults). Candidates dedup on the slim (qid, vec_id) pairs, THEN
    vectors re-attach: corpus v/nv via one join against the persisted
    slim table (AQE picks broadcast when the candidate set is small —
    each matched vector moves at most once), query qv/nq via a broadcast
    join (query side is small by contract). The slim table is registered
    with caching.register("cosine_topk_lsh"); drain after materializing.
    """
    if dim is None:
        dim = len(items.select(vec_col).first()[0])
    tables = [_hyperplanes(dim, n_planes, seed=42 + 97 * t)
              for t in range(n_tables)]
    if signature_impl == "auto":
        signature_impl = (
            "pandas" if dim * n_planes * n_tables > _LSH_EXPR_LIMIT else "expr"
        )

    it = items.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    q = queries.select(
        F.col(qid_col).alias("qid"),
        F.col(qvec_col).cast("array<double>").alias("qv"),
    )
    if signature_impl == "pandas":
        it_slim = caching.register(
            it.withColumn("nv", _norm(F.col("v"))).persist(),
            "cosine_topk_lsh",
        )
        banded_it = _lsh_buckets_pandas(
            it_slim.select("vec_id", "v"), "vec_id", "v", tables, n_planes,
            flip_bits=False, include_vec=False,
        )
        banded_q = _lsh_buckets_pandas(
            q, "qid", "qv", tables, n_planes,
            flip_bits=probe_flips >= 1, include_vec=False,
        )
        cand = (
            banded_it.join(F.broadcast(banded_q), "bucket")
            .filter(F.col("vec_id") != F.col("qid"))
            .select("qid", "vec_id")
            .dropDuplicates(["qid", "vec_id"])  # dedup BEFORE the fat attach
        )
        q_full = q.withColumn("nq", _norm(F.col("qv")))
        scored = (
            cand.join(it_slim, "vec_id")
            .join(F.broadcast(q_full), "qid")
            .select(
                "qid", "vec_id",
                F.round(
                    _dot(F.col("v"), F.col("qv"))
                    / (F.col("nv") * F.col("nq")),
                    SIM_DECIMALS,
                ).alias("sim"),
            )
        )
        w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("vec_id"))
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "vec_id",
                    F.col("rank").cast("long").alias("rank"), "sim")
        )
    else:
        it = it.withColumn(
            "bucket",
            F.explode(F.array(*[
                lsh_signature_col("v", tables[t]) + F.lit(t << n_planes)
                for t in range(n_tables)
            ])),
        ).withColumn("nv", _norm(F.col("v")))
        q = q.withColumn("nq", _norm(F.col("qv")))
        probes = []
        for t in range(n_tables):
            sig = lsh_signature_col("qv", tables[t]) + F.lit(t << n_planes)
            probes.append(sig)
            if probe_flips >= 1:
                for j in range(n_planes):
                    probes.append(sig.bitwiseXOR(F.lit(1 << j)))
        q = q.withColumn("bucket", F.explode(F.array(*probes)))

    scored = it.join(F.broadcast(q), "bucket").filter(
        F.col("vec_id") != F.col("qid")
    ).select(
        "qid", "vec_id",
        F.round(
            _dot(F.col("v"), F.col("qv")) / (F.col("nv") * F.col("nq")),
            SIM_DECIMALS,
        ).alias("sim"),
    ).dropDuplicates(["qid", "vec_id"])
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "vec_id", F.col("rank").cast("long").alias("rank"), "sim")
    )


def cosine_topk_ivf(
    items: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_clusters: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
    seed: int = 42,
    quantizer: str = "kmeans",
) -> DataFrame:
    """IVF-style ANN: coarse quantizer → probe n_probe nearest centroids →
    exact cosine within probed cells.

    This is the direct analog of the reference's IVF candidate generation
    (colbert/search/candidate_generation.py:45-64: centroid sims → top
    ncells → gather cell members), rebuilt on pyspark.ml KMeans + a
    broadcast centroid table. n_probe/n_clusters are the recall/cost knobs
    (reference ncells, searcher.py:108-127).

    quantizer: "kmeans" (trained, the quality path) or "first_k" — the
    n_clusters lowest-id item vectors become the centroids and every item
    is assigned to its max-cosine centroid (tie → lowest cell). first_k is
    fully deterministic and replayable in ANSI SQL, so the driver's DuckDB
    oracle can check the whole probe funnel end-to-end; recall of the
    trained path is pytest-checked against brute instead.
    """
    spark = items.sparkSession
    base = items.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    if quantizer == "kmeans":
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        ml_items = base.withColumn("features", array_to_vector("v"))
        model = KMeans(k=n_clusters, seed=seed, featuresCol="features").fit(
            ml_items
        )
        assigned = model.transform(ml_items).select(
            "vec_id", "v", F.col("prediction").alias("cell")
        ).withColumn("nv", _norm(F.col("v")))
        cent_df = spark.createDataFrame(
            [(i, [float(x) for x in c])
             for i, c in enumerate(model.clusterCenters())],
            "cell int, cv array<double>",
        )
    elif quantizer == "first_k":
        cent_rows = base.orderBy("vec_id").limit(n_clusters).collect()
        cent_df = spark.createDataFrame(
            [(int(r["vec_id"]), list(r["v"])) for r in cent_rows],
            "cell int, cv array<double>",
        )
        # map-only strict-fold assignment (r6): same (csim DESC, cell
        # ASC) winner as the explode→window form — pinned row-identical
        # in tests/test_pq_kernel.py — minus the N×n_clusters blowup
        # that carried the full vector payload through a window exchange
        assigned = _assign_cells_first_k(base, cent_rows, include_vec=True)
    else:
        raise ValueError(f"unknown quantizer {quantizer!r}")

    q = queries.select(
        F.col(qid_col).alias("qid"),
        F.col(qvec_col).cast("array<double>").alias("qv"),
    ).withColumn("nq", _norm(F.col("qv")))
    # rank centroids per query, keep n_probe nearest (by cosine)
    qc = q.crossJoin(F.broadcast(cent_df)).select(
        "qid", "qv", "nq", "cell",
        (_dot(F.col("qv"), F.col("cv"))
         / (F.col("nq") * _norm(F.col("cv")))).alias("csim"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("csim"), F.asc("cell"))
    probes = qc.withColumn("r", F.row_number().over(w)).filter(
        F.col("r") <= n_probe
    ).select("qid", "qv", "nq", "cell")

    scored = assigned.join(F.broadcast(probes), "cell").filter(
        F.col("vec_id") != F.col("qid")
    ).select(
        "qid", "vec_id",
        F.round(
            _dot(F.col("v"), F.col("qv")) / (F.col("nv") * F.col("nq")),
            SIM_DECIMALS,
        ).alias("sim"),
    ).dropDuplicates(["qid", "vec_id"])
    w2 = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("qid", "vec_id", F.col("rank").cast("long").alias("rank"), "sim")
    )


def cosine_near_pairs(
    items: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    blocking: str = "lsh",
    n_planes: int = 8,
    n_tables: int = 6,
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs → (a, b, sim ≥ threshold),
    a < b. The dedup-family twin of the ANN top-k operators.

    blocking="brute": exact all-pairs scan — quadratic, the ground-truth/
    oracle path (fixture scale only; the docstring threshold: don't run
    beyond ~10^5 vectors).
    blocking="lsh": multi-table random-hyperplane buckets block the
    corpus; only bucket-colliding pairs get the exact cosine. At high
    thresholds collision probability per table is (1 − θ/π)^J with θ
    small, so near-dups collide with near-certainty while the bucket join
    keeps the candidate set ~linear. Recall vs brute is pytest-measured
    (probabilistic, unlike SimHash's combinatorial guarantee).

    Shuffle shape (lsh): band rows carry ONLY (vec_id, bucket) — at dim
    1536 float64 the vector is ~12 KB/row, and duplicating it per bucket
    row through both sides of the corpus×corpus equi-join (n_tables ×
    both sides ≈ 74 KB/doc at defaults) is the exact payload-carry
    anti-pattern the MinHash join fixed (dedup.py minhash_lsh_pairs).
    Vectors re-attach AFTER pair dedup via two hash joins against the
    persisted slim (vec_id, v, nv) table, so each surviving pair moves
    each vector once. The slim table is registered with caching.register;
    call caching.drain() after materializing the result.
    """
    it = items.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("nv", _norm(F.col("v")))
    if blocking == "brute":
        a = it.select(F.col("vec_id").alias("a"), F.col("v").alias("va"),
                      F.col("nv").alias("na"))
        b = it.select(F.col("vec_id").alias("b"), F.col("v").alias("vb"),
                      F.col("nv").alias("nb"))
        pairs = a.join(b, F.col("a") < F.col("b"))
    elif blocking == "lsh":
        if dim is None:  # pass dim to skip this one driver action
            dim = len(items.select(vec_col).first()[0])
        tables = [_hyperplanes(dim, n_planes, seed=42 + 97 * t)
                  for t in range(n_tables)]
        # both re-attach joins read this; one (id, vec, norm) row per doc
        slim = caching.register(it.persist(), "cosine_near_pairs")
        if dim * n_planes * n_tables > _LSH_EXPR_LIMIT:
            banded = _lsh_buckets_pandas(
                slim.select("vec_id", "v"), "vec_id", "v", tables, n_planes,
                flip_bits=False, include_vec=False,
            )
        else:
            banded = slim.select(
                "vec_id",
                F.explode(F.array(*[
                    lsh_signature_col("v", tables[t]) + F.lit(t << n_planes)
                    for t in range(n_tables)
                ])).alias("bucket"),
            )
        a = banded.select(F.col("vec_id").alias("a"), "bucket")
        b = banded.select(F.col("vec_id").alias("b"), "bucket")
        cand = (
            a.join(b, "bucket").filter(F.col("a") < F.col("b"))
            .select("a", "b").dropDuplicates(["a", "b"])
        )
        pairs = cand.join(
            slim.select(F.col("vec_id").alias("a"), F.col("v").alias("va"),
                        F.col("nv").alias("na")), "a",
        ).join(
            slim.select(F.col("vec_id").alias("b"), F.col("v").alias("vb"),
                        F.col("nv").alias("nb")), "b",
        )
    else:
        raise ValueError(f"unknown blocking {blocking!r}")
    return pairs.select(
        "a", "b",
        F.round(
            _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")),
            SIM_DECIMALS,
        ).alias("sim"),
    ).filter(F.col("sim") >= threshold)


def _fold_dot(xs, ys) -> float:
    """Strict left-to-right IEEE-double dot product — bit-identical to
    Spark's aggregate(zip_with(...)) fold and DuckDB's list_dot_product,
    unlike np.dot's pairwise/SIMD summation."""
    s = 0.0
    for x, y in zip(xs, ys):
        s += float(x) * float(y)
    return s


def _subslices(col, m: int, sub: int):
    """Split an array<double> column into its m contiguous sub-vectors."""
    return F.array(*[F.slice(col, mi * sub + 1, sub) for mi in range(m)])


def _strict_dot_matrix(V: np.ndarray, C: np.ndarray) -> np.ndarray:
    """dot(V_i, C_j) for every (row, codeword) pair with _dot's exact
    arithmetic: acc = acc + x*y left-to-right over the element index.
    One vectorized numpy step per element — numpy mul/add are single
    IEEE-double ops (no FMA fusion), so every accumulator sees the same
    operation sequence as the Catalyst aggregate fold and DuckDB's
    list_dot_product (r6 kernel rule, same as the simhash xxhash64
    replica: bit-exact or bust)."""
    acc = np.zeros((V.shape[0], C.shape[0]), dtype=np.float64)
    for i in range(V.shape[1]):
        acc += V[:, i, None] * C[None, :, i]
    return acc


def _strict_sq_norms(V: np.ndarray) -> np.ndarray:
    """⟨v, v⟩ per row with _norm's exact fold (acc = acc + v*v)."""
    acc = np.zeros(V.shape[0], dtype=np.float64)
    for i in range(V.shape[1]):
        acc += V[:, i] * V[:, i]
    return acc


def _vecs_matrix(col, dim: int) -> np.ndarray:
    """pandas column of equal-length lists → (n, dim) float64, loud on
    ragged input (Catalyst's zip_with would null-pad; no caller feeds
    mixed dims, and silent divergence is worse than an error)."""
    V = np.asarray(col.tolist(), dtype=np.float64)
    if V.ndim != 2 or V.shape[1] != dim:
        raise ValueError(
            f"expected uniform dim-{dim} vectors, got shape {V.shape}")
    return V


def _make_cell_assign_kernel(cells: np.ndarray, C: np.ndarray,
                             include_vec: bool):
    """Map-only replacement for the first_k coarse-assignment
    explode→window funnel: per row, csim_j = _dot(v, cv_j) / (_norm(v) *
    _norm(cv_j)) with the identical strict fold, winner = Spark's
    (csim DESC, cell ASC) row_number()==1 pick — NaN ranks above every
    number in a Spark DESC sort, replicated in the comparison mask.
    Emits (vec_id[, v], cell[, nv]); the N×n_clusters intermediate and
    its window exchange never exist."""
    import pandas as pd

    nc = np.sqrt(_strict_sq_norms(C))
    dim = C.shape[1]

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = _vecs_matrix(pdf["v"], dim)
            nv = np.sqrt(_strict_sq_norms(V))
            denom = nv[:, None] * nc[None, :]
            if np.any(denom == 0.0):
                # ANSI parity: the relational form's csim division raises
                # DIVIDE_BY_ZERO on a zero-norm vector or centroid
                raise ValueError(
                    "zero-norm vector or centroid in cosine assignment")
            csims = _strict_dot_matrix(V, C) / denom
            best = csims[:, 0].copy()
            best_cell = np.full(len(pdf), cells[0], dtype=np.int64)
            for j in range(1, len(cells)):
                c = csims[:, j]
                better = (c > best) | (np.isnan(c) & ~np.isnan(best))
                best = np.where(better, c, best)
                best_cell = np.where(better, cells[j], best_cell)
            cols = {"vec_id": pdf["vec_id"].to_numpy()}
            if include_vec:
                cols["v"] = pdf["v"]
            cols["cell"] = best_cell.astype(np.int32)
            out = pd.DataFrame(cols)
            if include_vec:
                out["nv"] = nv
            yield out

    return gen


def _assign_cells_first_k(base: DataFrame, cent_rows, *,
                          include_vec: bool) -> DataFrame:
    """first_k coarse assignment as ONE map-only pass (the centroids are
    already driver-local rows). include_vec additionally passes v through
    and emits nv (the exact-scoring IVF path needs both; the PQ funnels
    need only the slim (vec_id, cell))."""
    cells = np.array([int(r["vec_id"]) for r in cent_rows], dtype=np.int64)
    C = np.array([[float(x) for x in r["v"]] for r in cent_rows],
                 dtype=np.float64)
    gen = _make_cell_assign_kernel(cells, C, include_vec)
    schema = ("vec_id long, v array<double>, cell int, nv double"
              if include_vec else "vec_id long, cell int")
    return base.mapInPandas(gen, schema=schema)


def _make_pq_encode_kernel(cb_by_m: list, m: int, sub: int):
    """Map-only PQ encode: per (row, subspace), dist_j = ⟨sv,sv⟩ −
    2.0·⟨sv,cv_j⟩ + cn_j with the strict folds, winner = Spark's
    min(struct(dist, cid, cn)) — smallest dist, tie → lowest cid, NaN
    greater than every number. Emits the same (vec_id, m, code, cn) rows
    as the relational _pq_encode without the N·m·k_sub explode-join or
    its groupBy exchange."""
    import pandas as pd

    dim = m * sub
    m_col_base = np.arange(m, dtype=np.int32)

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = _vecs_matrix(pdf["v"], dim)
            n = len(pdf)
            codes = np.empty((n, m), dtype=np.int32)
            cns = np.empty((n, m), dtype=np.float64)
            for mi in range(m):
                sv = V[:, mi * sub:(mi + 1) * sub]
                ss = _strict_sq_norms(sv)
                cids, C, cn = cb_by_m[mi]
                dist = (ss[:, None] - 2.0 * _strict_dot_matrix(sv, C)
                        + cn[None, :])
                best = dist[:, 0].copy()
                bi = np.zeros(n, dtype=np.int64)
                for j in range(1, len(cids)):
                    d = dist[:, j]
                    better = (d < best) | (np.isnan(best) & ~np.isnan(d))
                    best = np.where(better, d, best)
                    bi = np.where(better, j, bi)
                codes[:, mi] = cids[bi]
                cns[:, mi] = cn[bi]
            yield pd.DataFrame({
                "vec_id": np.repeat(pdf["vec_id"].to_numpy(), m),
                "m": np.tile(m_col_base, n),
                "code": codes.reshape(-1),
                "cn": cns.reshape(-1),
            })

    return gen


def _pq_encode_kernel(base: DataFrame, cb_rows: list, m: int,
                      sub: int) -> DataFrame:
    """Kernel-encode every vector from the driver-local codebook rows
    [(mi, cid, cv)] — pinned row-identical to the relational _pq_encode
    in tests/test_pq_kernel.py. cn re-uses _fold_dot exactly as the cb
    table does, so downstream arithmetic sees the same doubles."""
    cb_by_m: list = [None] * m
    for mi in range(m):
        entries = sorted((cid, cv) for mj, cid, cv in cb_rows if mj == mi)
        cb_by_m[mi] = (
            np.array([cid for cid, _ in entries], dtype=np.int64),
            np.array([[float(x) for x in cv] for _, cv in entries],
                     dtype=np.float64),
            np.array([_fold_dot(cv, cv) for _, cv in entries],
                     dtype=np.float64),
        )
    gen = _make_pq_encode_kernel(cb_by_m, m, sub)
    return base.mapInPandas(gen,
                            schema="vec_id long, m int, code int, cn double")


def _pq_codebook_rows(spark, base: DataFrame, m: int, sub: int, k_sub: int,
                      quantizer: str, seed: int, head_rows=None) -> list:
    """Codebook rows [(mi, cid, cv)] — driver-local in BOTH quantizer
    paths (first_k collects k_sub rows; kmeans's clusterCenters() are
    driver-side by construction). head_rows lets a caller that already
    collected the sorted head (the fused first_k collect) skip the extra
    driver job."""
    if quantizer == "first_k":
        cent_rows = (head_rows[:k_sub] if head_rows is not None
                     else base.orderBy("vec_id").limit(k_sub).collect())
        return [
            (mi, int(r["vec_id"]),
             [float(x) for x in r["v"][mi * sub:(mi + 1) * sub]])
            for r in cent_rows for mi in range(m)
        ]
    if quantizer != "kmeans":
        raise ValueError(f"unknown quantizer {quantizer!r}")
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    cb_rows = []
    svs = base.select(
        F.posexplode(_subslices(F.col("v"), m, sub)).alias("m", "sv")
    )
    for mi in range(m):
        ml_df = svs.filter(F.col("m") == mi).select(
            array_to_vector("sv").alias("features")
        )
        model = KMeans(k=k_sub, seed=seed + mi,
                       featuresCol="features").fit(ml_df)
        for cid, c in enumerate(model.clusterCenters()):
            cb_rows.append((mi, cid, [float(x) for x in c]))
    return cb_rows


def _pq_codebook_df(spark, cb_rows: list) -> DataFrame:
    return spark.createDataFrame(
        [(mi, cid, cv, _fold_dot(cv, cv)) for mi, cid, cv in cb_rows],
        "m int, cid int, cv array<double>, cn double",
    )


def _pq_codebook(spark, base: DataFrame, m: int, sub: int, k_sub: int,
                 quantizer: str, seed: int) -> DataFrame:
    """Per-subspace PQ codebook table (m, cid, cv, cn=⟨cv,cv⟩).

    first_k: codewords are the sub-vectors of the k_sub lowest-id corpus
    vectors (fully deterministic → DuckDB-replayable). kmeans: one
    pyspark.ml KMeans per subspace (the quality path)."""
    return _pq_codebook_df(
        spark, _pq_codebook_rows(spark, base, m, sub, k_sub, quantizer, seed)
    )


def _pq_encode(base: DataFrame, cb: DataFrame, m: int, sub: int) -> DataFrame:
    """Encode every vector: (vec_id, m, code, cn) — argmin_cid ‖sv−cv‖²
    per (vec_id, subspace) via the dot-product identity (both engines
    fold identically); min(struct) gives map-side combine with the
    (dist, cid) tiebreak."""
    sv = base.select(
        "vec_id", F.posexplode(_subslices(F.col("v"), m, sub)).alias("m", "sv")
    )
    dist = (_dot(F.col("sv"), F.col("sv"))
            - F.lit(2.0) * _dot(F.col("sv"), F.col("cv")) + F.col("cn"))
    return (
        sv.join(F.broadcast(cb), "m")
        .select("vec_id", "m", F.struct(
            dist.alias("d"), F.col("cid").alias("cid"), F.col("cn").alias("cn")
        ).alias("_w"))
        .groupBy("vec_id", "m")
        .agg(F.min("_w").alias("w"))
        .select("vec_id", "m", F.col("w.cid").alias("code"),
                F.col("w.cn").alias("cn"))
    )


def _pq_lut(q: DataFrame, cb: DataFrame, m: int, sub: int) -> DataFrame:
    """Per-query ADC lookup table (qid, m, cid, partial=⟨q_sub, cv⟩) —
    Q·m·k_sub rows, tiny by contract, meant to be broadcast."""
    return (
        q.select("qid",
                 F.posexplode(_subslices(F.col("qv"), m, sub)).alias("m", "qsv"))
        .join(F.broadcast(cb), "m")
        .select("qid", "m", "cid",
                _dot(F.col("qsv"), F.col("cv")).alias("partial"))
    )


def cosine_topk_pq(
    items: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 8,
    k_sub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
    quantizer: str = "first_k",
    seed: int = 42,
    refine: int = 0,
) -> DataFrame:
    """Product-quantization ANN (Jégou et al. 2011) with asymmetric
    distance computation: (qid, vec_id, rank, sim).

    The vector space splits into `m` subspaces; each sub-vector is
    encoded as its nearest codeword (L2, tie → lowest code id) from a
    per-subspace codebook of `k_sub` centroids. A query never touches
    raw corpus vectors: per query, a lookup table of
    dot(query_sub, codeword) partials (Q·m·k_sub rows — tiny by
    contract) is BROADCAST against the code table, and
    approx_cos(q, x) = Σ_m lut[m, code(x,m)] / (‖q‖·‖x̂‖), with the
    reconstruction norm ‖x̂‖ accumulated from codeword norms in the
    same fold. This is the reference's residual-codec scoring idea
    (colbert/indexing/codecs/residual.py:24-53 — centroid + quantized
    lookup instead of raw floats) rebuilt as two joins and a groupBy.

    Why it matters at 100 TB: the code table is m·⌈log2 k_sub⌉ bits per
    vector (8 bytes here vs 512 for the raw float64 vector) — the whole
    searchable index fits where 1.5% of the corpus would, scans are
    64× cheaper, and the per-query work is one broadcast-LUT join over
    codes with map-side-combined partial sums. Compose with
    cosine_topk_ivf's cells (probe first, then ADC within cells) for
    the full IVFADC funnel.

    quantizer: "first_k" — codewords are the sub-vectors of the k_sub
    lowest-id corpus vectors: fully deterministic, so the DuckDB oracle
    replays encode → LUT → ADC → rank end-to-end. "kmeans" — one
    pyspark.ml KMeans per subspace (the quality path; recall is
    pytest-checked against brute instead).

    refine: 0 returns pure ADC scores. refine=R > k runs the standard
    ADC-then-refine funnel: ADC keeps the top-R candidates per query,
    exact cosine re-scores ONLY those R (raw vectors re-attach via one
    id-keyed join — each candidate vector moves once), and the final
    top-k ranks on the exact score. On unstructured/near-orthogonal
    embeddings pure-ADC ordering is noisy (quantization error ≈ signal);
    refine buys near-exact recall for R·Q vector touches instead of
    N·Q — the knob every production PQ system ships.

    Encode here is fused with search for oracle-checkability; a
    production pipeline runs the encode once, persists (vec_id, m,
    code, cn) as the index, and amortizes it across every query batch.
    """
    spark = items.sparkSession
    base = items.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    # first_k: ONE driver collect answers dim AND the codebook (guide
    # §2.6 job-count discipline — was first() + a second sorted collect)
    if quantizer == "first_k":
        head = base.orderBy("vec_id").limit(k_sub).collect()
        if not head:
            raise ValueError("cannot PQ-encode an empty items table")
        dim = len(head[0]["v"])
    else:
        head = None
        dim = len(base.select("v").first()[0])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m

    cb_rows = _pq_codebook_rows(spark, base, m, sub, k_sub, quantizer,
                                seed, head_rows=head)
    cb = _pq_codebook_df(spark, cb_rows)
    codes = _pq_encode_kernel(base, cb_rows, m, sub)

    q = queries.select(
        F.col(qid_col).alias("qid"),
        F.col(qvec_col).cast("array<double>").alias("qv"),
    ).withColumn("nq", _norm(F.col("qv")))
    lut = _pq_lut(q, cb, m, sub)
    sc = (
        codes.join(F.broadcast(lut),
                   (codes["m"] == lut["m"]) & (codes["code"] == lut["cid"]))
        .groupBy("qid", "vec_id")
        .agg(F.sum("partial").alias("adot"), F.sum("cn").alias("recon2"))
    )
    scored = (
        sc.join(F.broadcast(q.select("qid", "nq")), "qid")
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid", "vec_id",
            F.round(F.col("adot") / (F.col("nq") * F.sqrt(F.col("recon2"))),
                    SIM_DECIMALS).alias("sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("vec_id"))
    if refine <= 0:
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "vec_id",
                    F.col("rank").cast("long").alias("rank"), "sim")
        )
    if refine < k:
        raise ValueError(f"refine {refine} must be >= k {k}")
    # ADC as candidate generator: keep top-`refine` per query on the ADC
    # score, then exact-rescore ONLY those — each candidate raw vector
    # moves once through an id-keyed join (R·Q rows), never the corpus
    cand = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= refine)
        .select("qid", "vec_id")
    )
    exact = (
        cand.join(base, "vec_id")
        .join(F.broadcast(q.select("qid", "qv", "nq")), "qid")
        .select(
            "qid", "vec_id",
            F.round(
                _dot(F.col("v"), F.col("qv")) / (_norm(F.col("v")) * F.col("nq")),
                SIM_DECIMALS,
            ).alias("sim"),
        )
    )
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "vec_id", F.col("rank").cast("long").alias("rank"), "sim")
    )


def cosine_topk_ivfpq(
    items: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_clusters: int = 16,
    n_probe: int = 4,
    m: int = 8,
    k_sub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
    quantizer: str = "first_k",
    seed: int = 42,
    refine: int = 0,
) -> DataFrame:
    """IVFADC (Jégou et al. 2011 §V): the full production ANN funnel —
    coarse quantizer prunes the corpus to n_probe cells per query, ADC
    scores ONLY the surviving candidates from their 8-byte PQ codes via
    a broadcast lookup table, and refine=R optionally exact-rescores the
    top-R. Returns (qid, vec_id, rank, sim).

    This is the composition the reference's retrieval engine runs as one
    funnel: centroid probe (colbert/search/candidate_generation.py:45-64)
    → residual-codec approximate scoring (colbert/search/index_storage.
    py:69-116 score_pids) → exact rerank of survivors. Here each stage is
    a DataFrame op: broadcast-centroid probe join, candidate×code join
    against the broadcast LUT, id-keyed re-attach for the exact stage.

    Cost model at 100 TB: the per-query scan is |corpus|·(n_probe/
    n_clusters) code rows (8 B each) instead of |corpus| raw vectors
    (512 B each) — a ~(n_clusters/n_probe)·64× read reduction — and no
    stage shuffles anything wider than (qid, vec_id, two doubles).
    Encode/assignment are fused here for oracle-checkability; production
    persists (vec_id, cell, codes) once as the index.

    quantizer="first_k" keeps every stage deterministic (coarse
    centroids = n_clusters lowest-id vectors, argmax-cosine assignment,
    tie → lowest cell — identical to cosine_topk_ivf's rule) so the
    DuckDB oracle replays the whole funnel; "kmeans" trains both the
    coarse and subspace codebooks (recall pytest-checked vs brute).
    """
    spark = items.sparkSession
    base = items.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    # coarse quantizer → slim (vec_id, cell) assignment + centroid table.
    # first_k: ONE driver collect of the sorted head answers dim, the
    # centroids AND the PQ codebook (was three separate driver jobs), and
    # assignment runs as a map-only strict-fold kernel — the N×n_clusters
    # explode and its window exchange never exist (guide §2.4/§4.2).
    head = None
    if quantizer == "first_k":
        head = base.orderBy("vec_id").limit(max(n_clusters, k_sub)).collect()
        if not head:
            raise ValueError("cannot index an empty items table")
        dim = len(head[0]["v"])
    else:
        dim = len(base.select("v").first()[0])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m

    if quantizer == "first_k":
        cent_rows = head[:n_clusters]
        cent_df = spark.createDataFrame(
            [(int(r["vec_id"]), list(r["v"])) for r in cent_rows],
            "cell int, cv array<double>",
        )
        assigned = _assign_cells_first_k(base, cent_rows, include_vec=False)
    elif quantizer == "kmeans":
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        ml_items = base.withColumn("features", array_to_vector("v"))
        model = KMeans(k=n_clusters, seed=seed, featuresCol="features").fit(
            ml_items
        )
        assigned = model.transform(ml_items).select(
            "vec_id", F.col("prediction").alias("cell")
        )
        cent_df = spark.createDataFrame(
            [(i, [float(x) for x in c])
             for i, c in enumerate(model.clusterCenters())],
            "cell int, cv array<double>",
        )
    else:
        raise ValueError(f"unknown quantizer {quantizer!r}")

    cb_rows = _pq_codebook_rows(spark, base, m, sub, k_sub, quantizer,
                                seed, head_rows=head)
    cb = _pq_codebook_df(spark, cb_rows)
    codes = _pq_encode_kernel(base, cb_rows, m, sub)

    q = queries.select(
        F.col(qid_col).alias("qid"),
        F.col(qvec_col).cast("array<double>").alias("qv"),
    ).withColumn("nq", _norm(F.col("qv")))
    qc = q.crossJoin(F.broadcast(cent_df)).select(
        "qid", "cell",
        (_dot(F.col("qv"), F.col("cv"))
         / (F.col("nq") * _norm(F.col("cv")))).alias("csim"),
    )
    wp = Window.partitionBy("qid").orderBy(F.desc("csim"), F.asc("cell"))
    probes = (
        qc.withColumn("r", F.row_number().over(wp))
        .filter(F.col("r") <= n_probe)
        .select("qid", "cell")
    )

    # candidates: members of probed cells, self excluded — (qid, vec_id)
    cand = (
        assigned.join(F.broadcast(probes), "cell")
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id")
    )

    # ADC over candidates only: (qid, vec_id, m, code) ⋈ broadcast LUT
    lut = _pq_lut(q, cb, m, sub)
    cc = cand.join(codes, "vec_id")
    sc = (
        cc.join(
            F.broadcast(lut),
            (cc["qid"] == lut["qid"]) & (cc["m"] == lut["m"])
            & (cc["code"] == lut["cid"]),
        )
        .select(cc["qid"].alias("qid"), "vec_id", "partial", "cn")
        .groupBy("qid", "vec_id")
        .agg(F.sum("partial").alias("adot"), F.sum("cn").alias("recon2"))
    )
    scored = (
        sc.join(F.broadcast(q.select("qid", "nq")), "qid")
        .select(
            "qid", "vec_id",
            F.round(F.col("adot") / (F.col("nq") * F.sqrt(F.col("recon2"))),
                    SIM_DECIMALS).alias("sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("vec_id"))
    if refine <= 0:
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "vec_id",
                    F.col("rank").cast("long").alias("rank"), "sim")
        )
    if refine < k:
        raise ValueError(f"refine {refine} must be >= k {k}")
    cand_r = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= refine)
        .select("qid", "vec_id")
    )
    exact = (
        cand_r.join(base, "vec_id")
        .join(F.broadcast(q.select("qid", "qv", "nq")), "qid")
        .select(
            "qid", "vec_id",
            F.round(
                _dot(F.col("v"), F.col("qv")) / (_norm(F.col("v")) * F.col("nq")),
                SIM_DECIMALS,
            ).alias("sim"),
        )
    )
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "vec_id", F.col("rank").cast("long").alias("rank"), "sim")
    )


def semdedup(
    items: DataFrame,
    n_clusters: int = 16,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    quantizer: str = "kmeans",
    mode: str = "flag",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    near-duplicate removal by clustering embeddings and comparing pairs
    ONLY within each cluster — the pruning that makes embedding dedup
    tractable when the LSH-banded route (cosine_near_pairs) isn't wanted.

    Deterministic contract: vector i is a duplicate iff some LOWER-id
    vector j in the SAME cell has round(cos(i, j), 6) >= threshold —
    i.e. each ε-ball keeps its minimum-id representative (ties and
    chains resolve by id, no iteration). Cross-cell near-duplicates are
    missed by design (that is SemDeDup's recall trade; raise n_clusters
    for speed, lower it for recall).

    mode='flag'  → dropped rows (vec_id, cell, dup_of, sim): dup_of =
                   the smallest qualifying lower id, sim = that pair's
                   rounded cosine.
    mode='clean' → surviving item rows.

    quantizer: 'kmeans' (trained, quality path) or 'first_k' (the
    n_clusters lowest-id vectors are the centroids, argmax-cosine
    assignment, tie → lowest cell) — fully replayable in ANSI SQL, same
    scheme as cosine_topk_ivf.

    Plan shape: centroids broadcast; ONE shuffle keyed by cell for the
    self-join; pairwise work is Σ|cell|² — bounded by choosing
    n_clusters ∝ N/√target_cell_size; a skewed giant cell shows up in
    the shuffle and is fixed by raising n_clusters, not by salting
    (salting would split balls across keys and change results).
    """
    if mode not in ("flag", "clean"):
        raise ValueError(f"mode must be 'flag' or 'clean', got {mode!r}")
    spark = items.sparkSession
    base = items.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    if quantizer == "kmeans":
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        ml_items = base.withColumn("features", array_to_vector("v"))
        model = KMeans(k=n_clusters, seed=seed, featuresCol="features").fit(
            ml_items)
        assigned = model.transform(ml_items).select(
            "vec_id", "v", F.col("prediction").alias("cell")
        ).withColumn("nv", _norm(F.col("v")))
    elif quantizer == "first_k":
        cent_rows = base.orderBy("vec_id").limit(n_clusters).collect()
        cent_df = spark.createDataFrame(
            [(int(r["vec_id"]), list(r["v"])) for r in cent_rows],
            "cell int, cv array<double>",
        )
        ic = base.join(F.broadcast(cent_df)).select(
            "vec_id", "v", "cell",
            (_dot(F.col("v"), F.col("cv"))
             / (_norm(F.col("v")) * _norm(F.col("cv")))).alias("csim"),
        )
        wa = Window.partitionBy("vec_id").orderBy(F.desc("csim"),
                                                  F.asc("cell"))
        assigned = (
            ic.withColumn("r", F.row_number().over(wa))
            .filter(F.col("r") == 1)
            .select("vec_id", "v", "cell")
            .withColumn("nv", _norm(F.col("v")))
        )
    else:
        raise ValueError(f"unknown quantizer {quantizer!r}")

    a = assigned.select(F.col("vec_id").alias("i"), F.col("cell"),
                        F.col("v").alias("vi"), F.col("nv").alias("ni"))
    b = assigned.select(F.col("vec_id").alias("j"), F.col("cell"),
                        F.col("v").alias("vj"), F.col("nv").alias("nj"))
    pairs = a.join(b, "cell").filter(F.col("i") > F.col("j")).select(
        "i", "cell", "j",
        F.round(_dot(F.col("vi"), F.col("vj"))
                / (F.col("ni") * F.col("nj")), SIM_DECIMALS).alias("sim"),
    ).filter(F.col("sim") >= threshold)
    dropped = pairs.groupBy("i", "cell").agg(
        F.min("j").alias("dup_of"),
        F.min_by("sim", "j").alias("sim"),
    ).select(F.col("i").alias("vec_id"),
             F.col("cell").cast("long").alias("cell"), "dup_of", "sim")
    if mode == "clean":
        return items.join(
            dropped.select(F.col("vec_id").alias(id_col)), id_col,
            "left_anti")
    return dropped
