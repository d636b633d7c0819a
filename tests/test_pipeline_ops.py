"""Training-data pipeline ops: property-based verification for operators
whose oracles aren't SQL-expressible (MinHash/SimHash/LSH), plus metric
sanity on hand-built rankings."""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F

from colbert_spark.operators import (
    dedup,
    metrics,
    multimodal,
    similarity,
    textstats,
)


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


def test_simhash_blocking_plan_guarantee():
    """k − c ≥ max_hamming for every radius the API accepts (the pigeonhole
    recall guarantee), and plan shape follows the documented policy."""
    import itertools

    for d in range(0, 33):
        k, c = dedup.simhash_blocking_plan(d)
        assert k - c >= d
        assert 1 <= c <= k <= 64
        # keys per doc stays bounded (C(k, c))
        n_keys = len(list(itertools.combinations(range(k), c)))
        assert n_keys <= 600
    with pytest.raises(ValueError):
        dedup.simhash_blocking_plan(33)


def test_stratified_sample_rates_and_determinism(spark):
    """Fraction-1.0 strata keep everything, fraction-0 strata keep
    nothing, middle rates land near their target on a big-enough draw,
    and the surviving set is identical at different partitionings (the
    shuffle-free determinism the operator exists for)."""
    from colbert_spark.operators.sampling import stratified_sample

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    fr = {"src0": 1.0, "src1": 0.0, "src2": 0.5}
    got = stratified_sample(docs, fr, default_fraction=0.2)
    by_src = {r["source"]: r["n"] for r in
              got.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    totals = {r["source"]: r["n"] for r in
              docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert by_src["src0"] == totals["src0"]
    assert "src1" not in by_src
    assert 0 < by_src.get("src2", 0) < totals["src2"]
    ids = sorted(r["doc_id"] for r in got.select("doc_id").collect())
    ids2 = sorted(r["doc_id"] for r in
                  stratified_sample(docs.repartition(13), fr,
                                    default_fraction=0.2)
                  .select("doc_id").collect())
    assert ids == ids2


def test_pack_sequences_tiles_streams_exactly(spark):
    """Within every stream the doc spans tile [0, stream total) with no
    gaps or overlaps, seq bounds follow integer division by the budget,
    and the layout is identical at a different input partitioning."""
    from colbert_spark.operators.packing import pack_sequences

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = pack_sequences(docs, budget=256, n_streams=4).collect()
    streams: dict[int, list] = {}
    for r in out:
        streams.setdefault(r["stream"], []).append(r)
        assert r["seq_first"] == r["start_tok"] // 256
        assert r["seq_last"] == max(r["start_tok"] + r["n_tokens"] - 1,
                                    r["start_tok"]) // 256
    assert len(streams) == 4
    for rows in streams.values():
        rows.sort(key=lambda r: r["start_tok"])
        pos = 0
        for r in rows:
            assert r["start_tok"] == pos
            pos += r["n_tokens"]
    again = pack_sequences(docs.repartition(7), budget=256, n_streams=4).collect()
    key = lambda r: (r["doc_id"], r["stream"], r["start_tok"])
    assert sorted(map(key, out)) == sorted(map(key, again))


def test_quantize_roundtrip_error_bounds(spark):
    """int8 quantize → dequantize: per-element error ≤ scale/(2·127) (+FP
    slack), cosine(v, v̂) ≥ 0.999, and all-zero vectors survive. 4-bit
    shows the bits knob coarsening error as expected."""
    import numpy as np

    from colbert_spark.operators.quantize import (
        dequantize_embeddings, quantize_embeddings)

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet") \
        .filter(F.col("vec_id") < 100).select("vec_id", "embedding")
    zero = spark.createDataFrame(
        [(9999, [0.0] * len(emb.first()["embedding"]))],
        "vec_id long, embedding array<double>")
    both = emb.select("vec_id", F.col("embedding").cast("array<double>")
                      .alias("embedding")).unionByName(zero)
    orig = {r["vec_id"]: np.array(r["embedding"]) for r in both.collect()}
    back = {r["vec_id"]: np.array(r["embedding"])
            for r in dequantize_embeddings(
                quantize_embeddings(both, bits=8), bits=8).collect()}
    assert (back[9999] == 0).all()
    errs8 = []
    for vid, v in orig.items():
        if vid == 9999:
            continue
        vh = back[vid]
        bound = np.abs(v).max() / (2 * 127) * 1.0001
        assert np.abs(v - vh).max() <= bound, vid
        cos = v @ vh / (np.linalg.norm(v) * np.linalg.norm(vh))
        assert cos >= 0.999, (vid, cos)
        errs8.append(np.abs(v - vh).max())
    back4 = {r["vec_id"]: np.array(r["embedding"])
             for r in dequantize_embeddings(
                 quantize_embeddings(both, bits=4), bits=4).collect()}
    err4 = np.mean([np.abs(orig[v] - back4[v]).max()
                    for v in orig if v != 9999])
    assert err4 > np.mean(errs8)  # fewer bits → coarser


def test_canonical_url_contract(spark):
    """The documented canonicalization rules, one case each — scheme/host
    case, default vs real ports, fragments, utm stripping + param sort,
    trailing slashes, root path, and the pass-through for non-URLs."""
    from colbert_spark.operators.webcrawl import canonical_url

    cases = [
        ("HTTPS://EXAMPLE.COM:443/A/b/", "https://example.com/A/b"),
        ("http://h.com:80/x", "http://h.com/x"),
        ("http://h.com:8080/x", "http://h.com:8080/x"),
        ("https://h.com/x#frag", "https://h.com/x"),
        ("https://h.com/x?utm_source=a&b=2&a=1", "https://h.com/x?a=1&b=2"),
        ("https://h.com/x?utm_campaign=z", "https://h.com/x"),
        ("https://h.com/", "https://h.com"),
        ("https://h.com", "https://h.com"),
        ("not a url", "not a url"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = {r["url"]: r["c"]
           for r in df.select("url", canonical_url("url").alias("c")).collect()}
    for raw, want in cases:
        assert got[raw] == want, (raw, got[raw], want)


def test_latest_capture_keeps_newest_per_canonical(spark):
    """Real-timestamp path over the datagen web-page shape: duplicate
    captures of a page under messy raw spellings collapse to one row —
    the newest warc_ts — and capture_stats counts the history."""
    import datetime as dt

    from colbert_spark.operators.webcrawl import capture_stats, latest_capture

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("https://a.com/p1", t0, "old"),
        ("HTTPS://A.COM:443/p1#x", t0 + dt.timedelta(days=2), "newest"),
        ("https://a.com/p1/", t0 + dt.timedelta(days=1), "mid"),
        ("https://b.com/q?z=1&a=2", t0, "only"),
        ("https://b.com/q?a=2&utm_s=x&z=1", t0 - dt.timedelta(days=1), "older"),
    ]
    docs = spark.createDataFrame(rows, "url string, warc_ts timestamp, text string")
    kept = {r["canonical_url"]: r["text"]
            for r in latest_capture(docs).collect()}
    assert kept == {"https://a.com/p1": "newest",
                    "https://b.com/q?a=2&z=1": "only"}
    st = {r["canonical_url"]: (r["n_captures"], r["n_raw_urls"])
          for r in capture_stats(docs).collect()}
    assert st == {"https://a.com/p1": (3, 3), "https://b.com/q?a=2&z=1": (2, 2)}


def test_sample_fraction_threshold_rounds_not_truncates(spark):
    """int(0.29 * 1e6) truncates to 289999 (binary-float error) — one
    bucket short of the advertised rate. The filter literal must be the
    ROUNDED threshold 290000."""
    from colbert_spark.operators.sampling import sample_fraction

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    plan = sample_fraction(docs, 0.29)._jdf.queryExecution().analyzed().toString()
    assert "290000" in plan and "289999" not in plan


def test_pack_sequences_stream_is_raw_hash_mod(spark):
    """Stream assignment must mod the RAW hash, not the sampler's 1e6
    keep-bucket: (h % 1e6) % 48 is measurably non-uniform because 48
    doesn't divide 1e6. Pinned against an independent Python md5 replay
    in portable mode."""
    import hashlib

    from colbert_spark.operators.packing import pack_sequences

    docs = spark.createDataFrame(
        [(i, f"w{i} w{i + 1} w{i + 2}") for i in range(300)],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["stream"]
           for r in pack_sequences(docs, budget=64, n_streams=48,
                                   portable_hash=True).collect()}
    for i in range(300):
        h = int(hashlib.md5(f"{i}:42".encode()).hexdigest()[:15], 16)
        assert got[i] == h % 48, i


def test_near_dup_components_transitive_chain(spark):
    """Chains must collapse to one cluster (the property per-pair 'drop b'
    rules get wrong): a 6-hop path 0-1-2-...-6 plus a disjoint pair all
    label to their component minimum, across more propagation rounds than
    the graph's star radius."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(6)] + [(100, 101)], "a long, b long"
    )
    expect = {**{i: 0 for i in range(7)}, 100: 100, 101: 100}
    for algo in ("doubling", "propagation"):
        got = {r["doc_id"]: r["rep"]
               for r in dedup.near_dup_components(pairs,
                                                  algorithm=algo).collect()}
        assert got == expect, algo
    with pytest.raises(RuntimeError):
        dedup.near_dup_components(
            spark.createDataFrame([(i, i + 1) for i in range(6)],
                                  "a long, b long"),
            max_iter=1)


def test_near_dup_components_doubling_beats_chain_diameter(spark):
    """Adversarial 60-hop path: plain propagation needs O(diameter) ≈ 59
    rounds and must fail a 20-round budget; pointer-jump doubling
    (Hash-to-Min style) contracts label chains in O(log d) and converges
    well inside it with identical components."""
    chain = spark.createDataFrame([(i, i + 1) for i in range(60)],
                                  "a long, b long")
    with pytest.raises(RuntimeError):
        dedup.near_dup_components(chain, max_iter=20,
                                  algorithm="propagation")
    got = {r["doc_id"]: r["rep"]
           for r in dedup.near_dup_components(chain, max_iter=20,
                                              algorithm="doubling").collect()}
    assert got == {i: 0 for i in range(61)}


def test_near_dup_components_empty_graph(spark):
    empty = spark.createDataFrame([], "a long, b long")
    assert dedup.near_dup_components(empty).collect() == []


def test_curate_corpus_equals_operator_composition(spark):
    """The single-pass funnel must keep exactly the docs that survive the
    three individual operators applied in sequence (dedup keep-first →
    quality gate → lang gate) — one tokenize pass is an optimization,
    never a semantics change."""
    from colbert_spark.operators import textstats
    from colbert_spark.operators.curation import curate_corpus

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
    )
    got = {r["doc_id"]: (r["n_tokens"], r["stopword_ratio"], r["lang_pred"])
           for r in curate_corpus(docs, require_lang="en").collect()}

    kept = dedup.exact_dedup_keep_first(docs)
    quality = textstats.quality_features(kept)
    lang = textstats.lang_id_heuristic(kept)
    want = {
        r["doc_id"]: (r["n_tokens"], r["stopword_ratio"], r["lang_pred"])
        for r in quality.filter(F.col("quality") == 1)
        .join(lang.filter(F.col("lang_pred") == "en"), "doc_id")
        .select("doc_id", "n_tokens", "stopword_ratio", "lang_pred")
        .collect()
    }
    assert len(want) > 0 and got == want


def test_simhash_blocking_plan_128():
    """128-bit plan: single-band (selective ≥ 8-bit keys) through radius
    15 — the regime a 64-bit signature cannot reach — pigeonhole recall at
    every radius, no warning until keys actually narrow (radius 17)."""
    import itertools
    import warnings

    for d in range(0, 33):
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            k, c = dedup.simhash_blocking_plan(d, num_bits=128)
        assert k - c >= d
        if d <= 15:
            assert (k, c) == (d + 1, 1)
        else:
            assert (k, c) == (d + 2, 2)
        assert bool(w) == (d >= 17)  # 14-bit keys at 16; ≤ 12-bit past it
        n_keys = len(list(itertools.combinations(range(k), c)))
        assert n_keys <= 600
    # 64-bit behavior unchanged by the num_bits generalization
    assert dedup.simhash_blocking_plan(7) == (8, 1)
    with pytest.warns(RuntimeWarning):
        assert dedup.simhash_blocking_plan(8) == (10, 2)


def test_simhash128_banded_equals_brute_at_radius_12(spark):
    """128-bit banded pairs at hamming ≤ 12 (single-band plan, k=13) must
    equal the brute all-pairs scan exactly — 100% recall via pigeonhole
    with bands split across the two signature halves."""
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter(F.col("doc_id") < 200)
        .select("doc_id", "text")
    )
    sigs = dedup.simhash128(docs)
    banded = {
        (r["a"], r["b"], r["hamming"])
        for r in dedup.simhash_near_pairs128(docs, max_hamming=12,
                                             sigs=sigs,
                                             allpairs_max=0).collect()
    }
    a = sigs.select(F.col("doc_id").alias("a"), F.col("simhash_lo").alias("la"),
                    F.col("simhash_hi").alias("ha"))
    b = sigs.select(F.col("doc_id").alias("b"), F.col("simhash_lo").alias("lb"),
                    F.col("simhash_hi").alias("hb"))
    brute = {
        (r["a"], r["b"], r["hamming"])
        for r in a.join(b, F.col("a") < F.col("b"))
        .select("a", "b",
                (F.bit_count(F.col("la").bitwiseXOR(F.col("lb")))
                 + F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
                .cast("long").alias("hamming"))
        .filter(F.col("hamming") <= 12)
        .collect()
    }
    assert len(brute) > 0  # fixture actually exercises the radius
    assert banded == brute
    # identical-text docs collide on the full 128 bits
    dup = {r["doc_id"]: (r["simhash_lo"], r["simhash_hi"])
           for r in dedup.simhash128(
               spark.createDataFrame([(0, "alpha beta gamma"),
                                      (1, "alpha beta gamma")],
                                     "doc_id long, text string")).collect()}
    assert dup[0] == dup[1]


def test_simhash_banded_equals_brute_at_radius_10(spark):
    """Recall test the old 4×16 banding failed: banded pairs at hamming ≤ 10
    must equal the brute all-pairs scan exactly (candidate false positives
    are removed by the exact bit_count filter, so equality == 100% recall)."""
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter(F.col("doc_id") < 200)
        .select("doc_id", "text")
    )
    sigs = dedup.simhash64(docs)
    banded = {
        (r["a"], r["b"], r["hamming"])
        for r in dedup.simhash_near_pairs(docs, max_hamming=10,
                                          sigs=sigs,
                                          allpairs_max=0).collect()
    }
    a = sigs.select(F.col("doc_id").alias("a"), F.col("simhash").alias("ha"))
    b = sigs.select(F.col("doc_id").alias("b"), F.col("simhash").alias("hb"))
    brute = {
        (r["a"], r["b"], r["hamming"])
        for r in a.join(b, F.col("a") < F.col("b"))
        .select("a", "b",
                F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
                .cast("long").alias("hamming"))
        .filter(F.col("hamming") <= 10)
        .collect()
    }
    assert len(brute) > 0  # fixture actually exercises the radius
    assert banded == brute


def test_simhash_allpairs_path_equals_banding(spark):
    """The small-corpus all-pairs popcount path (r6) must return exactly
    the banding path's pair set — 64-bit and 128-bit, including the
    hamming values — on a fixture large enough to produce pairs."""
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter(F.col("doc_id") < 200)
        .select("doc_id", "text")
    )
    for fn, radius in ((dedup.simhash_near_pairs, 10),
                       (dedup.simhash_near_pairs128, 12)):
        allpairs = {
            (r["a"], r["b"], r["hamming"])
            for r in fn(docs, max_hamming=radius,
                        allpairs_max=10**9).collect()
        }
        banded = {
            (r["a"], r["b"], r["hamming"])
            for r in fn(docs, max_hamming=radius,
                        allpairs_max=0).collect()
        }
        assert len(banded) > 0
        assert allpairs == banded


def test_portable_hash_variants_consistent(spark, dup_docs):
    """portable_hash=True (md5) and the xxhash64 default must agree on the
    hash-independent structure: exact-dup simhashes collide, and MinHash
    est_jaccard for an exact dup pair is 1.0 under both hashes."""
    for portable in (False, True):
        sigs = {r["doc_id"]: r["simhash"]
                for r in dedup.simhash64(dup_docs,
                                         portable_hash=portable).collect()}
        assert sigs[0] == sigs[1]
        pairs = {(r["a"], r["b"]): r["est_jaccard"]
                 for r in dedup.minhash_lsh_pairs(
                     dup_docs, num_perm=64, bands=16, threshold=0.5,
                     portable_hash=portable).collect()}
        assert pairs[(0, 1)] == 1.0


def test_ivf_first_k_quantizer_matches_probe_all(spark):
    """first_k quantizer with n_probe == n_clusters degenerates to exact
    brute top-k (every cell probed) — checks the funnel loses nothing."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").filter(
        F.col("vec_id") < 200
    )
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    brute = sorted(
        (r["qid"], r["vec_id"], r["rank"])
        for r in similarity.cosine_topk_brute(emb, queries, k=5).collect()
    )
    ivf = sorted(
        (r["qid"], r["vec_id"], r["rank"])
        for r in similarity.cosine_topk_ivf(
            emb, queries, k=5, n_clusters=8, n_probe=8, quantizer="first_k"
        ).collect()
    )
    assert ivf == brute


def test_lsh_pandas_impl_high_dim_recall(spark):
    """dim-128 LSH must route to the Arrow matmul signature path (auto)
    and keep recall vs brute; the expr path at this dim would build a
    128×8×6-literal codegen tree."""
    emb64 = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    emb = emb64.select(
        "vec_id", F.concat("embedding", "embedding").alias("embedding")
    )
    queries = emb.filter(F.col("vec_id") < 15).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    brute_rows = similarity.cosine_topk_brute(emb, queries, k=5).collect()
    lsh = similarity.cosine_topk_lsh(emb, queries, k=5, n_planes=8,
                                     signature_impl="auto")
    lsh_rows = lsh.collect()
    brute_sets, lsh_sets = {}, {}
    for r in brute_rows:
        brute_sets.setdefault(r["qid"], set()).add(r["vec_id"])
    for r in lsh_rows:
        lsh_sets.setdefault(r["qid"], set()).add(r["vec_id"])
    recalls = [
        len(brute_sets[q] & lsh_sets.get(q, set())) / len(brute_sets[q])
        for q in brute_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.5


def test_lsh_pandas_and_expr_buckets_agree_on_small_dim(spark):
    """On a dim where both impls are viable, the two signature paths must
    produce the same candidate structure for exact duplicates: a vector
    always shares all buckets with itself-as-query (recall 1.0 for the
    self pair at rank 1 — excluded — so its exact duplicate wins)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet") \
        .filter(F.col("vec_id") < 100).select("vec_id", "embedding")
    dup = emb.filter(F.col("vec_id") == 3).select(
        (F.col("vec_id") + 1000).alias("vec_id"), "embedding")
    both = emb.unionByName(dup)
    queries = both.filter(F.col("vec_id") == 1003).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    for impl in ("expr", "pandas"):
        rows = similarity.cosine_topk_lsh(
            both, queries, k=1, n_planes=8, signature_impl=impl).collect()
        assert rows and rows[0]["vec_id"] == 3 and rows[0]["sim"] == 1.0, impl


def test_cosine_near_pairs_lsh_recall_vs_brute(spark):
    """LSH-blocked embedding near-dup recall vs the exact all-pairs scan.
    Plants exact + jittered duplicates so high-sim pairs exist; at sim
    ≥ 0.9 the hyperplane collision probability per table is ≈ (1 − θ/π)^J
    with θ ≈ 26°, so 6 tables recover planted pairs with near-certainty."""
    import numpy as np

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet") \
        .filter(F.col("vec_id") < 200).select("vec_id", "embedding")
    rows = emb.collect()
    planted = []
    rng = np.random.Generator(np.random.Philox(key=7))
    for i, r in enumerate(rows[:20]):
        v = np.array(r["embedding"], dtype=np.float64)
        jit = v + rng.normal(0, 0.05 * np.abs(v).mean(), v.size)
        planted.append((int(r["vec_id"]) + 10_000, [float(x) for x in jit]))
    both = emb.unionByName(
        spark.createDataFrame(planted, "vec_id long, embedding array<double>")
        .select("vec_id", F.col("embedding").cast("array<float>").alias("embedding"))
    )
    brute = {(r["a"], r["b"]) for r in similarity.cosine_near_pairs(
        both, threshold=0.9, blocking="brute").collect()}
    lsh = {(r["a"], r["b"]) for r in similarity.cosine_near_pairs(
        both, threshold=0.9, blocking="lsh", n_planes=8).collect()}
    assert len(brute) >= 15          # the plant worked
    assert lsh <= brute              # exact filter → no false positives
    assert len(lsh & brute) / len(brute) >= 0.9


def test_multimodal_resize_and_frame_sample(spark, dup_docs):
    """Resize/frame-sample plumbing: schemas, explosion counts, and
    determinism are the contract (codecs are stubbed by design)."""
    blobs = multimodal.attach_blob(dup_docs)
    resized = multimodal.resize_images(blobs, width=8, height=4).collect()
    assert {r["doc_id"] for r in resized} == set(range(6))
    for r in resized:
        assert len(r["blob"]) == 32 and r["width"] == 8 and r["height"] == 4

    frames = multimodal.sample_frames(blobs, every_nth=2, frame_bytes=16,
                                      fps=30).collect()
    texts = {r["doc_id"]: r["text"] for r in dup_docs.collect()}
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rows in by_doc.items():
        n_frames = max(len(texts[doc_id].encode()) // 16, 1)
        expected_idx = list(range(0, n_frames, 2))
        assert sorted(r["frame_idx"] for r in rows) == expected_idx
        for r in rows:
            assert r["ts_ms"] == r["frame_idx"] * 1000 // 30
    # deterministic
    again = multimodal.sample_frames(blobs, every_nth=2, frame_bytes=16,
                                     fps=30).collect()
    key = lambda r: (r["doc_id"], r["frame_idx"])
    assert sorted(((r["doc_id"], r["frame_idx"], bytes(r["frame"]))
                   for r in frames)) == \
           sorted(((r["doc_id"], r["frame_idx"], bytes(r["frame"]))
                   for r in again))


def test_simhash_jvm_fold_matches_numpy_reference(spark):
    """The 64-aggregate JVM fold must equal an independent numpy
    implementation of SimHash on randomized corpora (hash → ±tf votes per
    bit → sign bits → signed int64)."""
    import numpy as np

    from colbert_spark.functions.analysis import python_tokenize

    rng = np.random.Generator(np.random.Philox(key=123))
    vocab = [f"w{i}" for i in range(40)]
    rows = []
    for doc_id in range(60):
        n = int(rng.integers(1, 50))
        words = [vocab[int(i)] for i in rng.integers(0, len(vocab), n)]
        rows.append((doc_id, " ".join(words)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["simhash"]
           for r in dedup.simhash64(docs).collect()}

    # independent reference: xxhash64 values pulled from Spark (the hash
    # itself is JVM-only), fold done fully in numpy
    hdf = spark.createDataFrame(
        [(t,) for t in vocab], "term string"
    ).select("term", F.xxhash64("term").alias("h")).collect()
    h_of = {r["term"]: np.uint64(np.int64(r["h"])) for r in hdf}
    for doc_id, text in rows:
        toks = python_tokenize(text)
        counts = {}
        for t in toks:
            counts[t] = counts.get(t, 0) + 1
        votes = np.zeros(64, dtype=np.int64)
        for t, tf in counts.items():
            h = int(h_of[t])
            for b in range(64):
                votes[b] += tf if (h >> b) & 1 else -tf
        sig = 0
        for b in range(64):
            if votes[b] > 0:
                sig |= 1 << b
        if sig >= 1 << 63:
            sig -= 1 << 64
        assert got[doc_id] == sig, doc_id


def test_create_triples_reference_semantics(spark):
    """Positive selection must equal an independent replay of the
    reference's greedy slot rule (utility/supervision/triples.py:53-57);
    negatives: exactly num_negatives per query from the label-0 pool,
    deterministic under repartitioning."""
    from colbert_spark.operators.triples import create_triples

    rows = []
    # qid 1: positives at ranks 2, 4, 11, 30; rest negatives (depth 30)
    for rank in range(1, 31):
        rows.append((1, 100 + rank, rank, 1 if rank in (2, 4, 11, 30) else 0))
    # qid 2: positives beyond every slot's best budget
    for rank in range(1, 16):
        rows.append((2, 200 + rank, rank, 1 if rank <= 5 else 0))
    labeled = spark.createDataFrame(
        rows, "qid long, pid long, rank int, label int"
    )
    specs = ((2, 10), (1, 25))

    def replay(qrows):
        taken, c = [], 0
        for pid, rank, label in sorted(qrows, key=lambda x: x[1]):
            if not label:
                continue
            m = max([b for b, d in specs if rank <= d], default=0)
            if c < m:
                taken.append(pid)
                c += 1
            else:
                break  # prefix property: once refused, never take again
        return taken

    out = create_triples(labeled, positives=specs, depth=30,
                         num_negatives=3).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["qid"], {}).setdefault(r["pos"], set()).add(r["neg"])
    for qid in (1, 2):
        qrows = [(p, rk, lb) for q, p, rk, lb in rows if q == qid]
        expect_pos = set(replay(qrows))
        assert set(by_q.get(qid, {})) == expect_pos, qid
        for pos, negs in by_q[qid].items():
            assert len(negs) == 3
            neg_pool = {p for p, rk, lb in qrows if lb == 0}
            assert negs <= neg_pool
    # same negatives for every positive of a qid (query-level sample)
    negsets = list(by_q[1].values())
    assert all(s == negsets[0] for s in negsets)
    # deterministic under physical layout changes
    out2 = create_triples(labeled.repartition(16), positives=specs, depth=30,
                          num_negatives=3).collect()
    assert sorted((r["qid"], r["pos"], r["neg"]) for r in out) == \
           sorted((r["qid"], r["pos"], r["neg"]) for r in out2)


def test_create_triples_permissive_reference_semantics(spark):
    """Permissive mode must equal a pure-Python replay of the reference's
    sample_for_query with permissive=True (triples.py:42-72): every label-1
    row becomes a positive (counter grows on both branches), refused ones
    pair with negatives at list position > their rank."""
    from colbert_spark.operators.triples import create_triples

    rows = []
    # qid 1: positives at ranks 2, 4, 11, 18; depth 30
    for rank in range(1, 31):
        rows.append((1, 100 + rank, rank, 1 if rank in (2, 4, 11, 18) else 0))
    labeled = spark.createDataFrame(
        rows, "qid long, pid long, rank int, label int"
    )
    specs = ((2, 10), (1, 25))

    def replay_positives(qrows):
        strict, refused, count = [], [], 0
        for pid, rank, label in sorted(qrows, key=lambda x: x[1]):
            if not label:
                continue
            take = any(rank <= d and count < b for b, d in specs)
            if take:
                strict.append(pid)
            else:
                # neg_start = rank; eligible negs are list positions > rank
                refused.append((pid, rank))
            count += 1  # permissive: grows on BOTH branches
        return strict, refused

    out = create_triples(labeled, positives=specs, depth=30,
                         num_negatives=3, permissive=True,
                         permissive_negatives=2).collect()
    qrows = [(p, rk, lb) for q, p, rk, lb in rows]
    strict, refused = replay_positives(qrows)
    by_pos = {}
    for r in out:
        by_pos.setdefault(r["pos"], set()).add(r["neg"])
    assert set(by_pos) == set(strict) | {p for p, _ in refused}
    negs_in_order = [p for p, rk, lb in sorted(qrows, key=lambda x: x[1])
                     if lb == 0]
    for pid in strict:
        assert len(by_pos[pid]) == 3  # full num_negatives, whole pool
    for pid, rank in refused:
        eligible = set(negs_in_order[rank:])  # list position > rank
        assert len(by_pos[pid]) == 2  # permissive_negatives
        assert by_pos[pid] <= eligible, (pid, rank)
    # non-permissive output is untouched by the new parameters
    base = create_triples(labeled, positives=specs, depth=30,
                          num_negatives=3).collect()
    strict_np = {r["pos"] for r in base}
    assert strict_np == {102, 104}  # prefix rule: refused-at-11 stops takes


def test_create_triples_self_semantics(spark):
    """Self-training triples (self_training.py:28-57): pools are pure rank
    cutoffs (no qrels), num_sampled negatives per query, one per-negative
    positive; biased mode draws half the sample from the first-100
    negatives and half from the rest (:19-25)."""
    from colbert_spark.operators.triples import create_triples_self

    # qid 1: 200 ranked pids (pid = 1000 + rank)
    rows = [(1, 1000 + r, r) for r in range(1, 201)]
    ranking = spark.createDataFrame(rows, "qid long, pid long, rank int")

    out = create_triples_self(
        ranking, npositives=1, depth_positive=5, cutoff_negative=20,
        depth_negative=200, num_sampled=8,
    ).collect()
    pos_pool = {1000 + r for r in range(1, 6)}
    neg_pool = {1000 + r for r in range(21, 201)}
    assert len(out) == 8 and len({r["neg"] for r in out}) == 8
    assert all(r["pos"] in pos_pool and r["neg"] in neg_pool for r in out)

    # biased: half the negatives from the first 100 of the pool, half after
    biased = create_triples_self(
        ranking, npositives=1, depth_positive=5, cutoff_negative=20,
        depth_negative=200, num_sampled=8, biased=True,
    ).collect()
    top100 = {1000 + r for r in range(21, 121)}  # first 100 negatives
    n_top = sum(r["neg"] in top100 for r in biased)
    assert len(biased) == 8 and n_top == 4

    # npositives > 1 → sorted array of distinct positives per negative
    multi = create_triples_self(
        ranking, npositives=2, depth_positive=5, cutoff_negative=20,
        depth_negative=200, num_sampled=4,
    ).collect()
    assert len(multi) == 4
    for r in multi:
        assert len(r["pos"]) == 2 and r["pos"] == sorted(set(r["pos"]))

    # deterministic under physical layout changes
    again = create_triples_self(
        ranking.repartition(16), npositives=1, depth_positive=5,
        cutoff_negative=20, depth_negative=200, num_sampled=8,
    ).collect()
    assert sorted((r["qid"], r["pos"], r["neg"]) for r in out) == \
           sorted((r["qid"], r["pos"], r["neg"]) for r in again)


def test_lsh_banding_kernel_footprint_is_slim():
    """r5: the production banding kernel (include_vec=False, both top-k
    sides and the near-pair join) must emit an output whose per-batch
    footprint is a small fraction of the fat (vector-carrying) variant —
    the np.repeat of an embedding per bucket row multiplied Arrow batches
    ×n_tables corpus-side and ×n_tables·(1+n_planes) probe-side."""
    import numpy as np
    import pandas as pd

    from colbert_spark.operators.similarity import (
        _hyperplanes,
        _make_lsh_bucket_kernel,
    )

    dim, n_planes, n_tables, n = 512, 8, 6, 256
    tables = [_hyperplanes(dim, n_planes, seed=42 + 97 * t)
              for t in range(n_tables)]
    rng = np.random.Generator(np.random.Philox(key=5))
    pdf = pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "v": [rng.standard_normal(dim) for _ in range(n)],
    })

    def footprint(include_vec, flip_bits):
        gen = _make_lsh_bucket_kernel("vec_id", "v", tables, n_planes,
                                      flip_bits, include_vec)
        out = next(gen(iter([pdf])))
        total = 0
        for c in out.columns:
            if out[c].dtype == object:  # vector cells
                total += sum(a.nbytes for a in out[c])
            else:
                total += out[c].to_numpy().nbytes
        return total, out

    slim_b, slim = footprint(False, False)
    fat_b, fat = footprint(True, False)
    # identical bucket assignments, ~n_tables× smaller payload
    assert list(slim.columns) == ["vec_id", "bucket"]
    assert (slim["bucket"].to_numpy() == fat["bucket"].to_numpy()).all()
    assert fat_b / slim_b > 4  # 6 tables → fat carries 6 vector copies/row

    slim_probe_b, _ = footprint(False, True)
    fat_probe_b, _ = footprint(True, True)
    assert fat_probe_b / slim_probe_b > 4  # ×(1+n_planes) rows on probes


def test_line_dedup_keep_first_and_reconstruction(spark):
    """Hand-built corpus: the keep-first winner is the smallest
    (doc_id, pos) occurrence of each NORMALIZED line; empty-normal lines
    always survive; reconstruction preserves order; an all-dropped doc
    yields text_clean ''."""
    docs = spark.createDataFrame(
        [
            (0, "alpha beta\ncommon line\ngamma"),
            (1, "common line\ndelta\ncommon line"),
            (2, "unique stuff\n!!!\nCOMMON, line"),
            (3, "common line"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in dedup.line_dedup(docs).collect()}
    assert out[0]["n_lines"] == 3 and out[0]["n_kept"] == 3
    assert out[0]["text_clean"] == "alpha beta\ncommon line\ngamma"
    # doc 1: both its occurrences lose to doc 0's (including the in-doc dup)
    assert out[1]["n_lines"] == 3 and out[1]["n_kept"] == 1
    assert out[1]["text_clean"] == "delta"
    # doc 2: '!!!' normalizes empty -> always kept; 'COMMON, line'
    # normalizes to 'common line' -> dropped despite differing raw text
    assert out[2]["n_lines"] == 3 and out[2]["n_kept"] == 2
    assert out[2]["text_clean"] == "unique stuff\n!!!"
    assert out[3]["n_lines"] == 1 and out[3]["n_kept"] == 0
    assert out[3]["text_clean"] == ""


def test_gopher_quality_rules_hand_case(spark):
    """Each rule exercised in both directions against a pure-Python
    replay of the formulas on the shared tokenizer."""
    rows = [
        (0, "the cat and a dog ran to the park in morning light today ok"),
        (1, "### 404 505 ... 606 ### 707 ... 808 909 111 222 333 444"),
        (2, "the a"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in textstats.gopher_quality(
            docs, min_words=5, max_words=20, min_avg_len=2.0,
            max_avg_len=4.0, max_symbol_ratio=0.1, min_alpha_ratio=0.8,
            min_stop_hits=2,
        ).collect()
    }
    from colbert_spark.functions.analysis import python_tokenize

    stop = {"the", "a", "of", "and", "to", "in", "is", "it"}
    for doc_id, text in rows:
        t = python_tokenize(text)
        raw = [w for w in text.split() if w]
        exp_n = len(t)
        exp_avg = round(sum(len(x) for x in t) / exp_n, 6)
        exp_sym = round((text.count("#") + text.count("...")) / exp_n, 6)
        exp_alpha = round(
            sum(1 for w in raw if any(c.isalpha() for c in w)) / len(raw), 6)
        exp_stop = len(set(t) & stop)
        r = out[doc_id]
        assert r["n_words"] == exp_n
        assert r["avg_word_len"] == pytest.approx(exp_avg, abs=1e-9)
        assert r["symbol_ratio"] == pytest.approx(exp_sym, abs=1e-9)
        assert r["alpha_ratio"] == pytest.approx(exp_alpha, abs=1e-9)
        assert r["stop_hits"] == exp_stop
        assert r["gopher_pass"] == int(
            5 <= exp_n <= 20 and 2.0 <= exp_avg <= 4.0 and exp_sym <= 0.1
            and exp_alpha >= 0.8 and exp_stop >= 2
        )
    # direction checks: 0 passes everything, 1 fails symbol+alpha+stop,
    # 2 fails word count
    assert out[0]["gopher_pass"] == 1
    assert out[1]["flag_symbol"] == 0 and out[1]["flag_alpha"] == 0
    assert out[1]["flag_stopwords"] == 0
    assert out[2]["flag_word_count"] == 0 and out[2]["gopher_pass"] == 0


def test_pq_kmeans_recall_vs_brute(spark):
    """Trained-codebook PQ (per-subspace KMeans) vs exact brute cosine on
    the fixture embeddings. Pure ADC ordering on near-orthogonal random
    vectors is noisy (quantization error ≈ signal) — it only needs to
    beat chance by a wide margin; the production path is ADC-as-
    candidate-generator + exact refine, which must recover most of the
    true top-5 while touching only R·Q raw vectors."""
    from colbert_spark.operators.similarity import (
        cosine_topk_brute, cosine_topk_pq,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    n_items = emb.count()
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )

    def recall(df):
        got = {}
        for r in df.collect():
            got.setdefault(r["qid"], set()).add(r["vec_id"])
        rs = [
            len(brute_sets[q] & got.get(q, set())) / len(brute_sets[q])
            for q in brute_sets
        ]
        return sum(rs) / len(rs)

    brute_sets = {}
    for r in cosine_topk_brute(emb, queries, k=5).collect():
        brute_sets.setdefault(r["qid"], set()).add(r["vec_id"])

    adc = recall(cosine_topk_pq(emb, queries, k=5, m=8, k_sub=16,
                                quantizer="kmeans"))
    # chance recall@5 is 5/(n-1); ADC must beat it by >10x
    assert adc > 10 * 5.0 / (n_items - 1)
    refined = recall(cosine_topk_pq(emb, queries, k=5, m=8, k_sub=16,
                                    quantizer="kmeans", refine=50))
    assert refined >= 0.6
    assert refined > adc


def test_ivfpq_full_probe_equals_pq(spark):
    """Probing every coarse cell makes the IVFADC candidate set the whole
    corpus, so the funnel must reduce exactly to flat PQ with the same
    codebooks and refine depth — same rows, same sims, same ranks."""
    from colbert_spark.operators.similarity import (
        cosine_topk_ivfpq, cosine_topk_pq,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    pq = sorted(
        tuple(r) for r in cosine_topk_pq(
            emb, queries, k=5, m=8, k_sub=16, quantizer="first_k", refine=20
        ).collect()
    )
    ivfpq = sorted(
        tuple(r) for r in cosine_topk_ivfpq(
            emb, queries, k=5, n_clusters=16, n_probe=16, m=8, k_sub=16,
            quantizer="first_k", refine=20
        ).collect()
    )
    assert pq == ivfpq


def test_ivfpq_kmeans_recall_vs_brute(spark):
    """Trained coarse + subspace codebooks with refine: the production
    IVFADC path keeps useful recall vs brute while scanning only
    n_probe/n_clusters of the code table."""
    from colbert_spark.operators.similarity import (
        cosine_topk_brute, cosine_topk_ivfpq,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    brute_sets, got = {}, {}
    for r in cosine_topk_brute(emb, queries, k=5).collect():
        brute_sets.setdefault(r["qid"], set()).add(r["vec_id"])
    out = cosine_topk_ivfpq(emb, queries, k=5, n_clusters=16, n_probe=8,
                            m=8, k_sub=16, quantizer="kmeans", refine=50)
    for r in out.collect():
        got.setdefault(r["qid"], set()).add(r["vec_id"])
    recalls = [
        len(brute_sets[q] & got.get(q, set())) / len(brute_sets[q])
        for q in brute_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.35


def test_rrf_fuse_hand_case(spark):
    """Hand-computed RRF: overlapping pid fuses both contributions, a
    single-system pid gets one; ranks re-window on the fused score."""
    from colbert_spark.operators.fusion import rrf_fuse

    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)], "qid long, pid long, rank long"
    )
    b = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2)], "qid long, pid long, rank long"
    )
    out = {r["pid"]: r for r in rrf_fuse([a, b], k_rrf=60, topk=10).collect()}
    assert out[11]["rrf_score"] == pytest.approx(
        round(1 / 62 + 1 / 61, 6), abs=1e-9)
    assert out[10]["rrf_score"] == pytest.approx(round(1 / 61, 6), abs=1e-9)
    assert out[13]["rrf_score"] == pytest.approx(round(1 / 62, 6), abs=1e-9)
    assert out[12]["rrf_score"] == pytest.approx(round(1 / 63, 6), abs=1e-9)
    # 11 beats 10 (two contributions); 13 (1/62) beats 12 (1/63);
    # 10 vs 13: 1/61 > 1/62
    assert [out[p]["rank"] for p in (11, 10, 13, 12)] == [1, 2, 3, 4]


def test_winnow_fingerprints_properties(spark):
    """Python replay of the selection on one doc + the winnowing
    guarantee: docs sharing a run of >= w+n-1 tokens share a selected
    hash; sub-window docs keep their global min; empty docs hash ''."""
    import hashlib

    from colbert_spark.functions.analysis import python_tokenize

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    rows = [
        (0, shared + " iota kappa unique one two three"),
        (1, "different prefix words here " + shared),
        (2, "tiny doc here"),            # 3 < n → zero shingles
        (3, "five little tokens right here"),  # 2 shingles < w → global min
        (4, "..."),                      # normalizes empty
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r
           for r in textstats.winnow_fingerprints(docs, n=4, w=5).collect()}

    def replay(text, n=4, w=5):
        t = python_tokenize(text)
        grams = [" ".join(t[i:i + n]) for i in range(len(t) - n + 1)]
        hs = [hashlib.md5(g.encode()).hexdigest() for g in grams]
        if len(hs) >= w:
            sel = sorted({min(hs[i:i + w]) for i in range(len(hs) - w + 1)})
        elif hs:
            sel = [min(hs)]
        else:
            sel = []
        return (len(grams), len(sel),
                hashlib.md5(" ".join(sel).encode()).hexdigest(), set(sel))

    sels = {}
    for doc_id, text in rows:
        n_g, n_s, fp, sel = replay(text)
        assert out[doc_id]["n_grams"] == n_g
        assert out[doc_id]["n_selected"] == n_s
        assert out[doc_id]["winnow_fp"] == fp
        sels[doc_id] = sel
    # guarantee: 8 shared tokens = w + n - 1 → at least one common hash
    assert sels[0] & sels[1]
    assert out[2]["n_grams"] == 0 and out[2]["n_selected"] == 0
    assert out[3]["n_grams"] == 2 and out[3]["n_selected"] == 1
    assert out[4]["winnow_fp"] == replay("...")[2]  # md5('')


def test_perplexity_buckets_terciles(spark):
    """Buckets partition the corpus into ordered thirds: every head
    score <= every middle score <= every tail score, and sizes are
    near-equal (interpolated-percentile cuts)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = textstats.perplexity_buckets(docs).collect()
    by = {"head": [], "middle": [], "tail": []}
    for r in rows:
        by[r["ppl_bucket"]].append(r["bits_per_token"])
    n = len(rows)
    assert n == 500
    for b in by.values():
        assert abs(len(b) - n / 3) < n * 0.1
    assert max(by["head"]) <= min(by["middle"])
    assert max(by["middle"]) <= min(by["tail"])


def test_prf_reduces_to_bm25_and_expansion_moves_ranks(spark):
    """fb_terms=0 must reproduce plain BM25 exactly (same rows, ranks,
    scores); with expansion on, at least one query's top-10 changes —
    the feedback terms are doing something."""
    from colbert_spark.operators.brute import bm25_topk
    from colbert_spark.operators.expansion import bm25_prf_topk

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select(F.col("doc_id").alias("pid"), "text")
    from colbert_spark.entry_queries import QUERY_SET

    queries = spark.createDataFrame(QUERY_SET, "qid long, text string")
    base = sorted(tuple(r) for r in bm25_topk(docs, queries, k=10).collect())
    prf0 = sorted(
        tuple(r) for r in
        bm25_prf_topk(docs, queries, k=10, fb_terms=0).collect()
    )
    assert base == prf0
    prf = sorted(
        tuple(r) for r in
        bm25_prf_topk(docs, queries, k=10, fb_docs=5, fb_terms=10,
                      fb_weight=0.5).collect()
    )
    assert prf != base


def test_kwic_snippets_window_election(spark):
    """Window election: densest window wins, earliest on tie; zero-hit
    rows fall back to the document head with n_hits 0."""
    from colbert_spark.operators.snippets import kwic_snippets

    docs = spark.createDataFrame(
        [
            # one hit at 0; later a dense cluster: cat(6) cat(7) dog(8)
            (1, "cat filler filler filler filler filler cat cat dog end"),
            (2, "nothing relevant here at all whatsoever friend"),
        ],
        "pid long, text string",
    )
    queries = spark.createDataFrame([(7, "cat dog")], "qid long, text string")
    ranking = spark.createDataFrame(
        [(7, 1, 1), (7, 2, 2)], "qid long, pid long, rank long"
    )
    out = {r["pid"]: r for r in
           kwic_snippets(ranking, docs, queries, width=4).collect()}
    # windows starting at each hit p ∈ {0, 6, 7, 8}: counts 1, 3, 2, 1
    assert out[1]["n_hits"] == 3
    assert out[1]["snippet"] == "cat cat dog end"
    assert out[2]["n_hits"] == 0
    assert out[2]["snippet"] == "nothing relevant here at"
    # tie → earliest: two equally dense windows
    docs2 = spark.createDataFrame(
        [(5, "cat a b cat c d")], "pid long, text string")
    r2 = spark.createDataFrame([(7, 5, 1)], "qid long, pid long, rank long")
    row = kwic_snippets(r2, docs2, queries, width=3).collect()[0]
    assert row["n_hits"] == 1 and row["snippet"] == "cat a b"


def test_phrase_match_hand_case(spark):
    """Contiguous-run counting: overlapping runs count per start position;
    scattered terms (all present, never adjacent) do NOT match."""
    from colbert_spark.operators.phrase import phrase_match

    docs = spark.createDataFrame(
        [
            (1, "a b a b a b"),     # "a b" starts at 0,2,4 → tf 3
            (2, "b a x a x b"),     # both terms present, never "a b"
            (3, "a b"),             # exact doc == phrase
            (4, "a"),               # shorter than the phrase
        ],
        "pid long, text string",
    )
    phrases = spark.createDataFrame([(9, "a b")], "qid long, text string")
    out = {r["pid"]: r for r in phrase_match(docs, phrases).collect()}
    assert set(out) == {1, 3}
    assert out[1]["phrase_tf"] == 3 and out[1]["rank"] == 1
    assert out[3]["phrase_tf"] == 1 and out[3]["rank"] == 2


def test_bm25_proximity_rerank_moves_adjacent_doc_up(spark):
    """Two docs with identical term bags (same BM25): the one where the
    query terms are adjacent outranks the scattered one after the
    MinDist boost; with prox_weight=0 the ranking equals plain BM25."""
    from colbert_spark.operators import brute
    from colbert_spark.operators.phrase import bm25_proximity_topk

    docs = spark.createDataFrame(
        [
            (1, "cat x x x x dog"),  # same bag as pid 2, scattered
            (2, "x x cat dog x x"),  # adjacent → bigger boost
            (3, "cat z z z z z"),    # one term only → zero boost
        ],
        "pid long, text string",
    )
    queries = spark.createDataFrame([(1, "cat dog")], "qid long, text string")
    out = bm25_proximity_topk(docs, queries, k=3).orderBy("rank").collect()
    assert [r["pid"] for r in out[:2]] == [2, 1]
    # plain BM25 ties 1 and 2 → pid tiebreak puts 1 first
    base = brute.bm25_topk(docs, queries, k=3).orderBy("rank").collect()
    assert [r["pid"] for r in base[:2]] == [1, 2]
    # zero-weight rerank reproduces the base ranking exactly
    z = bm25_proximity_topk(docs, queries, k=3, prox_weight=0.0)
    assert [(r["qid"], r["pid"], r["rank"]) for r in z.orderBy("rank").collect()] \
        == [(r["qid"], r["pid"], r["rank"]) for r in base]


def test_boolean_search_gate_semantics(spark):
    """must=AND, should=OR (vacuous when empty), must_not=NOT; matches
    ranked by BM25 over must ∪ should."""
    from colbert_spark.operators.phrase import boolean_search

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "alpha beta banned"),
            (3, "alpha delta gamma"),
            (4, "beta gamma delta"),
        ],
        "pid long, text string",
    )
    bq = spark.createDataFrame(
        [
            (0, "alpha", "beta delta", "banned"),  # 1 (beta), 3 (delta); 2 banned
            (1, "gamma", "", ""),                  # 1, 3, 4
        ],
        "qid long, must string, should string, must_not string",
    )
    out = boolean_search(docs, bq, k=10).collect()
    got = {(r["qid"], r["pid"]) for r in out}
    assert got == {(0, 1), (0, 3), (1, 1), (1, 3), (1, 4)}
    assert all(r["score"] > 0 for r in out)


def test_boolean_search_minimum_should_match(spark):
    """msm counts DISTINCT matched should terms: 0 makes should purely
    score-boosting, 2 requires two, msm > len(should) is unmatchable,
    and an empty should list under msm>=1 is unmatchable (vs the None
    default where it's vacuously true)."""
    from colbert_spark.operators.phrase import boolean_search

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),       # matches beta+gamma (2 should)
            (2, "alpha beta"),             # matches beta only   (1 should)
            (3, "alpha"),                  # matches none        (0 should)
        ],
        "pid long, text string",
    )
    bq = spark.createDataFrame(
        [(0, "alpha", "beta gamma delta", "")],
        "qid long, must string, should string, must_not string",
    )

    def pids(msm):
        return {r["pid"] for r in
                boolean_search(docs, bq, k=10,
                               min_should_match=msm).collect()}

    assert pids(0) == {1, 2, 3}     # should purely optional
    assert pids(1) == {1, 2}        # == the at-least-one default
    assert pids(2) == {1}           # requires two distinct should hits
    assert pids(4) == set()         # msm > len(should): unmatchable

    # empty should list: vacuous under the None default, unmatchable
    # under msm >= 1
    bq_empty = spark.createDataFrame(
        [(0, "alpha", "", "")],
        "qid long, must string, should string, must_not string")
    assert {r["pid"] for r in boolean_search(docs, bq_empty, k=10).collect()} \
        == {1, 2, 3}
    assert {r["pid"] for r in
            boolean_search(docs, bq_empty, k=10,
                           min_should_match=1).collect()} == set()


def test_fuzzy_search_matches_expanded_bm25(spark):
    """fuzzy_bm25_topk must equal plain bm25_topk run on the hand-
    expanded distance-1 term sets (computed with a pure-Python
    levenshtein over the vocabulary), including an in-vocab term
    keeping its neighbors and a nonsense term expanding to nothing."""
    from colbert_spark.functions.analysis import python_tokenize
    from colbert_spark.operators.brute import bm25_topk
    from colbert_spark.operators.fuzzy import fuzzy_bm25_topk

    docs_rows = [
        (0, "table scan filter"),
        (1, "label table join"),
        (2, "scan scans span"),
        (3, "filter merge sort"),
    ]
    docs = spark.createDataFrame(docs_rows, "pid long, text string")
    queries = [(0, "tabel scan"), (1, "zzzqx filter")]
    q = spark.createDataFrame(queries, "qid long, text string")

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                         prev + (ca != cb))
        return dp[-1]

    vocab = sorted({t for _, x in docs_rows for t in python_tokenize(x, 220)})
    expanded = [
        (qid, " ".join(sorted({v for t in python_tokenize(x, 32)
                               for v in vocab if lev(t, v) <= 1})))
        for qid, x in queries
    ]
    # sanity on the fixture: 'tabel' pulls 'label' (one substitution)
    # but NOT 'table' (a transposition is distance 2 — plain
    # Levenshtein, like Lucene with transpositions=false); in-vocab
    # 'scan' still pulls scans+span; 'zzzqx' pulls nothing
    assert expanded[0][1] == "label scan scans span"
    assert expanded[1][1] == "filter"

    eq = spark.createDataFrame(expanded, "qid long, text string")
    want = sorted(map(tuple, bm25_topk(docs, eq, k=10).collect()))
    got = sorted(map(tuple, fuzzy_bm25_topk(docs, q, k=10).collect()))
    assert got == want


def test_fuzzy_term_suggest(spark):
    """Deletion-neighborhood candidates + exact distance filter: exact
    match ranks first, dist-1 edits found, transpositions (dist 2 via a
    shared deletion) and far terms excluded; df breaks ties."""
    from colbert_spark.operators.fuzzy import term_suggest

    dic = spark.createDataFrame(
        [("scan", 100), ("scans", 40), ("span", 60), ("table", 10),
         ("chair", 5)],
        "term string, df long",
    )
    probes = spark.createDataFrame(
        [("scan",), ("scann",), ("tabel",), ("zzz",)], "qterm string")
    out = term_suggest(dic, probes, k=5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["qterm"], []).append(
            (r["rank"], r["term"], r["dist"]))
    for v in by_q.values():
        v.sort()
    # exact first (dist 0), then dist-1 by df desc: span(60) > scans(40)
    assert by_q["scan"] == [(1, "scan", 0), (2, "span", 1), (3, "scans", 1)]
    assert by_q["scann"] == [(1, "scan", 1), (2, "scans", 1)]
    # 'tabel' shares the deletion 'tabl' with 'table' but levenshtein=2
    assert "tabel" not in by_q
    assert "zzz" not in by_q


def test_fuzzy_complete_prefix(spark):
    """Autocomplete: top-k completions per prefix by (df desc, term asc);
    a prefix IS its own completion; no-match prefixes yield no rows."""
    from colbert_spark.operators.fuzzy import complete_prefix

    dic = spark.createDataFrame(
        [("scan", 100), ("scatter", 80), ("scale", 80), ("span", 60),
         ("sc", 7), ("table", 10)],
        "term string, df long",
    )
    pf = spark.createDataFrame([("sc",), ("tab",), ("zz",)],
                               "prefix string")
    out = complete_prefix(dic, pf, k=3).collect()
    by_p = {}
    for r in out:
        by_p.setdefault(r["prefix"], []).append((r["rank"], r["term"]))
    for v in by_p.values():
        v.sort()
    # df desc, then term asc for the 80-80 tie; 'sc' itself (df 7) cut at k=3
    assert by_p["sc"] == [(1, "scan"), (2, "scale"), (3, "scatter")]
    assert by_p["tab"] == [(1, "table")]
    assert "zz" not in by_p


def test_fuzzy_autocorrect_query_terms(spark):
    """In-vocab terms pass through; OOV terms map to the best dist-1
    suggestion (df desc tiebreak); uncorrectable OOV terms drop; output
    is distinct per (qid, term) even when a fix collides with an
    existing in-vocab term."""
    from colbert_spark.operators.fuzzy import autocorrect_query_terms

    dic = spark.createDataFrame(
        [("scan", 100), ("scans", 40), ("filter", 70), ("key", 30)],
        "term string, df long",
    )
    qt = spark.createDataFrame(
        [(0, "scan"), (0, "filtr"),      # in-vocab + correctable
         (1, "scann"), (1, "scan"),      # fix collides with in-vocab term
         (2, "zzzzz")],                  # uncorrectable -> drops
        "qid long, term string",
    )
    out = autocorrect_query_terms(dic, qt).collect()
    got = {(r["qid"], r["term"]) for r in out}
    assert got == {(0, "scan"), (0, "filter"), (1, "scan")}
    assert len(out) == len(got)  # distinct


def test_semdedup_min_id_representative(spark):
    """Each ε-ball keeps its min-id member; cross-cell near-dups are NOT
    dropped (the SemDeDup recall trade); clean mode = anti-join."""
    from colbert_spark.operators.similarity import semdedup

    # cells (first_k, k=2): centroids are vec 0 (x-axis) and vec 1
    # (y-axis). 0,2,3 land in cell 0; 1,4 in cell 1.
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0]),
        (2, [0.99, 0.01, 0.0]),   # ≈ vec 0 → dropped (dup_of 0)
        (3, [0.6, 0.4, 0.0]),     # cell 0, cos≈0.83 vs 0/2: below τ=0.95
        (4, [0.01, 0.999, 0.0]),  # ≈ vec 1 → dropped (dup_of 1)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semdedup(emb, n_clusters=2, threshold=0.95, quantizer="first_k")
    got = {r["vec_id"]: r["dup_of"] for r in out.collect()}
    assert got == {2: 0, 4: 1}
    kept = semdedup(emb, n_clusters=2, threshold=0.95,
                    quantizer="first_k", mode="clean")
    assert sorted(r["vec_id"] for r in kept.collect()) == [0, 1, 3]
    # chain semantics: 3 at τ low enough to catch 3~2 keeps dup_of = min j
    out2 = {r["vec_id"]: r["dup_of"]
            for r in semdedup(emb, n_clusters=2, threshold=0.80,
                              quantizer="first_k").collect()}
    assert out2[3] == 0 or out2[3] == 2  # lower-id witness exists
    assert out2[2] == 0


def test_dsir_weights_prefer_target_like_docs(spark):
    """Docs sharing the target's vocabulary score higher than docs that
    don't; a pure-Python replay of the formula matches exactly."""
    import math
    from collections import Counter

    from colbert_spark.operators.dsir import dsir_log_weights

    corpus = spark.createDataFrame(
        [
            (1, "apple banana apple banana"),
            (2, "metal oxide metal oxide"),
            (3, "apple metal banana oxide"),
        ],
        "doc_id long, text string",
    )
    target = spark.createDataFrame(
        [(100, "apple banana apple apple banana")], "doc_id long, text string")
    B = 32
    out = {r["doc_id"]: r["log_weight"]
           for r in dsir_log_weights(corpus, target, n_buckets=B).collect()}
    assert out[1] > out[3] > out[2]

    # exact replay
    def grams(text):
        t = text.split()
        return t + [f"{a} {b}" for a, b in zip(t, t[1:])]

    import hashlib

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % B

    raw = Counter(bucket(g) for _, tx in
                  [(1, "apple banana apple banana"),
                   (2, "metal oxide metal oxide"),
                   (3, "apple metal banana oxide")] for g in grams(tx))
    tgt = Counter(bucket(g) for g in grams("apple banana apple apple banana"))
    tr, tt = sum(raw.values()), sum(tgt.values())

    def lw(text):
        return round(sum(
            math.log((tgt.get(bucket(g), 0) + 1.0) / (tt + B))
            - math.log((raw.get(bucket(g), 0) + 1.0) / (tr + B))
            for g in grams(text)), 6)

    assert abs(out[1] - lw("apple banana apple banana")) < 2e-6
    assert abs(out[2] - lw("metal oxide metal oxide")) < 2e-6


def test_facet_counts_totals_and_nulls(spark):
    """Facet totals equal the ranked-set size per dimension; NULLs count
    under 'null'."""
    from colbert_spark.operators.facets import facet_counts

    docs = spark.createDataFrame(
        [(1, "en", "a"), (2, "en", None), (3, "de", "a")],
        "pid long, lang string, src string")
    ranking = spark.createDataFrame(
        [(7, 1), (7, 2), (7, 3), (8, 1)], "qid long, pid long")
    out = facet_counts(ranking, docs, ["lang", "src"]).collect()
    got = {(r["qid"], r["facet"], r["value"]): r["n_hits"] for r in out}
    assert got[(7, "lang", "en")] == 2 and got[(7, "lang", "de")] == 1
    assert got[(7, "src", "a")] == 2 and got[(7, "src", "null")] == 1
    assert got[(8, "lang", "en")] == 1
    # per-dimension totals == ranked size
    assert sum(v for (q, f, _), v in got.items()
               if q == 7 and f == "lang") == 3
