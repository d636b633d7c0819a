"""Deduplication operators for web-scale corpus curation.

Four families over documents(id, text):
  exact          — md5-hash groupBy (one shuffle on the hash, not the text)
  n-gram Jaccard — shingle self-join with exact set overlap
  MinHash + LSH  — signature bands → bucket join → candidate pairs
  SimHash        — 64-bit fingerprint, near-dup by Hamming distance

Everything stays JVM-side except the SimHash bit-fold (Arrow applyInPandas
over pre-hashed terms). Design notes for 10^12 docs: every join here keys
on a hash (uniform distribution → no skew); shingle joins are the heavy
path and MinHash/LSH exists precisely to replace the quadratic shingle
self-join with a band-bucket equi-join.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from colbert_spark import caching
from colbert_spark.functions import analysis

# 31-bit Mersenne prime: products a*h stay under 2^62 (ANSI-safe int64)
_MINHASH_P = 2147483647

#: SimHash all-pairs fast-path threshold (see _allpairs_hamming_pairs).
#: Size-adaptive algorithm selection, the broadcast-join analog: below
#: this many signatures an exact vectorized N² popcount sweep is cheaper
#: than banding's candidate join (at large radii the banding keys carry
#: ~10-13 effective bits, so candidate volume is already ~N²/2^11 —
#: within a small constant of all-pairs, at far higher per-pair cost).
#: At the default, the worst task does ≤ threshold²/parallelism ≈ 10^7
#: vectorized XOR+popcounts; above it the banding path (the 100-TB
#: shape) runs unchanged. Not a local[32] constant: the crossover is a
#: property of corpus size, like spark.sql.autoBroadcastJoinThreshold.
_SIMHASH_ALLPAIRS_MAX = int(
    os.environ.get("SPARK_GRAFT_SIMHASH_ALLPAIRS_MAX", "20000"))

#: byte-wise popcount LUT for the all-pairs Hamming sweep (numpy < 2 has
#: no bitwise_count)
_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def _allpairs_hamming_pairs(sigs: DataFrame, id_col: str,
                            sig_cols: list[str],
                            max_hamming: int) -> DataFrame:
    """Exact (a < b, hamming ≤ max_hamming) pairs by a distributed
    all-pairs popcount sweep — the small-corpus fast path of
    simhash_near_pairs/128. The full signature table (one or two longs
    per doc, bounded by the caller's threshold) is broadcast; each task
    XORs its partition's signatures against all of them in numpy and
    emits the pairs whose smaller id it owns, so every qualifying
    unordered pair appears exactly once. Result-identical to the
    guaranteed-recall banding path by construction (banding = the same
    exact pair set, pigeonhole recall + exact bit_count filter);
    pytest-pinned in tests/test_pipeline_ops.py."""
    rows = sigs.select(id_col, *sig_cols).collect()
    n = len(rows)
    ids_all = np.fromiter((r[0] for r in rows), dtype=np.int64, count=n)
    mats_all = [
        np.fromiter((r[i + 1] for r in rows), dtype=np.int64, count=n)
        .view(np.uint64)
        for i in range(len(sig_cols))
    ]
    bc = sigs.sparkSession.sparkContext.broadcast((ids_all, mats_all))
    thr = int(max_hamming)
    cols = list(sig_cols)

    def gen(batches):
        all_ids, all_mats = bc.value
        n_all = all_ids.size
        if n_all == 0:
            return
        # bound the per-chunk XOR matrix to ~64 MB
        step = max(1, (64 << 20) // (n_all * 8))
        for pdf in batches:
            my_ids = pdf[id_col].to_numpy()
            my_mats = [pdf[c].to_numpy().astype(np.int64).view(np.uint64)
                       for c in cols]
            for lo in range(0, my_ids.size, step):
                hi = min(lo + step, my_ids.size)
                m = hi - lo
                ham = np.zeros((m, n_all), dtype=np.int64)
                for mine, allm in zip(my_mats, all_mats):
                    x = mine[lo:hi, None] ^ allm[None, :]
                    ham += _POP8[x.view(np.uint8)].reshape(
                        m, n_all, 8).sum(axis=2, dtype=np.int64)
                mask = (ham <= thr) & (all_ids[None, :] > my_ids[lo:hi, None])
                ai, bi = np.nonzero(mask)
                if ai.size:
                    yield pd.DataFrame({
                        "a": my_ids[lo:hi][ai], "b": all_ids[bi],
                        "hamming": ham[ai, bi],
                    })

    return sigs.mapInPandas(gen, schema="a long, b long, hamming long")


def md5_hash64(col) -> "F.Column":
    """Engine-portable 60-bit hash: first 15 hex chars of md5, base-16
    parsed. Identical in Spark (conv) and DuckDB (('0x'||substr)::BIGINT)
    — used by the oracle-checked dedup variants so a DuckDB oracle can
    replay the exact hash pipeline. xxhash64 stays the scale-path default
    (JVM-native, no hex round-trip)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _hash64(col, portable: bool):
    return md5_hash64(col) if portable else F.xxhash64(col)


def normalized_text(text_col: str = "text"):
    """Canonical form: tokens re-joined with single spaces."""
    return F.array_join(analysis.tokens(text_col), " ")


def exact_dedup_summary(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """(num_docs, num_distinct_texts, num_dup_docs): corpus-level exact-dup
    profile. Dedup keys on md5(normalized text) so the shuffle carries
    16-byte hashes, not documents."""
    h = docs.select(F.md5(F.encode(normalized_text(text_col), "UTF-8")).alias("h"))
    groups = h.groupBy("h").count()
    return groups.agg(
        F.sum("count").alias("num_docs"),
        F.count(F.lit(1)).alias("num_distinct_texts"),
        F.sum(F.when(F.col("count") > 1, F.col("count") - 1).otherwise(0)).alias(
            "num_dup_docs"
        ),
    )


def exact_dedup_keep_first(docs: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text") -> DataFrame:
    """Keep the lowest-id doc per identical normalized text."""
    withh = docs.withColumn(
        "_h", F.md5(F.encode(normalized_text(text_col), "UTF-8"))
    )
    keep = withh.groupBy("_h").agg(F.min(id_col).alias(id_col))
    return withh.join(keep, ["_h", id_col], "left_semi").drop("_h")


def shingle_expr(terms_col, n: int):
    """array<string> terms → array of n-gram shingle strings (0-based Spark
    array indexing inside transform)."""
    idx = ", ".join(f"t[i+{j}]" for j in range(n))
    return F.expr(
        f"transform(sequence(0, size({terms_col}) - {n}), "
        f"i -> concat_ws(' ', {idx.replace('t[', terms_col + '[')}))"
    )


def _doc_shingles(docs: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, shingle) distinct, for docs with at least n tokens."""
    toks = docs.select(
        F.col(id_col), analysis.tokens(text_col).alias("_t")
    ).filter(F.size("_t") >= n)
    return toks.select(
        id_col, F.explode(F.array_distinct(shingle_expr("_t", n))).alias("shingle")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 2,
    threshold: float = 0.2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (a < b, jaccard ≥ threshold).

    Quadratic in shingle-group size — the brute baseline MinHash replaces
    at scale (the shared-shingle join explodes on common shingles exactly
    like a head term; use minhash_lsh_pairs beyond ~10^6 docs).
    """
    sh = _doc_shingles(docs, id_col, text_col, n)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col(id_col).alias("a"), "shingle")
    b = sh.select(F.col(id_col).alias("b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col(id_col).alias("a"), F.col("n_sh").alias("na")), "a")
        .join(sizes.select(F.col(id_col).alias("b"), F.col("n_sh").alias("nb")), "b")
        .select(
            "a", "b",
            F.round(
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def shared_ngram_stats(docs: DataFrame, n: int = 3, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Cross-document duplicated-span signal (the substring-dedup proxy of
    Lee et al. 2022 / RefinedWeb): per doc, how many of its DISTINCT
    n-grams also occur in at least one OTHER doc.

    (id, n_doc_ngrams, n_shared_ngrams, shared_ratio) — a shared_ratio
    near 1.0 marks template/boilerplate pages whole-doc dedup misses.

    Plan: the slim (id, n-gram) table is built once and persisted
    (caching.register — drain after materializing); duplicated n-grams are
    those whose doc-count exceeds 1 (map-side-combined groupBy on the
    n-gram), re-attached with a hit-indicator join, then one per-doc fold.
    All exchanges key on the n-gram or the doc id; pick n large enough
    (≥ 8 at web scale) that head n-grams don't concentrate a join key.
    Docs with fewer than n tokens are omitted."""
    from pyspark import StorageLevel

    from colbert_spark import caching

    sh = _doc_shingles(docs, id_col, text_col, n).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    caching.register(sh, "shared_ngram_stats")
    dup_grams = (
        sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("ndocs"))
        .filter(F.col("ndocs") > 1)
        .select("shingle", F.lit(1).alias("_dup"))
    )
    return (
        sh.join(dup_grams, "shingle", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_doc_ngrams"),
            F.sum(F.coalesce(F.col("_dup"), F.lit(0))).cast("long")
            .alias("n_shared_ngrams"),
        )
        .select(
            id_col, "n_doc_ngrams", "n_shared_ngrams",
            F.round(F.col("n_shared_ngrams") / F.col("n_doc_ngrams"), 6)
            .alias("shared_ratio"),
        )
    )


def minhash_perm_constants(num_perm: int) -> list[tuple[int, int, int]]:
    """Deterministic MinHash permutation constants (LCG-derived, in [1, p)).
    Pure so the DuckDB oracle can embed the identical table as VALUES."""
    rows = []
    for i in range(num_perm):
        a = (1103515245 * (i + 1) + 12345) % _MINHASH_P
        b = (69069 * (i + 1) + 1) % _MINHASH_P
        rows.append((i, max(a, 1), b))
    return rows


def minhash_signatures(
    docs: DataFrame,
    num_perm: int = 64,
    shingle_n: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    portable_hash: bool = False,
) -> DataFrame:
    """(id, sig: array<long>) MinHash signatures, fully JVM-side:
    shingle → hash → ONE groupBy(id) with num_perm literal-constant min
    aggregates (min over ((a*h + b) mod p)), assembled into the
    signature array in permutation order.

    r6 shape: the permutation constants are pure (minhash_perm_constants),
    so they inline as literals — the former broadcast perm-table join
    multiplied every shingle row num_perm× and fed TWO aggregation
    exchanges ((id, perm) then (id)); this form is one map-side-combined
    exchange with a bounded 64-long partial per id. Values are identical
    (same arithmetic, same perm order — the DuckDB oracle still replays
    the VALUES form)."""
    sh = _doc_shingles(docs, id_col, text_col, shingle_n).select(
        id_col,
        F.pmod(_hash64("shingle", portable_hash), F.lit(_MINHASH_P)).alias("h"),
    )
    consts = minhash_perm_constants(num_perm)
    mins = [
        F.min(
            F.pmod(F.lit(a) * F.col("h") + F.lit(b), F.lit(_MINHASH_P))
        ).alias(f"_mh{i}")
        for i, a, b in consts
    ]
    return sh.groupBy(id_col).agg(*mins).select(
        id_col,
        F.array(*[F.col(f"_mh{i}") for i, _, _ in consts]).alias("sig"),
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 2,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    portable_hash: bool = False,
) -> DataFrame:
    """MinHash+LSH near-dup candidates → (a, b, est_jaccard ≥ threshold).

    bands of r = num_perm/bands rows; docs sharing any band bucket become
    candidates (equi-join on (band, xxhash64(band slice))); est_jaccard =
    fraction of matching signature positions. The scale path: candidate
    generation is a pure hash equi-join, no quadratic shingle join.

    portable_hash=True swaps the shingle hash for md5_hash64 so a DuckDB
    oracle can reproduce signatures bit-for-bit (band keys stay xxhash64 —
    they're internal join keys; the oracle blocks on band-slice equality,
    which is the same relation).
    """
    assert num_perm % bands == 0
    r = num_perm // bands
    # the signature table feeds the candidate self-join (twice) AND the
    # final sig re-attach (twice more); without a persist Spark recomputes
    # the whole shingle→hash→min pipeline four times. Signatures are
    # num_perm longs/doc — tiny next to the text — so caching them is the
    # right trade at any corpus size.
    sigs = minhash_signatures(docs, num_perm, shingle_n, id_col, text_col,
                              portable_hash=portable_hash).persist()
    # band rows carry ONLY (id, band, bh): shuffling the full 64-long sig
    # through 16 exploded band rows per doc would move ~8 KB/doc of
    # duplicated payload through the self-join; signatures re-attach AFTER
    # pair dedup via two hash joins against the persisted sig table
    banded = sigs.select(
        id_col,
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), "
                f"b -> struct(b as band, xxhash64(cast(slice(sig, b*{r}+1, {r}) as string)) as bh))"
            )
        ).alias("bb"),
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))
    a = banded.select(F.col(id_col).alias("a"), "band", "bh")
    b = banded.select(F.col(id_col).alias("b"), "band", "bh")
    pairs = (
        a.join(b, ["band", "bh"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .dropDuplicates(["a", "b"])
    )
    cands = pairs.join(
        sigs.select(F.col(id_col).alias("a"), F.col("sig").alias("siga")), "a"
    ).join(
        sigs.select(F.col(id_col).alias("b"), F.col("sig").alias("sigb")), "b"
    )
    est = cands.select(
        "a", "b",
        F.round(
            F.size(F.filter(F.zip_with("siga", "sigb", lambda x, y: x == y),
                            lambda z: z)) / F.lit(num_perm),
            6,
        ).alias("est_jaccard"),
    )
    # the persisted signature table is released via caching.drain() once
    # the caller has materialized the result
    caching.register(sigs, "minhash_lsh_pairs")
    return est.filter(F.col("est_jaccard") >= threshold)


def _make_simhash_kernel(id_col: str, text_col: str, kind: str,
                         out_cols: list[str]):
    """mapInPandas kernel: docs batch → one signature row per doc that
    tokenizes to ≥ 1 term. Tokenize (the shared Arrow kernel), fold
    (doc, term) tf counts, hash the batch vocabulary with the JVM-exact
    replica (functions.hashing — pytest-enforced bit parity), then per
    hash lane compute the 64 bit votes as reduceat segment sums:
    vote_b = Σ±tf = 2·Σ(tf·bit_b) − Σtf, bit set iff vote > 0 (identical
    arithmetic to the 64-aggregate JVM fold this replaces — integer ops
    only, no float drift possible)."""

    def run(batches):
        import pyarrow as pa

        from colbert_spark.functions import hashing
        from colbert_spark.functions.analysis import _tokenize_batch_pyarrow

        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            _, doc_idx, flat = _tokenize_batch_pyarrow(
                list(pdf[text_col]), None)
            if flat.size == 0:
                continue
            enc = pa.array(flat, type=pa.string()).dictionary_encode()
            codes = np.asarray(enc.indices.to_numpy(zero_copy_only=False),
                               dtype=np.int64)
            vocab = np.asarray(enc.dictionary.to_pandas(), dtype=object)
            v_sz = len(vocab)
            key = doc_idx.astype(np.int64) * v_sz + codes
            ukey, tf = np.unique(key, return_counts=True)
            out_doc = ukey // v_sz          # sorted nondecreasing
            out_code = ukey % v_sz
            starts = np.flatnonzero(
                np.concatenate(([True], out_doc[1:] != out_doc[:-1])))
            docs_u = out_doc[starts]
            total = np.add.reduceat(tf, starts)
            cols = {id_col: ids[docs_u]}
            for name, h_vocab in zip(out_cols,
                                     hashing.hash_terms(vocab, kind)):
                h = h_vocab[out_code].astype(np.uint64)
                sig = np.zeros(docs_u.size, dtype=np.uint64)
                for b in range(64):
                    bit = ((h >> np.uint64(b)) & np.uint64(1)).astype(np.int64)
                    vote = 2 * np.add.reduceat(tf * bit, starts) - total
                    sig |= (vote > 0).astype(np.uint64) << np.uint64(b)
                cols[name] = sig.view(np.int64)
            yield pd.DataFrame(cols)

    return run


def _spread(df: DataFrame) -> DataFrame:
    """Ensure a map-heavy kernel input has at least default-parallelism
    partitions. A small corpus arrives as one scan split (files under
    maxPartitionBytes), and a pure map stage inherits that — the old
    relational formulations were insulated by their aggregation
    exchanges. Round-robin repartition only when under-split (guide-
    style 'repartition immediately after the read'); a well-split scan
    (any real corpus) passes through untouched, so no corpus-sized
    shuffle is ever added at scale."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def simhash64(docs: DataFrame, id_col: str = "doc_id",
              text_col: str = "text", portable_hash: bool = False) -> DataFrame:
    """(id, simhash: long) 64-bit SimHash over tf-weighted term hashes.

    ONE shuffle-free corpus pass (mapInPandas): a doc's signature is a
    pure function of its own tokens, so tokenize + tf fold + bit votes
    all happen row-locally in the Arrow kernel — no explode, no
    (id, term) exchange, no 64-aggregate fold stage. Bit-identical to
    the relational formulation (simhash64_sql, kept as the equivalence
    oracle): the term hash is the JVM-exact replica in
    functions.hashing and the vote arithmetic is integer-only.
    """
    kernel = _make_simhash_kernel(id_col, text_col,
                                  "md64" if portable_hash else "xx64",
                                  ["simhash"])
    return _spread(docs.select(id_col, text_col)).mapInPandas(
        kernel, schema=f"{id_col} long, simhash long")


def simhash64_sql(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text",
                  portable_hash: bool = False) -> DataFrame:
    """Relational SimHash (the pre-r6 formulation): per-bit votes as 64
    conditional-sum JVM aggregates. Kept as the pure-Catalyst reference
    the Arrow kernel is equivalence-tested against."""
    term_h = (
        docs.select(F.col(id_col), F.explode(analysis.tokens(text_col)).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .select(id_col, _hash64("term", portable_hash).alias("h"), "tf")
    )
    votes = term_h.groupBy(id_col).agg(*_vote_aggs("h", "v"))
    return votes.select(F.col(id_col), _assemble_int64("v").alias("simhash"))


def _vote_aggs(hcol: str, tag: str) -> list:
    """64 conditional-sum bit-vote aggregates over hash column `hcol`,
    aliased {tag}0..{tag}63 (same JVM map-side-combinable fold as
    simhash64)."""
    return [
        F.sum(
            F.when(F.shiftright(hcol, b).bitwiseAND(F.lit(1)) == 1,
                   F.col("tf")).otherwise(-F.col("tf"))
        ).alias(f"{tag}{b}")
        for b in range(64)
    ]


def _assemble_int64(tag: str):
    """Signed int64 from 64 vote columns {tag}0..{tag}63: bits 0..62 sum
    directly; bit 63 is the sign bit (adding 1<<63 would overflow ANSI
    int64 — add −2^63 instead, the same two's-complement value)."""
    low = None
    for b in range(63):
        term = F.when(F.col(f"{tag}{b}") > 0, F.lit(1 << b).cast("long")) \
                .otherwise(F.lit(0).cast("long"))
        low = term if low is None else low + term
    return low + F.when(F.col(f"{tag}63") > 0,
                        F.lit(-(1 << 63)).cast("long")).otherwise(F.lit(0))


def simhash128(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text", portable_hash: bool = False) -> DataFrame:
    """(id, simhash_lo, simhash_hi) 128-bit SimHash: two independent
    64-bit term hashes voted in ONE groupBy (128 conditional-sum JVM
    aggregates, map-side combinable — one shuffle of 128 partial longs
    per doc).

    Why 128 bits: at dedup radii ≥ 8 a 64-bit signature's blocking keys
    degrade to ~10-13 effective bits (simhash_blocking_plan warns), so
    bucket candidate volume grows ~n²/2^11 at web scale. Doubling the
    signature keeps ≥ 8-bit single-band keys up to radius 15 — the Manku
    et al. WWW'07 remedy for large-radius near-dup at 10^9+ docs.

    Hash independence: xxhash64(term) and xxhash64(term, 1) (seeded by the
    extra literal column) on the scale path; in portable mode the two
    halves are disjoint 60-bit slices of one md5 (chars 1-15 and 17-31),
    replayable in DuckDB. Portable halves carry 60 effective bits each
    (top 4 bits always vote negative) — blocking/recall guarantees are
    unaffected, selectivity is marginally lower.

    Same ONE-pass Arrow kernel as simhash64 (signatures are row-local;
    no exchange, no 128-aggregate fold stage); bit parity with the
    relational form (simhash128_sql) is pytest-enforced.
    """
    kernel = _make_simhash_kernel(id_col, text_col,
                                  "md128" if portable_hash else "xx128",
                                  ["simhash_lo", "simhash_hi"])
    return _spread(docs.select(id_col, text_col)).mapInPandas(
        kernel, schema=f"{id_col} long, simhash_lo long, simhash_hi long")


def simhash128_sql(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text",
                   portable_hash: bool = False) -> DataFrame:
    """Relational 128-bit SimHash (pre-r6 formulation; the equivalence
    oracle for the Arrow kernel)."""
    tf = (
        docs.select(F.col(id_col), F.explode(analysis.tokens(text_col)).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    if portable_hash:
        md5 = F.md5("term")
        h_lo = F.conv(F.substring(md5, 1, 15), 16, 10).cast("long")
        h_hi = F.conv(F.substring(md5, 17, 15), 16, 10).cast("long")
    else:
        h_lo = F.xxhash64("term")
        h_hi = F.xxhash64("term", F.lit(1))
    term_h = tf.select(id_col, h_lo.alias("hl"), h_hi.alias("hh"), "tf")
    votes = term_h.groupBy(id_col).agg(*_vote_aggs("hl", "vl"),
                                       *_vote_aggs("hh", "vh"))
    return votes.select(
        F.col(id_col),
        _assemble_int64("vl").alias("simhash_lo"),
        _assemble_int64("vh").alias("simhash_hi"),
    )


def simhash_near_pairs128(docs: DataFrame, max_hamming: int = 10,
                          id_col: str = "doc_id", text_col: str = "text",
                          sigs: DataFrame | None = None,
                          portable_hash: bool = False,
                          allpairs_max: int | None = None) -> DataFrame:
    """Near-dup pairs (a < b, hamming ≤ max_hamming) over the 128-bit
    signature, guaranteed recall (pigeonhole over
    simhash_blocking_plan(max_hamming, num_bits=128) bands).

    Bands partition the 128 bit positions by giving each 64-bit half its
    own contiguous spans (ceil(k/2) bands from lo, floor(k/2) from hi) —
    any disjoint partition of positions into k groups satisfies the
    pigeonhole argument, and per-half spans keep extraction to one
    shiftright+mask per band. Same slim join shape as simhash_near_pairs:
    band rows carry (id, sigs, bh); one equi-join on the 8-byte key.

    Signature tables at or under `allpairs_max` rows (default
    _SIMHASH_ALLPAIRS_MAX; 0 disables) take the exact all-pairs popcount
    sweep instead — same pair set by construction (banding is
    guaranteed-recall + exact filter), cheaper than the candidate join
    at small N. Pass 0 to force banding (the recall tests do)."""
    import itertools

    if allpairs_max is None:
        allpairs_max = _SIMHASH_ALLPAIRS_MAX
    owned_sigs = ()
    if sigs is None:
        sigs = simhash128(docs, id_col, text_col,
                          portable_hash=portable_hash).persist()
        owned_sigs = (sigs,)
    if allpairs_max and sigs.count() <= allpairs_max:
        out = _allpairs_hamming_pairs(
            sigs, id_col, ["simhash_lo", "simhash_hi"], max_hamming)
        for s in owned_sigs:
            caching.register(s, "simhash_near_pairs128")
        return out
    k, c = simhash_blocking_plan(max_hamming, num_bits=128)
    k_lo = (k + 1) // 2
    band_exprs = [
        f"(shiftright(simhash_lo, {off}) & {(1 << w) - 1})"
        for off, w in _band_bounds(64, k_lo)
    ] + [
        f"(shiftright(simhash_hi, {off}) & {(1 << w) - 1})"
        for off, w in _band_bounds(64, k - k_lo)
    ]
    keys = [
        f"xxhash64({kid}, {', '.join(band_exprs[i] for i in combo)})"
        for kid, combo in enumerate(itertools.combinations(range(k), c))
    ]
    banded = sigs.select(
        id_col, F.explode(F.expr(f"array({', '.join(keys)})")).alias("bh"),
    )
    # candidate election is SLIM (a, b) only — a qualifying pair collides
    # on many bands, and carrying the signatures through the
    # dropDuplicates aggregation made the partial-agg hash maps and the
    # one exchange move value payloads for every duplicated candidate
    # row (r6 measurement: the fat dedup dominated the probe).
    # Signatures re-attach AFTER dedup from the persisted sig table
    # (unhinted joins — AQE broadcasts the sig table when it is small).
    a = banded.select(F.col(id_col).alias("a"), "bh")
    b = banded.select(F.col(id_col).alias("b"), "bh")
    cands = (
        a.join(b, "bh").filter(F.col("a") < F.col("b"))
        .select("a", "b").dropDuplicates(["a", "b"])
    )
    out = cands.join(
        sigs.select(F.col(id_col).alias("a"), F.col("simhash_lo").alias("la"),
                    F.col("simhash_hi").alias("ha")), "a",
    ).join(
        sigs.select(F.col(id_col).alias("b"), F.col("simhash_lo").alias("lb"),
                    F.col("simhash_hi").alias("hb")), "b",
    ).select(
        "a", "b",
        (F.bit_count(F.col("la").bitwiseXOR(F.col("lb")))
         + F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))).cast("long")
        .alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)
    for s in owned_sigs:
        caching.register(s, "simhash_near_pairs128")
    return out


def near_dup_components(pairs: DataFrame, a_col: str = "a", b_col: str = "b",
                        max_iter: int = 50,
                        algorithm: str = "doubling") -> DataFrame:
    """(doc_id, rep): connected components of the undirected near-dup pair
    graph, rep = min doc id reachable — the cluster artifact a dedup
    pipeline consumes (keep each rep, drop the rest; transitively
    consistent, unlike per-pair 'drop b' rules, which over- or under-drop
    on chains a~b~c).

    algorithm="doubling" (default): min-label propagation PLUS pointer
    jumping — each round sets label(x) to the min of {label(x),
    neighbor labels, label(label(x))}. The jump is the Hash-to-Min idea
    (Rastogi et al. 2012, "Finding Connected Components in Map-Reduce in
    Logarithmic Rounds"): label chains contract by doubling, so an
    adversarial path graph of diameter d converges in O(log d) rounds
    instead of O(d) — the difference between ~40 and ~10^12-edge-chain-
    length rounds at web scale. Two uniform id-keyed shuffle joins per
    round.

    algorithm="propagation": plain neighbor-min, O(diameter) rounds, one
    join per round — kept for comparison and for graphs known to be
    clique-shaped (near-dup graphs usually are).

    Both run ONE Spark action per round: the changed-label count rides
    the checkpoint job as an observe() metric instead of a second
    join+count pass (invariant: label(x) ≤ x, monotone non-increasing,
    always a node id inside x's component; at a fixpoint adjacent nodes
    agree, so every label equals its component minimum).

    Raises RuntimeError if max_iter rounds don't converge.

    Lineage note: every round MUST cut its logical plan
    (`localCheckpoint`), not just cache its data — with plain persist()
    each iteration re-embeds the whole upstream plan (including the pair
    generator's banding expressions) and Catalyst re-analyzes a plan
    that doubles per round; at sf0.1 the plan string hit the 2 GB JVM
    limit and OOMed the driver before the fix. Checkpointed label state
    is two longs per node. On a cluster, swap localCheckpoint for a
    reliable checkpoint dir if executor loss mid-algorithm matters.
    """
    from pyspark.sql import Observation

    if algorithm not in ("doubling", "propagation"):
        raise ValueError(f"unknown algorithm {algorithm!r}")
    edges = pairs.select(F.col(a_col).alias("x"), F.col(b_col).alias("y"))
    adj = edges.union(
        edges.select(F.col("y").alias("x"), F.col("x").alias("y"))
    ).localCheckpoint(eager=True)
    labels = (
        adj.groupBy("x").agg(F.min("y").alias("_nb"))
        .select("x", F.least("x", "_nb").alias("label"))
        .localCheckpoint(eager=True)
    )
    if not labels.take(1):  # empty graph — also keeps Observation.get off
        return labels.select(F.col("x").alias("doc_id"),  # the zero-task path
                             F.col("label").alias("rep"))
    for _ in range(max_iter):
        nb_label = labels.select(F.col("x").alias("y"), "label")
        prop = (
            adj.join(nb_label, "y")
            .groupBy("x").agg(F.min("label").alias("_prop"))
        )
        cand = (
            labels.withColumnRenamed("label", "_old")
            .join(prop, "x", "left")
            .select("x", F.least("_old", "_prop").alias("label"), "_old")
        )
        if algorithm == "doubling":
            # pointer jump: label(label(x)) via last round's (complete,
            # checkpointed) label map — every label value is a node id,
            # so the lookup is total
            lmap = labels.select(F.col("x").alias("label"),
                                 F.col("label").alias("_ll"))
            cand = cand.join(lmap, "label", "left").select(
                "x", F.least("label", "_ll").alias("label"), "_old"
            )
        obs = Observation()
        new_labels = (
            cand.observe(
                obs,
                F.sum((F.col("label") != F.col("_old")).cast("long"))
                .alias("changed"),
            )
            .select("x", "label")
            .localCheckpoint(eager=True)
        )
        labels = new_labels
        if not (obs.get["changed"] or 0):
            break
    else:
        raise RuntimeError(
            f"near_dup_components did not converge in {max_iter} rounds"
        )
    return labels.select(F.col("x").alias("doc_id"),
                         F.col("label").alias("rep"))


def simhash_blocking_plan(max_hamming: int, num_bits: int = 64) -> tuple[int, int]:
    """(num_bands k, bands_per_key c) such that blocking on every C(k, c)
    concatenation of c bands guarantees recall for Hamming ≤ k − c
    (pigeonhole: d flipped bits corrupt ≤ d bands, leaving ≥ k − d clean;
    k − d ≥ c ⇒ some c-combination is clean on both docs).

    Policy: single-band keys while bands stay ≥ 8 bits wide (cheap, selective);
    beyond that, 2-band keys — C(d+2, 2) keys/doc buys selective ~10-bit
    buckets instead of degenerate ≤ 5-bit single bands. Manku et al. WWW'07
    block-permutation scheme, combination form.

    Selectivity at large radii: once keys narrow below ~14 effective bits,
    random-doc bucket collision odds are ~2^-key_bits and expected candidate
    volume grows ~n²/2^key_bits — fine at 10^7 docs, quadratic-in-practice
    at 10^9+. That is inherent to fixed-width SimHash at large radii (Manku
    §4). With the default 64-bit signature the regime starts at
    max_hamming ≥ 8; `num_bits=128` (simhash128) keeps ≥ 8-bit single
    bands up to radius 15 and stays out of the warning zone through 16.
    This function warns when the requested (radius, width) enters it.
    """
    import warnings

    if not 0 <= max_hamming <= 32:
        raise ValueError(f"max_hamming {max_hamming} outside supported [0, 32]")
    if num_bits // (max_hamming + 1) >= 8:
        return max_hamming + 1, 1
    key_bits = 2 * (num_bits // (max_hamming + 2))
    if key_bits <= 13:
        wider = "radius <= 7 or a 128-bit signature (simhash128)" \
            if num_bits == 64 else f"a radius where keys stay wider (num_bits={num_bits})"
        warnings.warn(
            f"simhash blocking at max_hamming={max_hamming} uses ~{key_bits}-bit "
            f"2-band keys: candidate volume grows ~n^2/2^{key_bits}; beyond ~10^8 "
            f"docs use {wider}",
            RuntimeWarning,
            stacklevel=2,
        )
    return max_hamming + 2, 2


def _band_bounds(total_bits: int, k: int) -> list[tuple[int, int]]:
    """k (offset, width) spans covering total_bits; first bands get the
    extra bit when it doesn't divide evenly."""
    widths = [total_bits // k + (1 if i < total_bits % k else 0) for i in range(k)]
    out, off = [], 0
    for w in widths:
        out.append((off, w))
        off += w
    return out


def simhash_near_pairs(docs: DataFrame, max_hamming: int = 3,
                       id_col: str = "doc_id", text_col: str = "text",
                       sigs: DataFrame | None = None,
                       portable_hash: bool = False,
                       allpairs_max: int | None = None) -> DataFrame:
    """Near-dup pairs (a < b, hamming ≤ max_hamming) by SimHash, with
    GUARANTEED recall at the requested radius: blocking keys are xxhash64
    over c-band combinations chosen by simhash_blocking_plan, so every
    qualifying pair shares ≥ 1 key; bucket false positives are removed by
    the exact bit_count filter. One equi-join on an 8-byte key — no
    all-pairs stage at any corpus size past `allpairs_max` (default
    _SIMHASH_ALLPAIRS_MAX; 0 disables): at or under it the exact
    all-pairs popcount sweep runs instead — identical pair set by
    construction (banding is guaranteed-recall + exact filter), cheaper
    than the candidate join at small N. Pass 0 to force banding (the
    recall tests do)."""
    import itertools

    if allpairs_max is None:
        allpairs_max = _SIMHASH_ALLPAIRS_MAX
    owned_sigs = ()
    if sigs is None:
        # both join sides read the signatures; persist so the JVM bit-fold
        # runs once (one long per doc — cheap to cache)
        sigs = simhash64(docs, id_col, text_col,
                         portable_hash=portable_hash).persist()
        owned_sigs = (sigs,)
    if allpairs_max and sigs.count() <= allpairs_max:
        out = _allpairs_hamming_pairs(sigs, id_col, ["simhash"], max_hamming)
        for s in owned_sigs:
            caching.register(s, "simhash_near_pairs")
        return out
    k, c = simhash_blocking_plan(max_hamming)
    band_exprs = [
        f"(shiftright(simhash, {off}) & {(1 << w) - 1})"
        for off, w in _band_bounds(64, k)
    ]
    keys = [
        f"xxhash64({kid}, {', '.join(band_exprs[i] for i in combo)})"
        for kid, combo in enumerate(itertools.combinations(range(k), c))
    ]
    banded = sigs.select(
        id_col, F.explode(F.expr(f"array({', '.join(keys)})")).alias("bh"),
    )
    # slim (a, b) candidate election; signatures re-attach post-dedup
    # (see simhash_near_pairs128 — the fat dedup was the r6-measured
    # bottleneck of this probe)
    a = banded.select(F.col(id_col).alias("a"), "bh")
    b = banded.select(F.col(id_col).alias("b"), "bh")
    cands = (
        a.join(b, "bh").filter(F.col("a") < F.col("b"))
        .select("a", "b").dropDuplicates(["a", "b"])
    )
    out = cands.join(
        sigs.select(F.col(id_col).alias("a"), F.col("simhash").alias("ha")),
        "a",
    ).join(
        sigs.select(F.col(id_col).alias("b"), F.col("simhash").alias("hb")),
        "b",
    ).select(
        "a", "b",
        F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).cast("long")
        .alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)
    for s in owned_sigs:
        caching.register(s, "simhash_near_pairs")
    return out


#: line position packing base for the keep-first winner key — positions
#: must stay below this per doc (1M lines/doc; a 100-TB crawl page is
#: orders of magnitude under it)
_LINE_KEY_BASE = 1 << 20


def line_dedup(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text", delim: str = "\n") -> DataFrame:
    """C4-style cross-document line deduplication (Raffel et al. 2020
    §2.2 scaled to line granularity — the RefinedWeb/Dolma exact
    line-dedup pass): any line whose normalized form occurs more than
    once in the corpus keeps only its FIRST occurrence (smallest
    (doc_id, position)); every other occurrence is removed from its
    document. Lines that normalize to empty (whitespace/punctuation
    only) never participate and are always kept.

    Returns one row per input doc:
      (id, n_lines, n_kept, text_clean)   — counts BIGINT, text_clean =
      surviving lines re-joined with `delim` in original order ('' when
      nothing survives).

    Plan shape for 10^12 lines: winner election shuffles ONLY
    (16-byte line hash, packed 8-byte winner key) with map-side combine
    (groupBy(h).min(key)); line text moves twice — once through the
    hash-keyed flag join, once into the per-doc reconstruction fold —
    both on uniform keys (content hash / doc id). No driver state, no
    windows over the full corpus. The reference consumes pre-cleaned
    collections (colbert/data/collection.py:14-33); this is the pass
    that cleans them.
    """
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), delim)).alias("_pos", "_line"),
    ).select(
        id_col, "_pos", "_line",
        F.array_join(analysis.tokens(F.col("_line")), " ").alias("_norm"),
        (F.col(id_col) * _LINE_KEY_BASE + F.col("_pos")).alias("_k"),
    ).withColumn("_h", F.md5(F.encode(F.col("_norm"), "UTF-8")))
    winners = (
        lines.filter(F.col("_norm") != "")
        .groupBy("_h")
        .agg(F.min("_k").alias("_wk"))
    )
    flagged = lines.join(winners, "_h", "left").withColumn(
        "keep", (F.col("_norm") == "") | (F.col("_k") == F.col("_wk"))
    )
    # collect_list skips the NULL produced by when(~keep), so only
    # surviving lines enter the per-doc fold; sort restores input order
    kept_struct = F.when(
        F.col("keep"), F.struct(F.col("_pos"), F.col("_line"))
    )
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(F.col("keep").cast("long")).cast("long").alias("n_kept"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(kept_struct)),
                    lambda s: s.getField("_line"),
                ),
                delim,
            ).alias("text_clean"),
        )
    )


def containment_pairs(
    docs: DataFrame,
    n: int = 2,
    threshold: float = 0.9,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Broder containment near-superset pairs: (a, b, containment) where
    containment = |S(a) ∩ S(b)| / |S(a)| ≥ threshold, a ≠ b, over distinct
    n-gram shingle sets. Catches quote-inclusion / fragment-of cases that
    symmetric Jaccard misses (a 30-token excerpt of a 300-token page has
    Jaccard ≈ 0.1 but containment 1.0). Both directions are evaluated;
    mutual near-dups yield two rows (well-defined, documented).

    Scale note: same shared-shingle self-join spine as
    ngram_jaccard_pairs — the brute baseline; at corpus scale feed the
    candidate pairs from minhash_lsh_pairs and use this only to verify
    containment exactly on candidates.
    """
    sh = _doc_shingles(docs, id_col, text_col, n)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col(id_col).alias("a"), "shingle")
    b = sh.select(F.col(id_col).alias("b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col(id_col).alias("a"),
                                F.col("n_sh").alias("na")), "a")
        .select("a", "b",
                F.round(F.col("inter") / F.col("na"), 6).alias("containment"))
        .filter(F.col("containment") >= threshold)
    )
