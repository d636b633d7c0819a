"""Text analytics for corpus curation: quality scoring, language-ID
heuristic, token counting, document fingerprinting.

All pure DataFrame expressions (whole-stage codegen); each has an exact
SQL mirror in __spark_entry__.oracle_sql. Stopword sets and thresholds are
fixed constants — determinism over linguistics.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from colbert_spark.functions import analysis

#: tiny fixed English function-word set for ratio features (deterministic,
#: not a real lexicon — mirrors what the oracle SQL hardcodes)
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def _stop_array():
    return F.array(*[F.lit(s) for s in STOPWORDS])


def quality_features(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(id, n_tokens, n_chars_norm, avg_token_len, stopword_ratio, quality)

    quality = 1 if 5 ≤ n_tokens ≤ 500 and stopword_ratio < 0.5 (web-text
    boilerplate/garbage gate; thresholds are config, not science)."""
    t = docs.select(F.col(id_col), analysis.tokens(text_col).alias("_t"))
    # stopword ratio counts occurrences (not distinct membership)
    stop_count = F.size(F.filter("_t", lambda x: F.array_contains(_stop_array(), x)))
    feat = t.select(
        id_col,
        F.size("_t").cast("long").alias("n_tokens"),
        F.length(F.array_join("_t", " ")).cast("long").alias("n_chars_norm"),
        F.round(
            F.when(F.size("_t") > 0,
                   F.aggregate("_t", F.lit(0), lambda a, x: a + F.length(x))
                   .cast("double") / F.size("_t")).otherwise(F.lit(0.0)),
            6,
        ).alias("avg_token_len"),
        F.round(
            F.when(F.size("_t") > 0,
                   stop_count.cast("double") / F.size("_t")).otherwise(F.lit(0.0)),
            6,
        ).alias("stopword_ratio"),
    )
    return feat.withColumn(
        "quality",
        (
            (F.col("n_tokens") >= 5)
            & (F.col("n_tokens") <= 500)
            & (F.col("stopword_ratio") < 0.5)
        ).cast("int"),  # oracle: CAST(... AS INTEGER)
    )


def doc_fingerprint(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """(id, fp): md5 of the normalized token stream — the content identity
    used for exact dedup and cross-run lineage."""
    return docs.select(
        F.col(id_col),
        F.md5(F.encode(F.array_join(analysis.tokens(text_col), " "), "UTF-8"))
        .alias("fp"),
    )


def token_counts_by(docs: DataFrame, group_col: str, text_col: str = "text"
                    ) -> DataFrame:
    """Per-group doc + token totals (whitespace-regex tokens)."""
    t = docs.select(F.col(group_col), analysis.doclen(text_col).alias("n"))
    return t.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n").alias("total_tokens"),
        F.round(F.avg("n"), 6).alias("avg_tokens"),
    )


def lang_id_heuristic(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """(id, en_ratio, lang_pred): deterministic function-word heuristic —
    'en' if any stopword appears in ≥5% of tokens, else 'unk'. A stand-in
    for a real n-gram model; the Spark plumbing (not the linguistics) is
    the point."""
    t = docs.select(F.col(id_col), analysis.tokens(text_col).alias("_t"))
    ratio = F.when(
        F.size("_t") > 0,
        F.size(F.filter("_t", lambda x: F.array_contains(_stop_array(), x)))
        .cast("double") / F.size("_t"),
    ).otherwise(F.lit(0.0))
    return t.select(
        id_col,
        F.round(ratio, 6).alias("en_ratio"),
        F.when(ratio >= 0.05, F.lit("en")).otherwise(F.lit("unk")).alias("lang_pred"),
    )


#: PII patterns — the intersection of Java-regex and RE2 semantics (no
#: lookaround, no backrefs) so the DuckDB oracle replays them verbatim.
#: Redaction applies them in THIS order; the placeholder tokens contain no
#: digits/@, so later patterns can't match inside earlier replacements.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d{3}[- ]\d{3}[- ]\d{4}", "<PHONE>"),
)


def pii_stats(docs: DataFrame, id_col: str = "doc_id",
              text_col: str = "text", redact: bool = True) -> DataFrame:
    """(id, n_email, n_ipv4, n_phone[, redacted]): PII occurrence counts
    and the scrubbed text — the pre-training privacy pass. Pure codegen
    (regexp_count/regexp_replace), zero shuffles, zero Python; the pattern
    set is deliberately conservative (precision over recall) and lives in
    PII_PATTERNS so recipes extend it in one place."""
    cols = [F.col(id_col)]
    for name, pat, _ in PII_PATTERNS:
        cols.append(
            F.regexp_count(F.col(text_col), F.lit(pat)).cast("long")
            .alias(f"n_{name}")
        )
    if redact:
        red = F.col(text_col)
        for _, pat, repl in PII_PATTERNS:
            red = F.regexp_replace(red, pat, repl)
        cols.append(red.alias("redacted"))
    return docs.select(*cols)


def repetition_stats(docs: DataFrame, n: int = 2, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Gopher-style within-document repetition signals over n-grams:

    (id, n_ngrams, n_distinct, top_ngram_count,
     dup_ngram_ratio = occurrences belonging to repeated n-grams / total,
     top_ngram_ratio = occurrences of the most frequent n-gram / total)

    High ratios flag boilerplate/spam pages (the Gopher repetition rules,
    Rae et al. 2021 §A1.1). Docs with fewer than n tokens have no n-grams
    and are omitted. Two-level aggregation — explode n-grams, count per
    (id, ngram), fold per id — both exchanges keyed by the doc id (uniform
    at any corpus size; map-side combine collapses repeats before the
    first shuffle)."""
    from colbert_spark.operators.dedup import shingle_expr

    toks = docs.select(
        F.col(id_col), analysis.tokens(text_col).alias("_t")
    ).filter(F.size("_t") >= n)
    grams = toks.select(
        id_col, F.explode(shingle_expr("_t", n)).alias("_g")
    )
    per_gram = grams.groupBy(id_col, "_g").agg(F.count(F.lit(1)).alias("c"))
    agg = per_gram.groupBy(id_col).agg(
        F.sum("c").alias("n_ngrams"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("c").alias("top_ngram_count"),
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).alias("_dup"),
    )
    return agg.select(
        id_col,
        F.col("n_ngrams").cast("long").alias("n_ngrams"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        F.col("top_ngram_count").cast("long").alias("top_ngram_count"),
        F.round(F.col("_dup") / F.col("n_ngrams"), 6).alias("dup_ngram_ratio"),
        F.round(F.col("top_ngram_count") / F.col("n_ngrams"), 6)
        .alias("top_ngram_ratio"),
    )


def unigram_logprob(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """(id, doclen, bits_per_token): per-doc cross-entropy under the
    corpus's OWN unigram model — the CCNet-style LM-quality proxy (a real
    KenLM isn't in this sandbox; the Spark shape is identical, only the
    model table changes). p(t) = cf_t / Σcf over the full input corpus, so
    every token has p > 0 by construction (no smoothing term to tune);
    bits_per_token = Σ tf·(−log2 p(t)) / doclen, rounded 6 (double-sum
    order differs across engines).

    Outlier docs on BOTH tails are suspect: very high = non-language
    noise, very low = stopword/template spam. Plan: one tokenize pass →
    (id, term, tf) with map-side combine → corpus cf aggregate (AQE
    broadcasts it back when the vocab is small; at 10^8+ vocab it is a
    term-keyed equi-join) → per-doc fold keyed by id."""
    tf = (
        docs.select(F.col(id_col), F.explode(analysis.tokens(text_col))
                    .alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    cf = tf.groupBy("term").agg(F.sum("tf").alias("cf"))
    total = cf.agg(F.sum("cf").alias("total_cf"))
    scored = (
        tf.join(cf, "term")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("long").alias("doclen"),
            F.sum(F.col("tf") * -F.log2(F.col("cf") / F.col("total_cf")))
            .alias("_bits"),
        )
    )
    return scored.select(
        id_col, "doclen",
        F.round(F.col("_bits") / F.col("doclen"), 6).alias("bits_per_token"),
    )


def token_counts_bpe(docs: DataFrame, group_col: str, text_col: str = "text"
                     ) -> DataFrame:
    """(group, n_docs, total_words, total_subwords, avg_subwords):
    subword-level token accounting. Subwords per word = ceil(len/4) — the
    standard ~4-chars-per-BPE-token rate applied per word, giving a
    deterministic, engine-portable estimate of LLM token cost (a real BPE
    vocab isn't in this sandbox; swap the inner expression for a
    tokenizer UDF to make it exact). All JVM-side: transform + aggregate
    inside whole-stage codegen."""
    t = docs.select(
        F.col(group_col).alias("grp"),
        analysis.tokens(text_col).alias("_t"),
    ).select(
        "grp",
        F.size("_t").cast("long").alias("n_words"),
        F.aggregate(
            F.transform("_t", lambda x: F.ceil(F.length(x) / 4.0)),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).alias("n_sub"),
    )
    return t.groupBy(F.col("grp").alias(group_col)).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").alias("total_words"),
        F.sum("n_sub").alias("total_subwords"),
        F.round(F.avg("n_sub"), 6).alias("avg_subwords"),
    )


def gopher_quality(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text",
                   min_words: int = 50, max_words: int = 100_000,
                   min_avg_len: float = 3.0, max_avg_len: float = 10.0,
                   max_symbol_ratio: float = 0.1,
                   min_alpha_ratio: float = 0.8,
                   min_stop_hits: int = 2) -> DataFrame:
    """The Gopher quality-rule bundle (Rae et al. 2021 §A1.1) as per-doc
    features + pass flags — the standard pre-training web filter:

      flag_word_count : min_words ≤ n_words ≤ max_words
      flag_avg_len    : min_avg_len ≤ mean token length ≤ max_avg_len
      flag_symbol     : (count('#') + count('...')) / n_words ≤ max_symbol_ratio
      flag_alpha      : fraction of whitespace words containing an
                        alphabetic char ≥ min_alpha_ratio
      flag_stopwords  : ≥ min_stop_hits DISTINCT words from the fixed
                        STOPWORDS list present
      gopher_pass     : all of the above

    Output: (id, n_words, avg_word_len, symbol_ratio, alpha_ratio,
    stop_hits, flag_*, gopher_pass) — ratios rounded 6, flags/counts
    BIGINT-compatible ints. Docs with zero words report 0 ratios and
    fail flag_word_count.

    Pure whole-stage-codegen expressions (tokenize/regexp_count/filter/
    aggregate): zero shuffles, zero Python — the filter column costs one
    corpus scan at any scale, and the oracle SQL replays every rule.
    Defaults are the paper's; fixture-scale callers pass bounds that
    match their doc lengths (thresholds are config, not science).
    """
    t = docs.select(
        F.col(id_col),
        F.col(text_col).alias("_raw"),
        analysis.tokens(text_col).alias("_t"),
    )
    n_words = F.size("_t").cast("long")
    nz = n_words > 0
    avg_len = F.round(
        F.when(nz, F.aggregate("_t", F.lit(0), lambda a, x: a + F.length(x))
               .cast("double") / F.size("_t")).otherwise(F.lit(0.0)), 6)
    n_sym = (F.regexp_count(F.col("_raw"), F.lit(r"#"))
             + F.regexp_count(F.col("_raw"), F.lit(r"\.\.\."))).cast("long")
    symbol_ratio = F.round(
        F.when(nz, n_sym.cast("double") / F.size("_t")).otherwise(F.lit(0.0)), 6)
    # alpha rule runs on RAW whitespace words (punctuation intact), per the
    # paper; the tokenizer would have stripped the non-alpha evidence
    raw_words = F.filter(F.split(F.col("_raw"), r"\s+"), lambda x: x != F.lit(""))
    n_alpha = F.size(F.filter(raw_words, lambda w: w.rlike("[a-zA-Z]")))
    alpha_ratio = F.round(
        F.when(F.size(raw_words) > 0,
               n_alpha.cast("double") / F.size(raw_words))
        .otherwise(F.lit(0.0)), 6)
    stop_hits = F.size(
        F.array_intersect(F.array_distinct("_t"), _stop_array())
    ).cast("long")

    feat = t.select(
        id_col,
        n_words.alias("n_words"),
        avg_len.alias("avg_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        alpha_ratio.alias("alpha_ratio"),
        stop_hits.alias("stop_hits"),
    )
    f_wc = (F.col("n_words") >= min_words) & (F.col("n_words") <= max_words)
    f_al = ((F.col("avg_word_len") >= min_avg_len)
            & (F.col("avg_word_len") <= max_avg_len))
    f_sy = F.col("symbol_ratio") <= max_symbol_ratio
    f_aw = F.col("alpha_ratio") >= min_alpha_ratio
    f_st = F.col("stop_hits") >= min_stop_hits
    return feat.select(
        "*",
        f_wc.cast("long").alias("flag_word_count"),
        f_al.cast("long").alias("flag_avg_len"),
        f_sy.cast("long").alias("flag_symbol"),
        f_aw.cast("long").alias("flag_alpha"),
        f_st.cast("long").alias("flag_stopwords"),
        (f_wc & f_al & f_sy & f_aw & f_st).cast("long").alias("gopher_pass"),
    )


def winnow_fingerprints(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text",
                        n: int = 4, w: int = 5) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS algorithm): hash every n-token shingle, slide
    a window of w consecutive hashes, keep each window's minimum; the
    distinct selected hashes are the document's fingerprint set. The
    guarantee: any shared run of ≥ w + n − 1 tokens between two
    documents yields at least one shared selected hash, with only
    ~2/(w+1) of all shingles retained — the span-level dedup/plagiarism
    sampling rule that per-doc MinHash (whole-doc similarity) does not
    give.

    Output: (id, n_grams, n_selected, winnow_fp) — counts BIGINT,
    winnow_fp = md5 of the space-joined sorted selected hashes (md5('')
    for docs with no shingle). Docs shorter than one window keep their
    single global-min hash (the at-least-one guarantee).

    Pure per-document array expressions (whole-stage codegen): zero
    shuffles, zero Python — the selection is a transform over the
    in-row hash array. Hashes are md5 hex strings compared
    lexicographically so the DuckDB oracle replays the selection
    bit-for-bit (both engines emit lowercase hex).
    """
    t = docs.select(
        F.col(id_col), analysis.tokens(text_col).alias("_t")
    )
    n_sh = F.greatest(F.size("_t") - F.lit(n - 1), F.lit(0))
    grams = F.when(
        n_sh > 0,
        F.transform(
            F.sequence(F.lit(0), n_sh - 1),
            lambda i: F.array_join(F.slice("_t", i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    g = t.select(id_col, grams.alias("_g"))
    hashes = F.transform(F.col("_g"),
                         lambda x: F.md5(F.encode(x, "UTF-8")))
    h = g.select(id_col, F.size("_g").cast("long").alias("n_grams"),
                 hashes.alias("_h"))
    n_win = F.col("n_grams") - F.lit(w - 1)
    selected = (
        F.when(n_win >= 1, F.array_sort(F.array_distinct(F.transform(
            F.sequence(F.lit(0), (n_win - 1).cast("int")),
            lambda i: F.array_min(F.slice("_h", i + 1, w)),
        ))))
        .when(F.col("n_grams") > 0, F.array(F.array_min("_h")))
        .otherwise(F.array().cast("array<string>"))
    )
    s = h.select(id_col, "n_grams", selected.alias("_s"))
    return s.select(
        id_col, "n_grams",
        F.size("_s").cast("long").alias("n_selected"),
        F.md5(F.encode(F.array_join(F.col("_s"), " "), "UTF-8"))
        .alias("winnow_fp"),
    )


def perplexity_buckets(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """CCNet-style quality terciles (Wenzek et al. 2020 §4.3): score
    every doc with the corpus-own unigram cross-entropy
    (unigram_logprob) and bucket into head / middle / tail at the exact
    1/3 and 2/3 interpolated percentiles of bits_per_token — head =
    most-fluent third (what CCNet keeps first), tail = noisiest.

    Output: (id, doclen, bits_per_token, ppl_bucket).

    Plan shape: the per-doc score table (id-keyed aggs, see
    unigram_logprob) → ONE 1-row threshold aggregate → broadcast
    crossJoin compare. Deliberately NOT an ntile window: a global
    ORDER BY window funnels the whole corpus through one task; the
    two-phase threshold pattern (the domain_mix_budget shape) keeps
    every stage distributed. At 10^10+ docs swap the exact percentile
    for approx_percentile — the bucketing join is unchanged.

    Thresholds round 6 (like every repo ratio) so the DuckDB replay
    (quantile_cont — same (n−1)-position linear interpolation) lands on
    identical cut points over the identical round-6 score column.

    The score table feeds BOTH the threshold agg and the output, so it
    is persisted (caching-registered — callers drain after
    materializing); without it the whole tokenize→tf→cf pipeline runs
    twice (plan-audited: 20 exchanges → 8).
    """
    from .. import caching

    scores = unigram_logprob(docs, id_col=id_col, text_col=text_col).persist()
    caching.register(scores, "perplexity_buckets")
    th = scores.agg(
        F.round(F.percentile("bits_per_token", F.lit(1.0 / 3.0)), 6)
        .alias("_t1"),
        F.round(F.percentile("bits_per_token", F.lit(2.0 / 3.0)), 6)
        .alias("_t2"),
    )
    return scores.crossJoin(F.broadcast(th)).select(
        id_col, "doclen", "bits_per_token",
        F.when(F.col("bits_per_token") <= F.col("_t1"), F.lit("head"))
        .when(F.col("bits_per_token") <= F.col("_t2"), F.lit("middle"))
        .otherwise(F.lit("tail")).alias("ppl_bucket"),
    )


def bigram_collocations(
    docs: DataFrame,
    min_count: int = 5,
    k: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
    maxlen: int | None = 220,
) -> DataFrame:
    """Top-k bigram collocations by pointwise mutual information
    (Church & Hanks 1990) → (bigram, n_pairs, pmi).

        pmi(a,b) = ln( (c_ab / T) / ((c_a / U) · (c_b / U)) )

    with c_ab the corpus bigram count (adjacent tokens, within-doc),
    c_a/c_b unigram counts, T total bigrams, U total unigrams. Low-count
    noise is gated by min_count (PMI's known bias toward hapax pairs);
    output is top-k by (pmi desc, bigram asc), pmi round-6. The DuckDB
    oracle replays the identical expression with the identical division
    order.

    Plan shape: ONE tokenize pass persisted; bigrams are formed in-row
    (zip_with over two slices — no positional self-join); unigram and
    bigram counts are map-side-combinable aggs on uniform term keys;
    totals are 1-row broadcasts. Nothing corpus-sized shuffles except
    the two count aggs any term dictionary build performs.
    """
    from .. import caching

    toks = docs.select(
        F.col(id_col), analysis.tokens(text_col, maxlen).alias("_t")
    ).persist()
    caching.register(toks, "bigram_collocations")

    uni = (
        toks.select(F.explode("_t").alias("w"))
        .groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    )
    bigram = F.when(
        F.size("_t") >= 2,
        F.zip_with(
            F.slice("_t", 1, F.size("_t") - 1),
            F.slice("_t", 2, F.size("_t") - 1),
            lambda x, y: F.concat(x, F.lit(" "), y),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bi = (
        toks.select(F.explode(bigram).alias("bigram"))
        .groupBy("bigram").agg(F.count(F.lit(1)).alias("n_pairs"))
        .filter(F.col("n_pairs") >= min_count)
    )
    totals = (
        toks.select(
            F.size("_t").alias("nu"),
            F.when(F.size("_t") >= 1, F.size("_t") - 1).otherwise(0)
            .alias("nb"))
        .agg(F.sum("nu").alias("u"), F.sum("nb").alias("t"))
    )
    # unigram-dictionary joins stay unhinted: AQE broadcasts while the
    # vocabulary is small and falls back to a uniform-key shuffle join
    # when it isn't (a web-scale vocab can be 10^8 terms — too big to
    # force-broadcast)
    ca = uni.select(F.col("w").alias("_a"), F.col("c").alias("ca"))
    cb = uni.select(F.col("w").alias("_b"), F.col("c").alias("cb"))
    scored = (
        bi.withColumn("_a", F.split("bigram", " ")[0])
        .withColumn("_b", F.split("bigram", " ")[1])
        .join(ca, "_a")
        .join(cb, "_b")
        .crossJoin(F.broadcast(totals))
        .select(
            "bigram", "n_pairs",
            F.round(F.log(
                (F.col("n_pairs") / F.col("t"))
                / ((F.col("ca") / F.col("u")) * (F.col("cb") / F.col("u")))
            ), 6).alias("pmi"),
        )
    )
    # global top-k as sort+limit → TakeOrderedAndProject (per-partition
    # heaps + driver merge of k rows), never a single-partition window
    return scored.orderBy(F.desc("pmi"), F.asc("bigram")).limit(k)


def vocab_delta(
    old_docs: DataFrame,
    new_docs: DataFrame,
    k: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
    maxlen: int | None = 220,
) -> DataFrame:
    """Vocabulary drift between two corpus snapshots: per term the
    document frequency in each and the shift → (term, df_old, df_new,
    delta), top-k by (|delta| desc, term asc). The monitoring signal a
    crawl pipeline alarms on (topic burst, spam flood, extraction
    regression all show up as df drift before anything else does).

    Plan: two dictionary builds (combinable term aggs), one full-outer
    term join on uniform keys, TakeOrdered top-k. Nothing corpus-sized
    beyond the dictionary aggs themselves.
    """
    def _df(docs, out):
        toks = docs.select(F.col(id_col),
                           analysis.tokens(text_col, maxlen).alias("_t"))
        return (
            toks.select(F.explode(F.array_distinct("_t")).alias("term"))
            .groupBy("term").agg(F.count(F.lit(1)).alias(out))
        )

    j = _df(old_docs, "df_old").join(_df(new_docs, "df_new"),
                                     "term", "full_outer")
    out = j.select(
        "term",
        F.coalesce(F.col("df_old"), F.lit(0)).cast("long").alias("df_old"),
        F.coalesce(F.col("df_new"), F.lit(0)).cast("long").alias("df_new"),
    ).withColumn("delta", (F.col("df_new") - F.col("df_old")).cast("long"))
    return out.orderBy(F.abs(F.col("delta")).desc(), F.asc("term")).limit(k)


def extract_keywords(
    docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    maxlen: int | None = 220,
) -> DataFrame:
    """Per-document tf-idf keyword extraction → (id, term, tf, score,
    kw_rank): each doc's top-k most characteristic terms by
    tf · ln(N/df) (the classic tf-idf keywording; feeds more-like-this
    queries, tag clouds, and cluster labeling). score round-6, rank by
    (score desc, term asc).

    Plan: ONE tokenize pass (persisted, caching-registered) feeds both
    the dictionary agg and the per-doc rank; the idf join is unhinted on
    uniform term keys (AQE broadcasts small vocabs); the top-k window
    partitions by doc id — uniform, bounded by the doc's distinct terms.
    """
    from .. import caching

    token_df = analysis.tokenize_docs(
        docs, id_col=id_col, text_col=text_col, maxlen=maxlen
    ).persist()
    caching.register(token_df, "extract_keywords")
    n = token_df.select(id_col).distinct().count()
    if n == 0:
        return docs.sparkSession.createDataFrame(
            [], f"{id_col} long, term string, tf long, score double, "
                "kw_rank long")
    dfreq = token_df.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = token_df.join(dfreq, "term").select(
        id_col, "term", F.col("tf").cast("long").alias("tf"),
        F.round(F.col("tf") * F.log(F.lit(float(n)) / F.col("df")), 6)
        .alias("score"),
    )
    from pyspark.sql import Window as _W
    w = _W.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("kw_rank", F.row_number().over(w))
        .filter(F.col("kw_rank") <= k)
        .select(id_col, "term", "tf", "score",
                F.col("kw_rank").cast("long").alias("kw_rank"))
    )


#: high-confidence mojibake markers: U+00C3 'A-tilde' followed by a
#: Latin-1 continuation char (UTF-8 two-byte sequence read as Latin-1,
#: e.g. 'cafÃ©' for cafe-with-acute), or U+00E2 U+20AC — the
#: CP1252 mangling prefix of curly punctuation ('â€™' is
#: a right single quote). Explicit code points; Java regex and RE2 read
#: the class identically.
MOJIBAKE_RE = "\u00c3[\u0080-\u00bf]|\u00e2\u20ac"


def encoding_quality(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Mojibake / encoding-damage signals per document — the C4/CCNet
    utf-8-hygiene gate: text that survived a wrong-codec round trip
    (UTF-8 bytes decoded as Latin-1/CP1252) carries characteristic
    two-char digraphs; decoder failures leave U+FFFD replacement chars.
    Returns (id, fffd_count, mojibake_count, clean), clean = both
    counts zero. Pure codegen (regexp_extract_all sizes), one scan,
    zero shuffles; MOJIBAKE_RE is in the Java-regex ∩ RE2 subset so the
    DuckDB oracle replays the same pattern verbatim.
    """
    fffd = F.size(F.regexp_extract_all(
        F.col(text_col), F.lit("\ufffd"), F.lit(0)))
    moji = F.size(F.regexp_extract_all(
        F.col(text_col), F.lit(MOJIBAKE_RE), F.lit(0)))
    return docs.select(
        F.col(id_col),
        fffd.cast("long").alias("fffd_count"),
        moji.cast("long").alias("mojibake_count"),
        ((fffd == F.lit(0)) & (moji == F.lit(0))).alias("clean"),
    )
