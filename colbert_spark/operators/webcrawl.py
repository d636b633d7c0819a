"""Common-Crawl-style URL curation: canonicalization, latest-capture
dedup, and capture statistics over the (url, warc_ts, …) web-page table
shape (BASELINE.json input_hint; datagen.DOCS_SCHEMA).

A crawl re-captures the same page under many raw spellings — casing in
scheme/host, default ports, fragments, tracking parameters, shuffled
query order, trailing slashes — and across many snapshots. The standard
pipeline canonicalizes, then keeps the newest capture per canonical URL.
Everything here is whole-stage-codegen expressions (regex parse + array
ops, no UDF) and one hash-partitioned window per dedup — uniform keys
(URLs), no skew concern beyond what AQE handles.

Canonicalization contract (mirrored expression-for-expression in the
DuckDB oracle `url_latest_capture`):

  1. parse ^scheme://host[:port][path][?query][#fragment]$
  2. scheme, host → lowercase
  3. fragment dropped
  4. port dropped when it is the scheme default (http:80, https:443)
  5. path: trailing slashes stripped ('/a/' → '/a', '/' → '')
  6. query: params split on '&', empties and 'utm_'-prefixed tracking
     params dropped, remainder SORTED and rejoined; '?' dropped if none
     survive
  7. non-matching strings (no scheme) pass through unchanged

Reference note: the reference engine has no crawl-curation surface (its
collections are pre-cleaned TSVs, colbert/data/collection.py); these
operators are the upstream step a web-scale corpus needs before
`sources/collection.assign_pids` hands stable pids to the Indexer.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

#: host is greedy but cannot cross ':' '/' '?' '#'; the path group must
#: start with '/' (a lazy host + bare [^?#]* path lets the path swallow
#: the hostname — caught by the oracle comparison)
_URL_RE = r"^([^:/?#]+)://([^:/?#]+)(?::(\d+))?(/[^?#]*)?(?:\?([^#]*))?(?:#.*)?$"


def canonical_url(col) -> Column:
    """Canonical form of an absolute http(s) URL (contract above)."""
    url = F.col(col) if isinstance(col, str) else col
    g = lambda i: F.regexp_extract(url, _URL_RE, i)  # noqa: E731
    scheme = F.lower(g(1))
    host = F.lower(g(2))
    port = g(3)
    path = F.regexp_replace(g(4), "/+$", "")
    params = F.filter(
        F.split(g(5), "&"),
        lambda x: (x != "") & ~F.startswith(x, F.lit("utm_")),
    )
    qs = F.array_join(F.array_sort(params), "&")
    default_port = (
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    canon = F.concat(
        scheme, F.lit("://"), host,
        F.when((port == "") | default_port, F.lit(""))
         .otherwise(F.concat(F.lit(":"), port)),
        path,
        F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)),
    )
    return F.when(scheme == "", url).otherwise(canon)


def latest_capture(docs: DataFrame, url_col: str = "url",
                   ts_col: str = "warc_ts") -> DataFrame:
    """One row per canonical URL: the newest capture (ties broken by raw
    url, then remaining column order is irrelevant — the winner is fully
    determined). Adds `canonical_url`; keeps every input column."""
    canon = canonical_url(url_col).alias("canonical_url")
    w = Window.partitionBy("canonical_url").orderBy(
        F.desc(ts_col), F.asc(url_col)
    )
    return (
        docs.select("*", canon)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def capture_stats(docs: DataFrame, url_col: str = "url",
                  ts_col: str = "warc_ts") -> DataFrame:
    """(canonical_url, n_captures, n_raw_urls, first_ts, last_ts) — the
    per-page crawl-history rollup (map-side-combinable aggregates)."""
    return (
        docs.select(canonical_url(url_col).alias("canonical_url"),
                    F.col(url_col).alias("_u"), F.col(ts_col).alias("_t"))
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_captures"),
            F.countDistinct("_u").alias("n_raw_urls"),
            F.min("_t").alias("first_ts"),
            F.max("_t").alias("last_ts"),
        )
    )


def host_budget_cap(
    docs: DataFrame,
    max_per_host: int,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    presalt: int | None = None,
) -> DataFrame:
    """Per-host document budget: keep at most `max_per_host` docs per
    (lowercased) host, newest capture first, ties by raw url asc — the
    anti-host-dominance cap every Common-Crawl curation applies (C4 and
    CCNet both bound any single site's contribution).

    Adds a `host` column; keeps every input column.

    Scale path: a per-host rank window. Hosts are many and mostly small,
    but a pathological host (a wiki mirror with 10^8 pages) makes one
    window partition giant; `presalt=s` enables the two-phase top-N
    remedy — rank within (host, hash-salt slice) first and keep ≤ cap
    per slice, so no more than s·cap rows per host ever reach the global
    per-host window. Results are identical (the global window re-ranks
    survivors); the salt is a deterministic url hash, so output does not
    depend on parallelism.
    """
    host = F.lower(F.regexp_extract(F.col(url_col), _URL_RE, 2))
    out = docs.select("*", host.alias("host"))
    order = [F.desc(ts_col), F.asc(url_col)]
    if presalt is not None and presalt > 1:
        salt = F.pmod(F.xxhash64(F.col(url_col)), F.lit(presalt))
        lw = Window.partitionBy("host", salt).orderBy(*order)
        out = (
            out.withColumn("_lr", F.row_number().over(lw))
            .filter(F.col("_lr") <= max_per_host)
            .drop("_lr")
        )
    w = Window.partitionBy("host").orderBy(*order)
    return (
        out.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_per_host)
        .drop("_rn")
    )


def crawl_delta(
    old: DataFrame,
    new: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """Snapshot diff between two crawls of the same corpus:
    (url, status) with status ∈ added | removed | changed | unchanged —
    the incremental-crawl planner's input (what to re-fetch, what to
    tombstone; pairs with IndexUpdater remove/add for incremental index
    maintenance).

    Comparison is by md5 text fingerprint, so the join carries
    (url, 16-byte hash) — never the page text. One full-outer hash join
    on uniform url keys; at 10^12 pages this is the minimal shuffle any
    snapshot diff needs.
    """
    o = old.select(F.col(url_col).alias("url"),
                   F.md5(F.col(text_col)).alias("_ho"))
    n = new.select(F.col(url_col).alias("url"),
                   F.md5(F.col(text_col)).alias("_hn"))
    j = o.join(n, "url", "full_outer")
    return j.select(
        "url",
        F.when(F.col("_ho").isNull(), F.lit("added"))
        .when(F.col("_hn").isNull(), F.lit("removed"))
        .when(F.col("_ho") == F.col("_hn"), F.lit("unchanged"))
        .otherwise(F.lit("changed")).alias("status"),
    )


def sitemap_urls(
    sitemaps: DataFrame,
    xml_col: str = "xml",
) -> DataFrame:
    """Extract <loc> URLs from sitemap XML — the crawl-discovery source
    format (sitemaps.org protocol). sitemaps(host, xml) → (host, url),
    one row per <loc> entry; entity-decoded for the five XML escapes a
    conformant sitemap may contain. Pure codegen (regexp_extract_all +
    explode) — sitemap files never shuffle, only the extracted slim
    (host, url) rows do.

    Reference note: no analog (the reference ingests fixed TSVs); this
    is the discovery half of the crawl loop — pair with
    `sitemap_gap` to find listed-but-never-crawled pages.
    """
    locs = F.explode(
        F.expr(f"regexp_extract_all({xml_col}, '<loc>([^<]*)</loc>', 1)")
    ).alias("_loc")
    out = sitemaps.select("host", locs)
    url = F.col("_loc")
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&apos;", "'"), ("&amp;", "&")):
        url = F.replace(url, F.lit(ent), F.lit(ch))
    return out.select("host", url.alias("url"))


def sitemap_gap(
    sitemaps: DataFrame,
    crawled: DataFrame,
    url_col: str = "url",
    xml_col: str = "xml",
) -> DataFrame:
    """URLs a site's sitemap lists that the crawl has never captured —
    the recrawl planner's fetch frontier. One anti-join on uniform url
    keys; the crawled side reduces to its url column before shuffling.
    Returns (host, url)."""
    listed = sitemap_urls(sitemaps, xml_col=xml_col)
    seen = crawled.select(F.col(url_col).alias("url"))
    return listed.join(seen, "url", "left_anti").select("host", "url")


def resolve_redirects(
    redirects: DataFrame,
    max_hops: int = 32,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Resolve every redirect source to its terminal URL — the crawl
    post-processing step that collapses 301/302 chains so link graphs,
    dedup, and canonical-URL election all see final destinations.

    Input: redirects(src, dst), one row per redirecting URL (the map must
    be functional — duplicate src rows are a data bug upstream, the same
    URL cannot 301 to two places). Output one row per src:

      (src, final_url, hops, status)

    status='resolved'  — following the chain reaches, within `max_hops`
                         steps, a URL that is not itself a redirect;
                         final_url = that terminal, hops = chain length.
      'unresolved'     — a redirect loop, or a chain longer than
                         max_hops; final_url='' and hops=-1 (loops never
                         terminate, so "the" final URL does not exist).

    Scale path: pointer doubling — each round self-joins the current
    (src → nxt, hops) map on nxt = src, composing f with itself, so a
    chain of length L resolves in ceil(log2 L) rounds instead of L
    sequential joins. Rows shuffle three slim columns; each round
    localCheckpoints (the repo's iterative-loop rule — lineage would
    otherwise double per round). After ceil(log2 max_hops) rounds every
    chain of length <= max_hops has terminated; anything still pointing
    at a redirect source, or resolved past max_hops, is a loop/overlong
    chain by construction. The DuckDB oracle replays the contract as a
    step-at-a-time recursive CTE bounded at max_hops — the two shapes
    must agree exactly.

    Reference note: no analog (the reference ingests pre-resolved
    collections, colbert/data/collection.py); this is upstream crawl
    hygiene a web-scale corpus needs before url canonicalization.
    """
    if max_hops < 1:
        raise ValueError(f"max_hops must be >= 1, got {max_hops}")
    m = redirects.select(F.col(src_col).alias("src"),
                         F.col(dst_col).alias("dst"))
    cur = m.select(
        "src",
        F.col("dst").alias("nxt"),
        F.lit(1).cast("long").alias("hops"),
    )
    rounds = max(1, math.ceil(math.log2(max_hops))) if max_hops > 1 else 1
    for _ in range(rounds):
        j = cur.select(
            F.col("src").alias("_jsrc"),
            F.col("nxt").alias("_jnxt"),
            F.col("hops").alias("_jhops"),
        )
        cur = (
            cur.join(j, cur["nxt"] == j["_jsrc"], "left")
            .select(
                "src",
                F.coalesce("_jnxt", "nxt").alias("nxt"),
                (F.col("hops") + F.coalesce("_jhops", F.lit(0)))
                .alias("hops"),
            )
            .localCheckpoint(eager=True)
        )
    # the redirect-source set is O(#redirects) — never hint-broadcast it;
    # the join key (nxt) is a uniform url, AQE broadcasts when it fits
    open_srcs = m.select(F.col("src").alias("nxt")).distinct().withColumn(
        "_open", F.lit(1))
    resolved = F.col("_open").isNull() & (F.col("hops") <= max_hops)
    return (
        cur.join(open_srcs, "nxt", "left")
        .select(
            "src",
            F.when(resolved, F.col("nxt")).otherwise(F.lit(""))
            .alias("final_url"),
            F.when(resolved, F.col("hops")).otherwise(F.lit(-1))
            .cast("long").alias("hops"),
            F.when(resolved, F.lit("resolved"))
            .otherwise(F.lit("unresolved")).alias("status"),
        )
    )


def robots_filter(
    pages: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Drop pages whose path falls under a disallowed prefix for their
    host — the crawl-side robots.txt gate, reduced to its data-plane
    form: rules(host, path_prefix) = pre-parsed `Disallow:` lines
    (parsing robots.txt itself is fetch-time work; this operator is the
    corpus-wide enforcement pass a recrawl/compliance audit runs).

    Match contract (oracle-replayed): host = lowercased url host; a page
    is dropped when ANY rule for its host is a prefix of its raw path
    ('' disallows everything for that host, the robots `Disallow: /`
    case is path_prefix '/'). Keeps every input column.

    Plan shape: the rules table is the broadcast side (robots rules are
    tiny relative to any corpus — one row per disallow line); the match
    is a broadcast left-semi prefix join evaluated in codegen; pages
    never shuffle.
    """
    host = F.lower(F.regexp_extract(F.col(url_col), _URL_RE, 2))
    path = F.regexp_extract(F.col(url_col), _URL_RE, 4)
    tagged = pages.select("*", host.alias("_host"), path.alias("_path"))
    r = rules.select(F.lower(F.col("host")).alias("_rhost"),
                     F.col("path_prefix").alias("_pp"))
    kept = tagged.join(
        F.broadcast(r),
        (F.col("_host") == F.col("_rhost"))
        & F.col("_path").startswith(F.col("_pp")),
        "left_anti",
    )
    return kept.drop("_host", "_path")
