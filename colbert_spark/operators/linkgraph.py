"""Web link-graph analytics over crawled HTML: href extraction,
in-degree, and PageRank.

The reference has no link surface (its collections are pre-extracted
passage TSVs, colbert/data/collection.py:1-60); on a Common-Crawl-style
corpus (BASELINE.json input_hint: url, warc_ts, html, text, lang) the
link graph is the first corpus-level signal a curation pipeline derives
— in-degree as a quality prior, PageRank for crawl ordering and
sampling weights (the original Page et al. 1999 use case).

Plan shapes (100 TB framing):

- ``extract_links``: pure whole-stage-codegen (regexp_extract_all +
  explode), one corpus scan, no UDF; the output is edge-sized (urls
  only), the html payload never shuffles.
- ``in_degree``: one map-side-combinable count per dst.
- ``pagerank``: textbook power iteration as joins/aggs. Per round:
  edges ⋈ ranks (hash join on src — edges are persisted so the same
  partitioning is reused every round), groupBy(dst) sum → ONE shuffle
  per round on uniform url keys; the new rank vector is
  localCheckpoint(eager)ed each round (iterative-plan-growth OOM is a
  documented repo gotcha — see CLAUDE.md / near_dup_components) so the
  logical plan stays O(1) across rounds. Dangling mass is folded in
  via a 1-row aggregate crossJoin (no extra driver action — the
  checkpoint is the round's only job). Work per round is O(E), the
  same exchange Pregel/GraphX PageRank performs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from colbert_spark import caching

#: href attribute values in double quotes — the fixture/oracle contract
#: (DuckDB RE2 and Java regex agree on this pattern byte-for-byte).
HREF_RE = r'href="([^"]*)"'


def extract_links(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """pages(url, html, ...) → distinct edges (src, dst).

    html may be binary (cast to string = UTF-8 decode) or string.
    Self-loops are kept (a page linking itself is a real edge; the
    PageRank math below handles them like any other edge).
    """
    html_s = F.col(html_col).cast("string")
    return (
        pages.select(
            F.col(url_col).alias("src"),
            F.explode(F.regexp_extract_all(html_s, F.lit(HREF_RE), 1)).alias("dst"),
        )
        .filter(F.col("dst") != "")
        .distinct()
    )


def in_degree(edges: DataFrame) -> DataFrame:
    """(url, in_degree) over distinct edges — one combinable agg."""
    return edges.groupBy(F.col("dst").alias("url")).agg(
        F.count(F.lit(1)).alias("in_degree")
    )


def pagerank(
    edges: DataFrame, iterations: int = 3, damping: float = 0.85
) -> DataFrame:
    """Power-iteration PageRank over distinct edges → (url, rank).

    Semantics (mirrored 1:1 by the DuckDB oracle's unrolled CTEs):
      nodes   = distinct(src) ∪ distinct(dst), N = |nodes|
      rank₀   = 1/N
      rankᵢ₊₁ = (1-d)/N + d·(Σ_incoming rankᵢ/outdeg + dangling/N)
    where dangling = Σ rankᵢ over nodes with no out-edges. Ranks are
    raw doubles — callers round before cross-engine comparison.

    (1-d) is computed as an IEEE double subtraction in BOTH engines
    (1.0 - 0.85 ≠ the literal 0.15 at the ULP level, and DuckDB parses
    bare 0.15 as DECIMAL — the oracle mirrors the subtraction).
    """
    edges = edges.persist()
    caching.register(edges, "pagerank")
    nodes = (
        edges.select(F.col("src").alias("url"))
        .union(edges.select(F.col("dst").alias("url")))
        .distinct()
        .persist()
    )
    caching.register(nodes, "pagerank")
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    teleport = (1.0 - damping) / n

    ranks = nodes.select("url", (F.lit(1.0) / n).alias("rank"))
    for _ in range(iterations):
        contrib = (
            edges.join(ranks.withColumnRenamed("url", "src"), "src")
            .join(outdeg, "src")
            .groupBy(F.col("dst").alias("url"))
            .agg(F.sum(F.col("rank") / F.col("outdeg")).alias("c"))
        )
        # mass sitting on nodes with no out-edges, as a 1-row aggregate
        # (crossJoin keeps it inside the round's single checkpoint job)
        dangling = (
            ranks.join(outdeg, ranks["url"] == outdeg["src"], "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dmass"))
        )
        ranks = (
            nodes.join(contrib, "url", "left")
            .crossJoin(dangling)
            .select(
                "url",
                (
                    F.lit(teleport)
                    + F.lit(damping)
                    * (F.coalesce(F.col("c"), F.lit(0.0))
                       + F.col("dmass") / F.lit(float(n)))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


#: (href, anchor-text) — group 1 url, group 2 the inner text up to the
#: next tag; the Java-regex ∩ RE2 subset (no backrefs/lookaround)
ANCHOR_RE = r'href="([^"]*)"[^>]*>([^<]*)<'


def extract_anchor_pairs(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """pages(url, html, ...) → (src, dst, anchor): one row per link with
    its anchor text. Both captures come from the SAME regex ran twice
    (regexp_extract_all group 1 / group 2) and zipped positionally —
    identical match sequences by construction, pure codegen, no UDF.
    """
    html_s = F.col(html_col).cast("string")
    pat = F.lit(ANCHOR_RE)
    return (
        pages.select(
            F.col(url_col).alias("src"),
            F.explode(
                F.arrays_zip(
                    F.regexp_extract_all(html_s, pat, 1).alias("dst"),
                    F.regexp_extract_all(html_s, pat, 2).alias("anchor"),
                )
            ).alias("z"),
        )
        .select("src", F.col("z.dst").alias("dst"),
                F.col("z.anchor").alias("anchor"))
        .filter(F.col("dst") != "")
    )


def anchor_documents(anchor_pairs: DataFrame) -> DataFrame:
    """(src, dst, anchor) → (url, anchor_text): every target url's
    incoming anchor texts joined into one virtual document (the classic
    web-search anchor field — pages are described by the text OTHERS
    link them with; Brin & Page 1998 §2.2; the reference has no link
    surface at all).

    Anchors are sorted before joining so the concatenation is
    deterministic at any parallelism (collect_list order is not).
    Aggregation is one combinable groupBy on uniform url keys; anchor
    text per page is small (avg in-degree × anchor length), so the
    virtual corpus is far smaller than the page corpus.
    """
    return (
        anchor_pairs.groupBy(F.col("dst").alias("url"))
        .agg(F.array_join(F.array_sort(F.collect_list("anchor")), " ")
             .alias("anchor_text"))
    )
