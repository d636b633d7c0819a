"""Link-graph operators: href extraction + PageRank vs a pure-Python
replay (dangling nodes included — the board fixture has none, so the
dangling path is proven here)."""

from __future__ import annotations

import pytest

from colbert_spark import caching
from colbert_spark.operators import linkgraph


def _pagerank_py(edges, iterations=3, d=0.85):
    """Pure-Python replay of linkgraph.pagerank's exact semantics."""
    nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
    n = len(nodes)
    out = {}
    for s, _ in set(edges):
        out[s] = out.get(s, 0) + 1
    inc = {}
    for s, t in set(edges):
        inc.setdefault(t, []).append(s)
    rank = {u: 1.0 / n for u in nodes}
    for _ in range(iterations):
        dangling = sum(rank[u] for u in nodes if u not in out)
        new = {}
        for u in nodes:
            c = sum(rank[s] / out[s] for s in inc.get(u, []))
            new[u] = (1.0 - d) / n + d * (c + dangling / n)
        rank = new
    return rank


def test_extract_links_distinct_and_empty_href(spark):
    rows = [
        (1, 'x <a href="a">1</a> <a href="b">2</a> <a href="a">dup</a>'),
        (2, '<a href="">empty</a> <A HREF="c">case-sensitive attr</A>'),
    ]
    df = spark.createDataFrame(rows, "url int, html string")
    got = {(r.src, r.dst) for r in linkgraph.extract_links(df).collect()}
    # href= is matched lowercase only (the fixture contract); empty hrefs drop
    assert got == {(1, "a"), (1, "b")}


def test_extract_links_binary_html(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b'<a href="t">x</a>'))], "url int, html binary")
    got = [(r.src, r.dst) for r in linkgraph.extract_links(df).collect()]
    assert got == [(1, "t")]


@pytest.mark.parametrize("iterations", [1, 3])
def test_pagerank_matches_python_replay_with_dangling(spark, iterations):
    # d is a dangling node (no out-edges); c has high in-degree
    edges = [("a", "c"), ("b", "c"), ("c", "d"), ("a", "b"), ("d_in", "d")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.url: r.rank
           for r in linkgraph.pagerank(df, iterations=iterations).collect()}
    caching.drain()
    want = _pagerank_py(edges, iterations=iterations)
    assert set(got) == set(want)
    for u in want:
        assert got[u] == pytest.approx(want[u], abs=1e-12), u


def test_pagerank_mass_conserved(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")]
    df = spark.createDataFrame(edges, "src string, dst string")
    ranks = [r.rank for r in linkgraph.pagerank(df, iterations=4).collect()]
    caching.drain()
    assert sum(ranks) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_empty_graph(spark):
    df = spark.createDataFrame([], "src string, dst string")
    assert linkgraph.pagerank(df, iterations=2).count() == 0
    caching.drain()


def test_anchor_pairs_and_documents(spark):
    html = ('<p>x</p><a href="u1" class="z">first link</a>'
            '<a href="u2">second</a><a href="">skip</a>'
            '<a href="u1">another for u1</a>')
    df = spark.createDataFrame([("src", html)], "url string, html string")
    pairs = {(r.dst, r.anchor)
             for r in linkgraph.extract_anchor_pairs(df).collect()}
    assert pairs == {("u1", "first link"), ("u2", "second"),
                     ("u1", "another for u1")}
    ad = {r.url: r.anchor_text
          for r in linkgraph.anchor_documents(
              linkgraph.extract_anchor_pairs(df)).collect()}
    # anchors sorted before joining → deterministic at any parallelism
    assert ad == {"u1": "another for u1 first link", "u2": "second"}
