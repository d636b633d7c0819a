"""Containment dedup, host budget cap, PMI collocations — hand-case and
pure-Python-replay tests."""

from __future__ import annotations

import math

import pytest

from colbert_spark import caching
from colbert_spark.functions.analysis import python_tokenize
from colbert_spark.operators import dedup, textstats
from colbert_spark.operators.webcrawl import host_budget_cap


def test_containment_direction_and_threshold(spark):
    # doc 1 is a verbatim fragment of doc 0 → contained with 1.0;
    # doc 0 is NOT contained in doc 1 (its shingle set is much larger)
    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (1, "alpha beta gamma delta"),
            (2, "totally different words here now"),
        ],
        "doc_id long, text string",
    )
    rows = {(r.a, r.b): r.containment
            for r in dedup.containment_pairs(docs, n=2, threshold=0.9).collect()}
    assert rows == {(1, 0): 1.0}


def test_containment_mutual_near_identical(spark):
    docs = spark.createDataFrame(
        [(0, "a b c d e"), (1, "a b c d e")], "doc_id long, text string")
    rows = {(r.a, r.b) for r in
            dedup.containment_pairs(docs, n=2, threshold=0.9).collect()}
    assert rows == {(0, 1), (1, 0)}


def _host_rows():
    rows = []
    for h in ("x", "y"):
        for i in range(5):
            rows.append((f"https://{h}.com/p{i}", 100 + i))
    return rows


def test_host_budget_cap_keeps_newest(spark):
    df = spark.createDataFrame(_host_rows(), "url string, ts long")
    kept = host_budget_cap(df, max_per_host=2, url_col="url", ts_col="ts")
    got = sorted((r.host, r.url) for r in kept.collect())
    assert got == [
        ("x.com", "https://x.com/p3"), ("x.com", "https://x.com/p4"),
        ("y.com", "https://y.com/p3"), ("y.com", "https://y.com/p4"),
    ]


def test_host_budget_cap_presalt_identical(spark):
    df = spark.createDataFrame(_host_rows(), "url string, ts long")
    plain = sorted((r.host, r.url, r.ts) for r in
                   host_budget_cap(df, 3, ts_col="ts").collect())
    salted = sorted((r.host, r.url, r.ts) for r in
                    host_budget_cap(df, 3, ts_col="ts", presalt=4).collect())
    assert plain == salted


def _resolve_py(edges, max_hops):
    m = dict(edges)
    out = {}
    for s in m:
        cur, hops = s, 0
        while cur in m and hops <= max_hops:
            cur = m[cur]
            hops += 1
        if cur not in m and hops <= max_hops:
            out[s] = (cur, hops, "resolved")
        else:
            out[s] = ("", -1, "unresolved")
    return out


def test_resolve_redirects_chains_cycles_vs_python(spark):
    """Chain of 5, a 3-cycle, a self-loop, a 2-step chain feeding the
    cycle (unresolvable), and a chain longer than max_hops — all must
    match the step-at-a-time pure-Python walk."""
    from colbert_spark.operators.webcrawl import resolve_redirects

    edges = [(f"c{i}", f"c{i+1}") for i in range(5)]          # c0..c4 → c5
    edges += [("x0", "x1"), ("x1", "x2"), ("x2", "x0")]       # 3-cycle
    edges += [("self", "self")]                               # self-loop
    edges += [("into0", "into1"), ("into1", "x0")]            # feeds cycle
    edges += [(f"L{i}", f"L{i+1}") for i in range(9)]         # len-9 chains
    df = spark.createDataFrame(edges, "src string, dst string")

    for h in (4, 9, 16):
        want = _resolve_py(edges, h)
        got = {r.src: (r.final_url, r.hops, r.status)
               for r in resolve_redirects(df, max_hops=h).collect()}
        assert got == want, h

    with pytest.raises(ValueError, match="max_hops"):
        resolve_redirects(df, max_hops=0)


def test_sitemap_urls_and_gap(spark):
    """<loc> extraction with XML entity decoding (&amp; last, so
    '&amp;lt;' decodes to '&lt;' not '<'), and the gap anti-join."""
    from colbert_spark.operators.webcrawl import sitemap_gap, sitemap_urls

    xml = ('<?xml version="1.0"?><urlset>'
           "<url><loc>https://a.com/p?x=1&amp;y=2</loc></url>"
           "<url><loc>https://a.com/q&amp;lt;</loc></url>"
           "<url><loc>https://a.com/r</loc></url>"
           "</urlset>")
    sm = spark.createDataFrame([("a.com", xml)], "host string, xml string")
    got = sorted(r.url for r in sitemap_urls(sm).collect())
    assert got == ["https://a.com/p?x=1&y=2", "https://a.com/q&lt;",
                   "https://a.com/r"]

    crawled = spark.createDataFrame(
        [("https://a.com/p?x=1&y=2",), ("https://a.com/zzz",)],
        "url string")
    gap = sorted((r.host, r.url) for r in sitemap_gap(sm, crawled).collect())
    assert gap == [("a.com", "https://a.com/q&lt;"),
                   ("a.com", "https://a.com/r")]


def _pmi_py(texts, min_count, k):
    uni: dict[str, int] = {}
    bi: dict[str, int] = {}
    u = t = 0
    for txt in texts:
        toks = python_tokenize(txt, 220)
        u += len(toks)
        t += max(0, len(toks) - 1)
        for w in toks:
            uni[w] = uni.get(w, 0) + 1
        for x, y in zip(toks, toks[1:]):
            bi[f"{x} {y}"] = bi.get(f"{x} {y}", 0) + 1
    out = []
    for g, c in bi.items():
        if c < min_count:
            continue
        a, b = g.split(" ")
        pmi = round(math.log((c / t) / ((uni[a] / u) * (uni[b] / u))), 6)
        out.append((g, c, pmi))
    out.sort(key=lambda r: (-r[2], r[0]))
    return out[:k]


def test_bigram_collocations_matches_python_replay(spark):
    texts = [
        "new york is big", "new york never sleeps", "york new haven",
        "big data new york", "the new york times", "data big new york",
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(texts)], "doc_id long, text string")
    got = [(r.bigram, r.n_pairs, r.pmi) for r in
           textstats.bigram_collocations(df, min_count=2, k=10).collect()]
    caching.drain()
    assert got == _pmi_py(texts, 2, 10)
    assert any(b == "new york" for b, _, _ in got)


def test_host_crowd_caps_and_reranks(spark):
    from colbert_spark.operators.diversify import host_crowd

    ranking = spark.createDataFrame(
        [(0, p, 10.0 - p) for p in range(6)],
        "qid long, pid long, score double")
    hosts = spark.createDataFrame(
        [(p, "a" if p < 4 else "b") for p in range(6)],
        "pid long, host string")
    out = [(r.rank, r.pid, r.host) for r in sorted(
        host_crowd(ranking, hosts, max_per_host=2, k=10).collect(),
        key=lambda r: r.rank)]
    # host a holds pids 0-3 (best scores) but only 0,1 survive crowding
    assert out == [(1, 0, "a"), (2, 1, "a"), (3, 4, "b"), (4, 5, "b")]


def test_significant_terms_prefers_overrepresented(spark):
    from colbert_spark.operators import facets

    # corpus: 'rare' only in docs 0-2; 'common' everywhere
    docs = spark.createDataFrame(
        [(p, ("rare common" if p < 3 else "common filler")) for p in range(20)],
        "pid long, text string")
    ranking = spark.createDataFrame(
        [(0, p) for p in range(3)], "qid long, pid long")
    out = [(r.term, r.fg_df, r.jlh) for r in sorted(
        facets.significant_terms(ranking, docs, k=5, min_fg_df=2).collect(),
        key=lambda r: -r.jlh)]
    terms = [t for t, _, _ in out]
    # 'rare': fgp=1.0 vs bgp=0.15 → huge JLH; 'common': fgp=1.0 bgp=1.0 → 0
    assert terms[0] == "rare"
    jlh_rare = round((1.0 - 3 / 20.0) * (1.0 / (3 / 20.0)), 6)
    assert out[0][2] == pytest.approx(jlh_rare, abs=1e-9)
    assert dict((t, j) for t, _, j in out)["common"] == 0.0


def test_window_burst_scores_hand_case(spark):
    import datetime as dt
    from colbert_spark.operators.trending import window_burst_scores

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    # type 'a': 7 hourly windows with 2 events each, then a burst of 10
    for h in range(7):
        for i in range(2):
            rows.append((base + dt.timedelta(hours=h, minutes=i), "a"))
    for i in range(10):
        rows.append((base + dt.timedelta(hours=7, minutes=i), "a"))
    df = spark.createDataFrame(rows, "ts timestamp, event_type string")
    out = {r.win_start: (r.n, r.z)
           for r in window_burst_scores(df, 3600, trail=6,
                                        min_trail=3).collect()}
    ws = sorted(out)
    # first 3 windows: too little trailing history → NULL z
    assert out[ws[0]][1] is None and out[ws[2]][1] is None
    # constant-count windows → zero variance → NULL z
    assert out[ws[4]][1] is None
    # the burst window: trailing 6 windows all n=2 → sd=0 → NULL too!
    assert out[ws[7]][0] == 10 and out[ws[7]][1] is None
    # now add jitter so variance exists: type 'b' counts 1..6 then burst
    rows_b = []
    for h in range(6):
        for i in range(h + 1):
            rows_b.append((base + dt.timedelta(hours=h, minutes=i), "b"))
    for i in range(30):
        rows_b.append((base + dt.timedelta(hours=6, minutes=i), "b"))
    dfb = spark.createDataFrame(rows_b, "ts timestamp, event_type string")
    outb = {r.win_start: (r.n, r.z)
            for r in window_burst_scores(dfb, 3600, trail=6,
                                         min_trail=3).collect()}
    import statistics
    trail_counts = [1, 2, 3, 4, 5, 6]
    want = round((30 - statistics.mean(trail_counts))
                 / statistics.stdev(trail_counts), 6)
    burst_w = sorted(outb)[-1]
    assert outb[burst_w] == (30, pytest.approx(want, abs=1e-9))


def test_crawl_delta_statuses(spark):
    from colbert_spark.operators.webcrawl import crawl_delta

    old = spark.createDataFrame(
        [("u1", "same"), ("u2", "will change"), ("u3", "gone")],
        "url string, text string")
    new = spark.createDataFrame(
        [("u1", "same"), ("u2", "changed!"), ("u4", "fresh")],
        "url string, text string")
    got = {r.url: r.status for r in crawl_delta(old, new).collect()}
    assert got == {"u1": "unchanged", "u2": "changed",
                   "u3": "removed", "u4": "added"}


def test_robots_filter_prefix_and_case(spark):
    from colbert_spark.operators.webcrawl import robots_filter

    pages = spark.createDataFrame(
        [("https://A.com/private/x", 1), ("https://a.com/public", 2),
         ("https://b.com/private/x", 3), ("https://c.com/anything", 4)],
        "url string, doc_id long")
    rules = spark.createDataFrame(
        [("a.com", "/private"), ("C.COM", "/")],
        "host string, path_prefix string")
    kept = {r.doc_id for r in robots_filter(pages, rules).collect()}
    # host match is case-insensitive both sides; b.com has no rules
    assert kept == {2, 3}


def test_vocab_delta_hand_case(spark):
    old = spark.createDataFrame(
        [(0, "alpha beta"), (1, "alpha gone gone")],
        "doc_id long, text string")
    new = spark.createDataFrame(
        [(0, "alpha beta fresh"), (1, "alpha fresh")],
        "doc_id long, text string")
    out = {r.term: (r.df_old, r.df_new, r.delta)
           for r in textstats.vocab_delta(old, new, k=10).collect()}
    # df is per-document (distinct), not occurrences
    assert out["fresh"] == (0, 2, 2)
    assert out["gone"] == (0 + 1, 0, -1)
    assert out["alpha"] == (2, 2, 0)


def test_extract_keywords_hand_case(spark):
    import math as _m
    docs = spark.createDataFrame(
        [(0, "rare rare common"), (1, "common other"), (2, "common x y")],
        "doc_id long, text string")
    out = {(r.doc_id, r.kw_rank): (r.term, r.score)
           for r in textstats.extract_keywords(docs, k=2).collect()}
    caching.drain()
    # doc 0: 'rare' tf=2 idf=ln(3/1) beats 'common' tf=1 idf=ln(3/3)=0
    assert out[(0, 1)] == ("rare", round(2 * _m.log(3.0 / 1), 6))
    assert out[(0, 2)] == ("common", 0.0)


def test_encoding_quality_counts(spark):
    """Hand-checked mojibake/FFFD counts: the CP1252-damage digraphs
    count, clean ASCII (including a bare A-tilde NOT followed by a
    Latin-1 continuation char) does not."""
    from colbert_spark.operators.textstats import encoding_quality

    rows = [
        (0, "plain clean ascii text"),
        (1, "caf\u00c3\u00a9 nice"),                 # 1 moji digraph
        (2, "it\u00e2\u20ac\u2122s \u00e2\u20ac\u0153quoted\u00e2\u20ac\u009d"),  # 3 cp1252 markers
        (3, "bad\ufffd byte \ufffd\ufffd"),          # 3 replacement chars
        (4, "\u00c3 alone is fine; \u00c30 too"),     # A-tilde + space/digit: no match
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.fffd_count, r.mojibake_count, r.clean)
           for r in encoding_quality(df).collect()}
    assert got == {
        0: (0, 0, True),
        1: (0, 1, False),
        2: (0, 3, False),
        3: (3, 0, False),
        4: (0, 0, True),
    }
