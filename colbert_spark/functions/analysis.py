"""Text analysis: deterministic tokenization + HTML text extraction.

Reference parity:
- doc tokenization: colbert/modeling/tokenization/doc_tokenization.py:48-62
  (WordPiece there; deterministic lowercase word tokenization here — the
  engine is lexical, so the tokenizer is the analysis chain, not a model).
- punctuation skiplist: colbert/modeling/colbert.py:27-29 — here punctuation
  simply never survives the split regex.
- byte-identical extraction per url (BASELINE.json input_hint): extract_text
  is a pure function of the html bytes — no locale, hash-seed, or ordering
  dependence.

The SAME token rule must hold in three places: Spark (JVM regex), the DuckDB
oracle SQL, and the pure-Python test oracle. All three use:
    lower(text) split on '[^a-z0-9]+', drop empty strings.
Keep TOKEN_SPLIT_RE in sync with oracle_sql() in __spark_entry__.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# One regex, three engines (Java, DuckDB RE2, Python re). Intersection of
# their semantics: character-class split, no lookaround, no unicode classes.
TOKEN_SPLIT_RE = "[^a-z0-9]+"

#: Default truncation: reference doc_maxlen (settings.py:113) = 220 tokens.
DOC_MAXLEN = 220
#: Reference query_maxlen (settings.py:119) = 32 tokens.
QUERY_MAXLEN = 32


def tokens(col: Column | str, maxlen: int | None = None) -> Column:
    """Tokenize a text column → array<string>, entirely JVM-side.

    lower → regex split → drop empties → optional truncation to maxlen
    (the reference truncates docs to doc_maxlen-1 content tokens,
    doc_tokenization.py:51; we keep plain maxlen and document it).
    """
    c = F.col(col) if isinstance(col, str) else col
    arr = F.filter(F.split(F.lower(c), TOKEN_SPLIT_RE), lambda x: x != F.lit(""))
    if maxlen is not None:
        arr = F.slice(arr, 1, maxlen)
    return arr


def doclen(col: Column | str, maxlen: int | None = None) -> Column:
    """Token count of a text column (BM25 |d|)."""
    return F.size(tokens(col, maxlen))


def tokenize_docs(
    docs: DataFrame,
    id_col: str = "pid",
    text_col: str = "text",
    maxlen: int | None = None,
) -> DataFrame:
    """docs(id, text) → (id, term, tf, doclen): the term-frequency multiset.

    This is the lexical analog of the reference's per-passage embedding
    matrix (colbert/modeling/colbert.py:95-115): one row per distinct term
    per document instead of one vector per token.

    Implementation note: explode + groupBy(pid, term) — the groupBy's
    map-side combine collapses duplicate (pid, term) rows before the
    exchange, so the shuffle carries one row per distinct (doc, term).
    A shuffle-free in-row formulation was tried and measured SLOWER:
    Catalyst's project-collapse inlines intermediate array expressions
    into every lambda element access, turning O(L log L) per row into
    O(L² log L) (see git history); the plain aggregation is both idiomatic
    and fastest.
    """
    toks = docs.select(
        F.col(id_col),
        tokens(text_col, maxlen).alias("_terms"),
    ).withColumn("doclen", F.size("_terms"))
    return (
        toks.select(id_col, "doclen", F.explode("_terms").alias("term"))
        .groupBy(id_col, "term", "doclen")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def tokenize_docs_arrow(
    docs: DataFrame,
    id_col: str = "pid",
    text_col: str = "text",
    maxlen: int | None = None,
) -> DataFrame:
    """Shuffle-free (id, term, tf, doclen) via Arrow mapInPandas.

    Same output as tokenize_docs, different physical plan: a doc's tokens
    are row-local, so per-doc tf needs NO exchange — the kernel tokenizes a
    batch (Python regex ≡ the JVM/DuckDB rule, golden-tested) and counts
    (doc, term) pairs with one numpy unique. This removes the token-level
    shuffle entirely; the index build's only remaining corpus-sized
    exchange is the repartition-by-(term, salt) that builds postings.
    Preferred for builds; the relational tokenize_docs stays for plans that
    must be pure Catalyst expressions.
    """
    import re

    from collections.abc import Iterator as _It

    pattern = re.compile(TOKEN_SPLIT_RE)

    def run(batches: "_It[pd.DataFrame]") -> "_It[pd.DataFrame]":
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            toks_per_doc = [
                [t for t in pattern.split(s.lower()) if t][:maxlen]
                if isinstance(s, str) else []
                for s in pdf[text_col]
            ]
            import numpy as np

            doclens = np.fromiter((len(t) for t in toks_per_doc),
                                  dtype=np.int64, count=len(toks_per_doc))
            if doclens.sum() == 0:
                continue
            doc_idx = np.repeat(np.arange(len(toks_per_doc)), doclens)
            flat = np.array(
                [t for toks in toks_per_doc for t in toks], dtype=object
            )
            key = pd.MultiIndex.from_arrays([doc_idx, flat])
            counts = pd.Series(1, index=key).groupby(level=[0, 1]).sum()
            out_doc = counts.index.get_level_values(0).to_numpy()
            yield pd.DataFrame(
                {
                    id_col: ids[out_doc],
                    "doclen": doclens[out_doc],
                    "term": counts.index.get_level_values(1).to_numpy(),
                    "tf": counts.to_numpy().astype("int64"),
                }
            )

    return docs.select(id_col, text_col).mapInPandas(
        run, schema=f"{id_col} long, doclen int, term string, tf long"
    )


def python_tokenize(text: str, maxlen: int | None = None) -> list[str]:
    """Pure-Python mirror of tokens(); used by test oracles only."""
    import re

    out = [t for t in re.split(TOKEN_SPLIT_RE, text.lower()) if t]
    return out[:maxlen] if maxlen is not None else out


# --- HTML text extraction (input_hint invariant) -------------------------

def extract_text_from_html(html: bytes) -> str:
    """Extract visible text from html bytes; PURE function of the bytes.

    Deliberately simple and deterministic (no external parser): strip
    <script>/<style> blocks, drop tags, decode a fixed entity set, collapse
    whitespace. Byte-identical output per identical input is the contract
    (BASELINE.json input_hint), not HTML5 fidelity.
    """
    import re

    s = html.decode("utf-8", errors="replace")
    s = re.sub(r"(?is)<(script|style)\b.*?</\1\s*>", " ", s)
    s = re.sub(r"(?s)<!--.*?-->", " ", s)
    s = re.sub(r"(?s)<[^>]*>", " ", s)
    for ent, ch in (
        ("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
        ("&quot;", '"'), ("&#39;", "'"), ("&nbsp;", " "),
    ):
        s = s.replace(ent, ch)
    return " ".join(s.split())


def with_extracted_text(
    docs: DataFrame, html_col: str = "html", out_col: str = "text"
) -> DataFrame:
    """Add/replace a text column extracted from an html binary column.

    Arrow-vectorized mapInPandas (no per-row Python UDF dispatch); schema
    is preserved plus/replacing out_col.
    """
    fields = [f for f in docs.schema.fields if f.name != out_col]
    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in fields)
    out_schema += f", {out_col} string"
    names = [f.name for f in fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            res = pdf[names].copy()
            res[out_col] = pdf[html_col].map(
                lambda b: extract_text_from_html(bytes(b))
            )
            yield res

    return docs.mapInPandas(run, schema=out_schema)
