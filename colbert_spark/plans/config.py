"""Engine configuration with right-most-wins composition.

Mirrors the reference's ColBERTConfig semantics
(colbert/infra/config/base_config.py:19-33: from_existing merges
checkpoint < index < run, right-most non-default wins) without the
checkpoint machinery. Defaults mirror settings.py where a lexical analog
exists (doc_maxlen=220 @ settings.py:113, query_maxlen=32 @ :119).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, fields
from pathlib import Path


@dataclass
class ColBERTConfig:
    # analysis
    doc_maxlen: int = 220
    query_maxlen: int = 32
    # BM25
    k1: float = 1.2
    b: float = 0.75
    # index layout
    block_size: int = 128          # postings per block (bounds UDF memory)
    index_partitions: int = 32     # hash(term_id) partitions for segments
    # skew control: a term with df > max_group_postings is built as
    # ceil(df / max_group_postings) parallel salted sub-groups, so group
    # size — and therefore task memory and stragglers — is bounded by this
    # constant at ANY corpus size (a 10^12-doc head term just gets more
    # salts). ~24 bytes/posting ⇒ default ≈ 25 MB per kernel invocation.
    max_group_postings: int = 1 << 20
    # compaction-debt threshold for targeted re-add surgery: re-adding up
    # to this many previously-removed pids patches only the posting files
    # whose block ranges intersect them (builder.purge_pids — bounded
    # metadata probe + bounded broadcast array); past it, the O(index)
    # full coalesce is cheaper than |pids|-wide nested-loop metadata
    # probing and the targeted path hands off to coalesce_index.
    max_purge_pids: int = 1 << 20
    # second fallback axis: when targeted-purge discovery flags MORE than
    # this fraction of the postings files (block pid-ranges intersect the
    # re-added pids — wide tail-term blocks make this data-dependent),
    # the surgery would rewrite ~the whole table anyway, and a full
    # coalesce buys a complete debt reset (tombstone fold + segment
    # merge) for the same write volume. Surgery wins when pid locality
    # keeps the flagged set small (appended segments, time-ordered pids).
    purge_fallback_file_fraction: float = 0.8
    # cache the tokenized corpus between build phases. True trades memory/
    # local-disk bandwidth for 2 avoided recomputes — right for mid-size
    # corpora; False recomputes the (fully parallel) tokenize per phase —
    # right when the token table dwarfs executor storage (web scale).
    cache_tokens: bool = True
    # paths
    index_root: str = "/tmp/colbert_spark_indexes"
    index_name: str = "default"
    # storage backend: empty = parquet layout under index_root; set to the
    # name of a configured Iceberg Spark catalog (spark.sql.catalog.<name>)
    # to store index tables as Iceberg tables (sources.catalog.make_catalog)
    iceberg_catalog: str = ""
    # runtime
    shuffle_partitions: int = 32

    def index_path(self) -> str:
        return str(Path(self.index_root) / self.index_name)

    @classmethod
    def from_existing(cls, *sources: "ColBERTConfig | None") -> "ColBERTConfig":
        """Right-most non-default value wins (base_config.py:19-33)."""
        defaults = cls()
        merged = dataclasses.replace(defaults)
        for src in sources:
            if src is None:
                continue
            for f in fields(cls):
                v = getattr(src, f.name)
                if v != getattr(defaults, f.name):
                    setattr(merged, f.name, v)
        return merged

    def save(self, path: str) -> None:
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        Path(path).write_text(json.dumps(dataclasses.asdict(self), indent=2, sort_keys=True))

    @classmethod
    def load(cls, path: str) -> "ColBERTConfig":
        d = json.loads(Path(path).read_text())
        known = {f.name for f in fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})
