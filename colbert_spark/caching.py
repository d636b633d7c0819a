"""Session-scoped registry for operator-owned persisted DataFrames.

Some operators persist an intermediate (the tokenized corpus in
brute.bm25_topk, MinHash signatures, the slim (id, vec, norm) table in the
embedding near-dup join) because the returned plan reads it more than once.
The cache must outlive the operator call — Spark materializes plans lazily —
so the operator cannot unpersist before returning. The previous mechanism
(a ``cached_deps`` attribute monkey-patched onto the result DataFrame) was
silently lost on any further transformation and would not survive Spark
Connect DataFrames, so callers could not reliably release the memory.

Operators now register their caches here; callers drain the registry once
results are materialized::

    out = minhash_lsh_pairs(docs)
    rows = out.collect()
    caching.drain()                      # release everything operators pinned
    # or, scoped:
    caching.drain(owner="minhash_lsh_pairs")

``drain()`` is safe at any time: ``unpersist()`` never invalidates a plan —
recomputation simply stops hitting the cache. Long-lived sessions that call
many operators without draining only ever accumulate MEMORY_AND_DISK
entries that Spark's LRU evicts under pressure, so forgetting to drain is a
soft leak, not a correctness issue.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

_LOCK = threading.Lock()
_CACHES: list[tuple[str, DataFrame]] = []


def register(df: DataFrame, owner: str) -> DataFrame:
    """Record a persisted DataFrame owned by operator `owner`; returns it."""
    with _LOCK:
        _CACHES.append((owner, df))
    return df


def registered(owner: str | None = None) -> list[DataFrame]:
    """Currently-registered caches (optionally filtered by owner)."""
    with _LOCK:
        return [df for o, df in _CACHES if owner is None or o == owner]


def drain(owner: str | None = None, blocking: bool = False) -> int:
    """Unpersist and forget registered caches; returns how many were
    released. `owner=None` drains everything; `blocking=True` waits for the
    executors to actually drop the blocks (tests use this)."""
    with _LOCK:
        keep, drop = [], []
        for entry in _CACHES:
            (drop if owner is None or entry[0] == owner else keep).append(entry)
        _CACHES[:] = keep
    for _, df in drop:
        try:
            df.unpersist(blocking=blocking)
        except Exception:
            pass  # session already stopped — nothing to release
    return len(drop)
