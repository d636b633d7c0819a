"""Executor-side replicas of the engine's JVM hash functions.

Spark's ``xxhash64`` expression is XXH64 (Collet's spec) with seed 42,
applied to the UTF-8 bytes of a string; multi-argument calls chain, each
argument hashed with the running hash as its seed. Replicating it in
Python lets an Arrow kernel compute hash-derived per-document values
(SimHash bit votes) in ONE corpus pass with zero exchanges while staying
bit-identical to the JVM expressions it replaces — equivalence is
pytest-enforced against ``F.xxhash64`` directly
(tests/test_hashing.py), so a Spark upgrade that changed the expression
(it never has — the hash is part of Spark's on-disk bucketing contract)
would fail loudly.

The md5-based portable variants mirror dedup.md5_hash64's
``conv(substring(md5(col), 1, 15), 16, 10)`` (and the 128-bit second
slice ``substring(md5, 17, 15)``) via hashlib — exact by construction.

Per-term cost is a short pure-Python loop (terms are words); a
module-level memo amortises repeated vocabularies across batches on
reused workers. All functions are pure.
"""

from __future__ import annotations

import hashlib

import numpy as np

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def xxh64_bytes(data: bytes, seed: int = 42) -> int:
    """Unsigned XXH64 of ``data`` — Spark's hashUnsafeBytes path."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i <= n - 32:
            vs = [v1, v2, v3, v4]
            for k in range(4):
                lane = int.from_bytes(data[i + 8 * k:i + 8 * k + 8], "little")
                v = (vs[k] + lane * _P2) & _M
                vs[k] = (_rotl(v, 31) * _P1) & _M
            v1, v2, v3, v4 = vs
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _M, 31) * _P1) & _M
            h = (h * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i <= n - 8:
        lane = int.from_bytes(data[i:i + 8], "little")
        h ^= (_rotl((lane * _P2) & _M, 31) * _P1) & _M
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i <= n - 4:
        lane = int.from_bytes(data[i:i + 4], "little")
        h ^= (lane * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    return _fmix(h)


def _xxh64_int(i: int, seed: int) -> int:
    """Spark XXH64.hashInt — how an int32 column/literal chains."""
    h = (seed + _P5 + 4) & _M
    h ^= ((i & 0xFFFFFFFF) * _P1) & _M
    h = (_rotl(h, 23) * _P2 + _P3) & _M
    return _fmix(h)


def _signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def spark_xxhash64_str(s: str) -> int:
    """= F.xxhash64(col) for a string column (signed int64)."""
    return _signed(xxh64_bytes(s.encode("utf-8"), 42))


def spark_xxhash64_str_int(s: str, lit: int) -> int:
    """= F.xxhash64(col, F.lit(lit)) for a string column + int literal."""
    return _signed(_xxh64_int(lit, xxh64_bytes(s.encode("utf-8"), 42)))


def md5_hash64_str(s: str) -> int:
    """= dedup.md5_hash64(col): first 15 hex chars of md5, base-16."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def md5_hash64_pair(s: str) -> tuple[int, int]:
    """= (substring(md5,1,15), substring(md5,17,15)) base-16 — the
    portable 128-bit SimHash halves (dedup.simhash128)."""
    hx = hashlib.md5(s.encode("utf-8")).hexdigest()
    return int(hx[:15], 16), int(hx[16:31], 16)


# --- memoised vectorized term hashing -------------------------------------

#: per-worker memo: term → hash tuple. Vocabulary is Zipf-bounded, so the
#: hit rate across batches is high on reused workers; capped to bound
#: memory (reset wholesale — the distribution makes LRU pointless).
_MEMO_CAP = 1 << 20
_memo: dict[tuple, dict[str, tuple]] = {}


def hash_terms(vocab: np.ndarray, kind: str) -> list[np.ndarray]:
    """Hash an object array of terms → list of int64 arrays.

    kind: 'xx64'  → [xxhash64(term)]
          'xx128' → [xxhash64(term), xxhash64(term, lit(1))]
          'md128' → [md5 low slice, md5 high slice]  (portable)
          'md64'  → [md5 low slice]                  (portable)
    """
    memo = _memo.setdefault((kind,), {})
    if len(memo) > _MEMO_CAP:
        memo.clear()
    if kind == "xx64":
        fns = (spark_xxhash64_str,)
    elif kind == "xx128":
        fns = (spark_xxhash64_str, lambda t: spark_xxhash64_str_int(t, 1))
    elif kind == "md64":
        fns = (md5_hash64_str,)
    elif kind == "md128":
        pair = md5_hash64_pair
        fns = (lambda t: pair(t)[0], lambda t: pair(t)[1])
    else:
        raise ValueError(f"unknown hash kind {kind!r}")
    n_out = len(fns)
    outs = [np.empty(vocab.size, dtype=np.int64) for _ in range(n_out)]
    for i, term in enumerate(vocab):
        vals = memo.get(term)
        if vals is None:
            vals = tuple(f(term) for f in fns)
            memo[term] = vals
        for j in range(n_out):
            outs[j][i] = vals[j]
    return outs
