"""Delta-gap + varint posting-list codec (numpy-vectorized).

The lexical analog of the reference's residual codec
(colbert/indexing/codecs/residual.py:167-276: bucketize + packbits on
compress, LUT unpack on decompress). Here: sorted pids → first-differences
(delta-gap) → LEB128 varint bytes; tfs → varint bytes. encode/decode are
exact inverses (mirrors the compress/decompress inverse-pair test surface).

All hot paths are numpy array ops — no per-element Python in encode
(decode uses a tight loop over the byte array via numpy cumulative tricks).
"""

from __future__ import annotations

import numpy as np


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array → bytes. Vectorized: compute per-value
    byte counts, allocate once, scatter 7-bit groups."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # bytes needed per value: ceil(bitlength/7), min 1
    bits = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    while True:
        nz = tmp > 0
        if not nz.any():
            break
        bits[nz] += 1
        tmp >>= np.uint64(7)
    nbytes = np.maximum(bits, 1)
    offsets = np.concatenate(([0], np.cumsum(nbytes)))
    out = np.zeros(int(offsets[-1]), dtype=np.uint8)
    shifted = v.copy()
    max_len = int(nbytes.max())
    for k in range(max_len):
        mask = nbytes > k
        idx = offsets[:-1][mask] + k
        byte = (shifted[mask] & np.uint64(0x7F)).astype(np.uint8)
        more = (nbytes[mask] > k + 1).astype(np.uint8) << 7
        out[idx] = byte | more
        shifted[mask] >>= np.uint64(7)
    return out.tobytes()


def varint_decode(data: bytes) -> np.ndarray:
    """Inverse of varint_encode → uint64 array. Vectorized via group ids:
    continuation bits mark value boundaries; per-group 7-bit shifts are
    reconstructed with cumcount arithmetic."""
    buf = np.frombuffer(data, dtype=np.uint8)
    if buf.size == 0:
        return np.empty(0, dtype=np.uint64)
    cont = (buf & 0x80) != 0
    # value id of each byte: number of terminated values before it
    ends = ~cont
    value_id = np.concatenate(([0], np.cumsum(ends)[:-1]))
    # position of the byte within its value
    starts = np.concatenate(([True], ends[:-1]))
    pos = np.arange(buf.size) - np.maximum.accumulate(
        np.where(starts, np.arange(buf.size), -1)
    )
    parts = (buf & 0x7F).astype(np.uint64) << (np.uint64(7) * pos.astype(np.uint64))
    n_values = int(ends.sum())
    out = np.zeros(n_values, dtype=np.uint64)
    np.add.at(out, value_id, parts)
    return out


def encode_pids(pids: np.ndarray) -> bytes:
    """Sorted pid array → delta-gap varint bytes (first value absolute)."""
    p = np.asarray(pids, dtype=np.int64)
    if p.size == 0:
        return b""
    gaps = np.empty_like(p)
    gaps[0] = p[0]
    np.subtract(p[1:], p[:-1], out=gaps[1:])
    if (gaps[1:] <= 0).any():
        raise ValueError("pids must be strictly increasing")
    return varint_encode(gaps.astype(np.uint64))


def decode_pids(data: bytes) -> np.ndarray:
    """Inverse of encode_pids → int64 sorted pid array."""
    gaps = varint_decode(data).astype(np.int64)
    return np.cumsum(gaps)


def encode_tfs(tfs: np.ndarray) -> bytes:
    return varint_encode(np.asarray(tfs, dtype=np.uint64))


def decode_tfs(data: bytes) -> np.ndarray:
    return varint_decode(data).astype(np.int64)


# --- fixed-width bit-packing (FOR) — the SIMD-friendly alternative ------

def bitpack_encode(values: np.ndarray) -> bytes:
    """Frame-of-reference bit-packing: every value stored in exactly
    `width` bits, width = bitlength(max(values)) — the Lemire
    FastPFOR/Lucene `PackedInts` family's base layout, which trades
    varint's per-value byte granularity for constant-width lanes a
    vectorized decoder can unpack without data-dependent branches.

    Trade-off (measured, test_codec.py): flat FOR wins big on dense
    lists (head-term gaps 1-4 → 2-3 bits/value vs varint's 8) and loses
    on tailed gap distributions, where one outlier widens every lane —
    the failure PFOR patches with exceptions. The index keeps varint as
    its default payload codec; this is the SIMD-friendly alternative for
    head-term blocks.

    Header: 1 byte width (0-64), 8 bytes count (LE). width 0 encodes an
    all-zeros run in the header alone. Pure numpy (bit scatter via
    unpackbits-style shifts), exact inverse of bitpack_decode.
    """
    v = np.asarray(values, dtype=np.uint64)
    n = v.size
    if n == 0:
        return bytes([0]) + (0).to_bytes(8, "little")
    width = int(v.max()).bit_length()
    head = bytes([width]) + n.to_bytes(8, "little")
    if width == 0:
        return head
    # bit matrix: n rows × width bits (LSB first), then flatten → bytes
    shifts = np.arange(width, dtype=np.uint64)
    bits = ((v[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.uint8)
    flat = bits.reshape(-1)
    pad = (-flat.size) % 8
    if pad:
        flat = np.concatenate([flat, np.zeros(pad, dtype=np.uint8)])
    packed = np.packbits(flat.reshape(-1, 8), axis=1, bitorder="little")
    return head + packed.tobytes()


def bitpack_decode(data: bytes) -> np.ndarray:
    """Inverse of bitpack_encode → uint64 array."""
    width = data[0]
    n = int.from_bytes(data[1:9], "little")
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    if width == 0:
        return np.zeros(n, dtype=np.uint64)
    buf = np.frombuffer(data, dtype=np.uint8, offset=9)
    flat = np.unpackbits(buf, bitorder="little")[: n * width]
    bits = flat.reshape(n, width).astype(np.uint64)
    shifts = np.arange(width, dtype=np.uint64)
    return (bits << shifts[None, :]).sum(axis=1, dtype=np.uint64)


def encode_pids_packed(pids: np.ndarray) -> bytes:
    """Delta-gap + bit-pack pid codec (FOR over the gaps)."""
    p = np.asarray(pids, dtype=np.uint64)
    if p.size == 0:
        return bitpack_encode(p)
    gaps = np.concatenate(([p[0]], np.diff(p)))
    return bitpack_encode(gaps)


def decode_pids_packed(data: bytes) -> np.ndarray:
    g = bitpack_decode(data)
    return np.cumsum(g, dtype=np.uint64)


# --- adaptive per-block codec (the PFOR rationale, realized) -------------
#
# Head-term blocks have dense small gaps where flat FOR stores 2-3 bits a
# value vs varint's 8; tailed gap distributions have outliers that widen
# every FOR lane, where varint wins. Instead of one global choice, each
# block's payload carries a 1-byte codec tag and the encoder picks
# whichever encoding is smaller FOR THAT BLOCK — both sizes are computed
# exactly (closed form) before encoding, so only the winner is built.
# Lucene makes the same per-block decision family in its postings format
# (FOR blocks + vInt tail); this is that idea over the repo's two codecs.

TAG_VARINT = 0
TAG_BITPACK = 1


def _codec_sizes(v: np.ndarray) -> tuple[int, int]:
    """(varint_bytes, bitpack_bytes) the two encodings WOULD produce."""
    if v.size == 0:
        return 0, 9
    groups = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    while True:
        nz = tmp > 0
        if not nz.any():
            break
        groups[nz] += 1
        tmp >>= np.uint64(7)
    varint_bytes = int(np.maximum(groups, 1).sum())
    width = int(v.max()).bit_length()
    bitpack_bytes = 9 + (v.size * width + 7) // 8
    return varint_bytes, bitpack_bytes


def encode_u64_auto(values: np.ndarray) -> bytes:
    """1-byte tag + the smaller of {varint, FOR bitpack} for this array
    (tie → varint, the branch-free-decode-free default)."""
    v = np.asarray(values, dtype=np.uint64)
    vs, bs = _codec_sizes(v)
    if bs < vs:
        return bytes([TAG_BITPACK]) + bitpack_encode(v)
    return bytes([TAG_VARINT]) + varint_encode(v)


def decode_u64_auto(data: bytes) -> np.ndarray:
    """Inverse of encode_u64_auto (dispatch on the tag byte)."""
    if len(data) == 0:
        return np.empty(0, dtype=np.uint64)
    tag = data[0]
    if tag == TAG_BITPACK:
        return bitpack_decode(data[1:])
    if tag == TAG_VARINT:
        return varint_decode(data[1:])
    raise ValueError(f"unknown codec tag {tag}")


def encode_pids_auto(pids: np.ndarray) -> bytes:
    """Sorted pids → varint(first_pid) ++ tagged auto codec over the
    gaps BETWEEN pids (strictness as encode_pids).

    The absolute first pid is kept OUT of the FOR frame: it is O(corpus)
    while gaps are O(corpus/df), so folding it into the gap array would
    widen every bit-packed lane to its bit length and flat FOR would
    never win — the exception-value problem PFOR exists to solve,
    handled here by framing only the true gaps. The varint prefix is
    self-delimiting (first byte with a clear continuation bit), so no
    length header is needed."""
    p = np.asarray(pids, dtype=np.int64)
    if p.size == 0:
        return b""
    gaps = p[1:] - p[:-1]
    if (gaps <= 0).any():
        raise ValueError("pids must be strictly increasing")
    head = varint_encode(np.array([p[0]], dtype=np.uint64))
    return head + encode_u64_auto(gaps.astype(np.uint64))


def decode_pids_auto(data: bytes) -> np.ndarray:
    if len(data) == 0:
        return np.empty(0, dtype=np.int64)
    buf = np.frombuffer(data, dtype=np.uint8)
    end = int(np.flatnonzero((buf & 0x80) == 0)[0])  # varint self-delimits
    first = int(varint_decode(data[: end + 1])[0])
    gaps = decode_u64_auto(data[end + 1:]).astype(np.int64)
    return np.concatenate(([first], first + np.cumsum(gaps)))


def encode_tfs_auto(tfs: np.ndarray) -> bytes:
    return encode_u64_auto(np.asarray(tfs, dtype=np.uint64))


def decode_tfs_auto(data: bytes) -> np.ndarray:
    return decode_u64_auto(data).astype(np.int64)
