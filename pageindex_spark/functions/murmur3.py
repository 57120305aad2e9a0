"""Pure-Python Murmur3_x86_32 matching Spark's ``hash()`` for strings.

Spark's ``F.hash(col)`` on a string column is Murmur3_x86_32 over the UTF-8
bytes with seed 42, processing 4-byte little-endian words then mixing each
remaining TAIL byte individually as a SIGNED int (see
``org.apache.spark.unsafe.hash.Murmur3_x86_32.hashUnsafeBytes``) — this
differs from the classic murmur3 tail handling, so a stock mmh3 library
would NOT match. Having it in Python lets the query planner compute index
bucket ids for query terms without launching a Spark job.

Verified against ``F.hash`` in tests/test_codec.py.
"""

from __future__ import annotations

_MASK = 0xFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _MASK


def _mix_k1(k1: int) -> int:
    k1 = (k1 * 0xCC9E2D51) & _MASK
    k1 = _rotl(k1, 15)
    return (k1 * 0x1B873593) & _MASK


def _mix_h1(h1: int, k1: int) -> int:
    h1 ^= k1
    h1 = _rotl(h1, 13)
    return (h1 * 5 + 0xE6546B64) & _MASK


def _fmix(h1: int, length: int) -> int:
    h1 ^= length
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _MASK
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _MASK
    h1 ^= h1 >> 16
    return h1


def hash_utf8(s: str, seed: int = 42) -> int:
    """Spark-compatible int32 hash of a string (signed, like F.hash)."""
    data = s.encode("utf-8")
    n = len(data)
    h1 = seed & _MASK
    aligned = n - n % 4
    for i in range(0, aligned, 4):
        k1 = int.from_bytes(data[i : i + 4], "little")
        h1 = _mix_h1(h1, _mix_k1(k1))
    for i in range(aligned, n):
        b = data[i]
        if b >= 128:
            b -= 256  # Java bytes are signed; sign-extend into the int
        h1 = _mix_h1(h1, _mix_k1(b & _MASK))
    out = _fmix(h1, n)
    return out - (1 << 32) if out >= 1 << 31 else out


def term_bucket(term: str, n_buckets: int) -> int:
    """pmod(hash(term), n_buckets) — matches the index writer's bucket col."""
    return hash_utf8(term) % n_buckets
