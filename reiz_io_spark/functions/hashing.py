"""Pure-Python XXH64 bit-compatible with Spark's ``xxhash64`` expression.

Spark evaluates ``xxhash64(c1, c2, ...)`` as a left fold:
``h = 42; h = XXH64(bytes(c1), seed=h); h = XXH64(bytes(c2), seed=h)``
(strings hash their UTF-8 bytes). Reimplementing it driver-side lets
the engine compute doc_ids / term buckets without launching a Spark job
(one job saved per query) and lets the pure-Python oracle derive
doc_ids independently of Spark. Bit-parity is asserted in tests.

Algorithm: standard XXH64 (Collet, public domain spec; same layout
Spark's org.apache.spark.sql.catalyst.expressions.XxHash64 follows).
"""

from __future__ import annotations

MASK64 = 0xFFFFFFFFFFFFFFFF
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK64


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * P2) & MASK64
    acc = _rotl(acc, 31)
    return (acc * P1) & MASK64


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * P1 + P4) & MASK64


def xxh64(data: bytes, seed: int) -> int:
    """XXH64 of raw bytes -> unsigned 64-bit int."""
    seed &= MASK64
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & MASK64
        v2 = (seed + P2) & MASK64
        v3 = seed
        v4 = (seed - P1) & MASK64
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & MASK64
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + P5) & MASK64
    h = (h + n) & MASK64
    while i <= n - 8:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * P1 + P4) & MASK64
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i : i + 4], "little") * P1) & MASK64
        h = (_rotl(h, 23) * P2 + P3) & MASK64
        i += 4
    while i < n:
        h ^= (data[i] * P5) & MASK64
        h = (_rotl(h, 11) * P1) & MASK64
        i += 1
    h ^= h >> 33
    h = (h * P2) & MASK64
    h ^= h >> 29
    h = (h * P3) & MASK64
    h ^= h >> 32
    return h


def _to_signed(x: int) -> int:
    return x - (1 << 64) if x >= (1 << 63) else x


def xxh64_long(value: int, seed: int) -> int:
    """Spark hashes integral types as their little-endian 8-byte value
    via hashLong (a fixed-size XXH64 specialization)."""
    seed &= MASK64
    h = (seed + P5 + 8) & MASK64
    h ^= _round(0, value & MASK64)
    h = (_rotl(h, 27) * P1 + P4) & MASK64
    h ^= h >> 33
    h = (h * P2) & MASK64
    h ^= h >> 29
    h = (h * P3) & MASK64
    h ^= h >> 32
    return h


def spark_xxhash64(*cols: "str | bytes | int", seed: int = 42) -> int:
    """Bit-equal to Spark's ``F.xxhash64(*cols)`` (signed 64-bit)."""
    h = seed
    for c in cols:
        if isinstance(c, str):
            h = xxh64(c.encode("utf-8"), h)
        elif isinstance(c, (bytes, bytearray)):
            h = xxh64(bytes(c), h)
        elif isinstance(c, int):
            h = xxh64_long(c, h)
        else:
            raise TypeError(type(c))
    return _to_signed(h)


def doc_id_of(repo: str, path: str) -> int:
    """The engine's document identity: xxhash64(repo, path)."""
    return spark_xxhash64(repo, path)


def term_bucket_of(term: str, n_buckets: int) -> int:
    """pmod(xxhash64(term), n_buckets) — matches the index writer."""
    return spark_xxhash64(term) % n_buckets
