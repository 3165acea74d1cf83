"""Hashing: a pure-Python XXH64 matching Spark's ``xxhash64`` expression.

Spark's ``F.xxhash64(string_col)`` hashes the UTF-8 bytes with the standard
XXH64 algorithm, seed 42. The reference simulator (reference-equivalence
harness, SURVEY.md §5.2) must reproduce the engine's frontier keys without a
JVM, so we implement XXH64 from the public algorithm spec
(https://github.com/Cyan4973/xxHash — public domain spec). Property-tested
against Spark's own ``xxhash64`` in tests/test_hashing.py.

Also: MinHash / SimHash helpers used by the dedup operator family are in
operators/dedup.py (they use JVM-side hash expressions, not this module).
"""

from __future__ import annotations

MASK64 = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5

SPARK_XXHASH_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK64


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & MASK64
    acc = _rotl(acc, 31)
    return (acc * _P1) & MASK64


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return ((acc * _P1) + _P4) & MASK64


def xxh64(data: bytes, seed: int = SPARK_XXHASH_SEED) -> int:
    """XXH64 of ``data`` (unsigned 64-bit result)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & MASK64
        v2 = (seed + _P2) & MASK64
        v3 = seed & MASK64
        v4 = (seed - _P1) & MASK64
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
        h = (seed + _P5) & MASK64
    h = (h + n) & MASK64
    while i <= n - 8:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & MASK64
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & MASK64
        h = (_rotl(h, 23) * _P2 + _P3) & MASK64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & MASK64
        h = (_rotl(h, 11) * _P1) & MASK64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & MASK64
    h ^= h >> 29
    h = (h * _P3) & MASK64
    h ^= h >> 32
    return h


def spark_xxhash64_str(s: str) -> int:
    """Signed-64 value identical to Spark's ``xxhash64(lit(s))``."""
    u = xxh64(s.encode("utf-8"), SPARK_XXHASH_SEED)
    return u - (1 << 64) if u >= (1 << 63) else u
