"""Driver-side twins of Spark hash expressions.

``xxhash64_str`` reproduces Spark's ``xxhash64(string_col)`` (Catalyst
``XxHash64``: reference XXH64 over the UTF-8 bytes, seed 42, signed
64-bit result) in pure Python, and ``term_bucket`` the engine's bucket
mapping ``pmod(xxhash64(term), n_buckets)``.

Why: the inverted-index serve needs the bucket of each CONSTANT query
term to list only those postings directories.  Computing |terms| hash
values is driver-constant work; doing it with a ``spark.range(1)``
expression costs a full cluster round trip (job submit + schedule +
collect) per serve — pure latency at any scale, and the only job in the
serve path that touches no data.  Parity with the JVM expression is
pinned by ``tests/test_hashing.py`` over randomized lengths/scripts —
the build side keeps writing ``tb`` with the Catalyst expression, so a
drift here would misroute serves and fail those pins loudly.

Public-spec algorithm: XXH64 (https://github.com/Cyan4973/xxHash,
public domain spec); Spark's XXH64.java is validated against the same
reference vectors (XXH64Suite).
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = 0xFFFFFFFFFFFFFFFF

#: Spark's seed for all Catalyst xxhash64 expressions.
SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M64
    return (_rotl(acc, 31) * _P1) & _M64


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return ((acc * _P1) + _P4) & _M64


def xxh64(data: bytes, seed: int = SPARK_SEED) -> int:
    """Reference XXH64 of *data*, unsigned 64-bit result."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i:i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8:i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16:i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24:i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12)
             + _rotl(v4, 18)) & _M64
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        k1 = _round(0, int.from_bytes(data[i:i + 8], "little"))
        h = ((_rotl(h ^ k1, 27) * _P1) + _P4) & _M64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i:i + 4], "little") * _P1) & _M64
        h = ((_rotl(h, 23) * _P2) + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def xxhash64_str(s: str) -> int:
    """Spark ``xxhash64(lit(s))``: signed 64-bit, seed 42, UTF-8."""
    h = xxh64(s.encode("utf-8"), SPARK_SEED)
    return h - (1 << 64) if h >= (1 << 63) else h


def term_bucket(term: str, n_buckets: int) -> int:
    """Spark ``pmod(xxhash64(lit(term)), lit(n_buckets))`` — the
    inverted-index build's bucket mapping, computed on the driver."""
    return xxhash64_str(term) % n_buckets
