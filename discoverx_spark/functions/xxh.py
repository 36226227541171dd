"""Pure-Python XXH64 — driver-side reproduction of Spark's ``xxhash64``.

Spark's ``F.xxhash64(col1, col2, ...)`` (catalyst ``XxHash64``) folds its
arguments left-to-right starting from seed 42: for a string argument the
running hash becomes ``XXH64(utf8_bytes, seed=h)``; for an int literal it
becomes ``XXH64(4-byte little-endian, seed=h)`` (Spark's specialised
``hashInt`` is exactly XXH64 over the little-endian int bytes, and
``hashLong`` over the 8 LE bytes).  That lets a VALUES expected-output
oracle reproduce the production MinHash signatures (``dedup._hash_fn``
xxhash64 family) without any SQL-side xxhash support — DuckDB has none.

The algorithm is public (Yann Collet's xxHash, BSD); this is an
independent from-scratch implementation validated against Spark itself in
``tests/test_xxh.py`` (the test computes ``SELECT xxhash64(...)`` and
compares byte-for-byte).
"""

from __future__ import annotations

import struct

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1

SPARK_DEFAULT_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def _round(acc: int, inp: int) -> int:
    return (_rotl((acc + inp * _P2) & _M, 31) * _P1) & _M


def xxh64(data: bytes, seed: int) -> int:
    """XXH64 of ``data`` with ``seed`` (unsigned 64-bit result)."""
    seed &= _M
    n = len(data)
    off = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed
        v4 = (seed - _P1) & _M
        while off + 32 <= n:
            u = struct.unpack_from("<4Q", data, off)
            v1 = _round(v1, u[0])
            v2 = _round(v2, u[1])
            v3 = _round(v3, u[2])
            v4 = _round(v4, u[3])
            off += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h ^= _round(0, v)
            h = (h * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while off + 8 <= n:
        h ^= _round(0, struct.unpack_from("<Q", data, off)[0])
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        off += 8
    if off + 4 <= n:
        h ^= (struct.unpack_from("<I", data, off)[0] * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        off += 4
    while off < n:
        h ^= (data[off] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        off += 1
    return _fmix(h)


def _signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def spark_xxhash64_string(s: str, extra_int: int = None,
                          seed: int = SPARK_DEFAULT_SEED) -> int:
    """``F.xxhash64(string_col[, lit(extra_int)])`` as a signed long.

    Mirrors catalyst's left-to-right fold: hash the UTF-8 bytes of ``s``
    with the seed, then (when present) fold the 4-byte LE int literal with
    the running hash as seed — i.e. ``dedup._hash_fn('xxhash64', i)``."""
    h = xxh64(s.encode("utf-8"), seed)
    if extra_int is not None:
        h = xxh64(struct.pack("<i", extra_int), h)
    return _signed(h)
