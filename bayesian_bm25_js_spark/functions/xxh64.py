"""Pure-Python XXH64 — independent reimplementation from the public
xxHash specification (https://github.com/Cyan4973/xxHash/blob/dev/doc/xxhash_spec.md).

Purpose: an ORACLE-side hash for the MinHash/SimHash dedup operators.
Spark's `xxhash64(...)` expression is XXH64 with seed 42, hashing each
input column in sequence with the running hash as the next seed
(integers via the 4-byte path, longs via the 8-byte path, strings via
their UTF-8 bytes). Reimplementing the spec here — NOT calling into
Spark — lets tools/make_golden.py compute expected dedup outputs with
plain Python/NumPy and freeze them as golden parquet fixtures that the
correctness driver compares against the distributed results
(VERDICT r01 "What's missing" #1).

Parity with Spark's XXH64.java is pinned by tests/test_xxh64.py.
"""

from __future__ import annotations

import numpy as np

_M = (1 << 64) - 1
P1 = 11400714785074694791
P2 = 14029467366897019727
P3 = 1609587929392839161
P4 = 9650029242287828579
P5 = 2870177450012600261


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * P2) & _M
    h ^= h >> 29
    h = (h * P3) & _M
    h ^= h >> 32
    return h


def xxh64_bytes(data: bytes, seed: int) -> int:
    """XXH64 of a byte string (little-endian word reads, per spec)."""
    length = len(data)
    offset = 0
    if length >= 32:
        v1 = (seed + P1 + P2) & _M
        v2 = (seed + P2) & _M
        v3 = seed & _M
        v4 = (seed - P1) & _M
        while offset + 32 <= length:
            for _ in range(1):
                lanes = np.frombuffer(data, dtype="<u8", count=4, offset=offset)
                v1 = (_rotl((v1 + int(lanes[0]) * P2) & _M, 31) * P1) & _M
                v2 = (_rotl((v2 + int(lanes[1]) * P2) & _M, 31) * P1) & _M
                v3 = (_rotl((v3 + int(lanes[2]) * P2) & _M, 31) * P1) & _M
                v4 = (_rotl((v4 + int(lanes[3]) * P2) & _M, 31) * P1) & _M
            offset += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            k = (_rotl((v * P2) & _M, 31) * P1) & _M
            h = ((h ^ k) * P1 + P4) & _M
    else:
        h = (seed + P5) & _M
    h = (h + length) & _M
    while offset + 8 <= length:
        k = int(np.frombuffer(data, dtype="<u8", count=1, offset=offset)[0])
        k = (_rotl((k * P2) & _M, 31) * P1) & _M
        h = ((_rotl(h ^ k, 27) * P1) + P4) & _M
        offset += 8
    if offset + 4 <= length:
        k = int(np.frombuffer(data, dtype="<u4", count=1, offset=offset)[0])
        h = ((_rotl(h ^ ((k * P1) & _M), 23) * P2) + P3) & _M
        offset += 4
    while offset < length:
        h = (_rotl(h ^ ((data[offset] * P5) & _M), 11) * P1) & _M
        offset += 1
    return _fmix(h)


def xxh64_long(value: int, seed: int) -> int:
    """XXH64 of one 64-bit block (Spark's LongType path; equals
    xxh64_bytes of the 8 little-endian bytes)."""
    k = (_rotl((value & _M) * P2 & _M, 31) * P1) & _M
    h = (seed + P5 + 8) & _M
    h = ((_rotl(h ^ k, 27) * P1) + P4) & _M
    return _fmix(h)


def xxh64_int(value: int, seed: int) -> int:
    """XXH64 of one 32-bit block (Spark's IntegerType path)."""
    h = (seed + P5 + 4) & _M
    h = ((_rotl(h ^ (((value & 0xFFFFFFFF) * P1) & _M), 23) * P2) + P3) & _M
    return _fmix(h)


def _to_signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def spark_xxhash64(*values, seed: int = 42) -> int:
    """Equivalent of Spark's xxhash64(...) expression: chain-hash each
    value with the running hash as seed; returns a SIGNED 64-bit int
    (Spark LongType). bytes/str → byte path, bool/int → width by
    Python type tag: pass ("int", v) for a 32-bit column, plain Python
    int for a 64-bit (LongType) column, str/bytes for strings."""
    h = seed
    for v in values:
        if isinstance(v, tuple) and v[0] == "int":
            h = xxh64_int(v[1], h)
        elif isinstance(v, (bytes, bytearray)):
            h = xxh64_bytes(bytes(v), h)
        elif isinstance(v, str):
            h = xxh64_bytes(v.encode("utf-8"), h)
        elif isinstance(v, (int, np.integer)):
            h = xxh64_long(int(v) & _M, h)
        else:
            raise TypeError(f"unsupported type for spark_xxhash64: {type(v)}")
    return _to_signed(h)


# -- vectorized 64-bit-block variant (for MinHash permutation sweeps) ------

def _np_rotl(x: np.ndarray, r: int) -> np.ndarray:
    return (x << np.uint64(r)) | (x >> np.uint64(64 - r))


def _np_fmix(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> np.uint64(33))
    h = h * np.uint64(P2)
    h = h ^ (h >> np.uint64(29))
    h = h * np.uint64(P3)
    h = h ^ (h >> np.uint64(32))
    return h


def xxh64_long_np(values: np.ndarray, seed) -> np.ndarray:
    """Vectorized xxh64_long over a uint64 array; seed may be scalar or
    an array (for chained multi-column hashing)."""
    with np.errstate(over="ignore"):
        v = values.astype(np.uint64)
        k = _np_rotl(v * np.uint64(P2), 31) * np.uint64(P1)
        hs = (np.asarray(seed, dtype=np.uint64) + np.uint64(P5) + np.uint64(8))
        hs = _np_rotl(hs ^ k, 27) * np.uint64(P1) + np.uint64(P4)
        return _np_fmix(hs)


def xxh64_int_np(values: np.ndarray, seed) -> np.ndarray:
    """Vectorized xxh64_int (32-bit block path)."""
    with np.errstate(over="ignore"):
        v = values.astype(np.uint64) & np.uint64(0xFFFFFFFF)
        hs = (np.asarray(seed, dtype=np.uint64) + np.uint64(P5) + np.uint64(4))
        hs = _np_rotl(hs ^ (v * np.uint64(P1)), 23) * np.uint64(P2) + np.uint64(P3)
        return _np_fmix(hs)
