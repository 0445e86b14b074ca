"""Driver-side xxHash64 matching Spark's ``F.xxhash64`` (seed 42).

Why: a bucket-pruned point lookup (`LakeTable.read_key`) needs the bucket
id of ONE key. Launching a Spark job (`spark.range(1).select(xxhash64(...))`)
for that costs a full job round-trip per lookup; the hash itself is a few
microseconds of integer math. This is the standard XXH64 algorithm
(public domain, Yann Collet) restricted to what Spark hashes: Spark's
``XxHash64`` expression hashes a string column's UTF-8 bytes and promotes
all integral types to a little-endian 8-byte long. Parity with the JVM
implementation is pinned by tests/test_lake.py::test_xxhash64_parity.
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def _merge_round(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * _P1 + _P4) & _M


def xxh64(data: bytes, seed: int = 42) -> int:
    """Unsigned XXH64 of ``data``."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i <= n - 8:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def spark_xxhash64(value, int_width: int = 8) -> int:
    """Signed 64-bit hash equal to ``F.xxhash64(col)`` (seed 42).

    str → UTF-8 bytes; bytes → as-is; int/bool → little-endian two's
    complement of ``int_width`` bytes. Width MATTERS: Spark's XxHash64
    hashes Byte/Short/Int/Boolean columns through its 4-byte hashInt path
    and Long through the 8-byte hashLong path — the same value in an int
    vs a bigint column hashes differently (empirically pinned by
    tests/test_lake.py::test_xxhash64_parity). Callers must pass the
    width of the COLUMN the executor-side hash runs on (4 for
    byte/short/int/boolean, 8 for long).
    """
    if isinstance(value, str):
        data = value.encode("utf-8")
    elif isinstance(value, (bytes, bytearray)):
        data = bytes(value)
    elif isinstance(value, (int, bool)):
        data = int(value).to_bytes(int_width, "little", signed=True)
    else:
        raise TypeError(f"unsupported key type for xxhash64: {type(value)}")
    h = xxh64(data, 42)
    return h - (1 << 64) if h >= (1 << 63) else h
