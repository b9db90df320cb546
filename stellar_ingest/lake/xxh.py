"""Pure-Python XXH64 — the same hash Spark's ``xxhash64`` computes.

XXH64 is Yann Collet's public xxHash algorithm (BSD-licensed spec);
Spark's ``F.xxhash64`` applies it with seed 42 to each column value's
byte encoding (UTF-8 bytes for StringType) and chains multi-column
hashes by using the previous hash as the next seed.  Implementing it
driver-side means a point lookup (lake/read.py::key_bucket) can map
key → bucket in microseconds with NO Spark job — important when
lookups are interactive or issued in volume.

``tests/test_lake.py::test_python_xxh64_matches_spark`` proves
bit-for-bit equality against ``F.xxhash64`` over generated keys;
``key_bucket`` also keeps a Spark-side fallback for non-string keys.
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


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def _merge_round(h: int, v: int) -> int:
    h ^= _round(0, v)
    return ((h * _P1) + _P4) & _M


def xxh64(data: bytes, seed: int = 42) -> int:
    """XXH64 of ``data`` with ``seed`` (Spark uses seed 42), returned
    as an UNSIGNED 64-bit int; see :func:`xxh64_signed` for Spark's
    LongType view."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
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
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = ((_rotl(h, 27) * _P1) + _P4) & _M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M
        h = ((_rotl(h, 23) * _P2) + _P3) & _M
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


def xxh64_signed(data: bytes, seed: int = 42) -> int:
    """Signed 64-bit view — exactly what Spark's ``xxhash64`` column
    yields (LongType two's complement)."""
    h = xxh64(data, seed)
    return h - (1 << 64) if h >= (1 << 63) else h


def key_bytes(key, type_name: str | None = None) -> bytes:
    """The byte encoding Spark's ``xxhash64`` hashes for a column value:
    UTF-8 bytes for StringType, 4-byte little-endian two's complement
    for IntegerType, 8-byte for LongType (both verified bit-for-bit
    against ``F.xxhash64`` in tests/test_lake.py).  ``type_name`` is the
    icebox schema type of the column ("string"/"int"/"long") — a Python
    int alone can't distinguish Spark's int from long, and they hash
    differently.  Raises TypeError for types without a driver-side
    encoding (callers fall back to a one-row Spark plan)."""
    if isinstance(key, bool):
        raise TypeError("no driver-side xxhash64 encoding for bool keys")
    if isinstance(key, str):
        return key.encode("utf-8")
    if isinstance(key, int):
        n = 4 if type_name == "int" else 8
        return (key & ((1 << (8 * n)) - 1)).to_bytes(n, "little")
    raise TypeError(
        f"no driver-side xxhash64 encoding for {type(key).__name__} keys"
    )


def bucket_of(key, num_buckets: int, type_name: str | None = None) -> int:
    """``pmod(xxhash64(key), num_buckets)`` for a string/int/long key —
    the write path's bucket assignment (lake/write.py::bucket_expr),
    computed without Spark.  Python's ``%`` on a signed value is
    already pmod (result takes the divisor's sign)."""
    return xxh64_signed(key_bytes(key, type_name)) % num_buckets
