"""Driver-side XXH64 matching Spark's ``xxhash64`` (seed 42).

The lake's bucket layout hashes with Spark's ``xxhash64`` expression
(``table.py::bucket_expr``).  Point lookups and attribute-index lookups
need the bucket of a handful of LITERALS — paying a Spark job (plan +
schedule + single-row task) per lookup just to hash three strings is
pure fixed overhead on the engine's hottest read path
(``FeatureWriters.scala:126-147``'s per-feature read, which the
reference does store-side without a scan).  This module computes the
same hash in pure Python from the public XXH64 spec (Collet,
xxhash.com; the same algorithm Spark's ``XXH64`` implements), so bucket
location is a driver-side arithmetic step, not a job.

Type coverage mirrors Spark's ``XxHash64Function``: strings hash their
UTF-8 bytes; byte/short/int (and int-like dates) hash as 4-byte
little-endian; long/timestamp-micros as 8-byte little-endian; boolean
as int 0/1.  Anything else returns ``None`` and callers fall back to
the Spark-job path — never a wrong bucket, only a slower one.
``tests/test_xxhash.py`` pins equality against the Spark expression
across types, lengths and edge values.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import types as T

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1

_EPOCH_DATE = dt.date(1970, 1, 1)
_EPOCH_TS = dt.datetime(1970, 1, 1)


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def _merge(h: int, v: int) -> int:
    return ((h ^ _round(0, v)) * _P1 + _P4) & _M


def xxh64(data: bytes, seed: int = 42) -> int:
    """Unsigned XXH64 of ``data`` (public spec; default seed = Spark's)."""
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
        h = _merge(h, v1)
        h = _merge(h, v2)
        h = _merge(h, v3)
        h = _merge(h, v4)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
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


def _encode(value, dtype: T.DataType) -> bytes | None:
    """Spark ``XxHash64Function`` input bytes for a literal, or None if the
    type is outside the supported map (caller falls back to a Spark job)."""
    if value is None:
        return None  # Spark skips nulls (hash = seed); bucket of null is moot
    if isinstance(dtype, T.StringType):
        return str(value).encode("utf-8")
    if isinstance(dtype, T.LongType):
        return int(value).to_bytes(8, "little", signed=True)
    if isinstance(dtype, (T.IntegerType, T.ShortType, T.ByteType)):
        return int(value).to_bytes(4, "little", signed=True)
    if isinstance(dtype, T.BooleanType):
        return (1 if value else 0).to_bytes(4, "little")
    if isinstance(dtype, T.DateType):
        d = value if isinstance(value, dt.date) else None
        if d is None:
            return None
        return (d - _EPOCH_DATE).days.to_bytes(4, "little", signed=True)
    if isinstance(dtype, T.TimestampType):
        t = value if isinstance(value, dt.datetime) else None
        if t is None:
            return None
        if t.tzinfo is not None:
            t = t.astimezone(dt.timezone.utc).replace(tzinfo=None)
        micros = round((t - _EPOCH_TS).total_seconds() * 1_000_000)
        return micros.to_bytes(8, "little", signed=True)
    return None


def spark_xxhash64(value, dtype: T.DataType) -> int | None:
    """Signed 64-bit hash equal to ``F.xxhash64(col)`` on a ``dtype`` column
    holding ``value``; None when the type is unsupported."""
    b = _encode(value, dtype)
    if b is None:
        return None
    h = xxh64(b)
    return h - (1 << 64) if h >= (1 << 63) else h


def bucket_of(value, dtype: T.DataType, num_buckets: int) -> int | None:
    """The lake bucket of a literal: ``pmod(xxhash64(value), num_buckets)``,
    computed without a Spark job; None when the type is unsupported."""
    h = spark_xxhash64(value, dtype)
    if h is None:
        return None
    return h % num_buckets  # Python % on a signed int IS pmod
