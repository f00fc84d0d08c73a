"""Feature-id hashing — the ``GetGeoMesaKafkaRecord`` murmur3 fid
replacement (``GetGeoMesaKafkaRecord.scala:458-476``) re-expressed.

The reference hashes all attribute values with murmur3-128 into a hex fid.
Spark's codegen'd hash family is xxhash64 / md5 / sha2; byte-identical
murmur3-128 output would require a Python UDF (mmh3 is not installed), so
``fid_hash`` defaults to md5 (cross-engine checkable in DuckDB) with
xxhash64 as the fast JVM-internal variant.  What matters for parity is the
contract: deterministic fid from the full attribute tuple, stable across
partitionings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fid_hash(*cols: Column | str, algo: str = "md5") -> Column:
    """Deterministic feature id from attribute values.

    Null-safe: nulls are encoded as a sentinel distinct from empty strings,
    so (null) and ("") hash differently — the reference feeds raw bytes per
    attribute and has the same property.
    """
    parts = [
        F.coalesce(F.col(c).cast("string") if isinstance(c, str) else c.cast("string"),
                   F.lit("\x00null\x00"))
        for c in cols
    ]
    joined = F.concat_ws("\x1f", *parts)
    if algo == "md5":
        return F.md5(joined)
    if algo == "xxhash64":
        return F.conv(F.xxhash64(joined).cast("string"), 10, 16)
    if algo == "sha2":
        return F.sha2(joined, 256)
    raise ValueError(f"unknown fid hash algo {algo!r}")


def with_fid(df: DataFrame, cols: list[str] | None = None, algo: str = "md5") -> DataFrame:
    """Attach a ``__fid`` column hashed from ``cols`` (default: all)."""
    use = cols or df.columns
    return df.withColumn("__fid", fid_hash(*use, algo=algo))
