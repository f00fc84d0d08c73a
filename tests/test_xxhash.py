"""Driver-side XXH64 (functions/xxhash.py) must equal Spark's xxhash64
expression exactly — it stands in for a Spark job on the lookup path."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from geomesa_nifi_spark.functions.xxhash import bucket_of, spark_xxhash64


def _spark_hashes(spark, values, dtype):
    df = spark.createDataFrame(
        [(v,) for v in values], T.StructType([T.StructField("v", dtype)])
    )
    return [r[0] for r in df.select(F.xxhash64("v")).collect()]


def test_strings_match_spark(spark):
    # every tail-length class of the algorithm: 0, <4, <8, 8..31, >=32,
    # multi-stripe, plus unicode (multi-byte UTF-8)
    vals = [
        "", "a", "abc", "abcd", "abcdefg", "abcdefgh",
        "0123456789abcdef", "x" * 31, "x" * 32, "x" * 33, "y" * 100,
        "https://d7.example.org/p/123456", "naïve façade", "日本語テキスト",
        "\x00\x01\x02", "a\x1fb",
    ]
    got = [spark_xxhash64(v, T.StringType()) for v in vals]
    want = _spark_hashes(spark, vals, T.StringType())
    assert got == want


def test_integral_types_match_spark(spark):
    longs = [0, 1, -1, 42, -42, 2**62, -(2**62), 2**63 - 1, -(2**63)]
    assert [spark_xxhash64(v, T.LongType()) for v in longs] == _spark_hashes(
        spark, longs, T.LongType()
    )
    ints = [0, 1, -1, 2**31 - 1, -(2**31), 123456]
    assert [spark_xxhash64(v, T.IntegerType()) for v in ints] == _spark_hashes(
        spark, ints, T.IntegerType()
    )
    shorts = [0, -1, 32767, -32768]
    assert [spark_xxhash64(v, T.ShortType()) for v in shorts] == _spark_hashes(
        spark, shorts, T.ShortType()
    )
    assert [spark_xxhash64(v, T.BooleanType()) for v in (True, False)] == _spark_hashes(
        spark, [True, False], T.BooleanType()
    )


def test_date_timestamp_match_spark(spark):
    dates = [dt.date(1970, 1, 1), dt.date(2024, 2, 29), dt.date(1901, 12, 13)]
    assert [spark_xxhash64(v, T.DateType()) for v in dates] == _spark_hashes(
        spark, dates, T.DateType()
    )
    tss = [
        dt.datetime(1970, 1, 1),
        dt.datetime(2024, 5, 6, 12, 34, 56, 789012),
        dt.datetime(1955, 11, 5, 6, 0, 0),
    ]
    assert [spark_xxhash64(v, T.TimestampType()) for v in tss] == _spark_hashes(
        spark, tss, T.TimestampType()
    )


def test_bucket_of_matches_bucket_expr(spark):
    vals = [f"https://d{i}.example.org/p/{i * 7}" for i in range(50)]
    for nb in (4, 16, 27):
        got = [bucket_of(v, T.StringType(), nb) for v in vals]
        df = spark.createDataFrame([(v,) for v in vals], "v string")
        want = [
            r[0]
            for r in df.select(
                F.pmod(F.xxhash64("v"), F.lit(nb)).cast("int")
            ).collect()
        ]
        assert got == want


def test_unsupported_types_return_none():
    assert spark_xxhash64(1.5, T.DoubleType()) is None
    assert bucket_of(b"\x01", T.BinaryType(), 8) is None
    assert spark_xxhash64(None, T.StringType()) is None
