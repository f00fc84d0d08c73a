"""Feature-id hashing: byte-identical murmur3-128 fids
(GetGeoMesaKafkaRecord.scala:458-476 — commons-codec MurmurHash3.hash128,
seed 104729, hex of big-endian halves)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geomesa_nifi_spark.functions.hashing import (
    fid_hash,
    murmur3_128_hex,
    murmur3_fid,
    murmur3_x64_128,
)

# verified against org.apache.commons.codec.digest.MurmurHash3.hash128
# (the exact function the reference calls) via the Spark JVM
KNOWN = {
    b"": "9d2764a018e329428c3cf3b035938518",
    b"a": "3361634e7e0f5188e9c7dda24eae326b",
    b"abc": "8cc66bdf24a3b65ee942bed9d38bee40",
    b"hello world": "bd699b58e46894087d50ce87a7f20429",
    b"0123456789abcdef": "1a6e941ec6a76967d7d82808f505d6b1",  # one full block
    b"0123456789abcdefX": "c31e5ea436db745dd00872afcf95362c",
    b"x" * 15: "e824228c856e674d208fdb4a4446b406",  # tail-only
    b"y" * 16: "1fc033763b8ab957d062f654966de133",
    b"z" * 17: "f8c21ccd8cc82848ac366684bf778cbf",
    b"w" * 31: "225779cc55c6d9e331c1bef1ea7fd850",
    b"q" * 32: "023cfbaae97022966e478a6208b3031e",
    b"m" * 100: "6d95e2c077ed8bf75a7edd8a44469f82",
    "héllo wörld ünïcode".encode("utf-8"): "7151702984edce3f9dc44f957f8d9318",
    b"10001:Ada:20:2015-05-06:POINT (-100.2365 23)":
        "70eb02d4cacbc5d5952517802556f297",
}


def test_known_vectors_batch():
    data = list(KNOWN)
    assert murmur3_128_hex(data) == list(KNOWN.values())


def test_matches_jvm_commons_codec(spark):
    """Cross-check against the exact library function the reference calls
    (commons-codec ships in Spark's JVM)."""
    MH = spark._jvm.org.apache.commons.codec.digest.MurmurHash3
    data = [b"", b"spark", b"n" * 23, b"long " * 50, bytes(range(256))]
    got = murmur3_128_hex(data)
    for b, g in zip(data, got):
        arr = MH.hash128(b)
        lo, hi = arr[0] & (2**64 - 1), arr[1] & (2**64 - 1)
        assert g == f"{lo:016x}{hi:016x}", b


def test_empty_batch():
    h1, h2 = murmur3_x64_128([])
    assert len(h1) == 0 and len(h2) == 0
    assert murmur3_128_hex([]) == []


def test_murmur3_fid_column(spark):
    """DataFrame-level fid: id + ':' + attrs, Scala null rendering."""
    df = spark.createDataFrame(
        [("10001", "Ada", 20), ("10002", None, 25)], "id string, name string, age int"
    )
    rows = {r["id"]: r["fid"] for r in
            df.select("id", murmur3_fid("id", "name", "age").alias("fid")).collect()}
    assert rows["10001"] == murmur3_128_hex([b"10001:Ada:20"])[0]
    assert rows["10002"] == murmur3_128_hex([b"10002:null:25"])[0]  # Scala toString(null)


def test_murmur3_fid_df_date_parity(spark):
    """Temporal attributes must render as java.util.Date.toString (the
    reference string-joins attribute OBJECTS, GetGeoMesaKafkaRecord.scala:
    468) — 'Wed May 06 00:00:00 UTC 2015', not Spark's cast-to-string.
    Cross-checked against the JVM's own Date.toString."""
    import datetime as dt

    from geomesa_nifi_spark.functions.hashing import (
        java_date_string,
        murmur3_fid_df,
    )

    t = dt.datetime(2015, 5, 6, 0, 0, 0)
    df = spark.createDataFrame([("10001", "Ada", t)],
                               "id string, name string, dtg timestamp")
    rendered = df.select(java_date_string("dtg").alias("s")).first()["s"]
    # the exact library rendering the reference produces (JVM default TZ is
    # pinned to the session TZ = UTC by session.py)
    millis = int(t.replace(tzinfo=dt.timezone.utc).timestamp() * 1000)
    jvm_str = spark._jvm.java.util.Date(millis).toString()
    assert rendered == jvm_str == "Wed May 06 00:00:00 UTC 2015"

    fid = df.select(murmur3_fid_df(df, "id", "name", "dtg").alias("f")).first()["f"]
    assert fid == murmur3_128_hex([f"10001:Ada:{jvm_str}".encode()])[0]


def test_fid_hash_murmur3_algo(spark):
    df = spark.createDataFrame([("a", 1)], "k string, v int")
    r = df.select(fid_hash("k", "v", algo="murmur3").alias("f")).first()
    assert r["f"] == murmur3_128_hex(["a\x1f1".encode()])[0]
    assert len(r["f"]) == 32
