"""Debezium envelope ingest (sources/debezium.py): decode both wire shapes
into the merge contract, end-to-end through a lake table."""

from __future__ import annotations

import json
import tempfile

from pyspark.sql import functions as F
from pyspark.sql import types as T

from geomesa_nifi_spark.lake import LakeTable, merge_changes
from geomesa_nifi_spark.sources.debezium import (
    debezium_flat_to_changes,
    debezium_to_changes,
    encode_debezium,
    kafka_debezium_to_changes,
)

PAYLOAD = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("qty", T.LongType()),
        T.StructField("note", T.StringType()),
    ]
)


def _env(op, row, ts_ms, lsn, before=None):
    e = {
        "before": before if op == "d" else None,
        "after": None if op == "d" else row,
        "source": {"connector": "postgresql", "ts_ms": ts_ms, "lsn": lsn},
        "op": op,
        "ts_ms": ts_ms + 5,  # envelope ts lags source ts; source wins
    }
    return (json.dumps(e),)


def test_envelope_decode_ops_and_images(spark):
    rows = [
        _env("c", {"id": "a", "qty": 1, "note": "new"}, 1000, 10),
        _env("u", {"id": "a", "qty": 2, "note": "upd"}, 2000, 20),
        _env("r", {"id": "b", "qty": 7, "note": "snap"}, 500, 5),
        _env("d", None, 3000, 30, before={"id": "a", "qty": 2, "note": "upd"}),
        _env("t", None, 4000, 40, before=None),  # truncate: unknown -> NULL op
    ]
    df = spark.createDataFrame(rows, "value string")
    out = debezium_to_changes(df, PAYLOAD).collect()
    assert len(out) == 5
    by_lsn = {r.dbz_lsn: r for r in out}
    assert by_lsn[10].op == "upsert" and by_lsn[10].qty == 1
    assert by_lsn[20].op == "upsert" and by_lsn[20].qty == 2
    assert by_lsn[5].op == "upsert" and by_lsn[5].note == "snap"
    # delete takes the BEFORE image (after is null on the wire)
    assert by_lsn[30].op == "delete" and by_lsn[30].id == "a"
    # source.ts_ms wins over envelope ts_ms
    assert by_lsn[10].dbz_ts_ms == 1000
    # unknown op -> NULL op for dead-letter routing, never dropped
    unknowns = [r for r in out if r.op is None]
    assert len(unknowns) == 1


def test_snapshot_reads_can_be_dropped(spark):
    rows = [
        _env("r", {"id": "b", "qty": 7, "note": "snap"}, 500, 5),
        _env("c", {"id": "c", "qty": 1, "note": "new"}, 600, 6),
    ]
    df = spark.createDataFrame(rows, "value string")
    out = debezium_to_changes(df, PAYLOAD, include_snapshot_reads=False).collect()
    assert [r.id for r in out] == ["c"]


def test_flat_smt_decode(spark):
    rows = [
        (json.dumps({"id": "a", "qty": 1, "note": "n", "__op": "c", "__ts_ms": 100, "__lsn": 1}),),
        (json.dumps({"id": "a", "qty": 0, "note": None, "__deleted": "true", "__ts_ms": 200, "__lsn": 2}),),
        # no metadata at all (drop-tombstone SMT config): plain upsert
        (json.dumps({"id": "b", "qty": 9, "note": "x"}),),
    ]
    df = spark.createDataFrame(rows, "value string")
    out = {r.dbz_lsn: r for r in debezium_flat_to_changes(df, PAYLOAD).collect()}
    assert out[1].op == "upsert" and out[1].qty == 1
    assert out[2].op == "delete"
    assert out[None].op == "upsert" and out[None].id == "b"


def test_kafka_tombstones_dropped_lineage_kept(spark):
    recs = [
        ("k1", _env("c", {"id": "a", "qty": 1, "note": "n"}, 100, 1)[0], "t", 0, 7),
        ("k1", None, "t", 0, 8),  # log-compaction tombstone: no payload
    ]
    df = spark.createDataFrame(
        recs, "key string, value string, topic string, partition int, offset long"
    )
    out = kafka_debezium_to_changes(df, PAYLOAD).collect()
    assert len(out) == 1
    assert out[0].id == "a" and out[0].offset == 7 and out[0].topic == "t"


def test_encode_decode_roundtrip_through_lake(spark):
    """Engine changes -> Debezium wire -> decode -> merge == direct merge."""
    n = 400
    base = spark.range(n).select(
        F.concat(F.lit("k"), (F.col("id") % 60).cast("string")).alias("id"),
        (F.col("id") * 3).alias("qty"),
        F.concat(F.lit("note-"), F.col("id").cast("string")).alias("note"),
        F.when(F.col("id") % 7 == 0, "delete").otherwise("upsert").alias("op"),
        (F.lit(1_700_000_000_000) + F.col("id")).alias("ts_ms"),
        F.col("id").alias("lsn"),
    )
    wire = encode_debezium(base, ts_ms_col="ts_ms", lsn_col="lsn")
    decoded = debezium_to_changes(wire, PAYLOAD)

    def replay(src, tag):
        root = tempfile.mkdtemp(prefix=f"dbz-{tag}-") + "/t"
        t = LakeTable.create(
            spark, root, src.drop("op").schema,
            key_col="id", ts_col="dbz_ts_ms", tiebreak_col="dbz_lsn",
            num_buckets=4,
        )
        for b in (1, 0, 2):  # scrambled batches
            merge_changes(t, src.filter(F.col("dbz_lsn") % 3 == b), batch_id=f"b{b}")
        return sorted(map(tuple, t.scan().select("id", "qty", "note").collect()))

    direct = base.select(
        "id", "qty", "note", "op",
        F.col("ts_ms").alias("dbz_ts_ms"), F.col("lsn").alias("dbz_lsn"),
    )
    got = replay(decoded, "wire")
    want = replay(direct, "direct")
    assert got == want and len(got) > 0
