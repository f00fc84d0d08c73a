"""Bucket rescaling: rewrite the table under a new modulus.

The reference's stores fix their partition scheme at schema-create time
(``PutGeoMesaFsTest.scala:86``); at 100 TB a create-time bucket count is a
scaling liability (merge parallelism ceiling, per-bucket rewrite size), so
the engine adds ``LakeTable.rescale`` — an atomic full rewrite under a new
``pmod(xxhash64(key), B')`` layout, with version-aware readers (time travel
across a rescale prunes with the modulus its snapshot was written under)
and rescale-aware conflict handling in every writer path.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geomesa_nifi_spark.lake import (
    CommitConflict,
    LakeTable,
    append_only,
    compact,
    merge_changes,
)

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("offset", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)
CHANGE = T.StructType(list(SCHEMA.fields) + [T.StructField("op", T.StringType())])


def ts(i):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=int(i))


def ev(url, i, text, op="upsert"):
    return Row(url=url, warc_ts=ts(i), offset=int(i), text=text, op=op)


def make(spark, tmp_path, name, num_buckets=4, **props):
    return LakeTable.create(
        spark, str(tmp_path / name), SCHEMA,
        key_col="url", ts_col="warc_ts", tiebreak_col="offset",
        num_buckets=num_buckets, properties=props,
    )


def state(t, version=None):
    return {r.url: (r.warc_ts, r.text) for r in t.scan(version=version).collect()}


def _assert_layout_consistent(t):
    """Every live file's recorded bucket matches pmod(xxhash64(key), B')
    for every row it holds — the invariant all pruning rests on."""
    nb = t.num_buckets
    snap = t.snapshot()
    import os

    for f in snap.files:
        df = t.spark.read.parquet(os.path.join(t.root, f.path))
        bad = df.filter(
            F.pmod(F.xxhash64(F.col(t.key_col)), F.lit(nb)).cast("int") != F.lit(f.bucket)
        ).count()
        assert bad == 0, f"file {f.path} labeled bucket {f.bucket} holds foreign rows"


def test_rescale_preserves_state_up_and_down(spark, tmp_path):
    t = make(spark, tmp_path, "t", num_buckets=4)
    batch = spark.createDataFrame([ev(f"u{i}", i, f"v{i}") for i in range(120)], CHANGE)
    merge_changes(t, batch, batch_id="b0")
    before = state(t)

    snap = t.rescale(16)
    assert snap.summary["operation"] == "rescale"
    assert snap.summary["from_buckets"] == 4 and snap.summary["to_buckets"] == 16
    assert t.num_buckets == 16
    assert state(t) == before
    _assert_layout_consistent(t)
    assert len({f.bucket for f in t.snapshot().files}) > 4  # actually spread

    # shrink too (arbitrary modulus, not only multiples)
    t.rescale(3)
    assert t.num_buckets == 3
    assert state(t) == before
    _assert_layout_consistent(t)

    # idempotent no-op: same modulus commits nothing
    v = t.snapshot().version
    t.rescale(3)
    assert t.snapshot().version == v

    with pytest.raises(ValueError):
        t.rescale(0)


def test_rescale_folds_mor_deltas_and_keeps_tombstones(spark, tmp_path):
    t = make(spark, tmp_path, "t", num_buckets=4)
    merge_changes(
        t,
        spark.createDataFrame([ev(f"u{i}", i, "v1") for i in range(40)], CHANGE),
        batch_id="b0", mode="mor", auto_compact=False,
    )
    merge_changes(
        t,
        spark.createDataFrame(
            [ev("u1", 100, "v2"), ev("u2", 101, None, op="delete")], CHANGE
        ),
        batch_id="b1", mode="mor", auto_compact=False,
    )
    assert any(f.kind == "delta" for f in t.snapshot().files)

    t.rescale(8)
    snap = t.snapshot()
    # deltas are LWW-resolved into base files on the way through
    assert all(f.kind == "base" for f in snap.files)
    s = state(t)
    assert s["u1"] == (ts(100), "v2")
    assert "u2" not in s
    _assert_layout_consistent(t)

    # tombstones survived the rescale: a stale replay of the deleted key
    # (older ts) still cannot resurrect it
    merge_changes(
        t, spark.createDataFrame([ev("u2", 2, "stale")], CHANGE), batch_id="b2"
    )
    assert "u2" not in state(t)


def test_lookup_is_version_aware_across_rescale(spark, tmp_path):
    t = make(spark, tmp_path, "t", num_buckets=4)
    merge_changes(
        t,
        spark.createDataFrame([ev(f"u{i}", i, f"v{i}") for i in range(60)], CHANGE),
        batch_id="b0",
    )
    v_old = t.snapshot().version
    t.rescale(13)
    merge_changes(
        t, spark.createDataFrame([ev("u5", 200, "new5")], CHANGE), batch_id="b1"
    )

    # current-version lookup prunes with the new modulus
    assert {r.url for r in t.lookup(["u5", "u7"]).collect()} == {"u5", "u7"}
    assert t.lookup(["u5"]).collect()[0].text == "new5"
    # time-travel lookup prunes with the OLD modulus and sees the old value
    old = t.lookup(["u5", "u7"], version=v_old).collect()
    assert {r.url for r in old} == {"u5", "u7"}
    assert {r.text for r in old} == {"v5", "v7"}


def test_merge_after_rescale_prunes_with_new_modulus(spark, tmp_path):
    t = make(spark, tmp_path, "t", num_buckets=4)
    merge_changes(
        t,
        spark.createDataFrame([ev(f"u{i}", i, "v1") for i in range(200)], CHANGE),
        batch_id="b0",
    )
    t.rescale(16)
    res = merge_changes(
        t, spark.createDataFrame([ev("u3", 300, "v2")], CHANGE), batch_id="b1"
    )
    touched = res.snapshot.summary["touched_buckets"]
    assert len(touched) == 1 and touched[0] < 16
    assert state(t)["u3"] == (ts(300), "v2")
    _assert_layout_consistent(t)


def test_cow_merge_losing_race_to_rescale_rebuckets(spark, tmp_path):
    """A CoW merge whose commit loses to a concurrent rescale must re-bucket
    its batch under the new modulus before redoing — otherwise the rewrite
    publishes files whose bucket labels misprune every later scan."""
    t = make(spark, tmp_path, "t", num_buckets=4)
    merge_changes(
        t,
        spark.createDataFrame([ev(f"u{i}", i, "v1") for i in range(80)], CHANGE),
        batch_id="b0",
    )

    other = LakeTable(spark, t.root)  # the "concurrent" admin writer
    real_commit = t.ledger.commit
    fired = {"n": 0}

    def racing_commit(snap):
        if fired["n"] == 0 and snap.summary.get("operation") == "merge":
            fired["n"] = 1
            other.rescale(16)  # wins the version race
        return real_commit(snap)

    t.ledger.commit = racing_commit
    try:
        res = merge_changes(
            t, spark.createDataFrame([ev("u9", 500, "v2")], CHANGE), batch_id="b1"
        )
    finally:
        t.ledger.commit = real_commit
    assert res.snapshot is not None
    assert t.num_buckets == 16
    assert state(t)["u9"] == (ts(500), "v2")
    _assert_layout_consistent(t)


def test_mor_merge_losing_race_to_rescale_rewrites_deltas(spark, tmp_path):
    t = make(spark, tmp_path, "t", num_buckets=4)
    merge_changes(
        t,
        spark.createDataFrame([ev(f"u{i}", i, "v1") for i in range(80)], CHANGE),
        batch_id="b0",
    )

    other = LakeTable(spark, t.root)
    real_commit = t.ledger.commit
    fired = {"n": 0}

    def racing_commit(snap):
        if fired["n"] == 0 and snap.summary.get("operation") == "merge_mor":
            fired["n"] = 1
            other.rescale(16)
        return real_commit(snap)

    t.ledger.commit = racing_commit
    try:
        res = merge_changes(
            t,
            spark.createDataFrame([ev("u9", 500, "v2")], CHANGE),
            batch_id="b1", mode="mor", auto_compact=False,
        )
    finally:
        t.ledger.commit = real_commit
    assert res.snapshot is not None
    assert t.num_buckets == 16
    assert state(t)["u9"] == (ts(500), "v2")
    _assert_layout_consistent(t)


def test_append_losing_race_to_rescale_rewrites_files(spark, tmp_path):
    t = make(spark, tmp_path, "t", num_buckets=4)
    df = spark.createDataFrame([Row(url=f"u{i}", warc_ts=ts(i), offset=int(i),
                                    text="v1") for i in range(50)], SCHEMA)

    other = LakeTable(spark, t.root)
    real_commit = t.ledger.commit
    fired = {"n": 0}

    def racing_commit(snap):
        if fired["n"] == 0 and snap.summary.get("operation") == "append":
            fired["n"] = 1
            other.rescale(16)
        return real_commit(snap)

    t.ledger.commit = racing_commit
    try:
        res = append_only(t, df, batch_id="b0")
    finally:
        t.ledger.commit = real_commit
    assert res.metrics["appended"] == 50
    assert t.num_buckets == 16
    assert t.scan().count() == 50
    _assert_layout_consistent(t)


def test_stale_instance_sees_rescale(spark, tmp_path):
    """num_buckets is never cached: a long-lived writer instance picks up a
    rescale committed by another process before its next batch."""
    t = make(spark, tmp_path, "t", num_buckets=4)
    stale = LakeTable(spark, t.root)
    assert stale.num_buckets == 4  # warm the instance
    t.rescale(32)
    assert stale.num_buckets == 32
    merge_changes(
        stale, spark.createDataFrame([ev("k", 1, "v")], CHANGE), batch_id="b0"
    )
    _assert_layout_consistent(stale)


def test_rescale_then_vacuum_drops_old_layout(spark, tmp_path):
    t = make(spark, tmp_path, "t", num_buckets=4)
    merge_changes(
        t,
        spark.createDataFrame([ev(f"u{i}", i, "v1") for i in range(60)], CHANGE),
        batch_id="b0",
    )
    before = state(t)
    t.rescale(8)
    t.expire_snapshots(keep_last=1)
    removed = t.vacuum()
    assert removed  # the old 4-bucket layout's files are gone
    assert state(t) == before
