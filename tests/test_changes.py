"""Changelog egress (table_changes) and fid hashing."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geomesa_nifi_spark.functions.hashing import with_fid
from geomesa_nifi_spark.lake import LakeTable, merge_changes
from geomesa_nifi_spark.streaming.changes import rewrite_commits, table_changes

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


def test_table_changes_roundtrip(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, key_col="url",
                         ts_col="warc_ts", tiebreak_col="offset", num_buckets=4)
    merge_changes(t, spark.createDataFrame([ev("a", 1, "a1"), ev("b", 2, "b1")], CHANGE),
                  batch_id="1", mode="mor", auto_compact=False)
    merge_changes(t, spark.createDataFrame([ev("a", 3, "a2"), ev("b", 4, None, op="delete")], CHANGE),
                  batch_id="2", mode="mor", auto_compact=False)

    all_changes = table_changes(t).orderBy("_commit_version", "offset").collect()
    assert [(r.url, r._change_type, r._commit_version) for r in all_changes] == [
        ("a", "insert_or_update", 1),
        ("b", "insert_or_update", 1),
        ("a", "insert_or_update", 2),
        ("b", "delete", 2),
    ]
    assert {r._batch_id for r in all_changes} == {"1", "2"}

    # incremental read: only the second commit
    inc = table_changes(t, from_version=1).collect()
    assert len(inc) == 2 and all(r._commit_version == 2 for r in inc)

    # a downstream replay of the changelog reproduces the table state
    replayed = (
        spark.createDataFrame(all_changes)
        .withColumn("op", F.when(F.col("_change_type") == "delete", "delete").otherwise("upsert"))
        .drop("_change_type", "_commit_version", "_batch_id")
    )
    t2 = LakeTable.create(spark, str(tmp_path / "t2"), SCHEMA, key_col="url",
                          ts_col="warc_ts", tiebreak_col="offset", num_buckets=4)
    merge_changes(t2, replayed, batch_id="replay")
    a = t.scan().orderBy("url")
    b = t2.scan().orderBy("url")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_rewrite_commits_surfaced(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, key_col="url",
                         ts_col="warc_ts", tiebreak_col="offset", num_buckets=4)
    merge_changes(t, spark.createDataFrame([ev("a", 1, "a1")], CHANGE), batch_id="1", mode="cow")
    recs = rewrite_commits(t)
    assert len(recs) == 1 and recs[0]["operation"] == "merge"
    assert table_changes(t).count() == 0  # CoW commits are not row-changelogs


def test_fid_hash_deterministic_and_null_safe(spark):
    df = spark.createDataFrame(
        [Row(a="x", b=None), Row(a="x", b=""), Row(a="x", b="y")]
    )
    out = with_fid(df).collect()
    fids = [r["__fid"] for r in out]
    assert len(set(fids)) == 3  # null vs "" vs value all distinct
    again = [r["__fid"] for r in with_fid(df).collect()]
    assert fids == again


def test_cow_changelog_retention(spark, tmp_path):
    """changelog.enabled=true: CoW merges retain their change rows as side
    files and table_changes replays them like MoR deltas; scans and vacuum
    stay correct."""
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, key_col="url",
        ts_col="warc_ts", tiebreak_col="offset", num_buckets=4,
        properties={"changelog.enabled": "true"},
    )
    merge_changes(t, spark.createDataFrame([ev("a", 1, "a1"), ev("b", 2, "b1")], CHANGE),
                  batch_id="1")
    merge_changes(t, spark.createDataFrame(
        [ev("a", 3, "a2"), ev("b", 4, None, op="delete"), ev("a", 0, "stale")], CHANGE),
        batch_id="2")
    ch = table_changes(t).collect()
    by = {}
    for r in ch:
        by.setdefault(r["_batch_id"], []).append(r)
    assert {r.url for r in by["1"]} == {"a", "b"}
    assert all(r["_change_type"] == "insert_or_update" for r in by["1"])
    # batch 2: a updated (the stale event lost LWW inside the batch and is
    # absent), b deleted
    b2 = {r.url: r for r in by["2"]}
    assert b2["a"]["_change_type"] == "insert_or_update" and b2["a"].text == "a2"
    assert b2["b"]["_change_type"] == "delete"
    assert len(by["2"]) == 2
    # scans never see changelog side files
    assert {r.url for r in t.scan().collect()} == {"a"}
    # vacuum keeps summary-referenced changelog files
    assert t.vacuum(min_age_s=0) == []
    assert len(table_changes(t).collect()) == len(ch)
    # without the property, CoW commits stay summary-only (rewrite_commits)
    t2 = LakeTable.create(spark, str(tmp_path / "t2"), SCHEMA, key_col="url",
                          ts_col="warc_ts", tiebreak_col="offset", num_buckets=4)
    merge_changes(t2, spark.createDataFrame([ev("a", 1, "a1")], CHANGE), batch_id="1")
    assert table_changes(t2).count() == 0
    assert rewrite_commits(t2)


def test_changelog_gc_retention_and_loud_failure(spark, tmp_path):
    """changelog.retention.versions GC (table.gc_changelog): files past the
    horizon are deleted, in-horizon reads still work, and reading a GC'd
    range raises ChangelogRetentionError — never a silently-empty frame."""
    import pytest

    from geomesa_nifi_spark.streaming.changes import ChangelogRetentionError

    t = LakeTable.create(
        spark, str(tmp_path / "gc"), SCHEMA, key_col="url",
        ts_col="warc_ts", tiebreak_col="offset", num_buckets=4,
        properties={"changelog.enabled": "true",
                    "changelog.retention.versions": "1"},
    )
    for i in range(3):
        merge_changes(t, spark.createDataFrame([ev(f"k{i}", i + 1, f"v{i}")], CHANGE),
                      batch_id=f"b{i}", mode="cow")
    # all three commits readable before GC
    assert table_changes(t).count() == 3

    removed = t.gc_changelog()
    assert removed  # commits v1..v(horizon) lost their side files

    # in-horizon incremental read still works (newest retained commit)
    cur = t.snapshot().version
    inc = table_changes(t, from_version=cur - 1)
    assert inc.count() == 1

    # reaching past the horizon fails LOUDLY
    with pytest.raises(ChangelogRetentionError):
        table_changes(t).count()

    # idempotent: nothing further to remove
    assert t.gc_changelog() == []


def test_expired_snapshot_range_fails_loudly(spark, tmp_path):
    """expire_snapshots horizon: asking table_changes for versions the
    ledger no longer holds raises instead of returning partial changes."""
    import pytest

    from geomesa_nifi_spark.streaming.changes import ChangelogRetentionError

    t = LakeTable.create(
        spark, str(tmp_path / "exp"), SCHEMA, key_col="url",
        ts_col="warc_ts", tiebreak_col="offset", num_buckets=4,
    )
    for i in range(6):
        merge_changes(t, spark.createDataFrame([ev(f"k{i}", i + 1, f"v{i}")], CHANGE),
                      batch_id=f"b{i}", mode="mor", auto_compact=False)
    t.expire_snapshots(keep_last=3)
    with pytest.raises(ChangelogRetentionError):
        table_changes(t)  # from_version=0 reaches past the expiry horizon
    # the retained range still reads: snapshots v5, v6 need parent v4+
    cur = t.snapshot().version
    ok = table_changes(t, from_version=cur - 1).collect()
    assert len(ok) == 1
    # a range whose PARENT snapshot is gone also fails loudly, not with a
    # raw FileNotFoundError — through a FRESH handle (the writer's own
    # in-process snapshot cache would otherwise mask the expiry)
    t2 = LakeTable(spark, t.root)
    oldest = min(s.version for s in t2.history())
    with pytest.raises(ChangelogRetentionError):
        table_changes(t2, from_version=oldest - 1).count()
