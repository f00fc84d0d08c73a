"""Snapshot tags + rollback (lake/table.py, lake/ledger.py)."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from geomesa_nifi_spark.lake import LakeTable, merge_changes
from geomesa_nifi_spark.lake.ledger import CommitConflict


def _mk(spark, tmp, n_batches=3):
    src = spark.range(120).select(
        F.concat(F.lit("k"), (F.col("id") % 40).cast("string")).alias("k"),
        F.col("id").alias("seq"),
        (F.col("id") * 2).alias("v"),
        F.when(F.col("id") % 9 == 0, "delete").otherwise("upsert").alias("op"),
    )
    t = LakeTable.create(
        spark, tmp + "/t", src.drop("op").schema,
        key_col="k", ts_col="seq", num_buckets=4,
    )
    for b in range(n_batches):
        merge_changes(t, src.filter(F.col("seq") % n_batches == b), batch_id=f"b{b}")
    return t, src


def test_tag_create_resolve_scan(spark):
    with tempfile.TemporaryDirectory() as tmp:
        t, _ = _mk(spark, tmp)
        v2 = t.snapshot().version
        t.create_tag("prod")
        assert t.tags() == {"prod": v2}
        # advance the table; the tag keeps reading the old state
        merge_changes(
            t,
            spark.createDataFrame([("k0", 10_000, -1, "upsert")], "k string, seq long, v long, op string"),
            batch_id="late",
        )
        tagged = {r.k: r.v for r in t.scan(version="prod").collect()}
        head = {r.k: r.v for r in t.scan().collect()}
        assert tagged != head and head["k0"] == -1 and tagged["k0"] != -1
        # lookup through the tag too
        assert t.lookup(["k0"], version="prod").collect()[0].v == tagged["k0"]


def test_tag_name_validation_and_duplicates(spark):
    with tempfile.TemporaryDirectory() as tmp:
        t, _ = _mk(spark, tmp, n_batches=1)
        t.create_tag("a.b-c_1")
        with pytest.raises(CommitConflict):
            t.create_tag("a.b-c_1")
        t.create_tag("a.b-c_1", version=0, replace=True)
        assert t.tags()["a.b-c_1"] == 0
        with pytest.raises(ValueError):
            t.create_tag("../evil")
        with pytest.raises(KeyError):
            t.create_tag("nope", version=999)
        with pytest.raises(KeyError):
            t.scan(version="missing-tag")
        t.delete_tag("a.b-c_1")
        assert t.tags() == {}
        with pytest.raises(KeyError):
            t.delete_tag("a.b-c_1")


def test_tagged_version_survives_expiry(spark):
    with tempfile.TemporaryDirectory() as tmp:
        t, _ = _mk(spark, tmp, n_batches=4)
        t.create_tag("pinned", version=1)
        pinned_state = sorted(map(tuple, t.scan(version=1).collect()))
        removed = t.expire_snapshots(keep_last=2)
        assert 1 not in removed and 0 in removed
        t.vacuum(min_age_s=0)
        # the tagged version still reads, byte-identically
        assert sorted(map(tuple, t.scan(version="pinned").collect())) == pinned_state
        # untagged expired version is gone
        with pytest.raises(FileNotFoundError):
            t.scan(version=0)


def test_rollback_restores_state_as_new_commit(spark):
    with tempfile.TemporaryDirectory() as tmp:
        t, src = _mk(spark, tmp, n_batches=3)
        good = t.snapshot().version
        good_state = sorted(map(tuple, t.scan().collect()))
        # a bad batch lands
        merge_changes(
            t,
            spark.createDataFrame([("k1", 99_999, 666, "upsert")], "k string, seq long, v long, op string"),
            batch_id="bad",
        )
        assert sorted(map(tuple, t.scan().collect())) != good_state
        snap = t.rollback(good)
        assert snap.version == good + 2  # new commit, history intact
        assert snap.summary["operation"] == "rollback"
        assert sorted(map(tuple, t.scan().collect())) == good_state
        # the bad version is still time-travelable (audit chain intact)
        assert any(r.v == 666 for r in t.scan(version=good + 1).collect())
        # rolling back to a tag works and to the current head is a no-op
        t.create_tag("good", version=good)
        assert t.rollback("good").summary["rollback_of"] == good
        head = t.snapshot().version
        assert t.rollback(head).version == head


def test_rollback_across_rescale_restores_modulus(spark):
    with tempfile.TemporaryDirectory() as tmp:
        t, src = _mk(spark, tmp, n_batches=2)
        before = t.snapshot().version
        before_nb = t.num_buckets
        state = sorted(map(tuple, t.scan().collect()))
        t.rescale(before_nb * 2)
        assert t.num_buckets == before_nb * 2
        t.rollback(before)
        assert t.num_buckets == before_nb
        assert sorted(map(tuple, t.scan().collect())) == state
        # lookups prune with the restored modulus and still hit
        ks = [r[0] for r in t.scan().select("k").limit(3).collect()]
        assert sorted(r.k for r in t.lookup(ks).collect()) == sorted(ks)
