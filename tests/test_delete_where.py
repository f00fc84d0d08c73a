"""Predicate deletes (lake/merge.py::delete_where) + as-of time travel."""

from __future__ import annotations

import tempfile
import time

import pytest
from pyspark.sql import functions as F

from geomesa_nifi_spark.lake import LakeTable, delete_where, merge_changes


def _mk(spark, tmp, mode="cow"):
    src = spark.range(200).select(
        F.concat(F.lit("k"), (F.col("id") % 80).cast("string")).alias("k"),
        F.col("id").alias("seq"),
        F.col("id").alias("off"),
        (F.col("id") % 7).alias("grp"),
        (F.col("id") * 2).alias("v"),
        F.lit("upsert").alias("op"),
    )
    t = LakeTable.create(
        spark, tmp + "/t", src.drop("op").schema,
        key_col="k", ts_col="seq", tiebreak_col="off", num_buckets=4,
    )
    for b in range(2):
        merge_changes(t, src.filter(F.col("seq") % 2 == b), batch_id=f"b{b}",
                      mode=mode)
    return t


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_delete_where_removes_current_matches(spark, mode):
    with tempfile.TemporaryDirectory() as tmp:
        t = _mk(spark, tmp, mode=mode)
        before = {r.k: r.grp for r in t.scan().collect()}
        victims = {k for k, g in before.items() if g == 3}
        assert victims
        res = delete_where(t, [("grp", "=", 3)], batch_id="dw1", mode=mode)
        assert res.metrics.get("skipped") is not True
        after = {r.k for r in t.scan().collect()}
        assert after == set(before) - victims
        # exactly-once: same batch_id is a no-op
        v = t.snapshot().version
        delete_where(t, [("grp", "=", 3)], batch_id="dw1", mode=mode)
        assert t.snapshot().version == v


def test_delete_where_tombstones_beat_older_upserts(spark):
    with tempfile.TemporaryDirectory() as tmp:
        t = _mk(spark, tmp)
        victims = sorted(r.k for r in t.scan().where("grp = 2").collect())
        pre_delete = t.snapshot().version
        delete_where(t, [("grp", "=", 2)], batch_id="dw")
        # an OLDER upsert for a deleted key must not resurrect it
        old = spark.createDataFrame(
            [(victims[0], -5, -5, 2, 0, "upsert")],
            "k string, seq long, off long, grp long, v long, op string",
        )
        merge_changes(t, old, batch_id="late-old")
        assert t.scan().where(F.col("k") == victims[0]).count() == 0
        # an EXACT re-delivery of the victim row (same clock) must not
        # resurrect either — the tombstone's tiebreak is advanced past it
        victim_rows = (
            t.scan(version=pre_delete)
            .where(F.col("k") == victims[1])
            .withColumn("op", F.lit("upsert"))
        )
        assert victim_rows.count() == 1
        merge_changes(t, victim_rows, batch_id="redelivery")
        assert t.scan().where(F.col("k") == victims[1]).count() == 0
        # a NEWER upsert resurrects (normal LWW)
        new = spark.createDataFrame(
            [(victims[0], 10_000, 10_000, 2, 1, "upsert")],
            "k string, seq long, off long, grp long, v long, op string",
        )
        merge_changes(t, new, batch_id="late-new")
        assert t.scan().where(F.col("k") == victims[0]).count() == 1


def test_delete_where_prunes_files(spark):
    """The predicate scan must open fewer files than the table holds when
    zone maps exclude them (seq is write-sorted, so seq ranges split)."""
    with tempfile.TemporaryDirectory() as tmp:
        t = _mk(spark, tmp)
        snap = t.snapshot()
        cand = t.candidate_files(where=[("seq", "<", 5)])
        assert len(cand) < len(snap.files)


def test_version_as_of(spark):
    with tempfile.TemporaryDirectory() as tmp:
        t = _mk(spark, tmp)
        v_before = t.snapshot().version
        t0 = int(time.time() * 1000)
        time.sleep(0.05)
        delete_where(t, [("grp", "=", 1)], batch_id="dw")
        assert t.version_as_of(t0) == v_before
        assert t.version_as_of(int(time.time() * 1000)) == t.snapshot().version
        with pytest.raises(KeyError):
            t.version_as_of(0)
        # reading as-of shows the pre-delete state
        n_before = t.scan(version=t.version_as_of(t0)).count()
        assert n_before > t.scan().count()
