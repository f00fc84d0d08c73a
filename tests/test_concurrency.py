"""Optimistic-concurrency behavior: MoR commits rebase past concurrent
commits; CoW commits rebase only when buckets are disjoint."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from geomesa_nifi_spark.lake import CommitConflict, LakeTable, merge_changes
from geomesa_nifi_spark.lake.table import LakeTable as _LT

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


def make(spark, tmp_path):
    return LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA,
        key_col="url", ts_col="warc_ts", tiebreak_col="offset", num_buckets=4,
    )


def _inject_commit_between(monkeypatch, table, spark, rows):
    """Make another writer commit between our data write and ledger commit."""
    other = LakeTable(spark, table.root)
    orig = _LT.write_files
    state = {"fired": False}

    def patched(self, df, version_hint, max_records_per_file=2_000_000, kind="base", **kw):
        files = orig(self, df, version_hint, max_records_per_file, kind, **kw)
        if not state["fired"]:
            state["fired"] = True
            merge_changes(other, spark.createDataFrame(rows, CHANGE),
                          batch_id="intruder", mode="mor", auto_compact=False)
        return files

    monkeypatch.setattr(_LT, "write_files", patched)


def test_mor_commit_rebases_past_concurrent_writer(spark, tmp_path, monkeypatch):
    t = make(spark, tmp_path)
    _inject_commit_between(monkeypatch, t, spark, [ev("other", 99, "x")])
    r = merge_changes(t, spark.createDataFrame([ev("mine", 1, "v")], CHANGE),
                      batch_id="me", mode="mor", auto_compact=False)
    assert not r.skipped
    versions = [s.summary.get("batch_id") for s in t.history()]
    assert "intruder" in versions and "me" in versions
    st = {x.url for x in t.scan().collect()}
    assert st == {"other", "mine"}  # both writers' rows landed


def test_cow_conflict_same_bucket_redoes_merge(spark, tmp_path, monkeypatch):
    """A concurrent rewrite of OUR bucket invalidates the executed join; the
    merge must transparently redo against the new snapshot (not silently
    commit a stale result, not surface an error to the caller)."""
    t = make(spark, tmp_path)
    merge_changes(t, spark.createDataFrame([ev("k", 1, "v1")], CHANGE), batch_id="seed")
    # intruder updates the SAME key (same bucket) between write and commit
    _inject_commit_between(monkeypatch, t, spark, [ev("k", 50, "intruder")])
    r = merge_changes(t, spark.createDataFrame([ev("k", 10, "mine")], CHANGE),
                      batch_id="me", mode="cow")
    assert not r.skipped
    bids = [s.summary.get("batch_id") for s in t.history()]
    assert "intruder" in bids and "me" in bids
    final = {x.url: x.text for x in t.scan().collect()}
    assert final == {"k": "intruder"}  # offset 50 beats 10 after the redo
    # the abandoned first-attempt files are unreferenced -> vacuum removes them
    assert t.vacuum(min_age_s=0)


def test_cow_changelog_survives_rebase(spark, tmp_path, monkeypatch):
    """changelog.enabled CoW retention under conflict-rebase: a commit whose
    summary lists changelog side files loses the version race to a
    DISJOINT-bucket commit and rebases — table_changes must still surface
    the rebased commit's change rows (merge.py:393-415,441-465)."""
    from geomesa_nifi_spark.streaming.changes import table_changes

    t = LakeTable.create(
        spark, str(tmp_path / "cl"), SCHEMA,
        key_col="url", ts_col="warc_ts", tiebreak_col="offset", num_buckets=4,
        properties={"changelog.enabled": "true"},
    )
    # pick two keys that land in different buckets so the rebase path (not
    # the redo path) is taken
    from pyspark.sql import functions as F

    probe = spark.createDataFrame([(f"k{i}",) for i in range(20)], "url string")
    buckets = {r["url"]: r["b"] for r in
               probe.select("url", t.bucket_expr().alias("b")).collect()}
    k_mine = "k0"
    k_other = next(k for k, b in buckets.items() if b != buckets[k_mine])

    _inject_commit_between(monkeypatch, t, spark, [ev(k_other, 99, "intruder")])
    r = merge_changes(t, spark.createDataFrame([ev(k_mine, 1, "mine")], CHANGE),
                      batch_id="me", mode="cow")
    assert not r.skipped
    # both commits present; ours rebased on top of the intruder's
    bids = [s.summary.get("batch_id") for s in t.history()]
    assert "intruder" in bids and "me" in bids
    ch = table_changes(t)
    by_batch = {r["_batch_id"]: r["url"] for r in ch.collect()}
    assert by_batch.get("me") == k_mine, ch.collect()
    assert by_batch.get("intruder") == k_other


def test_cow_conflict_with_compaction_only_rebases(spark, tmp_path, monkeypatch):
    """A compaction is a logical no-op fold of files the merge already
    read: losing the race to one must REBASE (one resolution pass), not
    redo the merge — a frequently-compacting MoR peer must not starve a
    CoW writer (observed live in the cross-process soak)."""
    t = make(spark, tmp_path)
    merge_changes(t, spark.createDataFrame([ev("k", 1, "v1")], CHANGE),
                  batch_id="seed", mode="mor", auto_compact=False)
    other = LakeTable(spark, t.root)
    orig = _LT.write_files
    state = {"fired": False, "calls": 0}

    def patched(self, df, version_hint, max_records_per_file=2_000_000, kind="base", **kw):
        state["calls"] += 1
        files = orig(self, df, version_hint, max_records_per_file, kind, **kw)
        if not state["fired"]:
            state["fired"] = True
            from geomesa_nifi_spark.lake import compact

            compact(other)  # folds k's delta into a base file
        return files

    monkeypatch.setattr(_LT, "write_files", patched)
    r = merge_changes(t, spark.createDataFrame([ev("k", 10, "mine")], CHANGE),
                      batch_id="me", mode="cow")
    assert not r.skipped
    final = {x.url: x.text for x in t.scan().collect()}
    assert final == {"k": "mine"}
    ops = [s.summary.get("operation") for s in t.history()]
    assert "compact" in ops and "merge" in ops
    # exactly 2 write_files calls: our one resolution + the compaction's —
    # a redo would have produced a third
    assert state["calls"] == 2


def test_append_only_rebases_past_concurrent_commit(spark, tmp_path, monkeypatch):
    """A blind append is content-independent of the base snapshot: losing
    the commit race must rebase onto the newer snapshot, reusing the
    already-written files (no redo, no orphan parts), not raise."""
    from geomesa_nifi_spark.lake import append_only

    t = make(spark, tmp_path)
    _inject_commit_between(monkeypatch, t, spark, [ev("other", 99, "x")])
    r = append_only(t, spark.createDataFrame([ev("mine", 1, "v")], CHANGE).drop("op"),
                    batch_id="me")
    assert not r.skipped and r.metrics.get("appended") == 1
    bids = [s.summary.get("batch_id") for s in t.history()]
    assert "intruder" in bids and "me" in bids
    assert {x.url for x in t.scan().collect()} == {"other", "mine"}
    # the rebased commit reused its files: no orphaned DATA files for vacuum
    # (the losing attempt's tiny ledger manifests are expected orphans)
    assert [p for p in t.vacuum(min_age_s=0) if p.endswith(".parquet")] == []


def test_append_only_conflict_idempotent_skip(spark, tmp_path, monkeypatch):
    """If the conflicting commit turns out to BE our batch (a concurrent
    duplicate replay), the retry loop skips instead of double-appending."""
    from geomesa_nifi_spark.lake import append_only

    t = make(spark, tmp_path)
    other = LakeTable(spark, t.root)
    orig = _LT.write_files
    state = {"fired": False}

    def patched(self, df, version_hint, max_records_per_file=2_000_000, kind="base", **kw):
        files = orig(self, df, version_hint, max_records_per_file, kind, **kw)
        if not state["fired"]:
            state["fired"] = True
            append_only(other,
                        spark.createDataFrame([ev("dup", 1, "v")], CHANGE).drop("op"),
                        batch_id="me")
        return files

    monkeypatch.setattr(_LT, "write_files", patched)
    r = append_only(t, spark.createDataFrame([ev("dup", 1, "v")], CHANGE).drop("op"),
                    batch_id="me")
    assert r.skipped and r.metrics.get("reason") == "batch_committed"
    assert [x.url for x in t.scan().collect()] == ["dup"]  # appended exactly once


def _count_base_writes(monkeypatch):
    """Wrap write_files (AFTER any other patch) counting kind='base' calls."""
    counts = {"base": 0}
    prev = _LT.write_files

    def counting(self, df, version_hint, max_records_per_file=2_000_000,
                 kind="base", **kw):
        if kind == "base":
            counts["base"] += 1
        return prev(self, df, version_hint, max_records_per_file, kind, **kw)

    monkeypatch.setattr(_LT, "write_files", counting)
    return counts


def test_compact_rebase_on_disjoint_conflict(spark, tmp_path, monkeypatch):
    """compact() loses the version race to a commit touching OTHER buckets:
    pure rebase — the already-written fold re-commits, no second rewrite
    (three-committer soak finding: auto-compaction used to abort here)."""
    from geomesa_nifi_spark.lake import compact

    t = make(spark, tmp_path)
    urls = [f"u{i}" for i in range(40)]
    b_of = {u: t._literal_buckets([u], 4)[0] for u in urls}
    a = next(u for u in urls if b_of[u] == 0)
    c = next(u for u in urls if b_of[u] == 3)
    mk = lambda rows: spark.createDataFrame(rows, CHANGE)
    merge_changes(t, mk([ev(a, 1, "v1")]), batch_id="s1", mode="mor", auto_compact=False)
    merge_changes(t, mk([ev(a, 2, "v2")]), batch_id="s2", mode="mor", auto_compact=False)
    _inject_commit_between(monkeypatch, t, spark, [ev(c, 99, "x")])
    counts = _count_base_writes(monkeypatch)
    snap = compact(t, buckets=[0])
    assert snap.summary["operation"] == "compact"
    assert counts["base"] == 1  # rebase: the fold was NOT rewritten
    bids = [s.summary.get("batch_id") for s in t.history()]
    assert "intruder" in bids
    final = {x.url: x.text for x in t.scan().collect()}
    assert final == {a: "v2", c: "x"}  # nobody's rows lost
    assert not any(
        f.kind == "delta" and f.bucket == 0 for f in t.snapshot().files
    )


def test_compact_redo_on_overlapping_conflict(spark, tmp_path, monkeypatch):
    """compact() loses the race to a commit that added a delta INTO its
    scope: the stale fold would drop that delta's rows, so it must redo
    from the new head (and the redo folds the intruder's delta too)."""
    from geomesa_nifi_spark.lake import compact

    t = make(spark, tmp_path)
    urls = [f"u{i}" for i in range(40)]
    b_of = {u: t._literal_buckets([u], 4)[0] for u in urls}
    a = next(u for u in urls if b_of[u] == 0)
    mk = lambda rows: spark.createDataFrame(rows, CHANGE)
    merge_changes(t, mk([ev(a, 1, "v1")]), batch_id="s1", mode="mor", auto_compact=False)
    merge_changes(t, mk([ev(a, 2, "v2")]), batch_id="s2", mode="mor", auto_compact=False)
    # intruder updates the SAME key -> same bucket 0, inside the scope
    _inject_commit_between(monkeypatch, t, spark, [ev(a, 99, "intruder")])
    counts = _count_base_writes(monkeypatch)
    compact(t, buckets=[0])
    assert counts["base"] == 2  # first fold discarded, redo against head
    final = {x.url: x.text for x in t.scan().collect()}
    assert final == {a: "intruder"}  # the raced delta was folded, not dropped
    assert not any(f.kind == "delta" for f in t.snapshot().files)
    # the abandoned first-attempt files are unreferenced -> vacuum removes them
    assert t.vacuum(min_age_s=0)
