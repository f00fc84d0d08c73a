"""Streaming Write-Audit-Publish: every micro-batch staged on an isolated
per-epoch branch, audited against the full post-merge state, then published
atomically — the NiFi staging-store + route-to-failure flow as lake
branches (``streaming/pipeline.py::_wap_cycle``).

Pinned here: final-state equivalence with a plain replay, atomic
visibility (history shows publishes, no partial batches), audit rejection
as an exactly-once no-op commit, crash-resume across every window
(post-stage/pre-publish and post-publish/pre-drop), and changelog
readability across the auto-dropped per-epoch branches."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geomesa_nifi_spark.lake import LakeTable
from geomesa_nifi_spark.streaming.changes import table_changes
from geomesa_nifi_spark.streaming.pipeline import run_file_replay

from tests.test_streaming import (
    expected_final_count,
    make_table,
    replay_dir,  # noqa: F401  (fixture)
)


def _state(t):
    return sorted(map(tuple, t.scan().collect()))


def test_wap_replay_matches_plain_replay(spark, tmp_path, replay_dir):  # noqa: F811
    plain = make_table(spark, tmp_path, "plain")
    run_file_replay(spark, plain, replay_dir, str(tmp_path / "ck0"),
                    pipeline_id="p", max_files_per_trigger=2, write_mode="mor")

    wap = make_table(spark, tmp_path, "wap")
    stats = run_file_replay(
        spark, wap, replay_dir, str(tmp_path / "ck1"), pipeline_id="p",
        max_files_per_trigger=2, write_mode="mor", wap=True,
    )
    assert stats.batches == 3 and stats.skipped == 0
    assert _state(wap) == _state(plain)

    ops = [s.summary.get("operation") for s in wap.history()]
    # atomic visibility: main's history is create + one publish per batch —
    # no staged merge ever landed on main directly
    assert ops.count("publish") == 3
    assert "merge_mor" not in ops and "merge" not in ops
    # per-epoch branches were dropped after publishing
    assert set(wap.branches()) == {"main"}


def test_wap_changelog_survives_dropped_epoch_branches(spark, tmp_path, replay_dir):  # noqa: F811
    plain = make_table(spark, tmp_path, "plain")
    run_file_replay(spark, plain, replay_dir, str(tmp_path / "ck0"),
                    pipeline_id="p", max_files_per_trigger=3,
                    write_mode="mor", wap=False)
    t = make_table(spark, tmp_path)
    run_file_replay(spark, t, replay_dir, str(tmp_path / "ck"),
                    pipeline_id="p", max_files_per_trigger=3,
                    write_mode="mor", wap=True)
    ch = table_changes(t, from_version=0)
    # every change row from every published epoch is readable even though
    # the per-epoch branches are gone (published_commits fallback); same
    # batching -> identical per-batch LWW winners as the plain replay
    plain_ch = table_changes(plain, from_version=0)
    key = ["url", "warc_ts", "offset", "_change_type", "_batch_id"]
    assert sorted(map(tuple, ch.select(*key).collect())) == sorted(
        map(tuple, plain_ch.select(*key).collect())
    )
    assert set(r._batch_id for r in ch.select("_batch_id").distinct().collect()) == {
        "p-0", "p-1",
    }


def test_wap_audit_reject_routes_batch_to_failure(spark, tmp_path, replay_dir):  # noqa: F811
    t = make_table(spark, tmp_path)

    rejected: list[str] = []

    def audit(staged: LakeTable, batch_id: str) -> bool:
        if batch_id == "p-1":
            rejected.append(batch_id)
            return False
        return True

    stats = run_file_replay(
        spark, t, replay_dir, str(tmp_path / "ck"), pipeline_id="p",
        max_files_per_trigger=2, write_mode="mor", wap=True, wap_audit=audit,
    )
    assert rejected == ["p-1"]
    assert stats.skipped == 1

    ops = [s.summary.get("operation") for s in t.history()]
    assert ops.count("publish") == 2
    assert ops.count("audit_reject") == 1
    rej = [s for s in t.history() if s.summary.get("operation") == "audit_reject"][0]
    assert rej.summary["batch_id"] == "p-1"
    assert set(t.branches()) == {"main"}  # rejected staged work dropped

    # exactly-once across the rejection: re-delivery (fresh checkpoint,
    # same pipeline id) must skip ALL batches, including the rejected one
    stats2 = run_file_replay(
        spark, t, replay_dir, str(tmp_path / "ck2"), pipeline_id="p",
        max_files_per_trigger=2, write_mode="mor", wap=True, wap_audit=audit,
    )
    assert stats2.skipped == 3
    assert rejected == ["p-1"]  # audit not re-run for the committed marker


def test_wap_crash_between_stage_and_publish_resumes(spark, tmp_path, replay_dir, monkeypatch):  # noqa: F811
    """Crash after the batch is staged on its branch but before publish:
    the restart must drop the stale branch, re-stage and publish —
    NOT skip on the staged-only batch id (staged ≠ published)."""
    t = make_table(spark, tmp_path)
    import geomesa_nifi_spark.streaming.pipeline as pl

    orig = LakeTable.publish_branch
    state = {"crashes": 0}

    def crashing_publish(self, name, *a, **kw):
        if state["crashes"] == 0 and name == "wap-p-1":
            state["crashes"] += 1
            raise RuntimeError("wap test crash before publish")
        return orig(self, name, *a, **kw)

    monkeypatch.setattr(LakeTable, "publish_branch", crashing_publish)
    with pytest.raises(Exception, match="wap test crash"):
        run_file_replay(spark, t, replay_dir, str(tmp_path / "ck"),
                        pipeline_id="p", max_files_per_trigger=2,
                        write_mode="mor", wap=True)
    # batch p-1 is staged on its branch but NOT on main
    assert "wap-p-1" in t.branches()
    pub_count = sum(1 for s in t.history()
                    if s.summary.get("operation") == "publish")
    assert pub_count == 1

    stats = run_file_replay(spark, t, replay_dir, str(tmp_path / "ck"),
                            pipeline_id="p", max_files_per_trigger=2,
                            write_mode="mor", wap=True)
    assert t.scan().count() == expected_final_count(spark, replay_dir)
    assert set(t.branches()) == {"main"}
    pubs = [s for s in t.history() if s.summary.get("operation") == "publish"]
    assert len(pubs) == 3


def test_wap_crash_after_publish_is_skipped_on_redelivery(spark, tmp_path, replay_dir, monkeypatch):  # noqa: F811
    """Crash after publish but before the per-epoch branch is dropped: the
    restart must treat the batch as committed (skip), drop the stale
    branch, and converge to the same final state."""
    t = make_table(spark, tmp_path)

    orig = LakeTable.drop_branch
    state = {"crashes": 0}

    def crashing_drop(self, name, *a, **kw):
        if state["crashes"] == 0 and name == "wap-p-1":
            state["crashes"] += 1
            raise RuntimeError("wap test crash before drop")
        return orig(self, name, *a, **kw)

    monkeypatch.setattr(LakeTable, "drop_branch", crashing_drop)
    with pytest.raises(Exception, match="wap test crash"):
        run_file_replay(spark, t, replay_dir, str(tmp_path / "ck"),
                        pipeline_id="p", max_files_per_trigger=2,
                        write_mode="mor", wap=True)
    assert "wap-p-1" in t.branches()

    stats = run_file_replay(spark, t, replay_dir, str(tmp_path / "ck"),
                            pipeline_id="p", max_files_per_trigger=2,
                            write_mode="mor", wap=True)
    # p-1 published before the crash -> re-delivery skips it
    assert any(r.get("skipped") for r in stats.results)
    assert t.scan().count() == expected_final_count(spark, replay_dir)
    assert set(t.branches()) == {"main"}
    pubs = [s for s in t.history() if s.summary.get("operation") == "publish"]
    assert len(pubs) == 3  # p-1 published exactly once
