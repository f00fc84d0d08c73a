"""Metadata inspection tables (lake/inspect.py) and the read-optimized
scan mode — the ops surface for watching a 100-TB table from metadata."""

from __future__ import annotations

import datetime as dt
import json

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from geomesa_nifi_spark.lake import (
    LakeTable,
    compact,
    files_df,
    merge_changes,
    partitions_df,
    snapshots_df,
)

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("offset", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def ts(i):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=int(i))


def ev(url, i, text, op="upsert"):
    return Row(url=url, warc_ts=ts(i), offset=int(i), text=text, op=op)


def _df(spark, rows):
    change = T.StructType(list(SCHEMA.fields) + [T.StructField("op", T.StringType())])
    return spark.createDataFrame(rows, change)


@pytest.fixture
def table(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA,
        key_col="url", ts_col="warc_ts", tiebreak_col="offset", num_buckets=4,
    )
    merge_changes(t, _df(spark, [ev(f"u{i}", i, f"a{i}") for i in range(20)]),
                  batch_id="b0", mode="cow")
    merge_changes(t, _df(spark, [ev(f"u{i}", 100 + i, f"b{i}") for i in range(5)]),
                  batch_id="b1", mode="mor", auto_compact=False)
    return t


def test_files_df_matches_ledger(spark, table):
    rows = files_df(table).collect()
    snap = table.snapshot()
    assert len(rows) == len(snap.files)
    by_path = {f.path: f for f in snap.files}
    for r in rows:
        f = by_path[r["path"]]
        assert (r["bucket"], r["kind"], r["rows"]) == (f.bucket, f.kind, f.rows)
        assert r["size_bytes"] and r["size_bytes"] > 0
        if r["stats_json"]:
            assert "warc_ts" in json.loads(r["stats_json"])
    assert any(r["kind"] == "delta" for r in rows)


def test_snapshots_df_history(spark, table):
    rows = snapshots_df(table).collect()
    assert [r["version"] for r in rows] == [
        s.version for s in table.history()
    ]
    ops = {r["batch_id"]: r["operation"] for r in rows if r["batch_id"]}
    assert "b0" in ops and "b1" in ops
    head_v = table.snapshot().version
    head = next(r for r in rows if r["version"] == head_v)
    assert head["num_files"] == len(table.snapshot().files)
    assert head["committed_at_ms"] > 0


def test_partitions_df_debt_and_rows(spark, table):
    parts = {r["bucket"]: r for r in partitions_df(table).collect()}
    snap = table.snapshot()
    assert sum(p["rows"] for p in parts.values()) == sum(f.rows for f in snap.files)
    # MoR deltas show up as compaction debt
    assert sum(p["delta_files"] for p in parts.values()) > 0
    for p in parts.values():
        assert p["num_files"] == p["base_files"] + p["delta_files"]
        assert p["old_modulus_files"] == 0


def test_read_optimized_scan_skips_deltas(spark, table):
    # real-time view resolves deltas: u0..u4 updated
    rt = {r["url"]: r["text"] for r in table.scan().collect()}
    assert rt["u0"] == "b0" and len(rt) == 20
    # read-optimized view: state as of last compaction (here: base only)
    ro = {r["url"]: r["text"]
          for r in table.scan(read_optimized=True).collect()}
    assert ro["u0"] == "a0" and len(ro) == 20
    # after compaction the views converge
    compact(table)
    ro2 = {r["url"]: r["text"]
           for r in table.scan(read_optimized=True).collect()}
    assert ro2 == rt
    assert partitions_df(table).filter("delta_files > 0").count() == 0


def test_cli_inspect_and_bootstrap(spark, tmp_path, capsys):
    from geomesa_nifi_spark.cli import main

    src = str(tmp_path / "snap.parquet")
    spark.createDataFrame(
        [ev(f"u{i}", i, f"t{i}") for i in range(8)],
        T.StructType(list(SCHEMA.fields) + [T.StructField("op", T.StringType())]),
    ).write.parquet(src)
    root = str(tmp_path / "bt")
    LakeTable.create(
        spark, root, SCHEMA,
        key_col="url", ts_col="warc_ts", tiebreak_col="offset", num_buckets=4,
    )
    assert main(["bootstrap", "--table", root, "--source", src,
                 "--offset-hwm", "7", "--op-col", "op"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["bootstrapped"] == 8 and out["version"] is not None

    assert main(["inspect", "partitions", "--table", root]) == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert sum(p["rows"] for p in lines) == 8


def test_orphans_df_dry_run_matches_vacuum(spark, table):
    from geomesa_nifi_spark.lake import orphans_df

    # fresh table: compaction hasn't run, every file is referenced by SOME
    # live snapshot
    merge_changes(table, _df(spark, [ev(f"u{i}", 200 + i, f"c{i}") for i in range(5)]),
                  batch_id="b2", mode="cow")
    table.expire_snapshots(keep_last=1)
    orphans = orphans_df(table, min_age_s=0).collect()
    assert orphans, "expired snapshots should leave unreferenced files"
    assert all(o["size_bytes"] > 0 and o["modified_ms"] > 0 for o in orphans)
    removed = set(table.vacuum(min_age_s=0))
    assert {o["path"] for o in orphans} <= removed
    assert orphans_df(table, min_age_s=0).count() == 0


def test_expire_snapshots_age_retention(spark, table):
    """older_than_ms composes with keep_last: a snapshot inside the count
    window OR at/after the age cutoff survives."""
    merge_changes(table, _df(spark, [ev(f"u{i}", 300 + i, f"d{i}") for i in range(3)]),
                  batch_id="b2", mode="cow")
    versions = [s.version for s in table.history()]
    assert len(versions) >= 4
    # cutoff between the second-to-last and last commits: only the last is
    # "new enough", but keep_last=2 also protects the second-to-last
    cut = table.ledger.snapshot(versions[-1]).created_ms
    removed = table.expire_snapshots(keep_last=2, older_than_ms=cut)
    assert set(removed) == set(versions[:-2])
    left = [s.version for s in table.history()]
    assert left == versions[-2:]
    # everything still readable, horizon reads fail loudly
    assert table.scan().count() == 20
    with pytest.raises(Exception):
        table.snapshot(versions[0])

    # age alone protects older-but-recent snapshots even past keep_last
    merge_changes(table, _df(spark, [ev("u0", 999, "zz")]), batch_id="b3")
    removed2 = table.expire_snapshots(keep_last=1, older_than_ms=0)
    assert removed2 == []  # every snapshot is newer than the epoch cutoff


def test_vacuum_grace_period_protects_staged_files(spark, table):
    """An unreferenced file younger than min_age_s survives vacuum — the
    window where a concurrent writer has staged data files (or the ledger
    a manifest) but not yet published the commit that references them."""
    import os

    merge_changes(table, _df(spark, [ev(f"u{i}", 400 + i, f"e{i}") for i in range(3)]),
                  batch_id="b3", mode="cow")
    table.expire_snapshots(keep_last=1)
    from geomesa_nifi_spark.lake import orphans_df

    orphan_paths = {o["path"] for o in orphans_df(table, min_age_s=0).collect()}
    assert orphan_paths
    # default grace: freshly-written orphans are left alone — and the dry
    # run AGREES with vacuum (reports nothing deletable inside the window)
    assert orphans_df(table).count() == 0
    assert table.vacuum() == []
    assert {o["path"] for o in orphans_df(table, min_age_s=0).collect()} == orphan_paths
    # age the files past the horizon: now they go (dry run shows them first)
    for p in orphan_paths:
        full = os.path.join(table.root, p)
        os.utime(full, (1, 1))
    assert {o["path"] for o in orphans_df(table).collect()} == orphan_paths
    removed = set(table.vacuum())
    assert orphan_paths <= removed
