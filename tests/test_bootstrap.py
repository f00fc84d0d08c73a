"""Initial-snapshot bootstrap + incremental handoff (lake/bootstrap.py).

The CDC shape the reference runs operationally — bulk-append existing
data, then switch the flow to modify mode (write-mode selection,
mixins/FeatureWriters.scala:306-318) — as Debezium-style
snapshot-then-tail: bootstrap_load records the stream position, the
tail merges on top, handoff_filter makes overlap redelivery safe.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geomesa_nifi_spark.lake import (
    LakeTable,
    bootstrap_hwm,
    bootstrap_load,
    handoff_filter,
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


def ts(i):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=int(i))


def ev(url, pos, t, text, op="upsert"):
    """pos = stream position (tiebreak/offset), t = LWW timestamp."""
    return Row(url=url, warc_ts=ts(t), offset=int(pos), text=text, op=op)


@pytest.fixture
def table(spark, tmp_path):
    return LakeTable.create(
        spark,
        str(tmp_path / "t"),
        SCHEMA,
        key_col="url",
        ts_col="warc_ts",
        tiebreak_col="offset",
        num_buckets=8,
    )


def _state(table):
    return {
        r["url"]: r["text"] for r in table.scan().select("url", "text").collect()
    }


def _df(spark, rows):
    change = T.StructType(list(SCHEMA.fields) + [T.StructField("op", T.StringType())])
    return spark.createDataFrame(rows, change)


def test_bootstrap_then_tail_equals_full_lww(spark, table):
    # positions 0..5 pre-cut, 6..9 post-cut; ts deliberately NOT aligned
    # with position for key b (late-arriving older ts post-cut must lose)
    pre = [
        ev("a", 0, 10, "a0"),
        ev("b", 1, 20, "b1"),
        ev("a", 2, 12, "a2"),
        ev("c", 3, 30, "c3"),
        ev("c", 4, 31, "", op="delete"),
        ev("d", 5, 50, "d5"),
    ]
    post = [
        ev("a", 6, 13, "a6"),          # newer ts: wins
        ev("b", 7, 15, "b7-old"),      # OLDER ts than b1: must lose
        ev("d", 8, 51, "", op="delete"),
        ev("e", 9, 90, "e9"),
    ]
    # source snapshot at position 5 = LWW of pre, tombstones preserved
    from geomesa_nifi_spark.operators.dedup import lww_dedup

    snap = lww_dedup(_df(spark, pre), "url", ["warc_ts", "offset"])
    res = bootstrap_load(table, snap, batch_id="boot", offset_hwm=5, op_col="op")
    assert res.snapshot is not None
    assert res.metrics["bootstrapped"] == 4  # a, b, d live + c's tombstone row
    assert bootstrap_hwm(table) == 5
    assert _state(table) == {"a": "a2", "b": "b1", "d": "d5"}

    tail = handoff_filter(table, _df(spark, pre + post), "offset")
    assert tail.count() == 4  # pre rows dropped by position, not by ts
    merge_changes(table, tail, batch_id="tail-0")
    assert _state(table) == {"a": "a6", "b": "b1", "e": "e9"}


def test_handoff_filter_blocks_resurrection(spark, table):
    """A PLAIN snapshot (no tombstones) + partial redelivery of only the
    pre-cut upsert would resurrect a deleted key; the position filter is
    what prevents it."""
    pre_upsert = ev("x", 0, 100, "x-old")
    snap_rows = []  # source state at position 1: x was deleted -> absent
    snap = _df(spark, snap_rows)
    bootstrap_load(table, snap, batch_id="boot", offset_hwm=1)
    assert _state(table) == {}

    # overlap redelivery: ONLY the upsert comes back (its delete does not)
    redelivered = _df(spark, [pre_upsert])
    safe = handoff_filter(table, redelivered, "offset")
    assert safe.count() == 0
    merge_changes(table, safe.unionByName(_df(spark, [ev("y", 2, 1, "y")])),
                  batch_id="tail")
    assert _state(table) == {"y": "y"}

    # counterfactual: WITHOUT the filter the key resurrects — the hazard
    # the filter exists for (plain snapshots carry no delete clocks)
    t2 = LakeTable.create(
        table.spark, table.root + "2", SCHEMA,
        key_col="url", ts_col="warc_ts", tiebreak_col="offset", num_buckets=8,
    )
    bootstrap_load(t2, snap, batch_id="boot", offset_hwm=1)
    merge_changes(t2, redelivered, batch_id="tail")
    assert _state(t2) == {"x": "x-old"}  # wrong state, provably


def test_tombstone_snapshot_survives_unfiltered_redelivery(spark, table):
    """An engine-consistent snapshot (op_col given) keeps delete clocks,
    so even unfiltered redelivery converges."""
    pre = [
        ev("x", 0, 100, "x-old"),
        ev("x", 1, 101, "", op="delete"),
        ev("k", 2, 5, "k"),
    ]
    from geomesa_nifi_spark.operators.dedup import lww_dedup

    snap = lww_dedup(_df(spark, pre), "url", ["warc_ts", "offset"])
    bootstrap_load(table, snap, batch_id="boot", offset_hwm=2, op_col="op")
    assert _state(table) == {"k": "k"}
    # unfiltered redelivery of the pre-cut upsert: tombstone clock wins
    merge_changes(table, _df(spark, [pre[0]]), batch_id="redeliver")
    assert _state(table) == {"k": "k"}


def test_bootstrap_requires_empty_table(spark, table):
    merge_changes(table, _df(spark, [ev("a", 0, 0, "a")]), batch_id="b0")
    with pytest.raises(ValueError, match="empty"):
        bootstrap_load(table, _df(spark, [ev("b", 1, 1, "b")]), batch_id="boot")


def test_bootstrap_exactly_once(spark, table):
    snap = _df(spark, [ev("a", 0, 0, "a")])
    bootstrap_load(table, snap, batch_id="boot", offset_hwm=0)
    res = bootstrap_load(table, snap, batch_id="boot", offset_hwm=0)
    assert res.skipped
    assert _state(table) == {"a": "a"}


def test_bootstrap_writes_base_files_with_zone_maps(spark, table):
    rows = [ev(f"u{i}", i, i, f"t{i}") for i in range(50)]
    bootstrap_load(table, _df(spark, rows), batch_id="boot", offset_hwm=49)
    files = table.snapshot().files
    assert files and all(f.kind == "base" for f in files)
    assert any(f.stats and "warc_ts" in f.stats for f in files)
    # and the tail path is a normal merge on top
    merge_changes(table, _df(spark, [ev("u1", 60, 60, "new")]), batch_id="t")
    assert _state(table)["u1"] == "new"


def test_handoff_filter_noop_without_bootstrap(spark, table):
    ch = _df(spark, [ev("a", 0, 0, "a")])
    assert handoff_filter(table, ch, "offset").count() == 1


def test_streaming_tail_with_handoff(spark, tmp_path):
    """bootstrap_load + run_file_replay(handoff_offset_col=...): the
    checkpointed tail drops already-reflected events per micro-batch."""
    from geomesa_nifi_spark.operators.dedup import lww_dedup
    from geomesa_nifi_spark.sources.changegen import change_stream, write_replay_files
    from geomesa_nifi_spark.streaming.pipeline import run_file_replay

    events = change_stream(spark, 400, n_keys=80, seed=7)
    cut = (events.agg(F.max("offset")).first()[0] + 1) // 2
    pre = events.filter(F.col("offset") < cut)
    # overlap slice redelivers pre-cut upserts WITHOUT their deletes
    overlap = pre.filter((F.col("offset") >= cut // 2) & (F.col("op") != "delete"))
    tail = events.filter(F.col("offset") >= cut).unionByName(overlap)

    t = LakeTable.create(
        spark, str(tmp_path / "pages"), events.drop("op").schema,
        key_col="url", ts_col="warc_ts", tiebreak_col="offset", num_buckets=8,
    )
    snap = lww_dedup(pre, "url", ["warc_ts", "offset"])
    bootstrap_load(t, snap, batch_id="boot", offset_hwm=cut - 1, op_col="op")

    # a tail stream's offsets neither start at 0 nor are dense — the
    # min/max-based chunking must not drop any of it
    d = str(tmp_path / "tail")
    files = write_replay_files(tail, d, n_files=4)
    assert sum(spark.read.parquet(f).count() for f in files) == tail.count()
    run_file_replay(
        spark, t, d, str(tmp_path / "ckpt"), pipeline_id="tail",
        extract=False, handoff_offset_col="offset",
    )
    want = (
        lww_dedup(events, "url", ["warc_ts", "offset"])
        .filter(F.col("op") != "delete")
    )
    got = t.scan()
    assert got.count() == want.count()
    assert got.select("url", "offset").exceptAll(want.select("url", "offset")).count() == 0


def test_bootstrap_commit_race_rebases(spark, table):
    """Losing the commit race to a metadata commit (here: a rescale of the
    still-empty table) must re-bucket under the new modulus and succeed
    without rewriting the caller's view of the world."""
    from geomesa_nifi_spark.lake.ledger import CommitConflict

    real_commit = table.ledger.commit
    calls = {"n": 0}

    def racing_commit(snapshot):
        if calls["n"] == 0:
            calls["n"] += 1
            table.ledger.commit = real_commit  # restore before the rescale
            table.rescale(16)                  # concurrent metadata commit
            table.ledger.commit = racing_commit
            raise CommitConflict("lost to rescale")
        table.ledger.commit = real_commit
        return real_commit(snapshot)

    table.ledger.commit = racing_commit
    rows = [ev(f"u{i}", i, i, f"t{i}") for i in range(12)]
    res = bootstrap_load(table, _df(spark, rows), batch_id="boot", offset_hwm=11)
    assert res.snapshot is not None
    snap = table.snapshot()
    assert int(snap.properties["num_buckets"]) == 16
    # every file's bucket label is valid under the NEW modulus
    assert all(0 <= f.bucket < 16 for f in snap.files)
    assert _state(table) == {f"u{i}": f"t{i}" for i in range(12)}


def test_bootstrap_race_to_data_commit_raises(spark, table):
    """Losing the race to a DATA commit means the table is no longer empty:
    bootstrap must refuse loudly, not merge blindly."""
    from geomesa_nifi_spark.lake.ledger import CommitConflict

    real_commit = table.ledger.commit

    def racing_commit(snapshot):
        table.ledger.commit = real_commit
        merge_changes(table, _df(spark, [ev("other", 99, 99, "o")]), batch_id="racer")
        raise CommitConflict("lost to a merge")

    table.ledger.commit = racing_commit
    with pytest.raises(ValueError, match="no longer empty"):
        bootstrap_load(table, _df(spark, [ev("a", 0, 0, "a")]), batch_id="boot")


def test_bootstrap_cluster_by_prunes(spark, table):
    """cluster_by on the initial load lays files out for attribute pruning:
    a predicate on the clustered column reads fewer files than the table
    holds, and the state is unchanged."""
    # offset-as-attribute: 4 disjoint value ranges across 200 keys
    rows = [ev(f"u{i}", i, i % 997, f"t{i}") for i in range(200)]
    # small max_records_per_file: each bucket splits into several files, so
    # each clustered split covers a narrow warc_ts range the zone maps can
    # prune (a single file per bucket would span the whole range)
    bootstrap_load(
        table, _df(spark, rows), batch_id="boot", offset_hwm=199,
        cluster_by=["warc_ts"], max_records_per_file=8,
    )
    assert table.snapshot().summary.get("clustered_by") == ["warc_ts"]
    lo, hi = ts(0), ts(60)
    pred = [("warc_ts", "between", (lo, hi))]
    cand = table.candidate_files(where=pred)
    assert len(cand) < len(table.snapshot().files)
    got = {r["url"] for r in table.scan(where=pred).collect()}
    want = {f"u{i}" for i in range(200) if 0 <= i % 997 <= 60}
    assert got == want
