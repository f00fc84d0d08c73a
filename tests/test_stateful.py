"""Streaming stateful LWW (applyInPandasWithState): winner tracking across
micro-batches, late-event rejection, tombstones, and event-time expiry."""

from __future__ import annotations

import datetime as dt
import json

import pytest
from pyspark.sql import types as T

from geomesa_nifi_spark.streaming.stateful import lww_state_stream

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("src_offset", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("op", T.StringType()),
    ]
)


def ts(i):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=int(i))


def us(i):
    return int((ts(i) - dt.datetime(1970, 1, 1)).total_seconds() * 1_000_000)


def _run_stream(spark, tmp_path, files, name, ttl_ms=3_600_000, watermark="0 seconds"):
    """Write each list of rows as one parquet file; replay one file per
    micro-batch through the stateful operator into a memory sink."""
    src = tmp_path / "src"
    src.mkdir(exist_ok=True)
    for i, rows in enumerate(files):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
            str(src / f"batch-{i}.parquet")
        )
        # file source needs a flat dir of files; move the part file up
        import glob
        import shutil

        part = glob.glob(str(src / f"batch-{i}.parquet" / "part-*.parquet"))[0]
        shutil.move(part, str(src / f"file-{i}.parquet"))
        shutil.rmtree(str(src / f"batch-{i}.parquet"))

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = lww_state_stream(stream, tombstone_ttl_ms=ttl_ms, watermark=watermark)
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"select * from {name}").collect()


def test_insert_update_late_and_delete(spark, tmp_path):
    rows = _run_stream(
        spark,
        tmp_path,
        [
            [("u1", ts(10), 1, "v1", "upsert"), ("u2", ts(10), 2, "w1", "upsert")],
            [("u1", ts(20), 3, "v2", "upsert"), ("u2", ts(5), 4, "late", "upsert")],
            [("u1", ts(30), 5, None, "delete"), ("u2", ts(4), 6, None, "delete")],
        ],
        "lww_basic",
    )
    by_key = {}
    for r in rows:
        by_key.setdefault(r["url"], []).append(r)
    u1 = sorted(by_key["u1"], key=lambda r: r["ts_us"])
    assert [r["change"] for r in u1] == ["insert", "update", "delete"]
    assert json.loads(u1[1]["payload"])["text"] == "v2"
    # u2: late upsert and late delete both lose -> only the initial insert
    assert [r["change"] for r in by_key["u2"]] == ["insert"]


def test_tombstone_blocks_stale_resurrection(spark, tmp_path):
    rows = _run_stream(
        spark,
        tmp_path,
        [
            [("u1", ts(50), 1, None, "delete")],
            [("u1", ts(40), 2, "stale", "upsert")],  # older than tombstone
        ],
        "lww_tomb",
    )
    assert [r["change"] for r in rows] == ["delete"] or rows == []
    # nothing resurrected
    assert not any(r["change"] == "insert" for r in rows)


def test_tombstone_expires_after_ttl(spark, tmp_path):
    """Once the watermark passes ts + ttl the tombstone is evicted — a
    replay of an OLD upsert afterwards is treated as new state (the
    documented retention-horizon contract: ttl must exceed re-delivery
    lag; here it deliberately does not)."""
    # watermark delay 60s, ttl 10s: tombstone ts(50) times out once the
    # watermark (= max event - 60s) passes ts(60); the replay at ts(65)
    # stays ABOVE the watermark so it is not dropped as late data.
    rows = _run_stream(
        spark,
        tmp_path,
        [
            [("u1", ts(50), 1, None, "delete")],
            # end of this batch: watermark = 121 - 60 = 61 > 60 ...
            [("zz", ts(121), 2, "advance", "upsert")],
            # ... and THIS batch fires u1's event-time timeout (timeouts
            # fire only for keys with no data in the batch)
            [("zz", ts(122), 3, "advance2", "upsert")],
            [("u1", ts(65), 4, "back", "upsert")],
        ],
        "lww_ttl",
        ttl_ms=10_000,
        watermark="60 seconds",
    )
    u1 = [r for r in rows if r["url"] == "u1"]
    assert [r["change"] for r in u1] == ["insert"]
    assert json.loads(u1[0]["payload"])["text"] == "back"


def test_late_loser_rearms_tombstone_timeout(spark, tmp_path):
    """Every invocation clears a group's previously-set timeout, so a late
    losing event hitting a stored tombstone must RE-ARM the eviction
    deadline — otherwise the tombstone stays in state forever, violating
    tombstone_ttl.  Observable as the final state-store row count."""
    import glob
    import shutil

    files = [
        [("u1", ts(50), 1, None, "delete")],
        # late loser against the tombstone: the invocation resets u1's
        # timeout; the fix re-arms it to ts(50) + ttl
        [("u1", ts(40), 2, "late", "upsert")],
        [("zz", ts(185), 3, "advance", "upsert")],  # watermark -> 65 > 60
        [("zz", ts(186), 4, "advance2", "upsert")],  # fires u1's timeout
    ]
    src = tmp_path / "src"
    src.mkdir()
    for i, rows in enumerate(files):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
            str(src / f"b-{i}.parquet")
        )
        part = glob.glob(str(src / f"b-{i}.parquet" / "part-*.parquet"))[0]
        shutil.move(part, str(src / f"file-{i}.parquet"))
        shutil.rmtree(str(src / f"b-{i}.parquet"))

    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(str(src))
    )
    out = lww_state_stream(stream, tombstone_ttl_ms=10_000, watermark="120 seconds")
    q = (
        out.writeStream.format("memory")
        .queryName("lww_rearm")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    state_rows = [
        p["stateOperators"][0]["numRowsTotal"]
        for p in q.recentProgress
        if p.get("stateOperators")
    ]
    # final state: only zz's live row — u1's tombstone was evicted despite
    # the late-loser invocation in between
    assert state_rows and state_rows[-1] == 1, state_rows


def test_no_ttl_mode_is_batching_deterministic(spark, tmp_path):
    """tombstone_ttl_ms=None: NoTimeout + no watermark — no engine-side
    late-row filtering, tombstones kept forever.  A deep-late loser still
    REACHES the operator and is rejected by state (not silently dropped
    upstream), so the changelog is a pure function of the batched input."""
    rows = _run_stream(
        spark,
        tmp_path,
        [
            [("u1", ts(50), 1, "v1", "upsert")],
            [("zz", ts(10_000), 2, "far-future", "upsert")],
            # 9950s late vs zz; under a watermark this row would be dropped
            # before the operator — here it must arrive and lose to state
            [("u1", ts(40), 3, "late", "upsert")],
            [("u1", ts(60), 4, None, "delete")],
            # loses to the retained tombstone (never evicted without TTL)
            [("u1", ts(55), 5, "resurrect?", "upsert")],
        ],
        "lww_nottl",
        ttl_ms=None,
    )
    u1 = sorted((r for r in rows if r["url"] == "u1"), key=lambda r: r["ts_us"])
    assert [r["change"] for r in u1] == ["insert", "delete"]


def test_late_loser_after_ttl_deadline_does_not_crash(spark, tmp_path):
    """A deep-late loser arriving after the watermark crossed the
    tombstone's ts+ttl deadline must not crash or resurrect anything.
    (pyspark 4.1.2 filters sub-watermark rows before the operator, so the
    row never reaches the UDF here; the re-arm clamp in stateful.py guards
    the INVALID_TIMEOUT_TIMESTAMP path should that version-dependent
    pre-filter ever change.)  This pins the end-to-end behavior: the query
    completes and the loser emits nothing."""
    rows = _run_stream(
        spark,
        tmp_path,
        [
            [("u1", ts(50), 1, None, "delete")],  # tombstone, deadline ts(60)
            [("zz", ts(1000), 2, "advance", "upsert")],  # watermark -> ts(1000)
            # late loser hits the tombstone with deadline far behind the
            # watermark: without the clamp this batch crashes the query
            [("u1", ts(40), 3, "late", "upsert")],
            [("zz", ts(1001), 4, "advance2", "upsert")],  # fires u1's timeout
        ],
        "lww_clamp",
        ttl_ms=10_000,
        watermark="0 seconds",
    )
    # the query completed (no INVALID_TIMEOUT_TIMESTAMP crash) and the late
    # loser emitted nothing — a delete with no prior live row is silent
    u1 = [r for r in rows if r["url"] == "u1"]
    assert u1 == []


def test_crash_resume_changelog_equals_uninterrupted(spark, tmp_path):
    """Exactly-once across restart: kill the query after two micro-batches,
    restart from the same checkpoint, and the union of emitted changes must
    equal the uninterrupted run's changelog (state store + file-source
    offsets both recover from the checkpoint)."""
    import glob
    import shutil

    files = [
        [("u1", ts(10), 1, "v1", "upsert"), ("u2", ts(10), 2, "w1", "upsert")],
        [("u1", ts(20), 3, "v2", "upsert")],
        [("u2", ts(30), 4, None, "delete")],
        [("u1", ts(5), 5, "late", "upsert"), ("u3", ts(40), 6, "x1", "upsert")],
    ]

    def write_src(dirname):
        src = tmp_path / dirname
        src.mkdir()
        for i, rows in enumerate(files):
            spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
                str(src / f"b-{i}.parquet")
            )
            part = glob.glob(str(src / f"b-{i}.parquet" / "part-*.parquet"))[0]
            shutil.move(part, str(src / f"file-{i}.parquet"))
            shutil.rmtree(str(src / f"b-{i}.parquet"))
        return str(src)

    def start(src, out_dir, ckpt):
        # foreachBatch sink: checkpoint-recoverable (the memory sink is
        # not); one parquet dir per epoch — re-delivered epochs overwrite
        # their own dir, so output is idempotent like the lake pipeline's
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        out = lww_state_stream(stream, tombstone_ttl_ms=None)

        def sink(batch, epoch_id):
            batch.write.mode("overwrite").parquet(
                str(tmp_path / out_dir / f"epoch={epoch_id}")
            )

        return (
            out.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(availableNow=True)
            .start()
        )

    def read_out(out_dir):
        df = spark.read.parquet(str(tmp_path / out_dir / "epoch=*"))
        return sorted(
            (r["url"], r["ts_us"], r["tiebreak"], r["change"], r["payload"])
            for r in df.collect()
        )

    # uninterrupted reference run
    src_a = write_src("src_a")
    q = start(src_a, "out_ref", "ckpt_ref")
    q.awaitTermination()
    want = read_out("out_ref")

    # interrupted run: stop after the second micro-batch, then resume
    src_b = write_src("src_b")
    q = start(src_b, "out_crash", "ckpt_crash")
    while len(q.recentProgress) < 2 and q.isActive:
        pass
    q.stop()  # hard stop mid-stream
    q.awaitTermination()
    q2 = start(src_b, "out_crash", "ckpt_crash")
    q2.awaitTermination()
    assert read_out("out_crash") == want
