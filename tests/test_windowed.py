"""Watermarked event-time windowed aggregation over the change stream."""

from __future__ import annotations

from pyspark.sql import functions as F

from geomesa_nifi_spark.sources.changegen import change_stream, write_replay_files
from geomesa_nifi_spark.streaming.windowed import domain_activity, run_stream_activity


def test_stream_matches_batch(spark, tmp_path):
    """AvailableNow drain of the watermarked stream must equal the batch
    aggregate when no event is late beyond the watermark (generator
    disorder is 120s < the 3-minute watermark)."""
    d = str(tmp_path / "changes")
    events = change_stream(spark, 800, n_keys=150, seed=17, payload="text").drop("lang")
    write_replay_files(events.drop("partition"), d, n_files=4)

    out = str(tmp_path / "agg")
    run_stream_activity(
        spark, d, str(tmp_path / "ckpt"), out,
        window="5 minutes", watermark="3 minutes", max_files_per_trigger=2,
    )
    got = spark.read.parquet(out)

    batch = domain_activity(spark.read.parquet(d), window="5 minutes")
    # append mode emits only finalized windows: every emitted row must match
    # the batch result exactly, and most windows should have finalized
    assert got.count() > 0
    joined = got.join(
        batch,
        ["win_start", "win_end", "domain", "op"],
        "left",
    ).filter(got["n_events"] != batch["n_events"])
    assert joined.count() == 0
    assert got.count() <= batch.count()


def test_windowed_shape(spark):
    events = change_stream(spark, 300, n_keys=60, seed=9, payload="text")
    agg = domain_activity(events, window="10 minutes")
    rows = agg.collect()
    assert rows
    assert all(r.n_events > 0 and r.domain.startswith("d") for r in rows)
    total = sum(r.n_events for r in rows)
    assert total == 300  # every event lands in exactly one window
