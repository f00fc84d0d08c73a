"""Event-time windowed analytics over the change stream.

The reference batches purely by size/latency and has no event-time state
(SURVEY.md §2.5); late data is absorbed by upsert semantics.  The engine
adds the explicit Structured Streaming shape a monitoring/ops surface needs:
watermarked tumbling-window aggregates per domain and op — change-rate,
delete-rate, hot-domain detection — usable both on the live stream and as a
batch query over replay files (identical expressions, per Spark's unified
semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DOMAIN_RE = r"^https?://([^/]+)/"


def domain_activity(
    df: DataFrame,
    window: str = "5 minutes",
    watermark: str | None = "10 minutes",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """Tumbling-window change counts per (domain, op).

    On a stream, ``watermark`` bounds state: windows older than the
    watermark finalize and late events beyond it are dropped — the
    monitoring-plane tradeoff (the data plane's LWW merge still applies
    late events correctly; see SURVEY §2.5).
    """
    out = df.withColumn("domain", F.regexp_extract("url", DOMAIN_RE, 1))
    if watermark is not None and out.isStreaming:
        out = out.withWatermark(ts_col, watermark)
    return (
        out.groupBy(F.window(F.col(ts_col), window).alias("win"), "domain", "op")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "domain",
            "op",
            "n_events",
        )
    )


def run_stream_activity(
    spark,
    source_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    max_files_per_trigger: int = 1,
) -> None:
    """Drain ``source_dir`` through the watermarked windowed aggregate into
    parquet (append mode: only finalized windows are emitted)."""
    schema = spark.read.option("mergeSchema", "true").parquet(source_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    agg = domain_activity(stream, window=window, watermark=watermark)
    q = (
        agg.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .format("parquet")
        .option("path", out_dir)
        .start()
    )
    q.awaitTermination()
