"""Benchmark harness: headline CDC/operator timings + scaling protocol.

Prints ONE JSON line:
  {"metric": ..., "value": <total suite seconds>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "merge": {...events/sec...}, "scaling": {rate8, rate32, efficiency}}

The scaling section evidences the north rule's N->4N criterion in-sandbox:
the identical merge-replay job runs at local[8] and local[32] on the same
pre-materialized input, and efficiency = (rate32/rate8)/4.

Env knobs: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32), GNS_BENCH_EVENTS (default 10^6),
GNS_BENCH_SCALING=0 to skip the second session.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F
from pyspark.sql import types as T

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("offset", T.LongType()),
    ]
)


def _materialize_changes(spark, n_events: int, out_dir: str) -> None:
    """Pre-materialize the extracted change stream to parquet (untimed
    setup) so the timed merge phase measures MERGE, not generation or the
    Python UDF stage (which is benchmarked separately)."""
    from geomesa_nifi_spark.sources.changegen import change_stream

    ch = change_stream(spark, n_events, n_keys=max(n_events // 5, 64), seed=42, payload="text")
    ch.drop("partition").write.mode("overwrite").parquet(out_dir)


def _run_merge_replay(
    spark, changes_dir: str, table_root: str, n_batches: int = 4, max_offset: int | None = None
) -> float:
    """Timed: read the change stream and apply it in n_batches MERGEs."""
    from geomesa_nifi_spark.lake import LakeTable, merge_changes

    schema = T.StructType([f for f in PAGES_SCHEMA.fields if f.name != "html"])
    table = LakeTable.create(
        spark, table_root, schema,
        key_col="url", ts_col="warc_ts", tiebreak_col="offset",
        num_buckets=64,
    )
    ch = spark.read.parquet(changes_dir)
    if max_offset is not None:
        ch = ch.filter(F.col("offset") < max_offset)
    t0 = time.monotonic()
    for b in range(n_batches):
        batch = ch.filter(F.pmod(F.col("offset"), F.lit(n_batches)) == b)
        merge_changes(table, batch, batch_id=f"bench-{b}", collect_metrics=False)
    return time.monotonic() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_events = int(os.environ.get("GNS_BENCH_EVENTS", "1000000"))
    do_scaling = os.environ.get("GNS_BENCH_SCALING", "1") != "0"
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from geomesa_nifi_spark.session import get_spark

    work = tempfile.mkdtemp(prefix="gns_bench_")
    changes_dir = os.path.join(work, "changes")
    queries: dict[str, float] = {}
    suite_t0 = time.monotonic()

    spark = get_spark("bench", master=f"local[{cpus}]", shuffle_partitions=cpus)
    _materialize_changes(spark, n_events, changes_dir)  # untimed setup

    def timed(name, fn):
        t0 = time.monotonic()
        fn()
        queries[name] = round(time.monotonic() - t0, 3)

    def warmup(spark_, tag):
        # untimed: JIT/codegen warm-up so both scaling sessions (same JVM)
        # are measured hot
        _run_merge_replay(
            spark_, changes_dir, os.path.join(work, f"warm-{tag}"),
            n_batches=2, max_offset=max(n_events // 10, 10_000),
        )

    # headline: MERGE-apply replay throughput at local[cpus]
    warmup(spark, "big")
    t_merge_big = _run_merge_replay(spark, changes_dir, os.path.join(work, "t32"))
    queries["cdc_merge_replay_synthetic"] = round(t_merge_big, 3)
    rate_big = n_events / t_merge_big

    # extraction stage throughput (Arrow UDF path), 100k pages
    from geomesa_nifi_spark.functions.extract import extract_pages
    from geomesa_nifi_spark.sources.changegen import change_stream

    n_pages = 100_000
    pages = change_stream(spark, n_pages, seed=9).filter(F.col("op") != "delete")
    t0 = time.monotonic()
    # aggregate over the UDF outputs so Catalyst cannot prune the UDF away
    extract_pages(pages).agg(
        F.sum(F.length("text")), F.count_distinct("lang")
    ).collect()
    t_extract = time.monotonic() - t0
    queries["extract_html_100k"] = round(t_extract, 3)

    # operator headliners on the driver's sf tables
    import __spark_entry__ as entry

    for name in [
        "cdc_lww_state",
        "cdc_merge_replay",
        "doc_text_stats",
        "doc_minhash_lsh",
        "ann_cosine_topk",
    ]:
        fn = entry.queries()[name]
        timed(name, lambda fn=fn: fn(spark, sf_dir).select(F.count(F.lit(1))).collect())

    scaling = None
    if do_scaling:
        spark.stop()
        spark8 = get_spark("bench8", master="local[8]", shuffle_partitions=8)
        warmup(spark8, "small")
        t_merge_8 = _run_merge_replay(spark8, changes_dir, os.path.join(work, "t8"))
        queries["cdc_merge_replay_synthetic_local8"] = round(t_merge_8, 3)
        rate_8 = n_events / t_merge_8
        scaling = {
            "parallelism_small": 8,
            "parallelism_big": cpus,
            "events_per_sec_small": round(rate_8, 1),
            "events_per_sec_big": round(rate_big, 1),
            "efficiency": round((rate_big / rate_8) / (cpus / 8), 3),
        }
        spark8.stop()
    else:
        spark.stop()

    shutil.rmtree(work, ignore_errors=True)
    out = {
        "metric": "cdc_merge_apply_suite_seconds",
        "value": round(time.monotonic() - suite_t0, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "merge": {
            "n_events": n_events,
            "events_per_sec": round(rate_big, 1),
            "parallelism": cpus,
        },
        "scaling": scaling,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
