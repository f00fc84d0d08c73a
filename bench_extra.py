"""Supplementary micro-benchmarks for the optimization rounds.

``bench.py`` is the frozen artifact-of-record harness; this file holds the
iteration-speed measurements the optimization work cites in
OPTIMIZATION_r*.md: per-operator isolation with the noop sink (guide
§1.4), warm-JVM repetitions (min-of-N) so a single cold child's 2x
run-to-run swing cannot masquerade as a regression or a win, and
plan-shape captures.

Usage:
    python bench_extra.py extract [changes_dir]   # extraction stage only
    python bench_extra.py pipeline [changes_dir]  # full pipeline replay
    python bench_extra.py suiteq <name> [...]     # entry queries, noop sink
    python bench_extra.py minhash                 # doc_minhash_lsh stages

Env: GNS_EXTRA_REPS (default 3), SPARK_GRAFT_SF_DIR, GNS_EXTRA_CPUS
(default 8 for extract/pipeline — the bench children's level — and 32 for
suite queries, matching bench.py).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

REPS = int(os.environ.get("GNS_EXTRA_REPS", "3"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _spark(cpus: int, shuffle: int | None = None):
    from geomesa_nifi_spark.session import get_spark

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "16g")
    return get_spark(
        "bench-extra",
        master=f"local[{cpus}]",
        shuffle_partitions=shuffle or cpus,
        extra_conf={"spark.sql.files.maxPartitionBytes": str(32 * 1024 * 1024)},
    )


def _timed(label, fn, reps=REPS, warm=True):
    if warm:
        fn()
    times = []
    for _ in range(reps):
        t0 = time.monotonic()
        fn()
        times.append(time.monotonic() - t0)
    print(f"{label}: min {min(times):.3f}s  all {[round(t, 2) for t in times]}")
    return min(times)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def cmd_extract(changes_dir: str):
    from geomesa_nifi_spark.functions.extract import extract_pages

    cpus = int(os.environ.get("GNS_EXTRA_CPUS", "8"))
    spark = _spark(cpus)
    ch = spark.read.parquet(changes_dir).filter(F.pmod("offset", F.lit(4)) == 0)
    width = spark.sparkContext.defaultParallelism * 2
    spark.sparkContext.setJobDescription("extract: quarter slice, agg sink")
    _timed(
        f"extract local[{cpus}]",
        lambda: extract_pages(ch.repartition(width)).agg(
            F.sum(F.length("text")), F.count_distinct("lang")
        ).collect(),
    )
    spark.stop()


def cmd_pipeline(changes_dir: str):
    import shutil
    import tempfile

    from bench import run_pipeline_replay

    cpus = int(os.environ.get("GNS_EXTRA_CPUS", "8"))
    spark = _spark(cpus)

    def one():
        root = tempfile.mkdtemp(prefix="gns_extra_pipe_")
        try:
            secs = run_pipeline_replay(
                spark, changes_dir, root + "/t", n_batches=2, extract=True,
                num_buckets=16,
            )
            return secs
        finally:
            shutil.rmtree(root, ignore_errors=True)

    spark.sparkContext.setJobDescription("pipeline: 2-batch MoR replay")
    _timed(f"pipeline local[{cpus}]", one)
    spark.stop()


def cmd_suiteq(names: list[str]):
    import __spark_entry__ as entry

    cpus = int(os.environ.get("GNS_EXTRA_CPUS", "32"))
    spark = _spark(cpus)
    qs = entry.queries()
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"suiteq: {name}")
        _timed(name, lambda fn=fn: fn(spark, SF_DIR).select(F.count(F.lit(1))).collect())
    spark.stop()


def cmd_minhash():
    """Stage-by-stage breakdown of doc_minhash_lsh at the bench sf."""
    from geomesa_nifi_spark.operators.docdedup import (
        minhash_lsh_pairs,
        minhash_signatures,
    )

    cpus = int(os.environ.get("GNS_EXTRA_CPUS", "32"))
    spark = _spark(cpus)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs.count()
    _timed("signatures only", lambda: noop(minhash_signatures(docs, k=32, n=2)))
    _timed(
        "candidates (verify=False)",
        lambda: noop(minhash_lsh_pairs(docs, threshold=0.4, k=32, bands=16, n=2, verify=False)),
    )
    _timed(
        "full (verify=True)",
        lambda: noop(minhash_lsh_pairs(docs, threshold=0.4, k=32, bands=16, n=2)),
    )
    spark.stop()


if __name__ == "__main__":
    what = sys.argv[1] if len(sys.argv) > 1 else "extract"
    if what == "extract":
        cmd_extract(sys.argv[2] if len(sys.argv) > 2 else "/tmp/gns_r6_changes_html")
    elif what == "pipeline":
        cmd_pipeline(sys.argv[2] if len(sys.argv) > 2 else "/tmp/gns_r6_changes_html")
    elif what == "suiteq":
        cmd_suiteq(sys.argv[2:])
    elif what == "minhash":
        cmd_minhash()
    else:
        raise SystemExit(f"unknown command {what}")
