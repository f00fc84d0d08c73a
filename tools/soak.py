"""Soak run: sustained merge-on-read replay over many batches.

Validates what the short benches cannot: compaction cadence under a long
batch sequence, ledger growth, and end-state correctness vs an independent
LWW oracle over the full stream.

Usage: python tools/soak.py [n_events] [n_batches] [rescale_at:rescale_to[:lazy]]

The optional third arg wedges a live ``LakeTable.rescale`` into the replay
(e.g. ``10:256`` rescales to 256 buckets after batch 10) — proving the
admin rebalance under sustained write volume with the same end-state
oracle.  Suffix ``:lazy`` (e.g. ``10:256:lazy``) uses the metadata-only
lazy rescale instead; the rest of the replay then runs over a
mixed-modulus layout that migrates as merges/compactions touch it, and
the final ``migrate_layout`` debt is reported."""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql import types as T


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    rescale_at = rescale_to = None
    rescale_lazy = False
    if len(sys.argv) > 3:
        parts = sys.argv[3].split(":")
        rescale_at, rescale_to = int(parts[0]), int(parts[1])
        rescale_lazy = len(parts) > 2 and parts[2] == "lazy"

    from geomesa_nifi_spark.lake import LakeTable, merge_changes
    from geomesa_nifi_spark.operators.dedup import lww_dedup
    from geomesa_nifi_spark.session import get_spark
    from geomesa_nifi_spark.sources.changegen import change_stream

    spark = get_spark("soak")
    work = tempfile.mkdtemp(prefix="gns_soak_")
    changes_dir = os.path.join(work, "changes")
    print(f"generating {n_events:,} events ...", flush=True)
    change_stream(
        spark, n_events, n_keys=n_events // 5, seed=42, payload="text"
    ).drop("partition").write.parquet(changes_dir)

    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("offset", T.LongType()),
        ]
    )
    table = LakeTable.create(
        spark, os.path.join(work, "pages"), schema,
        key_col="url", ts_col="warc_ts", tiebreak_col="offset", num_buckets=64,
    )
    ch = spark.read.parquet(changes_dir)
    size = n_events // n_batches

    t0 = time.monotonic()
    compactions = 0
    for b in range(n_batches):
        batch = ch.filter(
            (F.col("offset") >= b * size) & (F.col("offset") < (b + 1) * size)
        )
        r = merge_changes(table, batch, batch_id=f"soak-{b}", collect_metrics=False, mode="mor")
        if r.metrics.get("compacted_buckets"):
            compactions += 1
        if rescale_at is not None and b + 1 == rescale_at:
            rt = time.monotonic()
            table.rescale(rescale_to, lazy=rescale_lazy)
            kind = "lazily rescaled" if rescale_lazy else "rescaled"
            print(
                f"  {kind} {64} -> {rescale_to} buckets after batch {b+1} "
                f"({time.monotonic() - rt:.1f}s)",
                flush=True,
            )
        if (b + 1) % 10 == 0:
            el = time.monotonic() - t0
            print(
                f"  batch {b+1}/{n_batches}: {((b+1)*size)/el:,.0f} ev/s sustained, "
                f"{compactions} compactions, ledger v{table.snapshot().version}",
                flush=True,
            )
    elapsed = time.monotonic() - t0
    print(f"replay: {n_events/elapsed:,.0f} events/s over {n_batches} batches ({elapsed:.1f}s)")

    print("verifying vs LWW oracle ...", flush=True)
    expected = (
        lww_dedup(ch, "url", ["warc_ts", "offset"], strategy="maxby")
        .filter(F.col("op") != "delete")
        .count()
    )
    got = table.scan().count()
    stats = table.delta_stats()
    max_deltas = max((s["delta_files"] for s in stats.values()), default=0)
    print(f"final rows: {got} oracle: {expected} -> {'MATCH' if got == expected else 'MISMATCH'}")
    print(f"ledger versions: {table.snapshot().version}, max delta files/bucket: {max_deltas}")
    if rescale_lazy:
        nb = table.num_buckets
        debt = sum(1 for f in table.snapshot().files if (f.modulus or nb) != nb)
        print(f"lazy-rescale debt after replay: {debt} old-modulus files", flush=True)
        if debt:
            from geomesa_nifi_spark.lake import migrate_layout

            mt = time.monotonic()
            migrate_layout(table)
            still = sum(
                1 for f in table.snapshot().files if (f.modulus or nb) != nb
            )
            ok = table.scan().count() == got and still == 0
            print(
                f"migrate_layout: cleared in {time.monotonic() - mt:.1f}s, "
                f"state intact: {ok}"
            )
    expired = table.expire_snapshots(keep_last=10)
    freed = table.vacuum(min_age_s=0)
    print(f"expired {len(expired)} snapshots, vacuumed {len(freed)} files; "
          f"state intact: {table.scan().count() == got}")


if __name__ == "__main__":
    main()
