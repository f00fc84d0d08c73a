"""Changelog egress: read a lake table's committed changes as a stream of
events — the engine's analogue of ``GetGeoMesaKafkaRecord`` (store ->
records, SURVEY.md §3.3), but sourced from the snapshot ledger instead of a
Kafka topic.

Merge-on-read makes this cheap and exact: each ``merge_mor`` commit's delta
files ARE the change events of that batch (one LWW survivor per key,
tombstones marked).  ``table_changes`` replays them between two snapshot
versions with the commit metadata attached.  ``append`` commits likewise
expose their rows as inserts.

Copy-on-write commits rewrite buckets without a row-level pre-image, so by
default they only appear as ``rewrite_commits`` summaries — the same
limitation real lakehouse changelog readers have.  Setting the table
property ``changelog.enabled=true`` makes every CoW merge also retain its
change rows as side files (listed in the commit summary, invisible to
scans), which this reader then replays exactly like MoR deltas.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geomesa_nifi_spark.lake.table import DELETED_COL, LakeTable


class ChangelogRetentionError(RuntimeError):
    """The requested change range reaches past the retention horizon.

    Raised instead of returning a silently-incomplete changelog when (a)
    ``expire_snapshots`` dropped ledger entries inside the range, or (b)
    ``gc_changelog`` deleted a CoW commit's retained change files.  A CDC
    consumer that fell behind must re-bootstrap from a full scan, exactly
    like a binlog client whose server purged the logs it needed."""


def table_changes(
    table: LakeTable,
    from_version: int = 0,
    to_version: int | None = None,
) -> DataFrame:
    """Change events committed in versions (from_version, to_version].

    Output: the table's columns plus ``_change_type`` (insert_or_update |
    delete), ``_commit_version``, ``_batch_id``.  Ordered consumers sort by
    (_commit_version, ts).

    Raises :class:`ChangelogRetentionError` (never silently truncates)
    when part of the requested range has been retired by snapshot expiry
    or changelog GC.
    """
    spark = table.spark
    history = table.history()
    oldest = min((s.version for s in history), default=0)
    if from_version < oldest - 1:
        # versions in (from_version, oldest) were expired from the ledger:
        # the range can no longer be reproduced
        raise ChangelogRetentionError(
            f"changes from version {from_version} requested but the ledger's "
            f"oldest retained snapshot is v{oldest} (expire_snapshots horizon); "
            f"re-bootstrap from a full scan"
        )
    snaps = [
        s for s in history
        if s.version > from_version and (to_version is None or s.version <= to_version)
    ]
    schema = table.schema()
    read_schema = T.StructType(
        list(schema.fields) + [T.StructField(DELETED_COL, T.BooleanType(), True)]
    )

    pieces: list[DataFrame] = []
    for snap in snaps:
        op = snap.summary.get("operation")
        if op == "merge":
            # CoW commit: readable only when the table retained its change
            # rows (changelog.enabled) — the summary lists those side files
            cl = snap.summary.get("changelog_files") or []
            paths = [os.path.join(table.root, f["path"]) for f in cl]
            if not paths:
                continue
            gone = [p for p in paths if not os.path.exists(p)]
            if gone:
                raise ChangelogRetentionError(
                    f"commit v{snap.version} retained change rows but "
                    f"{len(gone)} of its changelog files were garbage-"
                    f"collected (changelog.retention.versions horizon); "
                    f"re-bootstrap from a full scan"
                )
        elif op in ("merge_mor", "append"):
            try:
                parent_files = {f.path for f in table.snapshot(snap.parent_version).files} \
                    if snap.parent_version is not None else set()
            except FileNotFoundError as exc:
                raise ChangelogRetentionError(
                    f"commit v{snap.version}'s parent snapshot "
                    f"v{snap.parent_version} was expired; its change rows "
                    f"cannot be reconstructed — re-bootstrap from a full scan"
                ) from exc
            added = [f for f in snap.files if f.path not in parent_files]
            if not added:
                continue
            paths = [os.path.join(table.root, f.path) for f in added]
        else:
            continue
        df = spark.read.schema(read_schema).parquet(*paths)
        df = df.withColumn(DELETED_COL, F.coalesce(F.col(DELETED_COL), F.lit(False)))
        pieces.append(
            df.select(
                *[F.col(f.name) for f in schema.fields],
                F.when(F.col(DELETED_COL), "delete")
                .otherwise("insert_or_update")
                .alias("_change_type"),
                F.lit(snap.version).alias("_commit_version"),
                F.lit(snap.summary.get("batch_id")).alias("_batch_id"),
            )
        )

    if not pieces:
        out_schema = T.StructType(
            list(schema.fields)
            + [
                T.StructField("_change_type", T.StringType()),
                T.StructField("_commit_version", T.IntegerType()),
                T.StructField("_batch_id", T.StringType()),
            ]
        )
        return spark.createDataFrame([], out_schema)
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out


def rewrite_commits(table: LakeTable, from_version: int = 0) -> list[dict]:
    """CoW / compaction commits in range — rows not representable as a
    row-level changelog; exposed as summary records for consumers."""
    return [
        {
            "version": s.version,
            "operation": s.summary.get("operation"),
            "batch_id": s.summary.get("batch_id"),
            "rows_written": s.summary.get("rows_written"),
        }
        for s in table.history()
        if s.version > from_version
        and s.summary.get("operation") in ("merge", "compact")
    ]
