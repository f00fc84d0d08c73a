"""Snapshot ledger: the atomic-commit log of a lake table.

This plays the role that Iceberg's metadata/snapshot files would play if the
runtime jars were available: every commit writes an immutable JSON snapshot
file ``_ledger/v{version:012d}.json`` created with O_EXCL, so exactly one
writer can claim a version (optimistic concurrency — the loser re-reads and
retries).  A snapshot lists the live data files (with per-file bucket +
row-count + key-range stats for pruning), the table schema at that version,
and a free-form summary carrying the CDC lineage: source batch id, offset
ranges, and row counts.

Exactly-once: each MERGE commit records its ``batch_id`` in the snapshot
summary.  ``committed_batch_ids()`` walks the ledger, so replaying an
already-committed batch is detected and skipped before any work happens
(reference analogue: commit-after-ack offset discipline in
``GetGeoMesaKafkaRecord.scala:298-302``).

On a real deployment the ledger directory lives on an object store with
conditional-put (S3 If-None-Match / GCS preconditions) giving the same
exactly-one-winner semantics as O_EXCL; all other logic is unchanged.
Snapshot JSON is kilobytes per commit — at 10^10 events with ~10^4 commits
the ledger is ~100 MB of metadata, read once per job and cached.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Any

LEDGER_DIR = "_ledger"
SNAPSHOT_FMT = "v{:012d}.json"


@dataclass(frozen=True)
class DataFile:
    """One immutable parquet data file tracked by the ledger.

    ``kind``: "base" files hold resolved state; "delta" files hold
    merge-on-read change rows (including tombstones) that readers reduce
    with last-writer-wins at scan time until compaction folds them in.

    ``stats``: optional zone map — ``{col: {min, max, nulls, rows}}`` read
    from the parquet footer at commit time (see ``lake/stats.py``); absent
    on files written before the feature existed, which simply never prune.
    """

    path: str  # relative to the table root
    bucket: int  # hash-bucket of the key column this file holds
    rows: int
    kind: str = "base"
    stats: dict[str, Any] | None = None

    def to_json(self) -> dict[str, Any]:
        out = {"path": self.path, "bucket": self.bucket, "rows": self.rows, "kind": self.kind}
        if self.stats:
            out["stats"] = self.stats
        return out

    @staticmethod
    def from_json(d: dict[str, Any]) -> "DataFile":
        return DataFile(
            path=d["path"],
            bucket=int(d["bucket"]),
            rows=int(d["rows"]),
            kind=d.get("kind", "base"),
            stats=d.get("stats"),
        )


@dataclass
class Snapshot:
    version: int
    schema_json: str  # Spark StructType.json()
    files: list[DataFile]
    properties: dict[str, str] = field(default_factory=dict)
    summary: dict[str, Any] = field(default_factory=dict)
    parent_version: int | None = None
    created_ms: int = 0

    @property
    def snapshot_id(self) -> int:
        # Monotonic snapshot ids (north rule) == ledger versions.
        return self.version

    def to_json(self) -> dict[str, Any]:
        return {
            "version": self.version,
            "schema_json": self.schema_json,
            "files": [f.to_json() for f in self.files],
            "properties": self.properties,
            "summary": self.summary,
            "parent_version": self.parent_version,
            "created_ms": self.created_ms,
        }

    @staticmethod
    def from_json(d: dict[str, Any]) -> "Snapshot":
        return Snapshot(
            version=int(d["version"]),
            schema_json=d["schema_json"],
            files=[DataFile.from_json(f) for f in d["files"]],
            properties=dict(d.get("properties") or {}),
            summary=dict(d.get("summary") or {}),
            parent_version=d.get("parent_version"),
            created_ms=int(d.get("created_ms") or 0),
        )


class CommitConflict(Exception):
    """Another writer claimed this ledger version first."""


class Ledger:
    """Append-only snapshot log under ``<table_root>/_ledger``."""

    def __init__(self, table_root: str):
        self.table_root = table_root
        self.dir = os.path.join(table_root, LEDGER_DIR)
        # Snapshot files are immutable once committed, so they are memoized by
        # version; the batch-id set is maintained incrementally (only versions
        # newer than the last scan are opened).  Without this, a 10^4-commit
        # replay re-parses every snapshot JSON on every merge — O(commits^2)
        # driver-side metadata IO that dominates small-batch latency.
        self._snap_cache: dict[int, Snapshot] = {}
        self._batch_ids: set[str] = set()
        self._batch_ids_seen_version: int = -1

    # -- reads -----------------------------------------------------------

    def exists(self) -> bool:
        return os.path.isdir(self.dir) and bool(self._versions())

    def _versions(self) -> list[int]:
        if not os.path.isdir(self.dir):
            return []
        out = []
        for name in os.listdir(self.dir):
            if name.startswith("v") and name.endswith(".json"):
                try:
                    out.append(int(name[1:-5]))
                except ValueError:
                    continue
        return sorted(out)

    def current_version(self) -> int | None:
        versions = self._versions()
        return versions[-1] if versions else None

    def snapshot(self, version: int | None = None) -> Snapshot:
        if version is None:
            version = self.current_version()
            if version is None:
                raise FileNotFoundError(f"no snapshots in {self.dir}")
        snap = self._snap_cache.get(version)
        if snap is None:
            path = os.path.join(self.dir, SNAPSHOT_FMT.format(version))
            with open(path) as fh:
                snap = Snapshot.from_json(json.load(fh))
            self._snap_cache[version] = snap
        return snap

    def snapshots(self) -> list[Snapshot]:
        return [self.snapshot(v) for v in self._versions()]

    def committed_batch_ids(self) -> set[str]:
        """Batch ids of every committed snapshot (exactly-once gate).

        Incremental: only snapshots newer than the last call are opened, so a
        long replay pays O(new commits) per merge, not O(all commits).  Ids
        are retained even after ``expire_snapshots`` drops old ledger entries
        in-process — replaying an expired batch is still detected."""
        for v in self._versions():
            if v > self._batch_ids_seen_version:
                bid = self.snapshot(v).summary.get("batch_id")
                if bid is not None:
                    self._batch_ids.add(str(bid))
                self._batch_ids_seen_version = v
        return self._batch_ids

    # -- writes ----------------------------------------------------------

    def commit(self, snapshot: Snapshot) -> Snapshot:
        """Atomically publish ``snapshot`` as the next ledger version.

        O_EXCL create: if the target version file already exists another
        writer won the race -> CommitConflict (caller re-reads and retries
        on top of the new state).
        """
        os.makedirs(self.dir, exist_ok=True)
        snapshot.created_ms = int(time.time() * 1000)
        path = os.path.join(self.dir, SNAPSHOT_FMT.format(snapshot.version))
        tmp = path + f".tmp.{os.getpid()}"
        with open(tmp, "w") as fh:
            json.dump(snapshot.to_json(), fh)
            fh.flush()
            os.fsync(fh.fileno())
        try:
            # link() fails with EEXIST if the version was claimed -> atomic
            # fail-if-exists publish (rename() would silently overwrite).
            os.link(tmp, path)
        except FileExistsError as exc:
            raise CommitConflict(
                f"version {snapshot.version} already committed in {self.dir}"
            ) from exc
        finally:
            os.unlink(tmp)
        self._snap_cache[snapshot.version] = snapshot
        return snapshot
