"""Attribute index tables: exact secondary indexes maintained from the
ledger, the engine's full analogue of the reference's store-side
attribute indexes.

GeoMesa stores maintain one index table per indexed attribute and route
``UpdateGeoMesaRecord``'s non-id lookups through them
(``UpdateGeoMesaRecord.scala:154-166``).  The engine already approximates
that with zone maps (``lake/stats.py``) and clustered layouts
(``lake/cluster.py``) — both prune FILES.  This module is the third tier:
a real inverted index — ``value → source key`` — stored as its OWN
:class:`LakeTable`, so an equality lookup opens O(1) buckets of the index
plus O(matching keys) files of the source, independent of source table
size.

Layout.  The index table's rows are ``(_ikey, <value col>, <key col>,
_v)`` with ``_ikey = value ␟ key`` (unit-separated, unique per entry) as
the LakeTable key and ``_v`` (the source version of the refresh) as the
LWW clock.  Crucially the table BUCKETS BY THE VALUE column
(``LakeTable.bucket_col``): all entries for one value land in one bucket,
so a lookup hashes the literal value driver-side and opens exactly that
bucket — the same O(1) shape as the reference store's index range scan.
Within a bucket, files sort by ``_ikey`` (value-prefixed), so zone maps
prune to the files covering the value.

Maintenance is an EXACT diff, not a lazy one: a refresh scans the source
at the last-indexed and target versions over only the buckets the
intervening commits touched (the same ``diff_bucket_sets`` machinery the
incremental aggregate views use), and ``exceptAll`` yields precisely the
(value, key) pairs added and removed.  Entries removed because a row was
deleted or its value changed become index tombstones — no stale entries,
no read-side verification pass.  Refreshes are exactly-once via the batch
id ``aidx:<from>-><to>`` like every other writer.

Consistency contract: the index is exact AS OF its last refreshed source
version; :func:`index_lookup` therefore time-travels the source to that
version by default, returning a result identical to an (unindexed)
predicate scan at that version.  ``at_head=True`` reads the source HEAD
through the indexed keys instead — rows whose value changed *away* since
the refresh are filtered out by the residual predicate (no false
positives), rows that changed *to* the value since the refresh are missed
until the next refresh (documented staleness, the standard async-index
trade).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geomesa_nifi_spark.lake.materialize import diff_bucket_sets
from geomesa_nifi_spark.lake.merge import MergeResult, append_only, merge_changes
from geomesa_nifi_spark.lake.table import LakeTable

IKEY = "_ikey"
IDX_VERSION = "_v"
_SEP = "\x1f"

#: driver-side cap on candidate keys per lookup: attribute lookups are
#: selective by contract; past this, an index fetch would collect a
#: table-sized key list — fail loudly and point at the scan path.
MAX_LOOKUP_KEYS = 100_000


class IndexLookupError(RuntimeError):
    pass


def create_attr_index(
    source: LakeTable,
    col: str,
    root: str,
    num_buckets: int | None = None,
    if_not_exists: bool = False,
) -> LakeTable:
    """Declare an attribute index table for ``source.col`` at ``root``.

    The new table is empty; run :func:`refresh_attr_index` to populate it
    (a fresh index's first refresh diffs against version 0 = the empty
    table, i.e. a bootstrap full build over only the source's buckets).
    """
    src_schema = source.schema()
    if col not in src_schema.fieldNames():
        raise ValueError(f"indexed column '{col}' not in source schema")
    if col == source.key_col:
        raise ValueError("indexing the key column is redundant (use lookup())")
    key_col = source.key_col
    schema = T.StructType(
        [
            T.StructField(IKEY, T.StringType()),
            T.StructField(col, src_schema[col].dataType),
            T.StructField(key_col, src_schema[key_col].dataType),
            T.StructField(IDX_VERSION, T.LongType()),
        ]
    )
    return LakeTable.create(
        source.spark,
        root,
        schema,
        key_col=IKEY,
        ts_col=IDX_VERSION,
        num_buckets=num_buckets or min(source.num_buckets, 16),
        properties={
            "bucket_col": col,
            "aidx.source_col": col,
            "aidx.source_key": key_col,
            "aidx.source_root": source.root,
        },
        if_not_exists=if_not_exists,
    )


def _index_config(index: LakeTable) -> tuple[str, str]:
    p = index.snapshot().properties
    col, key = p.get("aidx.source_col"), p.get("aidx.source_key")
    if not col or not key:
        raise ValueError(f"{index.root} is not an attribute index table")
    return col, key


def last_indexed_version(index: LakeTable) -> int:
    """The source version the index currently reflects (0 = never)."""
    for snap in sorted(index.history(), key=lambda s: -s.version):
        v = (snap.summary.get("lineage") or {}).get("aidx_source_version")
        if v is not None:
            return int(v)
    return 0


def _entries(df: DataFrame, col: str, key: str, to_v: int, op: str) -> DataFrame:
    return df.where(F.col(col).isNotNull()).select(
        F.concat_ws(_SEP, F.col(col).cast("string"), F.col(key).cast("string")).alias(IKEY),
        F.col(col),
        F.col(key),
        F.lit(to_v).cast("long").alias(IDX_VERSION),
        F.lit(op).alias("op"),
    )


def refresh_attr_index(
    index: LakeTable, source: LakeTable, to_version: int | None = None
) -> MergeResult:
    """Advance the index to the source's ``to_version`` (default head).

    Exact diff over only the touched buckets: ``added = post ∖ pre``
    becomes upserts, ``removed = pre ∖ post`` becomes tombstones (a value
    change is one of each under different ``_ikey``s).  Exactly-once via
    the version-range batch id; raises ``MaterializeRetentionError`` when
    part of the range was expired (rebuild by re-creating the index and
    refreshing from scratch).
    """
    col, key = _index_config(index)
    from_v = last_indexed_version(index)
    to_v = source.snapshot().version if to_version is None else int(to_version)
    if to_v < from_v:
        raise ValueError(f"index is at source v{from_v}, cannot refresh back to v{to_v}")
    if to_v == from_v:
        return MergeResult(snapshot=None, skipped=True, metrics={"reason": "up_to_date"})

    pre_b, post_b = diff_bucket_sets(source, from_v, to_v)
    batch_id = f"aidx:{from_v}->{to_v}"
    lineage = {"aidx_source_version": to_v}

    if (pre_b is not None and not pre_b) and (post_b is not None and not post_b):
        src = index.spark.createDataFrame([], index.schema())
        return append_only(index, src, batch_id=batch_id, lineage=lineage)

    cols = [key, col]
    pre = source.scan(
        version=from_v, buckets=sorted(pre_b) if pre_b is not None else None
    ).select(*cols)
    post = source.scan(
        version=to_v, buckets=sorted(post_b) if post_b is not None else None
    ).select(*cols)
    rows = _entries(post.exceptAll(pre), col, key, to_v, "upsert").unionByName(
        _entries(pre.exceptAll(post), col, key, to_v, "delete")
    )
    result = merge_changes(index, rows, batch_id=batch_id, mode="mor", lineage=lineage)
    if result.skipped and (result.metrics or {}).get("reason") == "empty_batch":
        # zero-entry diff: merge skips empty batches without committing —
        # still record the fast-forward so the next range starts at to_v
        src = index.spark.createDataFrame([], index.schema())
        return append_only(index, src, batch_id=batch_id, lineage=lineage)
    return result


def index_lookup(
    source: LakeTable,
    index: LakeTable,
    values: list,
    at_head: bool = False,
    max_keys: int = MAX_LOOKUP_KEYS,
) -> DataFrame:
    """Source rows whose indexed column equals one of ``values``.

    One driver-side hash locates the value buckets of the index; the
    index read opens only those buckets (zone-map pruned to the value's
    files inside them); the matching source keys then drive the source's
    bucket-pruned key ``lookup``.  Cost is O(selectivity), independent of
    source size — the reference's attribute-index read path
    (``UpdateGeoMesaRecord.scala:154-166``), lake-shaped.
    """
    col, key = _index_config(index)
    if not values:
        return source.scan().limit(0)
    indexed_v = last_indexed_version(index)
    # driver-side literal hashing (functions/xxhash.py): locating the value
    # buckets costs no Spark job
    vbuckets = index._literal_buckets(list(values), index.num_buckets)
    entries = index.scan(buckets=vbuckets, where=[(col, "in", list(values))])
    keys = [
        r[0]
        for r in entries.select(key).distinct().limit(max_keys + 1).collect()
    ]
    if len(keys) > max_keys:
        raise IndexLookupError(
            f"attribute lookup matched more than {max_keys} keys; this "
            f"predicate is not selective — use scan(where=...) instead"
        )
    rows = source.lookup(keys, version=None if at_head else indexed_v)
    # residual: exact under at_head (drops keys whose value moved away
    # since the refresh); a no-op re-check at the indexed version
    return rows.filter(F.col(col).isin(values))
