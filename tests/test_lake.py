"""Lake table + ledger basics: create, append, scan, pruning, vacuum,
atomic-commit conflict, exactly-once batch skip."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from geomesa_nifi_spark.lake import (
    CommitConflict,
    LakeTable,
    Snapshot,
    append_only,
)

PAGES = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)


def ts(i):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i)


def page(i, rev=0):
    return Row(
        url=f"https://d{i % 7}.example.com/p/{i}",
        warc_ts=ts(i + rev * 1000),
        html=f"<html>{i}:{rev}</html>".encode(),
        text=f"page {i} rev {rev}",
        lang="en",
    )


def test_create_scan_append(spark, tmp_path):
    root = str(tmp_path / "pages")
    t = LakeTable.create(spark, root, PAGES, key_col="url", ts_col="warc_ts", num_buckets=8)
    assert t.exists()
    assert t.scan().count() == 0
    assert t.snapshot().version == 0

    df = spark.createDataFrame([page(i) for i in range(50)], PAGES)
    res = append_only(t, df, batch_id="b0")
    assert res.metrics["appended"] == 50
    assert t.scan().count() == 50
    assert t.snapshot().version == 1
    assert t.snapshot().summary["batch_id"] == "b0"

    # exactly-once: same batch id is a no-op
    res2 = append_only(t, df, batch_id="b0")
    assert res2.skipped
    assert t.scan().count() == 50
    assert t.snapshot().version == 1


def test_create_if_not_exists(spark, tmp_path):
    root = str(tmp_path / "t")
    LakeTable.create(spark, root, PAGES, key_col="url")
    with pytest.raises(FileExistsError):
        LakeTable.create(spark, root, PAGES, key_col="url")
    LakeTable.create(spark, root, PAGES, key_col="url", if_not_exists=True)


def test_bucket_pruned_scan(spark, tmp_path):
    root = str(tmp_path / "pages")
    t = LakeTable.create(spark, root, PAGES, key_col="url", ts_col="warc_ts", num_buckets=8)
    df = spark.createDataFrame([page(i) for i in range(200)], PAGES)
    append_only(t, df, batch_id="b0")

    snap = t.snapshot()
    buckets = sorted({f.bucket for f in snap.files})
    assert len(buckets) > 1  # data spread over buckets
    one = buckets[0]
    pruned = t.scan(buckets=[one])
    full = t.scan()
    # pruned scan reads strictly fewer rows and they all hash to that bucket
    assert 0 < pruned.count() < full.count()
    got = pruned.withColumn("_b", t.bucket_expr()).select("_b").distinct().collect()
    assert [r[0] for r in got] == [one]
    # pruning happens at the file level: scan only references that bucket's files
    assert sum(f.rows for f in snap.files if f.bucket == one) == pruned.count()


def test_commit_conflict_and_time_travel(spark, tmp_path):
    root = str(tmp_path / "pages")
    t = LakeTable.create(spark, root, PAGES, key_col="url", ts_col="warc_ts")
    base = t.snapshot()
    t.ledger.commit(
        Snapshot(version=1, schema_json=base.schema_json, files=[], summary={"operation": "x"},
                 properties=dict(base.properties), parent_version=0)
    )
    with pytest.raises(CommitConflict):
        t.ledger.commit(
            Snapshot(version=1, schema_json=base.schema_json, files=[], summary={"operation": "y"},
                     properties=dict(base.properties), parent_version=0)
        )
    # time travel: scan an older version
    df = spark.createDataFrame([page(i) for i in range(10)], PAGES)
    append_only(t, df)
    assert t.scan(version=1).count() == 0
    assert t.scan().count() == 10


def test_point_lookup_prunes_buckets(spark, tmp_path):
    root = str(tmp_path / "pages")
    t = LakeTable.create(spark, root, PAGES, key_col="url", ts_col="warc_ts", num_buckets=8)
    df = spark.createDataFrame([page(i) for i in range(200)], PAGES)
    append_only(t, df, batch_id="b0")
    some = [page(5).url, page(77).url, page(142).url]
    got = t.lookup(some)
    assert {r.url for r in got.collect()} == set(some)
    # the physical scan opens only the keys' buckets' files
    from geomesa_nifi_spark.plans.checks import assert_pushed_filters

    assert_pushed_filters(got, "url")
    read_buckets = {
        part.split("=")[1].split("/")[0]
        for f in got.inputFiles()
        for part in f.split("/")
        if part.startswith("_bucket=")
    }
    assert 0 < len(read_buckets) <= 3  # <= one bucket per key


def test_vacuum_removes_orphans(spark, tmp_path):
    root = str(tmp_path / "pages")
    t = LakeTable.create(spark, root, PAGES, key_col="url", ts_col="warc_ts", num_buckets=4)
    df = spark.createDataFrame([page(i) for i in range(20)], PAGES)
    append_only(t, df, batch_id="b0")
    # simulate a failed commit: files written but never referenced
    from geomesa_nifi_spark.lake.table import BUCKET_COL

    orphan = df.withColumn(BUCKET_COL, t.bucket_expr())
    t.write_files(orphan, version_hint=99)
    removed = t.vacuum(min_age_s=0)
    assert removed  # orphans deleted
    assert t.scan().count() == 20  # live data intact


def test_init_schemas_map(spark, tmp_path):
    """Multi-table idempotent init from a properties map
    (PutGeoMesa.scala:106-128)."""
    from pyspark.sql import types as T

    from geomesa_nifi_spark.lake.table import init_schemas

    specs = {
        "pages": {
            "schema": T.StructType([
                T.StructField("url", T.StringType()),
                T.StructField("warc_ts", T.TimestampType()),
            ]),
            "key_col": "url", "ts_col": "warc_ts", "num_buckets": 4,
        },
        "users": {
            "schema": T.StructType([T.StructField("uid", T.StringType())]),
            "key_col": "uid",
            "properties": {"changelog.enabled": "true"},
        },
    }
    tables = init_schemas(spark, str(tmp_path / "lake"), specs)
    assert set(tables) == {"pages", "users"}
    assert tables["pages"].num_buckets == 4
    assert tables["users"].snapshot().properties["changelog.enabled"] == "true"
    # idempotent: second call returns the existing tables, no new versions
    again = init_schemas(spark, str(tmp_path / "lake"), specs)
    assert again["pages"].snapshot().version == 0


def test_distributed_footer_stats_match_threaded(spark, tmp_path):
    """Above stats.footer.distribute.threshold, footer/zone-map collection
    fans out as a Spark job (bulk-commit shape: bootstrap commits the whole
    table at once); the resulting DataFiles — rows, stats — must be
    byte-identical to the driver-pool path."""
    def build(root, props):
        t = LakeTable.create(
            spark, root, PAGES, key_col="url", ts_col="warc_ts",
            num_buckets=8, properties=props,
        )
        df = spark.createDataFrame([page(i) for i in range(200)], PAGES)
        append_only(t, df, batch_id="b0")
        return t

    t_dist = build(str(tmp_path / "dist"), {"stats.footer.distribute.threshold": "2"})
    t_pool = build(str(tmp_path / "pool"), {})
    assert t_dist.last_footer_stats["distributed"] is True
    assert t_pool.last_footer_stats["distributed"] is False
    assert t_dist.last_footer_stats["files"] == t_pool.last_footer_stats["files"] > 2

    def norm(t):
        return sorted(
            (f.bucket, f.rows, None if f.stats is None else
             {k: dict(v) for k, v in f.stats.items()})
            for f in t.snapshot().files
        )

    assert norm(t_dist) == norm(t_pool)
    # the distributed-stats table still zone-map-prunes correctly
    n = t_dist.scan(where=[("warc_ts", ">=", ts(150))]).count()
    assert n == t_pool.scan(where=[("warc_ts", ">=", ts(150))]).count() == 50
