"""Physical-plan regression tests: pushdown, pruning, broadcast, partial
aggregation — the properties that keep the engine viable at 100 TB."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geomesa_nifi_spark.lake import LakeTable, append_only
from geomesa_nifi_spark.operators.dedup import lww_dedup
from geomesa_nifi_spark.operators.similarity import cosine_topk
from geomesa_nifi_spark.plans.checks import (
    assert_in_plan,
    assert_pushed_filters,
    assert_read_schema_only,
    count_exchanges,
    plan_str,
)

PAGES = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("offset", T.LongType()),
    ]
)


def _table(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), PAGES, key_col="url",
                         ts_col="warc_ts", tiebreak_col="offset", num_buckets=4)
    rows = [
        Row(url=f"u{i}", warc_ts=dt.datetime(2024, 1, 1), text=f"t{i}", lang="en", offset=i)
        for i in range(100)
    ]
    append_only(t, spark.createDataFrame(rows, PAGES))
    return t


def test_scan_pushes_filters_and_prunes_columns(spark, tmp_path):
    t = _table(spark, tmp_path)
    q = t.scan().filter(F.col("lang") == "en").select("url", "lang")
    assert_pushed_filters(q, "lang")
    # _deleted is read for tombstone filtering — that's the whole read set
    assert_read_schema_only(q, {"url", "lang", "_deleted"})


def test_lww_maxby_is_partial_aggregate(spark, tmp_path):
    t = _table(spark, tmp_path)
    dd = lww_dedup(t.scan(), "url", ["warc_ts", "offset"], strategy="maxby")
    plan = plan_str(dd, "simple")
    # map-side combine: an aggregate runs BEFORE the exchange (partial) —
    # hot keys reduce before they shuffle
    agg_before_exchange = plan.index("Exchange") > plan.index("Aggregate")
    assert agg_before_exchange or "partial" in plan, plan
    assert count_exchanges(dd) == 1  # exactly one shuffle for the dedup


def test_cosine_topk_broadcasts_queries(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = cosine_topk(emb, k=3, n_queries=3)
    assert_in_plan(q, "Broadcast")  # corpus never shuffles for the join


def test_convert_props_pushdown(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    q = ev.filter(F.col("event_type") == "click").select("event_id", "event_type")
    assert_pushed_filters(q, "event_type")
    assert_read_schema_only(q, {"event_id", "event_type"})


def test_mor_resolution_column_prunes(spark, tmp_path):
    """Merge-on-read resolution uses per-column max_by (maxby-columnar),
    so a narrow consumer prunes unused columns THROUGH the LWW aggregate
    all the way to the parquet scan: count() over resolved state must not
    read the text payload."""
    from geomesa_nifi_spark.lake import merge_changes

    t = _table(spark, tmp_path)
    ch = spark.createDataFrame(
        [Row(url=f"u{i}", warc_ts=dt.datetime(2024, 1, 2), text=f"n{i}",
             lang="en", offset=1000 + i, op="upsert") for i in range(10)],
        T.StructType(list(PAGES.fields) + [T.StructField("op", T.StringType())]),
    )
    merge_changes(t, ch, batch_id="d1", mode="mor", auto_compact=False)
    assert any(f.kind == "delta" for f in t.snapshot().files)
    # count over resolved state: only key + order cols + tombstone flag read
    q = t.scan().select(F.count(F.lit(1)))
    assert_read_schema_only(q, {"url", "warc_ts", "offset", "_deleted"})
    # narrow projection: text still unread, lang read
    q2 = t.scan().select("url", "lang")
    assert_read_schema_only(q2, {"url", "warc_ts", "offset", "lang", "_deleted"})
    # and the wide read still resolves the LWW winners correctly
    got = {r["url"]: r["text"] for r in t.scan().collect()}
    assert got["u0"] == "n0" and got["u99"] == "t99" and len(got) == 100


def test_maxby_columnar_equals_struct_on_unique_order(spark, tmp_path):
    t = _table(spark, tmp_path)
    src = t.scan()
    a = lww_dedup(src, "url", ["warc_ts", "offset"], strategy="maxby")
    b = lww_dedup(src, "url", ["warc_ts", "offset"], strategy="maxby-columnar")
    # count BEFORE executing: a collected AQE plan renders shuffle stages
    # as extra Exchange-bearing lines
    assert count_exchanges(b) == 1  # still one shuffle, still partial-agg
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
