"""Visibility expressions, row filtering, snapshot expiry."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from geomesa_nifi_spark.lake import LakeTable, merge_changes
from geomesa_nifi_spark.operators.visibility import (
    VisibilityError,
    evaluate,
    filter_by_auths,
)


def test_evaluate_grammar():
    assert evaluate("user", {"user"})
    assert not evaluate("user", {"admin"})
    assert evaluate("user&admin", {"user", "admin"})
    assert not evaluate("user&admin", {"user"})
    assert evaluate("user|admin", {"admin"})
    assert evaluate("(alpha|beta)&ops", {"beta", "ops"})
    assert not evaluate("(alpha|beta)&ops", {"beta"})
    assert evaluate(None, set()) and evaluate("", set())  # unlabelled = open
    with pytest.raises(VisibilityError):
        evaluate("user&&admin", {"user"})
    with pytest.raises(VisibilityError):
        evaluate("(user", {"user"})


def test_filter_by_auths(spark):
    df = spark.createDataFrame(
        [
            Row(id=1, vis="user"),
            Row(id=2, vis="user&admin"),
            Row(id=3, vis="admin|ops"),
            Row(id=4, vis=None),
            Row(id=5, vis=""),
        ]
    )
    got = {r.id for r in filter_by_auths(df, {"user"}).collect()}
    assert got == {1, 4, 5}
    got = {r.id for r in filter_by_auths(df, {"user", "admin"}).collect()}
    assert got == {1, 2, 3, 4, 5}
    got = {r.id for r in filter_by_auths(df, set()).collect()}
    assert got == {4, 5}


def test_expire_snapshots_and_vacuum(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("offset", T.LongType()),
        ]
    )
    change = T.StructType(list(schema.fields) + [T.StructField("op", T.StringType())])
    t = LakeTable.create(spark, str(tmp_path / "t"), schema, key_col="url",
                         ts_col="warc_ts", tiebreak_col="offset", num_buckets=2)
    for i in range(6):
        merge_changes(
            t,
            spark.createDataFrame(
                [Row(url="k", warc_ts=dt.datetime(2024, 1, 1, 0, 0, i), offset=i, op="upsert")],
                change,
            ),
            batch_id=str(i),
        )
    assert len(t.history()) == 7  # v0 + 6 merges
    removed = t.expire_snapshots(keep_last=3)
    assert len(removed) == 4
    assert [s.version for s in t.history()] == [4, 5, 6]
    freed = t.vacuum(min_age_s=0)
    assert freed  # files only referenced by expired snapshots are gone
    assert t.scan().count() == 1  # current state intact
    # recent batch ids still known for idempotency; the in-process ledger
    # cache retains even expired ids (stronger replay protection), while a
    # fresh instance only sees ids within the retained horizon
    assert "5" in t.committed_batch_ids() and "0" in t.committed_batch_ids()
    fresh = LakeTable(spark, str(tmp_path / "t"))
    assert "5" in fresh.committed_batch_ids()
    assert "0" not in fresh.committed_batch_ids()


def test_distinct_label_cardinality_guard(spark, monkeypatch):
    """A per-row-unique 'vis' column must raise, not collect the dataset to
    the driver — labels are policy expressions with tiny cardinality."""
    from geomesa_nifi_spark.operators import visibility as V

    monkeypatch.setattr(V, "MAX_DISTINCT_LABELS", 5)
    df = spark.range(50).selectExpr("concat('label', id) as vis", "id")
    with pytest.raises(V.VisibilityError, match="distinct"):
        V.filter_by_auths(df, {"admin"})
