"""Clustered (Z-order / linear) compaction: layouts that make the ledger
zone maps prune NON-key attribute predicates (lake/cluster.py; the
lakehouse analogue of the reference's store-side attribute index for
range-shaped read patterns, UpdateGeoMesaRecord.scala:154-166)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geomesa_nifi_spark.lake import LakeTable, merge_changes
from geomesa_nifi_spark.lake.cluster import (
    MAX_STRING_DICT,
    ClusteringError,
    cluster_sort_exprs,
)
from geomesa_nifi_spark.lake.merge import compact

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("offset", T.LongType()),
        T.StructField("lang", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ]
)


def ts(i):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=int(i))


def ev(url, i, lang, score, op="upsert"):
    return Row(url=url, warc_ts=ts(i), offset=int(i), lang=lang, score=score, op=op)


def make(spark, tmp_path, name="t", num_buckets=2):
    return LakeTable.create(
        spark, str(tmp_path / name), SCHEMA,
        key_col="url", ts_col="warc_ts", tiebreak_col="offset",
        num_buckets=num_buckets,
    )


def _load(spark, tmp_path, n=400, num_buckets=2):
    """n keys; score is a deterministic permutation so key order and score
    order are decorrelated (the worst case for the default key sort)."""
    t = make(spark, tmp_path, num_buckets=num_buckets)
    rows = [ev(f"u{i:04d}", i, ["en", "de", "fr", "pt"][i % 4],
               float((i * 193) % n)) for i in range(n)]
    merge_changes(t, spark.createDataFrame(rows), batch_id="b0", mode="mor",
                  auto_compact=False)
    return t, rows


# -- unit: sort expressions ---------------------------------------------------

def test_zvalue_interleave_properties(spark):
    """2-column Z-value: monotone along each axis (holding the other
    fixed), and sensitive to BOTH columns — neither dominates."""
    df = spark.createDataFrame(
        [(float(a), float(b)) for a in range(8) for b in range(8)], "a double, b double"
    )
    [z] = cluster_sort_exprs(df, ["a", "b"], bits=3)
    got = {(int(r["a"]), int(r["b"])): r["z"]
           for r in df.withColumn("z", z).collect()}
    for fixed in range(8):
        row = [got[(a, fixed)] for a in range(8)]
        col = [got[(fixed, b)] for b in range(8)]
        assert row == sorted(row), (fixed, row)
        assert col == sorted(col), (fixed, col)
    assert got[(0, 7)] > got[(0, 0)] and got[(7, 0)] > got[(0, 0)]
    assert got[(7, 7)] == max(got.values())
    # interleaving, not concatenation: the max single-axis value must not
    # exceed the mixed diagonal midpoint's neighborhood by construction
    assert got[(7, 0)] < got[(7, 7)] and got[(0, 7)] < got[(7, 7)]


def test_single_column_is_linear(spark):
    df = spark.createDataFrame([(1.0,), (2.0,)], "score double")
    exprs = cluster_sort_exprs(df, ["score"])
    assert len(exprs) == 1
    # raw column, not a computed Z: ordering by it equals ordering by score
    assert df.orderBy(exprs[0]).collect() == df.orderBy("score").collect()


def test_string_dictionary_rank_orders_lexically(spark):
    df = spark.createDataFrame(
        [("de", 1.0), ("en", 1.0), ("fr", 1.0), (None, 1.0)], "lang string, x double"
    )
    [r] = cluster_sort_exprs(df, ["lang", "x"])
    # Z over (lang-rank, const): non-null ordering must follow lexical lang
    # order; null ties with the lowest cell (rank 0, like NULLS FIRST —
    # zone maps track nulls separately so the tie cannot mis-prune)
    order = [row["lang"] for row in df.orderBy(r).collect()]
    assert [v for v in order if v is not None] == ["de", "en", "fr"]
    assert order.index(None) <= 1


def test_cluster_errors(spark):
    df = spark.createDataFrame([(1.0, b"x")], "a double, b binary")
    with pytest.raises(ClusteringError, match="not in schema"):
        cluster_sort_exprs(df, ["nope"])
    with pytest.raises(ClusteringError, match="unsupported type"):
        cluster_sort_exprs(df, ["a", "b"])
    with pytest.raises(ClusteringError, match="at least one"):
        cluster_sort_exprs(df, [])
    with pytest.raises(ClusteringError, match="63-bit"):
        cluster_sort_exprs(df.select("a", F.col("a").alias("c"),
                                     F.col("a").alias("d")), ["a", "c", "d"], bits=32)
    big = spark.range(MAX_STRING_DICT + 10).select(
        F.col("id").cast("string").alias("s"), F.col("id").cast("double").alias("v")
    )
    with pytest.raises(ClusteringError, match="distinct strings"):
        cluster_sort_exprs(big, ["s", "v"])


def test_sort_exprs_are_jvm_only(spark):
    """The clustering expression compiles to built-ins — no Python UDF in
    the plan (the 100-TB rewrite stays JVM-side)."""
    df = spark.createDataFrame([(1.0, 2.0)], "a double, b double")
    [z] = cluster_sort_exprs(df, ["a", "b"])
    plan = df.withColumn("z", z)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# -- integration: clustered compaction ---------------------------------------

def test_clustered_compaction_preserves_state(spark, tmp_path):
    t, rows = _load(spark, tmp_path)
    before = {(r["url"], r["score"]) for r in t.scan().collect()}
    compact(t, max_records_per_file=50, cluster_by=["score"])
    assert t.snapshot().summary["clustered_by"] == ["score"]
    after = {(r["url"], r["score"]) for r in t.scan().collect()}
    assert after == before and len(after) == 400


def test_linear_clustering_prunes_attribute_scans(spark, tmp_path):
    t, rows = _load(spark, tmp_path)
    # baseline: key-sorted compaction -> every file spans ~the full score
    # range, a score predicate prunes nothing
    compact(t, max_records_per_file=50)
    total = len(t.snapshot().files)
    assert total >= 8  # overflow splits happened
    where = [("score", ">=", 360.0)]
    unpruned = len(t.candidate_files(where=where))
    # decorrelated key sort: (almost) nothing prunes — a file boundary can
    # exclude the range by luck, but not more than one
    assert unpruned >= total - 1

    compact(t, max_records_per_file=50, cluster_by=["score"])
    total_c = len(t.snapshot().files)
    pruned = len(t.candidate_files(where=where))
    assert pruned < total_c / 2, (pruned, total_c)
    # and the pruned scan still returns exactly the matching rows
    got = {r["url"] for r in t.scan(where=where).collect()}
    want = {r.url for r in rows if r.score >= 360.0}
    assert got == want


def test_zorder_prunes_both_columns(spark, tmp_path):
    t, rows = _load(spark, tmp_path, n=800)
    compact(t, max_records_per_file=25, cluster_by=["score", "warc_ts"])
    total = len(t.snapshot().files)
    assert total >= 16
    for where, pred in (
        ([("score", "<", 100.0)], lambda r: r.score < 100.0),
        ([("warc_ts", ">=", ts(700))], lambda r: r.warc_ts >= ts(700)),
    ):
        cand = len(t.candidate_files(where=where))
        assert cand < total, (where, cand, total)
        got = {r["url"] for r in t.scan(where=where).collect()}
        assert got == {r.url for r in rows if pred(r)}


def test_clustered_compaction_survives_deltas_and_lww(spark, tmp_path):
    """Cluster, then merge newer deltas: per-bucket soundness keeps the
    pruned scan LWW-correct even though clustered files are stale."""
    t, rows = _load(spark, tmp_path)
    compact(t, max_records_per_file=50, cluster_by=["score"])
    upd = [ev(f"u{i:04d}", 10_000 + i, "en", 9999.0) for i in range(0, 400, 7)]
    merge_changes(t, spark.createDataFrame(upd), batch_id="b1", mode="mor",
                  auto_compact=False)
    where = [("score", ">=", 9000.0)]
    got = {r["url"] for r in t.scan(where=where).collect()}
    assert got == {r.url for r in upd}
