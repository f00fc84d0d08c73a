"""Attribute index tables (lake/index.py): exact inverted value->key
indexes maintained from the ledger — the engine's analogue of the
reference store's attribute indexes (UpdateGeoMesaRecord.scala:154-166)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geomesa_nifi_spark.lake import LakeTable, merge_changes
from geomesa_nifi_spark.lake.index import (
    IndexLookupError,
    create_attr_index,
    index_lookup,
    last_indexed_version,
    refresh_attr_index,
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


def ev(url, i, lang, score=1.0, op="upsert"):
    return Row(url=url, warc_ts=ts(i), offset=int(i), lang=lang, score=score, op=op)


def make(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA,
        key_col="url", ts_col="warc_ts", tiebreak_col="offset", num_buckets=4,
    )
    idx = create_attr_index(t, "lang", str(tmp_path / "t_lang_idx"))
    return t, idx


def _lang_keys(t, idx, langs):
    return {r["url"] for r in index_lookup(t, idx, langs).collect()}


def test_create_validations(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA,
        key_col="url", ts_col="warc_ts", num_buckets=4,
    )
    with pytest.raises(ValueError, match="not in source schema"):
        create_attr_index(t, "nope", str(tmp_path / "i1"))
    with pytest.raises(ValueError, match="redundant"):
        create_attr_index(t, "url", str(tmp_path / "i2"))
    idx = create_attr_index(t, "lang", str(tmp_path / "i3"))
    assert idx.bucket_col == "lang" and idx.key_col == "_ikey"
    with pytest.raises(ValueError, match="not an attribute index"):
        from geomesa_nifi_spark.lake.index import _index_config

        _index_config(t)


def test_bootstrap_and_incremental_refresh(spark, tmp_path):
    t, idx = make(spark, tmp_path)
    rows = [ev(f"u{i}", i, ["en", "de", "fr"][i % 3]) for i in range(30)]
    merge_changes(t, spark.createDataFrame(rows), batch_id="b0", mode="mor",
                  auto_compact=False)
    r = refresh_attr_index(idx, t)
    assert not r.skipped and last_indexed_version(idx) == t.snapshot().version
    assert _lang_keys(t, idx, ["de"]) == {f"u{i}" for i in range(30) if i % 3 == 1}

    # idempotent: same range skips; up-to-date refresh is a no-op
    assert refresh_attr_index(idx, t).skipped

    # incremental: u1 changes de -> en; u4 deleted; u99 arrives as fr
    upd = [ev("u1", 100, "en"), ev("u4", 101, None if False else "de", op="delete"),
           ev("u99", 102, "fr")]
    merge_changes(t, spark.createDataFrame(upd), batch_id="b1", mode="mor",
                  auto_compact=False)
    r2 = refresh_attr_index(idx, t)
    assert not r2.skipped
    assert "u1" not in _lang_keys(t, idx, ["de"])
    assert "u1" in _lang_keys(t, idx, ["en"])
    assert "u4" not in _lang_keys(t, idx, ["de"])
    assert "u99" in _lang_keys(t, idx, ["fr"])


def test_lookup_matches_scan_exactly(spark, tmp_path):
    t, idx = make(spark, tmp_path)
    rows = [ev(f"u{i}", i, ["en", "de", "fr", "pt"][i % 4], float(i)) for i in range(200)]
    merge_changes(t, spark.createDataFrame(rows), batch_id="b0", mode="mor",
                  auto_compact=False)
    refresh_attr_index(idx, t)
    got = {tuple(r) for r in index_lookup(t, idx, ["de", "pt"]).collect()}
    want = {tuple(r) for r in t.scan(where=[("lang", "in", ["de", "pt"])]).collect()}
    assert got == want and len(got) == 100


def test_lookup_time_travel_vs_head(spark, tmp_path):
    t, idx = make(spark, tmp_path)
    merge_changes(t, spark.createDataFrame([ev("u1", 1, "en"), ev("u2", 2, "de")]),
                  batch_id="b0", mode="mor", auto_compact=False)
    refresh_attr_index(idx, t)
    # u3 becomes en AFTER the refresh; u1 moves away from en
    merge_changes(t, spark.createDataFrame([ev("u3", 3, "en"), ev("u1", 4, "de")]),
                  batch_id="b1", mode="mor", auto_compact=False)
    # default: exact at the indexed version — u1 still en, u3 invisible
    assert _lang_keys(t, idx, ["en"]) == {"u1"}
    # at_head: no false positives (u1 filtered out), u3 missed until refresh
    head = {r["url"] for r in index_lookup(t, idx, ["en"], at_head=True).collect()}
    assert head == set()
    refresh_attr_index(idx, t)
    assert _lang_keys(t, idx, ["en"]) == {"u3"}


def test_refresh_survives_source_compaction_and_empty_ranges(spark, tmp_path):
    t, idx = make(spark, tmp_path)
    merge_changes(t, spark.createDataFrame([ev("u1", 1, "en")]), batch_id="b0",
                  mode="mor", auto_compact=False)
    refresh_attr_index(idx, t)
    v = last_indexed_version(idx)
    compact(t)  # metadata-only for the index: no logical rows changed
    r = refresh_attr_index(idx, t)
    assert last_indexed_version(idx) == t.snapshot().version > v
    assert _lang_keys(t, idx, ["en"]) == {"u1"}


def test_lookup_empty_and_cap(spark, tmp_path):
    t, idx = make(spark, tmp_path)
    rows = [ev(f"u{i}", i, "en") for i in range(20)]
    merge_changes(t, spark.createDataFrame(rows), batch_id="b0", mode="mor",
                  auto_compact=False)
    refresh_attr_index(idx, t)
    assert index_lookup(t, idx, []).count() == 0
    assert index_lookup(t, idx, ["xx"]).count() == 0
    with pytest.raises(IndexLookupError, match="not selective"):
        index_lookup(t, idx, ["en"], max_keys=5)


def test_index_read_is_bucket_pruned(spark, tmp_path):
    """The index lookup must open only the value's bucket(s), not the
    whole index — the O(1) promise."""
    t, idx = make(spark, tmp_path)
    rows = [ev(f"u{i}", i, ["en", "de", "fr", "pt"][i % 4]) for i in range(100)]
    merge_changes(t, spark.createDataFrame(rows), batch_id="b0", mode="mor",
                  auto_compact=False)
    refresh_attr_index(idx, t)
    total = len(idx.snapshot().files)
    lit = spark.createDataFrame([("de",)], "lang string")
    nb = idx.num_buckets
    [b] = [r[0] for r in lit.select(idx.bucket_expr(num_buckets=nb).alias("b")).collect()]
    cand = idx.candidate_files(buckets=[b])
    assert len(cand) < total or total == 1
    # and lookup through those buckets returns the right keys
    assert _lang_keys(t, idx, ["de"]) == {f"u{i}" for i in range(100) if i % 4 == 1}


def test_update_by_attribute_routes_through_index(spark, tmp_path):
    """update_by_attribute(index=...) must equal the index-less path —
    the reference's attribute-index read (UpdateGeoMesaRecord.scala:154-166)
    behind the same update semantics."""
    from geomesa_nifi_spark.lake.merge import update_by_attribute

    rows = [ev(f"u{i}", i, ["en", "de", "fr"][i % 3], float(i)) for i in range(60)]

    t, idx = make(spark, tmp_path)
    merge_changes(t, spark.createDataFrame(rows), batch_id="b0", mode="mor",
                  auto_compact=False)
    t2 = LakeTable.create(
        spark, str(tmp_path / "t2"), SCHEMA,
        key_col="url", ts_col="warc_ts", tiebreak_col="offset", num_buckets=4,
    )
    merge_changes(t2, spark.createDataFrame(rows), batch_id="b0", mode="mor",
                  auto_compact=False)

    upd = spark.createDataFrame([("de", 99.0)], "lang string, score double")
    r_idx = update_by_attribute(t, upd, "lang", batch_id="u1", index=idx)
    r_scan = update_by_attribute(t2, upd, "lang", batch_id="u1")

    assert r_idx.metrics["attr_update_rows"] == r_scan.metrics["attr_update_rows"] == 20
    got = {tuple(r) for r in t.scan().collect()}
    want = {tuple(r) for r in t2.scan().collect()}
    assert got == want
    # the routed refresh brought the index to the pre-update head; score
    # updates do not move lang, so a follow-up refresh only sees the
    # update commit itself (which left lang unchanged -> empty diff)
    assert last_indexed_version(idx) > 0
    refresh_attr_index(idx, t)
    assert _lang_keys(t, idx, ["de"]) == {f"u{i}" for i in range(60) if i % 3 == 1}

    # wrong-column index is rejected
    other = create_attr_index(t, "score", str(tmp_path / "score_idx"))
    import pytest as _pytest
    with _pytest.raises(ValueError, match="does not index"):
        update_by_attribute(t, upd, "lang", batch_id="u2", index=other)
