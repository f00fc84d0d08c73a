"""Ledger zone maps: per-file min/max stats, scan pruning, and the
MoR-soundness rule (stats.py; the lake analogue of the reference store's
attribute index behind UpdateGeoMesaRecord.scala:154-166)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geomesa_nifi_spark.lake import LakeTable, merge_changes
from geomesa_nifi_spark.lake.stats import (
    canon,
    file_may_match,
    predicate_column,
    prune_files,
)

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("offset", T.LongType()),
        T.StructField("lang", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ]
)
CHANGE = T.StructType(list(SCHEMA.fields) + [T.StructField("op", T.StringType())])


def ts(i):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=int(i))


def ev(url, i, lang, score=1.0, op="upsert"):
    return Row(url=url, warc_ts=ts(i), offset=int(i), lang=lang, score=score, op=op)


def make(spark, tmp_path, name="t", **kw):
    return LakeTable.create(
        spark, str(tmp_path / name), SCHEMA,
        key_col="url", ts_col="warc_ts", tiebreak_col="offset",
        num_buckets=kw.pop("num_buckets", 4), **kw,
    )


# -- unit level --------------------------------------------------------------

def test_canon_temporal():
    t = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    assert canon(t) == canon(dt.datetime(2024, 1, 1)) == 1_704_067_200_000_000
    assert canon(dt.date(2024, 1, 1)) == 1_704_067_200_000_000
    assert canon("x") == "x" and canon(3) == 3 and canon(True) == 1
    assert canon(b"raw") is None and canon(None) is None


def test_file_may_match_ops():
    st = {"lang": {"min": "de", "max": "fr", "nulls": 0, "rows": 10}}
    assert file_may_match(st, [("lang", "=", "en")])
    assert not file_may_match(st, [("lang", "=", "zz")])
    assert not file_may_match(st, [("lang", ">", "fr")])
    assert file_may_match(st, [("lang", ">=", "fr")])
    assert not file_may_match(st, [("lang", "<", "de")])
    assert file_may_match(st, [("lang", "in", ["zz", "en"])])
    assert not file_may_match(st, [("lang", "in", ["zz", "aa"])])
    assert file_may_match(st, [("lang", "between", ("aa", "de"))])
    assert not file_may_match(st, [("lang", "between", ("fs", "zz"))])
    # absent stats / absent column -> never prune
    assert file_may_match(None, [("lang", "=", "zz")])
    assert file_may_match({}, [("lang", "=", "zz")])
    # all-null column: no non-null comparison can match
    st_null = {"lang": {"min": None, "max": None, "nulls": 10, "rows": 10}}
    assert not file_may_match(st_null, [("lang", "=", "en")])
    # mixed-type comparison (schema drift): cannot prune, keep
    assert file_may_match(st, [("lang", "=", 7)])


def test_unknown_op_raises():
    st = {"a": {"min": 1, "max": 2, "nulls": 0, "rows": 2}}
    with pytest.raises(ValueError):
        file_may_match(st, [("a", "!=", 1)])
    with pytest.raises(ValueError):
        predicate_column([("a", "!=", 1)])


def test_string_stat_truncation_sound():
    from geomesa_nifi_spark.lake.stats import (
        MAX_STRING_STAT_LEN,
        _truncate_max,
        _truncate_min,
    )

    long = "m" * 500 + "tail"
    lo, hi = _truncate_min(long), _truncate_max(long)
    assert len(lo) <= MAX_STRING_STAT_LEN and len(hi) <= MAX_STRING_STAT_LEN
    assert lo <= long <= hi  # bounds stay valid for the original value
    # prefix-bump: any string sharing the truncated prefix is still covered
    assert long + "zzz" < hi
    # short strings pass through untouched
    assert _truncate_min("abc") == "abc" and _truncate_max("abc") == "abc"
    # the (theoretical) un-bumpable max becomes unbounded, not wrong
    assert _truncate_max(chr(0x10FFFF) * (MAX_STRING_STAT_LEN + 1)) is None


def test_long_text_column_stats_stay_small(spark, tmp_path):
    """A page-text column under parquet's 4 KB stats cutoff must not put
    multi-KB strings into every ledger entry — bounds are truncated (and
    remain sound: the pruner still keeps the right files)."""
    import json as _json

    from geomesa_nifi_spark.lake.stats import MAX_STRING_STAT_LEN

    t = make(spark, tmp_path, name="longtext", num_buckets=1)
    body_a = "alpha page body " * 60  # ~1 KB, under the parquet cutoff
    body_z = "zulu page body " * 60
    rows = [ev(f"a{i:02d}", i, body_a) for i in range(20)] + [
        ev(f"z{i:02d}", 100 + i, body_z) for i in range(20)
    ]
    merge_changes(t, spark.createDataFrame(rows, CHANGE), batch_id="b0",
                  max_records_per_file=10)
    files = t.snapshot().files
    for f in files:
        st = f.stats["lang"]  # 'lang' carries the long bodies in this test
        for bound in (st["min"], st["max"]):
            assert bound is None or len(bound) <= MAX_STRING_STAT_LEN
    # and the ledger entry on disk is bounded too
    raw = _json.dumps([f.to_json() for f in files])
    assert len(raw) < 20_000
    # truncated bounds still prune soundly: files holding only alpha bodies
    # are skipped for a zulu predicate, and the full value still matches
    got = t.scan(where=[("lang", "=", body_z)]).count()
    assert got == 20
    cand = t.candidate_files(where=[("lang", "=", body_z)])
    assert 0 < len(cand) < len(files)


# -- ledger + scan level -----------------------------------------------------

def test_stats_recorded_on_commit(spark, tmp_path):
    t = make(spark, tmp_path)
    merge_changes(
        t,
        spark.createDataFrame([ev(f"u{i}", i, "en", float(i)) for i in range(20)], CHANGE),
        batch_id="b0",
    )
    files = t.snapshot().files
    assert files and all(f.stats for f in files)
    st = files[0].stats
    # every comparable column carries min/max; timestamps too (the writer
    # emits TIMESTAMP_MICROS so footer stats exist)
    for col in ("url", "warc_ts", "offset", "lang", "score"):
        assert col in st, (col, sorted(st))
        assert st[col]["min"] is not None and st[col]["max"] is not None
    all_urls = sorted(r.url for r in t.scan().collect())
    lo = min(f.stats["url"]["min"] for f in files)
    hi = max(f.stats["url"]["max"] for f in files)
    assert lo == all_urls[0] and hi == all_urls[-1]


def test_scan_where_prunes_and_matches(spark, tmp_path):
    """Bulk check: a predicate on an attribute that correlates with the key
    order (domains, crawl prefixes — the common web-corpus shape) reads
    fewer files than the table holds and returns exactly the rows a
    full-scan filter would.  CoW rewrites sort by key, so per-file key
    ranges — and any key-correlated attribute's ranges — stay narrow."""
    t = make(spark, tmp_path, num_buckets=1)
    rows = [ev(f"a{i:03d}", i, "aa", float(i)) for i in range(50)] + [
        ev(f"z{i:03d}", 100 + i, "zz", float(i)) for i in range(50)
    ]
    merge_changes(t, spark.createDataFrame(rows, CHANGE), batch_id="b0",
                  max_records_per_file=25)
    snap = t.snapshot()
    assert len(snap.files) >= 4
    preds = [("lang", "=", "zz")]
    cand = t.candidate_files(where=preds)
    assert 0 < len(cand) < len(snap.files), (len(cand), len(snap.files))
    got = sorted(r.url for r in t.scan(where=preds).collect())
    want = sorted(r.url for r in t.scan().filter(F.col("lang") == "zz").collect())
    assert got == want and len(got) == 50


def test_scan_where_timestamp_range(spark, tmp_path):
    t = make(spark, tmp_path)
    merge_changes(t, spark.createDataFrame(
        [ev(f"u{i}", i * 1000, "en") for i in range(10)], CHANGE), batch_id="b0")
    preds = [("warc_ts", "between", (ts(2000), ts(4000)))]
    got = sorted(r.url for r in t.scan(where=preds).collect())
    assert got == ["u2", "u3", "u4"]


def test_mor_bucket_pruning_is_sound(spark, tmp_path):
    """The trap: key k's OLD row matches the predicate but a NEWER delta
    row does not.  Per-file pruning would drop the delta file (its stats
    exclude the predicate) and resurrect the stale row; bucket-granular
    pruning must read the whole bucket and resolve first."""
    t = make(spark, tmp_path, num_buckets=1)
    merge_changes(t, spark.createDataFrame([ev("k", 1, "en")], CHANGE),
                  batch_id="b0", mode="mor", auto_compact=False)
    # newer version of k flips lang away from the predicate value
    merge_changes(t, spark.createDataFrame([ev("k", 2, "fr")], CHANGE),
                  batch_id="b1", mode="mor", auto_compact=False)
    snap = t.snapshot()
    assert any(f.kind == "delta" for f in snap.files)
    rows = t.scan(where=[("lang", "=", "en")]).collect()
    assert rows == []  # the en-row was superseded; nothing may resurrect it
    # and the bucket IS skipped when nothing in it can match at all
    assert t.candidate_files(where=[("lang", "=", "qq")]) == []


def test_lookup_point_query_prunes_files(spark, tmp_path):
    """Point lookups prune to the files whose key range covers the key —
    write_files sorts by key, so multi-file buckets split into narrow
    ranges (the scan shape the verdict's 'non-key point queries prune
    nothing' finding asked for, now on key lookups too)."""
    t = make(spark, tmp_path, num_buckets=1)
    merge_changes(
        t,
        spark.createDataFrame([ev(f"u{i:04d}", i, "en") for i in range(400)], CHANGE),
        batch_id="b0",
        max_records_per_file=100,  # 1 bucket -> 4 files, each a key quartile
    )
    snap = t.snapshot()
    assert len(snap.files) >= 4
    cand = t.candidate_files(where=[("url", "in", ["u0001"])])
    assert len(cand) == 1, [f.path for f in cand]
    got = t.lookup(["u0001"]).collect()
    assert len(got) == 1 and got[0]["url"] == "u0001"


def test_evolved_column_files_not_pruned(spark, tmp_path):
    """Files written before an additive evolution have no stats for the new
    column; a predicate on it must keep them (absence = cannot prune), and
    the residual filter gives the exact result (old rows read as null)."""
    t = make(spark, tmp_path)
    merge_changes(t, spark.createDataFrame([ev("old", 1, "en")], CHANGE), batch_id="b0")
    wide = T.StructType(list(CHANGE.fields) + [T.StructField("mime", T.StringType())])
    rows = [Row(url="new", warc_ts=ts(2), offset=2, lang="en", score=1.0,
                op="upsert", mime="text/html")]
    merge_changes(t, spark.createDataFrame(rows, wide), batch_id="b1")
    cand = t.candidate_files(where=[("mime", "=", "text/html")])
    paths = {f.path for f in cand}
    # the old file survives pruning (no mime stats) ...
    assert len(cand) >= 1
    got = {r["url"] for r in t.scan(where=[("mime", "=", "text/html")]).collect()}
    assert got == {"new"}  # ... and the residual filter still excludes it


def test_stats_columns_property_narrows(spark, tmp_path):
    t = make(spark, tmp_path, name="narrow",
             properties={"stats.columns": "url,lang"})
    merge_changes(t, spark.createDataFrame([ev("u", 1, "en")], CHANGE), batch_id="b0")
    st = t.snapshot().files[0].stats
    assert "url" in st and "lang" in st
    assert "score" not in st and "warc_ts" not in st


def test_update_by_attribute_prunes_scan(spark, tmp_path):
    """The round-3 scale-killer shape: update_by_attribute ran
    table.scan() unconditionally.  With zone maps the lookup values bound
    the files read, and the result still matches the full semantics."""
    from geomesa_nifi_spark.lake.merge import update_by_attribute

    t = make(spark, tmp_path, num_buckets=1)
    rows = [ev(f"a{i:03d}", i, "aa") for i in range(50)] + [
        ev(f"z{i:03d}", 100 + i, "zz") for i in range(50)
    ]
    merge_changes(t, spark.createDataFrame(rows, CHANGE), batch_id="b0",
                  max_records_per_file=25)
    n_total = len(t.snapshot().files)
    # the pruning update_by_attribute performs internally, asserted here
    assert 0 < len(t.candidate_files(where=[("lang", "in", ["zz"])])) < n_total
    ups = spark.createDataFrame([("zz", 9.0)], "lang string, score double")
    r = update_by_attribute(t, ups, lookup_col="lang", batch_id="u0")
    assert r.metrics["attr_update_rows"] == 50
    assert r.metrics["attr_lookup_values"] == 1
    got = {row.url: row.score for row in t.scan().collect()}
    assert all(v == 9.0 for k, v in got.items() if k.startswith("z"))
    assert all(v != 9.0 for k, v in got.items() if k.startswith("a"))


def test_where_predicate_pushes_into_parquet_scan(spark, tmp_path):
    """Beyond file pruning, the residual where-filter must reach the
    parquet reader (PushedFilters) so surviving files still prune row
    groups — the full three-level pruning story: ledger file skip ->
    parquet row-group skip -> vectorized filter."""
    t = make(spark, tmp_path, name="push")
    merge_changes(t, spark.createDataFrame(
        [ev(f"u{i}", i, "en") for i in range(10)], CHANGE), batch_id="b0")
    plan = (
        t.scan(where=[("lang", "=", "en")])
        ._jdf.queryExecution().executedPlan().toString()
    )
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert pushed and any("lang" in l for l in pushed), plan


def test_compaction_preserves_stats(spark, tmp_path):
    from geomesa_nifi_spark.lake import compact

    t = make(spark, tmp_path)
    merge_changes(t, spark.createDataFrame([ev("k", 1, "en")], CHANGE),
                  batch_id="b0", mode="mor", auto_compact=False)
    merge_changes(t, spark.createDataFrame([ev("k", 2, "fr")], CHANGE),
                  batch_id="b1", mode="mor", auto_compact=False)
    compact(t)
    files = t.snapshot().files
    assert files and all(f.kind == "base" for f in files)
    assert all(f.stats and "lang" in f.stats for f in files)
    assert t.candidate_files(where=[("lang", "=", "en")]) == []  # folded away
