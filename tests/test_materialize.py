"""Incremental materialized aggregates (lake/materialize.py): refresh
deltas vs a full-recompute oracle, delete/insert/update group transitions,
fast-forward over metadata-only commits, exactly-once refresh, retention
contract, rebuild recovery."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geomesa_nifi_spark.lake import (
    LakeTable,
    MaterializeRetentionError,
    compact,
    create_aggregate_view,
    last_refreshed_version,
    merge_changes,
    rebuild,
    refresh,
)

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("offset", T.LongType()),
        T.StructField("lang", T.StringType()),
        T.StructField("tokens", T.LongType()),
    ]
)


def ts(i):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=int(i))


def ev(url, i, lang, tokens, op="upsert"):
    return Row(url=url, warc_ts=ts(i), offset=int(i), lang=lang,
               tokens=int(tokens), op=op)


def make_source(spark, tmp_path, mode_buckets=4):
    return LakeTable.create(
        spark, str(tmp_path / "src"), SCHEMA,
        key_col="url", ts_col="warc_ts", tiebreak_col="offset",
        num_buckets=mode_buckets,
    )


def make_view(spark, tmp_path, source):
    return create_aggregate_view(
        spark, str(tmp_path / "mv"), source,
        group_cols=["lang"],
        metrics={"n": "count", "tok": ("sum", "tokens")},
        num_buckets=4,
    )


def apply(spark, source, rows, bid, mode="cow"):
    df = spark.createDataFrame(
        rows, T.StructType(list(SCHEMA.fields) + [T.StructField("op", T.StringType())])
    )
    return merge_changes(source, df, batch_id=bid, mode=mode, auto_compact=False)


def view_state(view):
    return {
        r["lang"]: (r["n"], r["tok"])
        for r in view.scan().select("lang", "n", "tok").collect()
    }


def oracle(source):
    rows = (
        source.scan()
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("tokens").alias("tok"))
        .collect()
    )
    return {r["lang"]: (r["n"], r["tok"]) for r in rows}


def test_refresh_matches_recompute_through_transitions(spark, tmp_path):
    """Insert / update-in-group / update-across-group / delete, refreshed
    incrementally after each batch, always equals the full recompute."""
    source = make_source(spark, tmp_path)
    view = make_view(spark, tmp_path, source)

    apply(spark, source, [ev("a", 1, "en", 10), ev("b", 1, "en", 20),
                          ev("c", 1, "de", 5)], "b1")
    refresh(view, source)
    assert view_state(view) == oracle(source) == {"en": (2, 30), "de": (1, 5)}

    # update inside a group (tokens change) + across groups (b: en -> fr)
    apply(spark, source, [ev("a", 2, "en", 15), ev("b", 2, "fr", 20)], "b2")
    refresh(view, source)
    assert view_state(view) == oracle(source) == {
        "en": (1, 15), "fr": (1, 20), "de": (1, 5)}

    # delete the last member of a group -> group row deleted from the view
    apply(spark, source, [ev("c", 3, "de", 5, op="delete")], "b3")
    refresh(view, source)
    st = view_state(view)
    assert st == oracle(source)
    assert "de" not in st

    # resurrection re-inserts the group
    apply(spark, source, [ev("c", 4, "de", 7)], "b4")
    refresh(view, source)
    assert view_state(view) == oracle(source) == {
        "en": (1, 15), "fr": (1, 20), "de": (1, 7)}


def test_refresh_multi_batch_range_and_mor(spark, tmp_path):
    """One refresh spanning several MoR commits equals the recompute."""
    source = make_source(spark, tmp_path)
    view = make_view(spark, tmp_path, source)
    apply(spark, source, [ev("a", 1, "en", 1), ev("b", 1, "de", 2)], "b1", mode="mor")
    apply(spark, source, [ev("a", 2, "fr", 3)], "b2", mode="mor")
    apply(spark, source, [ev("b", 3, "de", 9), ev("d", 3, "de", 4)], "b3", mode="mor")
    r = refresh(view, source)
    assert not r.skipped
    assert view_state(view) == oracle(source) == {"fr": (1, 3), "de": (2, 13)}


def test_refresh_exactly_once_and_monotonic(spark, tmp_path):
    source = make_source(spark, tmp_path)
    view = make_view(spark, tmp_path, source)
    apply(spark, source, [ev("a", 1, "en", 1)], "b1")
    v = source.snapshot().version
    refresh(view, source, to_version=v)
    ver = view.snapshot().version
    # same range again -> batch-id skip, view version unchanged
    r = refresh(view, source, to_version=v)
    assert r.skipped and view.snapshot().version == ver
    assert last_refreshed_version(view) == v
    with pytest.raises(ValueError):
        refresh(view, source, to_version=v - 1)


def test_fast_forward_over_metadata_only_commits(spark, tmp_path):
    """Compaction/rescale commits move no rows: refresh fast-forwards the
    version marker without writing data rows."""
    source = make_source(spark, tmp_path)
    view = make_view(spark, tmp_path, source)
    apply(spark, source, [ev("a", 1, "en", 1), ev("b", 1, "de", 2)], "b1", mode="mor")
    refresh(view, source)
    before = view_state(view)

    compact(source)
    source.rescale(8, lazy=True)
    r = refresh(view, source)
    assert last_refreshed_version(view) == source.snapshot().version
    assert view_state(view) == before == oracle(source)


def test_refresh_across_lazy_rescale_with_data(spark, tmp_path):
    """Range containing a lazy rescale AND data commits on the new modulus
    still diffs correctly (bucket sets mapped between moduli)."""
    source = make_source(spark, tmp_path)
    view = make_view(spark, tmp_path, source)
    apply(spark, source, [ev("a", 1, "en", 1), ev("b", 1, "de", 2)], "b1")
    source.rescale(8, lazy=True)
    apply(spark, source, [ev("a", 2, "en", 5), ev("c", 2, "fr", 3)], "b2")
    refresh(view, source)
    assert view_state(view) == oracle(source) == {
        "en": (1, 5), "de": (1, 2), "fr": (1, 3)}


def test_retention_error_and_rebuild(spark, tmp_path):
    source = make_source(spark, tmp_path)
    view = make_view(spark, tmp_path, source)
    for i in range(12):
        apply(spark, source, [ev(f"k{i}", i + 1, "en", i)], f"b{i}")
    source.expire_snapshots(keep_last=3)
    with pytest.raises(MaterializeRetentionError):
        refresh(view, source)
    rebuild(view, source)
    assert view_state(view) == oracle(source)
    # after rebuild, incremental refresh picks up from the current version
    apply(spark, source, [ev("k0", 100, "de", 42)], "bx")
    refresh(view, source)
    assert view_state(view) == oracle(source)


def test_rebuild_deletes_vanished_groups(spark, tmp_path):
    source = make_source(spark, tmp_path)
    view = make_view(spark, tmp_path, source)
    apply(spark, source, [ev("a", 1, "en", 1), ev("b", 1, "de", 2)], "b1")
    refresh(view, source)
    apply(spark, source, [ev("b", 2, "de", 2, op="delete")], "b2")
    rebuild(view, source)
    assert view_state(view) == oracle(source) == {"en": (1, 1)}


def test_null_group_values_key_distinctly(spark, tmp_path):
    source = make_source(spark, tmp_path)
    view = make_view(spark, tmp_path, source)
    apply(spark, source, [ev("a", 1, None, 1), ev("b", 1, "", 2)], "b1")
    refresh(view, source)
    st = view_state(view)
    assert st == oracle(source)
    assert st[None] == (1, 1) and st[""] == (1, 2)


def test_refresh_prunes_source_read(spark, tmp_path):
    """The pre/post scans read only the buckets touched by the range, not
    the whole source — the scale contract."""
    source = make_source(spark, tmp_path, mode_buckets=8)
    view = make_view(spark, tmp_path, source)
    rows = [ev(f"k{i}", 1, "en", i) for i in range(64)]
    apply(spark, source, rows, "b1")
    refresh(view, source)
    from_v = source.snapshot().version
    apply(spark, source, [ev("k1", 2, "fr", 99)], "b2")
    to_v = source.snapshot().version

    from geomesa_nifi_spark.lake.materialize import _map_buckets, _touched_in_range

    touched, any_data = _touched_in_range(source, from_v, to_v)
    assert any_data
    nb = int(source.snapshot(to_v).properties["num_buckets"])
    want = {b for (m, b) in touched}
    all_b = {f.bucket for f in source.snapshot(to_v).files}
    assert len(want) < len(all_b), "single-key batch must not touch every bucket"
    # and the mapped scan file set is smaller than the full snapshot
    files = source.candidate_files(buckets=sorted(want), snapshot=source.snapshot(to_v))
    assert len(files) < len(source.snapshot(to_v).files)
    refresh(view, source)
    assert view_state(view) == oracle(source)


def test_refresh_across_eager_rescale_falls_back_to_full(spark, tmp_path):
    """An eager rescale inside the range makes bucket sets incommensurable
    (4 -> 6 is not an integer factor): refresh must fall back to full
    pre/post scans and still match."""
    source = make_source(spark, tmp_path)
    view = make_view(spark, tmp_path, source)
    apply(spark, source, [ev("a", 1, "en", 1), ev("b", 1, "de", 2)], "b1")
    refresh(view, source)
    source.rescale(6)
    apply(spark, source, [ev("a", 2, "fr", 9), ev("c", 2, "de", 4)], "b2")
    refresh(view, source)
    assert view_state(view) == oracle(source) == {
        "fr": (1, 9), "de": (2, 6)}


def test_refresh_pruning_sound_when_residues_split(spark, tmp_path):
    """Regression: after a lazy rescale 4 -> 8, a commit touching only
    bucket b (mod 8) must not decrement unchanged keys in the sibling
    bucket b+4 (mod 8) — pre/post scans have to cover identical key sets
    even though their moduli differ."""
    source = make_source(spark, tmp_path)
    view = make_view(spark, tmp_path, source)

    # deterministically find two keys that collide mod 4 but split mod 8
    cand = [f"url{i}" for i in range(64)]
    hs = {
        r["u"]: (r["b4"], r["b8"])
        for r in spark.createDataFrame([(c,) for c in cand], "u string")
        .select("u", F.pmod(F.xxhash64("u"), F.lit(4)).alias("b4"),
                F.pmod(F.xxhash64("u"), F.lit(8)).alias("b8"))
        .collect()
    }
    pair = None
    for a in cand:
        for b in cand:
            if a != b and hs[a][0] == hs[b][0] and hs[a][1] != hs[b][1]:
                pair = (a, b)
                break
        if pair:
            break
    changed, untouched = pair

    apply(spark, source, [ev(changed, 1, "en", 10), ev(untouched, 1, "de", 7)], "b1")
    refresh(view, source)
    source.rescale(8, lazy=True)
    # MoR: no sibling closure, so only `changed`'s mod-8 bucket is touched
    apply(spark, source, [ev(changed, 2, "fr", 3)], "b2", mode="mor")
    refresh(view, source)
    assert view_state(view) == oracle(source) == {"fr": (1, 3), "de": (1, 7)}


def test_view_on_evolved_column_refreshes_from_v0(spark, tmp_path):
    """A view grouping on a column ADDED by schema evolution must refresh
    across pre-evolution snapshots (old versions lack the column; padded
    with nulls exactly like evolved reads of old files)."""
    source = LakeTable.create(
        spark, str(tmp_path / "src"),
        T.StructType([f for f in SCHEMA.fields if f.name != "lang"]),
        key_col="url", ts_col="warc_ts", tiebreak_col="offset", num_buckets=4,
    )
    old_rows = [
        Row(url="a", warc_ts=ts(1), offset=1, tokens=5, op="upsert"),
        Row(url="b", warc_ts=ts(1), offset=2, tokens=6, op="upsert"),
    ]
    df = spark.createDataFrame(
        old_rows,
        T.StructType([f for f in SCHEMA.fields if f.name != "lang"]
                     + [T.StructField("op", T.StringType())]),
    )
    merge_changes(source, df, batch_id="b1", auto_compact=False)
    source.evolve_schema(SCHEMA)  # adds lang
    apply(spark, source, [ev("c", 2, "en", 7)], "b2")

    view = make_view(spark, tmp_path, source)
    refresh(view, source)  # range spans the pre-evolution commit
    assert view_state(view) == oracle(source) == {None: (2, 11), "en": (1, 7)}


# ---------------------------------------------------------------------------
# min/max extremal metrics (semi-maintainable: delta case analysis with a
# bounded per-group re-read when a touched bucket held the current extreme)
# ---------------------------------------------------------------------------


def make_minmax_view(spark, tmp_path, source, name="mvx"):
    return create_aggregate_view(
        spark, str(tmp_path / name), source,
        group_cols=["lang"],
        metrics={
            "n": "count",
            "tok": ("sum", "tokens"),
            "lo": ("min", "tokens"),
            "hi": ("max", "tokens"),
        },
        num_buckets=4,
    )


def minmax_oracle(source):
    rows = (
        source.scan()
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("tokens").alias("tok"),
            F.min("tokens").alias("lo"),
            F.max("tokens").alias("hi"),
        )
        .collect()
    )
    return {r["lang"]: (r["n"], r["tok"], r["lo"], r["hi"]) for r in rows}


def minmax_state(view):
    return {
        r["lang"]: (r["n"], r["tok"], r["lo"], r["hi"])
        for r in view.scan().select("lang", "n", "tok", "lo", "hi").collect()
    }


def _last_reread(view):
    snap = view.snapshot()
    return (snap.summary.get("lineage") or {}).get("mv_reread_groups")


def test_minmax_insert_only_no_reread(spark, tmp_path):
    """Growing extremes resolve from the delta alone (a new extreme always
    wins) — no re-read pass."""
    src = make_source(spark, tmp_path)
    view = make_minmax_view(spark, tmp_path, src)
    apply(spark, src, [ev(f"a{i}", i, "en", 100 + i) for i in range(6)], "b0")
    refresh(view, src)
    assert minmax_state(view) == minmax_oracle(src)
    assert _last_reread(view) == 0
    # a new global min and max in one batch
    apply(spark, src, [ev("low", 10, "en", 1), ev("high", 11, "en", 999)], "b1")
    refresh(view, src)
    assert minmax_state(view) == minmax_oracle(src)
    assert _last_reread(view) == 0


def test_minmax_delete_of_extreme_triggers_bounded_reread(spark, tmp_path):
    """Deleting the row that held the group's min forces a re-read of that
    group only; the refreshed value matches the recompute oracle."""
    src = make_source(spark, tmp_path)
    view = make_minmax_view(spark, tmp_path, src)
    apply(spark, src, [ev(f"a{i}", i, "en", 100 + 10 * i) for i in range(5)]
          + [ev(f"b{i}", i, "de", 500 + i) for i in range(3)], "b0")
    refresh(view, src)
    # a0 holds en's min (100): delete it
    apply(spark, src, [ev("a0", 50, "en", 0, op="delete")], "b1")
    refresh(view, src)
    assert minmax_state(view) == minmax_oracle(src)
    assert minmax_state(view)["en"][2] == 110
    assert _last_reread(view) == 1  # only the en group re-read


def test_minmax_update_moving_extreme_away(spark, tmp_path):
    """An LWW update that REPLACES the extreme value (same key, higher ts,
    larger tokens) is a delete+insert in the diff: min must recover via
    re-read, max via the delta."""
    src = make_source(spark, tmp_path)
    view = make_minmax_view(spark, tmp_path, src)
    apply(spark, src, [ev("u1", 1, "en", 5), ev("u2", 2, "en", 50)], "b0")
    refresh(view, src)
    assert minmax_state(view)["en"] == (2, 55, 5, 50)
    apply(spark, src, [ev("u1", 10, "en", 70)], "b1")  # 5 -> 70
    refresh(view, src)
    assert minmax_state(view) == minmax_oracle(src)
    assert minmax_state(view)["en"] == (2, 120, 50, 70)


def test_minmax_group_vanish_and_return(spark, tmp_path):
    src = make_source(spark, tmp_path)
    view = make_minmax_view(spark, tmp_path, src)
    apply(spark, src, [ev("x1", 1, "fr", 42)], "b0")
    refresh(view, src)
    apply(spark, src, [ev("x1", 2, "fr", 0, op="delete")], "b1")
    refresh(view, src)
    assert "fr" not in minmax_state(view)
    assert minmax_state(view) == minmax_oracle(src)
    apply(spark, src, [ev("x2", 3, "fr", 7)], "b2")
    refresh(view, src)
    assert minmax_state(view)["fr"] == (1, 7, 7, 7)


def test_minmax_matches_rebuild_over_scrambled_history(spark, tmp_path):
    """Many batches of mixed upserts/deletes, refreshed incrementally,
    equals a from-scratch rebuild on a second view."""
    import random

    rng = random.Random(7)
    src = make_source(spark, tmp_path)
    view = make_minmax_view(spark, tmp_path, src)
    langs = ["en", "de", "fr"]
    i = 0
    for b in range(6):
        rows = []
        for _ in range(12):
            i += 1
            key = f"k{rng.randrange(20)}"
            op = "delete" if rng.random() < 0.3 else "upsert"
            rows.append(ev(key, i, langs[rng.randrange(3)], rng.randrange(1000), op=op))
        apply(spark, src, rows, f"b{b}", mode="mor" if b % 2 else "cow")
        refresh(view, src)
        assert minmax_state(view) == minmax_oracle(src), f"diverged at batch {b}"
    view2 = make_minmax_view(spark, tmp_path, src, name="mvx2")
    rebuild(view2, src)
    assert minmax_state(view2) == minmax_state(view)


def test_minmax_unorderable_type_rejected(spark, tmp_path):
    src = make_source(spark, tmp_path)
    bad = T.StructType(list(SCHEMA.fields) + [T.StructField("blob", T.BinaryType())])
    src2 = LakeTable.create(
        spark, str(tmp_path / "src2"), bad,
        key_col="url", ts_col="warc_ts", tiebreak_col="offset", num_buckets=4,
    )
    with pytest.raises(ValueError, match="unorderable"):
        create_aggregate_view(
            spark, str(tmp_path / "mvbad"), src2,
            group_cols=["lang"],
            metrics={"n": "count", "m": ("min", "blob")},
        )
