"""spark-submit driver (`python -m geomesa_nifi_spark`): table lifecycle +
replay end-to-end through the CLI surface (north rule: runs via
spark-submit --py-files; local smoke here, master inherited under submit)."""

from __future__ import annotations

import datetime as dt
import json

from geomesa_nifi_spark.cli import main


def _write_changes(spark, path):
    rows = [
        ("u1", dt.datetime(2024, 1, 1, 0, 0, 10), 1, "v1", "upsert"),
        ("u2", dt.datetime(2024, 1, 1, 0, 0, 10), 2, "w1", "upsert"),
        ("u1", dt.datetime(2024, 1, 1, 0, 0, 20), 3, "v2", "upsert"),
        ("u2", dt.datetime(2024, 1, 1, 0, 0, 5), 4, "late", "upsert"),
    ]
    spark.createDataFrame(
        rows, "url string, warc_ts timestamp, offset long, text string, op string"
    ).write.parquet(str(path))


def test_cli_lifecycle(spark, tmp_path, capsys):
    table = str(tmp_path / "t")
    rc = main([
        "create-table", "--table", table,
        "--schema", "url string, warc_ts timestamp, offset long, text string",
        "--key", "url", "--ts", "warc_ts", "--tiebreak", "offset",
        "--buckets", "4",
    ])
    assert rc == 0
    assert json.loads(capsys.readouterr().out.strip().splitlines()[-1])["version"] == 0

    _write_changes(spark, tmp_path / "changes")
    rc = main([
        "replay", "--table", table, "--source", str(tmp_path / "changes"),
        "--checkpoint", str(tmp_path / "ckpt"), "--mode", "mor", "--no-extract",
        "--max-files-per-trigger", "10",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # rows counts per-partition offset lineage, which this source (no
    # `partition` column) doesn't carry — batch count + final state are
    # the CLI-level contract here
    assert out["batches"] >= 1 and out["skipped"] == 0

    rc = main(["compact", "--table", table])
    assert rc == 0
    capsys.readouterr()
    rc = main(["show", "--table", table])
    assert rc == 0
    shown = json.loads(capsys.readouterr().out.strip())
    assert shown["rows"] == 2  # LWW winners (late u2 lost, then compacted)
    assert shown["last_operation"] == "compact"

    rc = main(["scan", "--table", table, "--where", "url=u1", "--explain-pruning"])
    assert rc == 0
    lines = capsys.readouterr().out.strip().splitlines()
    rows = [json.loads(l) for l in lines]
    assert len(rows) == 1 and rows[0]["url"] == "u1" and rows[0]["text"] == "v2"

    rc = main(["vacuum", "--table", table, "--keep-last", "1"])
    assert rc == 0
    vac = json.loads(capsys.readouterr().out.strip())
    assert "changelog_files_gced" in vac


def test_cli_sft_spec_schema(spark, tmp_path, capsys):
    table = str(tmp_path / "sft")
    rc = main([
        "create-table", "--table", table, "--sft",
        "--schema", "url:String,warc_ts:Date,text:String",
        "--key", "url",
    ])
    assert rc == 0
    from geomesa_nifi_spark.lake import LakeTable

    t = LakeTable(spark, table)
    assert t.ts_col == "warc_ts"  # dtg inferred from the declared Date field


def test_module_entry_subprocess(tmp_path):
    """`python -m geomesa_nifi_spark` — the exact spark-submit surface —
    wires to the CLI (subprocess, fresh interpreter)."""
    import os
    import subprocess
    import sys

    env = dict(os.environ, SPARK_GRAFT_CPUS="2")
    out = subprocess.run(
        [sys.executable, "-m", "geomesa_nifi_spark", "create-table",
         "--table", str(tmp_path / "m"), "--schema", "k string, v long",
         "--key", "k"],
        capture_output=True, text=True, timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))), env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert json.loads(out.stdout.strip().splitlines()[-1])["version"] == 0


def test_cli_lazy_rescale_and_migrate(spark, tmp_path, capsys):
    table = str(tmp_path / "t")
    assert main([
        "create-table", "--table", table,
        "--schema", "url string, warc_ts timestamp, offset long, text string",
        "--key", "url", "--ts", "warc_ts", "--tiebreak", "offset",
        "--buckets", "4",
    ]) == 0
    _write_changes(spark, tmp_path / "changes")
    assert main([
        "replay", "--table", table, "--source", str(tmp_path / "changes"),
        "--checkpoint", str(tmp_path / "ckpt"), "--no-extract",
        "--max-files-per-trigger", "10",
    ]) == 0
    capsys.readouterr()

    assert main(["rescale", "--table", table, "--buckets", "16", "--lazy"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["lazy"] and out["to_buckets"] == 16 and out["stamped_files"] > 0

    assert main(["migrate", "--table", table, "--groups-per-commit", "1"]) == 0
    mig = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert mig["remaining_debt_files"] == 0

    assert main(["scan", "--table", table, "--where", "url=u1"]) == 0
    rows = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert len(rows) == 1 and rows[0]["text"] == "v2"


def test_cli_mv_create_and_refresh(spark, tmp_path, capsys):
    table = str(tmp_path / "t")
    assert main([
        "create-table", "--table", table,
        "--schema", "url string, warc_ts timestamp, offset long, text string",
        "--key", "url", "--ts", "warc_ts", "--tiebreak", "offset",
        "--buckets", "4",
    ]) == 0
    _write_changes(spark, tmp_path / "changes")
    assert main([
        "replay", "--table", table, "--source", str(tmp_path / "changes"),
        "--checkpoint", str(tmp_path / "ckpt"), "--no-extract",
        "--max-files-per-trigger", "10",
    ]) == 0
    capsys.readouterr()

    view = str(tmp_path / "mv")
    assert main([
        "mv-create", "--view", view, "--source", table,
        "--group-by", "text", "--sum", "total=offset", "--buckets", "2",
    ]) == 0
    created = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert created["metrics"] == ["n", "total"]

    assert main(["mv-refresh", "--view", view]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert not out["skipped"] and out["source_version"] > 0

    # refresh again with no new source commits -> skip, version unchanged
    assert main(["mv-refresh", "--view", view]) == 0
    again = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert again["skipped"] and again["view_version"] == out["view_version"]

    from geomesa_nifi_spark.lake import LakeTable

    got = {
        (r["text"], r["n"], r["total"])
        for r in LakeTable(spark, view).scan().select("text", "n", "total").collect()
    }
    assert got == {("v2", 1, 3), ("w1", 1, 2)}


def test_cli_clustered_compact_and_export_changes(spark, tmp_path, capsys):
    table = str(tmp_path / "t")
    assert main([
        "create-table", "--table", table,
        "--schema", "url string, warc_ts timestamp, offset long, text string",
        "--key", "url", "--ts", "warc_ts", "--tiebreak", "offset",
        "--buckets", "2",
    ]) == 0
    _write_changes(spark, tmp_path / "changes")
    assert main([
        "replay", "--table", table, "--source", str(tmp_path / "changes"),
        "--checkpoint", str(tmp_path / "ckpt"), "--mode", "mor", "--no-extract",
        "--max-files-per-trigger", "10",
    ]) == 0
    capsys.readouterr()

    rc = main(["compact", "--table", table, "--cluster-by", "offset,warc_ts"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["clustered_by"] == ["offset", "warc_ts"]

    # egress the whole changelog to a directory; decode must round-trip
    dest = str(tmp_path / "egress")
    rc = main([
        "export-changes", "--table", table, "--value-format", "avro",
        "--out", dest,
    ])
    assert rc == 0
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["sink"] == dest and "url" in info["value_schema_ddl"]

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from geomesa_nifi_spark.streaming.kafka import kafka_records_to_changes

    value_schema = T.StructType.fromDDL(
        "url string, warc_ts timestamp, offset long, text string, "
        "_commit_version int, _batch_id string, op string"
    )
    msgs = spark.read.parquet(dest)
    shaped = msgs.select(
        "key", "value", F.lit("t").alias("topic"), F.lit(0).alias("partition"),
        F.monotonically_increasing_id().alias("offset"),
        F.current_timestamp().alias("timestamp"), F.lit(0).alias("timestampType"),
    )
    back = kafka_records_to_changes(
        shaped, value_schema, include_lineage=False, value_format="avro"
    )
    # single-batch replay: the delta (and so the changelog) carries the
    # batch-local LWW winner per key — u1's offset-3 update and u2's
    # first write (the late offset-4 row lost)
    assert {(r["url"], r["offset"]) for r in back.collect()} == {
        ("u1", 3), ("u2", 2),
    }

    # argument validation
    assert main(["export-changes", "--table", table]) == 2
    assert main(["export-changes", "--table", table, "--brokers", "b:9092"]) == 2


def test_cli_index_create_refresh_lookup(spark, tmp_path, capsys):
    table = str(tmp_path / "t")
    assert main([
        "create-table", "--table", table,
        "--schema", "url string, warc_ts timestamp, offset long, text string",
        "--key", "url", "--ts", "warc_ts", "--tiebreak", "offset",
        "--buckets", "4",
    ]) == 0
    _write_changes(spark, tmp_path / "changes")
    assert main([
        "replay", "--table", table, "--source", str(tmp_path / "changes"),
        "--checkpoint", str(tmp_path / "ckpt"), "--no-extract",
        "--max-files-per-trigger", "10",
    ]) == 0
    capsys.readouterr()

    index = str(tmp_path / "idx")
    assert main([
        "index-create", "--index", index, "--source", table,
        "--column", "text", "--buckets", "2",
    ]) == 0
    created = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert created["column"] == "text" and created["buckets"] == 2

    assert main(["index-refresh", "--index", index]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert not out["skipped"] and out["source_version"] > 0

    # idempotent: no new source commits -> skip
    assert main(["index-refresh", "--index", index]) == 0
    again = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert again["skipped"]

    assert main(["index-lookup", "--index", index, "--values", "v2,late"]) == 0
    rows = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    # LWW state: u1 -> v2 (later offset wins), u2 -> w1; 'late' lost
    assert {(r["url"], r["text"]) for r in rows} == {("u1", "v2")}


def test_cli_tag_and_rollback(spark, tmp_path, capsys):
    from geomesa_nifi_spark.lake import LakeTable, merge_changes
    from pyspark.sql import functions as F

    table = str(tmp_path / "t")
    rc = main([
        "create-table", "--table", table,
        "--schema", "url string, warc_ts timestamp, offset long, text string",
        "--key", "url", "--ts", "warc_ts", "--tiebreak", "offset",
        "--buckets", "4",
    ])
    assert rc == 0
    capsys.readouterr()

    t = LakeTable(spark, table)
    src = spark.range(20).select(
        F.concat(F.lit("u"), (F.col("id") % 5).cast("string")).alias("url"),
        F.timestamp_micros(F.col("id") * 1_000_000).alias("warc_ts"),
        F.col("id").alias("offset"),
        F.lit("x").alias("text"),
        F.lit("upsert").alias("op"),
    )
    merge_changes(t, src, batch_id="b1")
    good = t.snapshot().version

    rc = main(["tag", "--table", table, "--name", "prod"])
    assert rc == 0
    assert json.loads(capsys.readouterr().out.strip())["version"] == good

    merge_changes(
        t,
        spark.createDataFrame(
            [("u0", dt.datetime(2030, 1, 1), 999, "BAD", "upsert")],
            "url string, warc_ts timestamp, offset long, text string, op string",
        ),
        batch_id="bad",
    )
    rc = main(["rollback", "--table", table, "--tag", "prod"])
    assert rc == 0
    rb = json.loads(capsys.readouterr().out.strip())
    assert rb["rollback_of"] == good
    assert t.scan().filter("text = 'BAD'").count() == 0

    rc = main(["tags", "--table", table])
    assert rc == 0
    assert json.loads(capsys.readouterr().out.strip()) == {"prod": good}

    rc = main(["tag", "--table", table, "--name", "prod", "--delete"])
    assert rc == 0
    capsys.readouterr()


def test_cli_delete_where(spark, tmp_path, capsys):
    from geomesa_nifi_spark.lake import LakeTable

    table = str(tmp_path / "t")
    main([
        "create-table", "--table", table,
        "--schema", "url string, warc_ts timestamp, offset long, text string",
        "--key", "url", "--ts", "warc_ts", "--tiebreak", "offset",
        "--buckets", "4",
    ])
    _write_changes(spark, tmp_path / "changes")
    main([
        "replay", "--table", table, "--source", str(tmp_path / "changes"),
        "--checkpoint", str(tmp_path / "ckpt"), "--no-extract",
    ])
    capsys.readouterr()
    rc = main(["delete-where", "--table", table, "--where", "text='v2'"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["version"] >= 2
    t = LakeTable(spark, table)
    assert t.scan().filter("text = 'v2'").count() == 0
    assert t.scan().count() == 1  # u2 survives


def test_cli_branch_publish_drop(spark, tmp_path, capsys):
    from geomesa_nifi_spark.lake import LakeTable, merge_changes
    from pyspark.sql import functions as F

    table = str(tmp_path / "t")
    main([
        "create-table", "--table", table,
        "--schema", "url string, warc_ts timestamp, offset long, text string",
        "--key", "url", "--ts", "warc_ts", "--tiebreak", "offset",
        "--buckets", "4",
    ])
    capsys.readouterr()
    t = LakeTable(spark, table)
    src = spark.range(10).select(
        F.concat(F.lit("u"), (F.col("id") % 5).cast("string")).alias("url"),
        F.timestamp_micros(F.col("id") * 1_000_000).alias("warc_ts"),
        F.col("id").alias("offset"),
        F.lit("x").alias("text"),
        F.lit("upsert").alias("op"),
    )
    merge_changes(t, src, batch_id="b1")
    head = t.snapshot().version

    assert main(["branch", "--table", table, "audit"]) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["branch"] == "audit"

    # stage a batch on the branch (library path), publish via CLI
    merge_changes(
        t.for_branch("audit"),
        src.withColumn("text", F.lit("staged")).withColumn(
            "offset", F.col("offset") + 100
        ),
        batch_id="s1",
    )
    assert t.snapshot().version == head  # main untouched

    assert main(["branches", "--table", table]) == 0
    heads = json.loads(capsys.readouterr().out)
    assert set(heads) == {"main", "audit"}

    assert main(["publish", "--table", table, "audit"]) == 0
    pub = json.loads(capsys.readouterr().out.strip())
    assert pub["published_branch"] == "audit"
    assert t.scan().filter("text = 'staged'").count() == 5

    assert main(["branch", "--table", table, "audit", "--delete"]) == 0
    assert json.loads(capsys.readouterr().out.strip())["dropped"] == "audit"
    assert set(t.branches()) == {"main"}


def test_cli_bootstrap_cluster_and_ro_pruning(spark, tmp_path, capsys):
    """--cluster-by/--cluster-bits reach bootstrap_load, and
    --explain-pruning under --read-optimized counts only the files the
    read-optimized scan actually opens (deltas excluded)."""
    from pyspark.sql import functions as F

    from geomesa_nifi_spark.lake import LakeTable, merge_changes

    table = str(tmp_path / "t")
    main([
        "create-table", "--table", table,
        "--schema", "url string, warc_ts timestamp, offset long, text string",
        "--key", "url", "--ts", "warc_ts", "--tiebreak", "offset",
        "--buckets", "4",
    ])
    capsys.readouterr()
    src = str(tmp_path / "snap.parquet")
    spark.range(40).select(
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("url"),
        F.timestamp_micros(F.col("id") * 1_000_000).alias("warc_ts"),
        F.col("id").alias("offset"),
        F.lit("x").alias("text"),
    ).write.parquet(src)
    rc = main([
        "bootstrap", "--table", table, "--source", src, "--offset-hwm", "39",
        "--cluster-by", "offset,warc_ts", "--cluster-bits", "16",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["bootstrapped"] == 40
    t = LakeTable(spark, table)
    assert t.snapshot().summary["clustered_by"] == ["offset", "warc_ts"]

    # add uncompacted MoR deltas, then compare pruning counts
    ch = spark.range(5).select(
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("url"),
        F.timestamp_micros((F.col("id") + 100) * 1_000_000).alias("warc_ts"),
        (F.col("id") + 100).alias("offset"),
        F.lit("y").alias("text"),
        F.lit("upsert").alias("op"),
    )
    merge_changes(t, ch, batch_id="d1", mode="mor", auto_compact=False)
    n_delta = sum(1 for f in t.snapshot().files if f.kind == "delta")
    assert n_delta > 0
    capsys.readouterr()
    assert main(["scan", "--table", table, "--explain-pruning", "--limit", "50"]) == 0
    cap = capsys.readouterr()
    full = json.loads(cap.err.strip().splitlines()[-1])
    assert main(["scan", "--table", table, "--explain-pruning",
                 "--read-optimized", "--limit", "50"]) == 0
    cap = capsys.readouterr()
    ro = json.loads(cap.err.strip().splitlines()[-1])
    assert ro["files_total"] == full["files_total"]
    assert ro["files_after_pruning"] == full["files_after_pruning"] - n_delta
