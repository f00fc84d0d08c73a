"""spark-submit entry point: `python -m geomesa_nifi_spark <cmd>`.

The north rule requires the engine to run "via spark-submit --py-files on
multi-executor clusters"; this module is that driver.  Typical cluster
invocation:

    zip -r gns.zip geomesa_nifi_spark
    spark-submit --py-files gns.zip -m geomesa_nifi_spark ...   # or:
    spark-submit --py-files gns.zip cli_shim.py replay \\
        --table /lake/pages --source /ingest/changes \\
        --checkpoint /lake/_ckpt/pages --mode mor

When launched under spark-submit the session inherits the submitted
master/conf (we never override a cluster master with local[*]); standalone
invocations fall back to local mode for smoke runs.

Commands:
  create-table  — declare a table (StructType DDL or a GeoMesa SFT spec)
  replay        — checkpoint-resumable CDC replay of a change-file stream
  compact       — fold merge-on-read deltas into base files
                  (--cluster-by: Z-order/linear layout rewrite)
  export-changes — changelog version range -> Kafka-shaped (key,value)
                  messages (parquet dir, or a broker with the kafka jar)
  rescale       — rewrite the table under a new bucket count
                  (--lazy: metadata-only stamp, migrate on touch)
  migrate       — pay down lazy-rescale debt in bounded commits
  mv-create     — declare an incremental aggregate view over a table
  mv-refresh    — advance a view to the source head (incremental)
  index-create  — declare an attribute index table over a column
  index-refresh — advance an attribute index to the source head (exact diff)
  index-lookup  — equality lookup routed through an attribute index
  vacuum        — expire snapshots, GC retained changelog files, delete
                  unreferenced data files
  show          — table state summary (version, schema, per-bucket stats)
  scan          — predicate scan (zone-map pruned) printed as JSON lines
  inspect       — metadata tables (files / snapshots / partitions) as JSON
  bootstrap     — bulk-load a source snapshot into an empty table with a
                  recorded stream position (snapshot-then-tail handoff)
"""

from __future__ import annotations

import argparse
import json
import sys


def _spark(app: str):
    # Under spark-submit, master/conf come from the submit command; the
    # builder must not override them.  get_spark only sets engine-required
    # session confs (UTC, AQE, parquet NTZ inference).
    from geomesa_nifi_spark.session import get_spark

    return get_spark(app, master=None)


def _cmd_create_table(args) -> int:
    from geomesa_nifi_spark.lake import LakeTable

    spark = _spark("gns-create-table")
    schema = args.schema
    if not args.sft:
        from pyspark.sql import types as T

        schema = T.StructType.fromDDL(schema)
    table = LakeTable.create(
        spark,
        args.table,
        schema,
        key_col=args.key,
        ts_col=args.ts,
        tiebreak_col=args.tiebreak,
        num_buckets=args.buckets,
        if_not_exists=args.if_not_exists,
    )
    print(json.dumps({"table": args.table, "version": table.snapshot().version}))
    return 0


def _cmd_replay(args) -> int:
    from geomesa_nifi_spark.lake import LakeTable
    from geomesa_nifi_spark.streaming.pipeline import run_file_replay

    spark = _spark("gns-replay")
    table = LakeTable(spark, args.table)
    stats = run_file_replay(
        spark,
        table,
        source_dir=args.source,
        checkpoint_dir=args.checkpoint,
        pipeline_id=args.pipeline_id,
        max_files_per_trigger=args.max_files_per_trigger,
        extract=not args.no_extract,
        write_mode=args.mode,
        metrics_path=args.metrics,
        quarantine_dir=args.quarantine,
    )
    print(
        json.dumps(
            {
                "batches": stats.batches,
                "rows": stats.rows,
                "skipped": stats.skipped,
                "version": table.snapshot().version,
            }
        )
    )
    return 0


def _cmd_compact(args) -> int:
    from geomesa_nifi_spark.lake import LakeTable, compact

    spark = _spark("gns-compact")
    table = LakeTable(spark, args.table)
    cluster_by = (
        [c.strip() for c in args.cluster_by.split(",") if c.strip()]
        if args.cluster_by
        else None
    )
    snap = compact(
        table, drop_tombstones=args.drop_tombstones, cluster_by=cluster_by
    )
    out = {"version": snap.version}
    if cluster_by:
        out["clustered_by"] = cluster_by
    print(json.dumps(out))
    return 0


def _cmd_export_changes(args) -> int:
    """Changelog egress: version range -> Kafka-shaped (key, value)
    messages, written to a directory (parquet) or a live broker when
    --brokers is given (requires the spark-sql-kafka jar)."""
    from geomesa_nifi_spark.lake import LakeTable
    from geomesa_nifi_spark.streaming.kafka import (
        kafka_sink_options,
        table_changes_to_kafka,
    )

    if args.brokers:
        if not args.topic:
            print("export-changes: --brokers requires --topic", file=sys.stderr)
            return 2
    elif not args.out:
        print("export-changes: need --out or --brokers/--topic", file=sys.stderr)
        return 2
    spark = _spark("gns-export-changes")
    table = LakeTable(spark, args.table)
    recs, value_schema = table_changes_to_kafka(
        table,
        from_version=args.from_version,
        to_version=args.to_version,
        value_format=args.value_format,
        records_per_message=args.records_per_message,
    )
    if args.brokers:
        plan = kafka_sink_options({"brokers": args.brokers, "topic": args.topic})
        writer = recs.write.format("kafka")
        for k, v in plan.options.items():
            writer = writer.option(k, v)
        writer.save()
        sink = f"kafka://{args.topic}"
    else:
        recs.write.mode("errorifexists").parquet(args.out)
        sink = args.out
    print(
        json.dumps(
            {
                "sink": sink,
                "value_format": args.value_format,
                "value_schema_ddl": value_schema.simpleString(),
            }
        )
    )
    return 0


def _cmd_rescale(args) -> int:
    from geomesa_nifi_spark.lake import LakeTable

    spark = _spark("gns-rescale")
    table = LakeTable(spark, args.table)
    old = table.num_buckets
    snap = table.rescale(args.buckets, lazy=args.lazy)
    out = {
        "version": snap.version,
        "from_buckets": old,
        "to_buckets": args.buckets,
        "lazy": args.lazy,
    }
    if args.lazy:
        out["stamped_files"] = snap.summary.get("stamped_files")
    print(json.dumps(out))
    return 0


def _cmd_mv_create(args) -> int:
    from geomesa_nifi_spark.lake import LakeTable, create_aggregate_view

    spark = _spark("gns-mv-create")
    source = LakeTable(spark, args.source)
    metrics: dict = {"n": "count"}
    for spec in args.sum or []:
        out, col = spec.split("=", 1) if "=" in spec else (f"sum_{spec}", spec)
        metrics[out] = ("sum", col)
    view = create_aggregate_view(
        spark, args.view, source,
        group_cols=args.group_by.split(","),
        metrics=metrics,
        num_buckets=args.buckets,
    )
    print(json.dumps({"view": view.root, "group_by": args.group_by,
                      "metrics": sorted(metrics)}))
    return 0


def _cmd_mv_refresh(args) -> int:
    from geomesa_nifi_spark.lake import (
        LakeTable,
        MaterializeRetentionError,
        last_refreshed_version,
        rebuild,
        refresh,
    )

    spark = _spark("gns-mv-refresh")
    view = LakeTable(spark, args.view)
    source = LakeTable(spark, view.snapshot().properties["mv.source_root"])
    try:
        r = refresh(view, source)
    except MaterializeRetentionError:
        if not args.rebuild_on_horizon:
            raise
        r = rebuild(view, source)
    print(json.dumps({
        "skipped": r.skipped,
        "source_version": last_refreshed_version(view),
        "view_version": view.snapshot().version,
    }))
    return 0


def _cmd_index_create(args) -> int:
    from geomesa_nifi_spark.lake import LakeTable, create_attr_index

    spark = _spark("gns-index-create")
    source = LakeTable(spark, args.source)
    idx = create_attr_index(
        source, args.column, args.index,
        num_buckets=args.buckets, if_not_exists=args.if_not_exists,
    )
    print(json.dumps({"index": idx.root, "source": source.root,
                      "column": args.column, "buckets": idx.num_buckets}))
    return 0


def _cmd_index_refresh(args) -> int:
    from geomesa_nifi_spark.lake import (
        LakeTable,
        last_indexed_version,
        refresh_attr_index,
    )

    spark = _spark("gns-index-refresh")
    idx = LakeTable(spark, args.index)
    source = LakeTable(spark, idx.snapshot().properties["aidx.source_root"])
    r = refresh_attr_index(idx, source)
    print(json.dumps({
        "skipped": r.skipped,
        "source_version": last_indexed_version(idx),
        "index_version": idx.snapshot().version,
    }))
    return 0


def _cmd_index_lookup(args) -> int:
    from geomesa_nifi_spark.lake import LakeTable, index_lookup

    spark = _spark("gns-index-lookup")
    idx = LakeTable(spark, args.index)
    source = LakeTable(spark, idx.snapshot().properties["aidx.source_root"])
    df = index_lookup(source, idx, args.values.split(","), at_head=args.at_head)
    for row in df.limit(args.limit).toJSON().collect():
        print(row)
    return 0


def _cmd_migrate(args) -> int:
    from geomesa_nifi_spark.lake import LakeTable, migrate_layout

    spark = _spark("gns-migrate")
    table = LakeTable(spark, args.table)
    snap = migrate_layout(table, groups_per_commit=args.groups_per_commit)
    nb = table.num_buckets
    debt = sum(1 for f in snap.files if (f.modulus or nb) != nb)
    print(json.dumps({"version": snap.version, "remaining_debt_files": debt}))
    return 0


def _cmd_vacuum(args) -> int:
    from geomesa_nifi_spark.lake import LakeTable

    spark = _spark("gns-vacuum")
    table = LakeTable(spark, args.table)
    expired = table.expire_snapshots(
        keep_last=args.keep_last, older_than_ms=args.older_than_ms
    )
    changelog = table.gc_changelog()
    freed = table.vacuum(min_age_s=args.min_age_s)
    print(json.dumps({
        "expired_snapshots": len(expired),
        "changelog_files_gced": len(changelog),
        "deleted_files": len(freed),
    }))
    return 0


def _parse_where(exprs: list[str]) -> list[tuple]:
    """--where col=val | col<=val | col>=val | col<val | col>val (repeatable).

    Values parse as int, then float, else string; quote the value
    (``col='0123'``) to force a string literal — comparing a numeric
    literal against a string column makes Spark cast the COLUMN, which
    matches '0123' == 123 and nulls non-numeric rows."""
    out = []
    for e in exprs:
        for op in ("<=", ">=", "=", "<", ">"):
            if op in e:
                col, _, val = e.partition(op)
                val = val.strip()
                v: object
                if len(val) >= 2 and val[0] == val[-1] and val[0] in ("'", '"'):
                    v = val[1:-1]  # quoted: always a string literal
                else:
                    v = val
                    for cast in (int, float):
                        try:
                            v = cast(val)
                            break
                        except ValueError:
                            continue
                out.append((col.strip(), op, v))
                break
        else:
            raise SystemExit(f"bad --where expression: {e!r}")
    return out


def _cmd_scan(args) -> int:
    from geomesa_nifi_spark.lake import LakeTable

    spark = _spark("gns-scan")
    table = LakeTable(spark, args.table)
    where = _parse_where(args.where or [])
    if args.explain_pruning:
        snap = table.snapshot(args.version)
        cand = table.candidate_files(where=where, version=args.version)
        if args.read_optimized:
            # the scan below drops delta files too; report what it reads
            cand = [f for f in cand if f.kind != "delta"]
        print(json.dumps({
            "files_total": len(snap.files),
            "files_after_pruning": len(cand),
        }), file=sys.stderr)
    df = table.scan(
        version=args.version, where=where or None,
        read_optimized=args.read_optimized,
    )
    for row in df.limit(args.limit).toJSON().collect():
        print(row)
    return 0


def _cmd_inspect(args) -> int:
    from geomesa_nifi_spark.lake import (
        LakeTable, files_df, orphans_df, partitions_df, snapshots_df,
    )

    spark = _spark("gns-inspect")
    table = LakeTable(spark, args.table)
    df = {
        "files": lambda: files_df(table, version=args.version),
        "snapshots": lambda: snapshots_df(table, all_branches=args.all_branches),
        "partitions": lambda: partitions_df(table, version=args.version),
        "orphans": lambda: orphans_df(table),
    }[args.what]()
    for row in df.limit(args.limit).toJSON().collect():
        print(row)
    return 0


def _cmd_bootstrap(args) -> int:
    from geomesa_nifi_spark.lake import LakeTable, bootstrap_load

    spark = _spark("gns-bootstrap")
    table = LakeTable(spark, args.table)
    src = spark.read.parquet(args.source)
    cluster_by = (
        [c.strip() for c in args.cluster_by.split(",") if c.strip()]
        if args.cluster_by
        else None
    )
    res = bootstrap_load(
        table,
        src,
        batch_id=args.batch_id,
        offset_hwm=args.offset_hwm,
        op_col=args.op_col,
        cluster_by=cluster_by,
        cluster_bits=args.cluster_bits,
    )
    print(json.dumps({
        "skipped": res.skipped,
        "version": res.snapshot.version if res.snapshot else None,
        **res.metrics,
    }))
    return 0


def _cmd_show(args) -> int:
    from geomesa_nifi_spark.lake import LakeTable

    spark = _spark("gns-show")
    table = LakeTable(spark, args.table)
    snap = table.snapshot()
    out = {
        "version": snap.version,
        "schema": [f.name for f in table.schema().fields],
        "files": len(snap.files),
        "rows": sum(f.rows for f in snap.files),
        "properties": snap.properties,
        "last_operation": snap.summary.get("operation"),
    }
    if args.deltas:
        out["delta_stats"] = table.delta_stats()
    print(json.dumps(out, indent=2, default=str))
    return 0


def _metadata_table(root: str):
    """A LakeTable handle for ledger-only operations (tags, rollback).

    These touch only the snapshot ledger — no DataFrame is ever built — so
    no SparkSession is started: tagging a 100 TB table is a metadata write,
    and paying a JVM spin-up for it would make the CLI useless in scripts."""
    from geomesa_nifi_spark.lake import LakeTable

    return LakeTable(None, root)  # type: ignore[arg-type]


def _cmd_delete_where(args) -> int:
    from geomesa_nifi_spark.lake import LakeTable, delete_where

    spark = _spark("gns-delete-where")
    table = LakeTable(spark, args.table)
    res = delete_where(
        table,
        _parse_where(args.where),
        batch_id=args.batch_id,
        mode=args.mode,
    )
    print(json.dumps({"version": table.snapshot().version, **{
        k: v for k, v in res.metrics.items() if isinstance(v, (int, bool, str))
    }}, default=str))
    return 0


def _cmd_tag(args) -> int:
    table = _metadata_table(args.table)
    if args.delete:
        table.delete_tag(args.name)
        print(json.dumps({"deleted": args.name}))
    else:
        v = table.create_tag(
            args.name,
            version=args.version if args.version is not None else None,
            replace=args.replace,
        )
        print(json.dumps({"tag": args.name, "version": v}))
    return 0


def _cmd_tags(args) -> int:
    print(json.dumps(_metadata_table(args.table).tags(), indent=2))
    return 0


def _cmd_rollback(args) -> int:
    table = _metadata_table(args.table)
    target = args.version if args.tag is None else args.tag
    snap = table.rollback(target)
    print(json.dumps({
        "version": snap.version,
        "rollback_of": snap.summary.get("rollback_of", snap.version),
    }))
    return 0


def _cmd_branch(args) -> int:
    table = _metadata_table(args.table)
    if args.delete:
        victims = table.drop_branch(args.name)
        print(json.dumps({"dropped": args.name, "versions": victims}))
    else:
        at = args.at
        if at is not None:
            try:
                at = int(at)
            except ValueError:
                pass  # a tag name
        b = table.create_branch(args.name, at=at)
        print(json.dumps({"branch": args.name, "head": b.snapshot().version}))
    return 0


def _cmd_branches(args) -> int:
    print(json.dumps(_metadata_table(args.table).branches(), indent=2))
    return 0


def _cmd_publish(args) -> int:
    snap = _metadata_table(args.table).publish_branch(args.name)
    print(json.dumps({
        "version": snap.version,
        "published_branch": args.name,
        "published_version": snap.summary["published_version"],
    }))
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="geomesa_nifi_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("create-table", help="declare a lake table")
    c.add_argument("--table", required=True)
    c.add_argument("--schema", required=True,
                   help="StructType DDL, or a GeoMesa SFT spec with --sft")
    c.add_argument("--sft", action="store_true",
                   help="treat --schema as an SFT spec string / config")
    c.add_argument("--key", required=True)
    c.add_argument("--ts", default=None)
    c.add_argument("--tiebreak", default=None)
    c.add_argument("--buckets", type=int, default=32)
    c.add_argument("--if-not-exists", action="store_true")
    c.set_defaults(fn=_cmd_create_table)

    r = sub.add_parser("replay", help="checkpoint-resumable CDC replay")
    r.add_argument("--table", required=True)
    r.add_argument("--source", required=True)
    r.add_argument("--checkpoint", required=True)
    r.add_argument("--pipeline-id", default="cdc")
    r.add_argument("--mode", choices=("merge", "mor", "append"), default="mor")
    r.add_argument("--max-files-per-trigger", type=int, default=1)
    r.add_argument("--no-extract", action="store_true")
    r.add_argument("--metrics", default=None)
    r.add_argument("--quarantine", default=None)
    r.set_defaults(fn=_cmd_replay)

    k = sub.add_parser("compact", help="fold MoR deltas into base files")
    k.add_argument("--table", required=True)
    k.add_argument("--drop-tombstones", action="store_true")
    k.add_argument(
        "--cluster-by", default=None,
        help="comma-separated columns: rewrite ordered by these (1 column "
             "= linear, several = Z-order) so zone maps prune attribute "
             "predicates; scope defaults to ALL buckets",
    )
    k.set_defaults(fn=_cmd_compact)

    ec = sub.add_parser(
        "export-changes",
        help="changelog -> Kafka-shaped (key,value) messages (dir or broker)",
    )
    ec.add_argument("--table", required=True)
    ec.add_argument("--from-version", type=int, default=0)
    ec.add_argument("--to-version", type=int, default=None)
    ec.add_argument("--value-format", choices=("json", "avro"), default="json")
    ec.add_argument("--records-per-message", type=int, default=500)
    ec.add_argument("--out", default=None, help="output directory (parquet)")
    ec.add_argument("--brokers", default=None, help="write to a live broker instead")
    ec.add_argument("--topic", default=None)
    ec.set_defaults(fn=_cmd_export_changes)

    rs = sub.add_parser("rescale", help="rewrite the table under a new bucket count")
    rs.add_argument("--table", required=True)
    rs.add_argument("--buckets", type=int, required=True)
    rs.add_argument(
        "--lazy", action="store_true",
        help="metadata-only: stamp old-modulus files, migrate on touch",
    )
    rs.set_defaults(fn=_cmd_rescale)

    mg = sub.add_parser(
        "migrate", help="rewrite lazy-rescale old-modulus files (bounded commits)"
    )
    mg.add_argument("--table", required=True)
    mg.add_argument("--groups-per-commit", type=int, default=64)
    mg.set_defaults(fn=_cmd_migrate)

    mvc = sub.add_parser(
        "mv-create", help="declare an incremental aggregate view over a table"
    )
    mvc.add_argument("--view", required=True)
    mvc.add_argument("--source", required=True)
    mvc.add_argument("--group-by", required=True, help="comma-separated columns")
    mvc.add_argument(
        "--sum", action="append",
        help="out_col=source_col (repeatable); count(*) column 'n' is implicit",
    )
    mvc.add_argument("--buckets", type=int, default=32)
    mvc.set_defaults(fn=_cmd_mv_create)

    ic = sub.add_parser(
        "index-create", help="declare an attribute index table over a column"
    )
    ic.add_argument("--index", required=True)
    ic.add_argument("--source", required=True)
    ic.add_argument("--column", required=True)
    ic.add_argument("--buckets", type=int, default=None)
    ic.add_argument("--if-not-exists", action="store_true")
    ic.set_defaults(fn=_cmd_index_create)

    ir = sub.add_parser(
        "index-refresh", help="advance an attribute index to the source head"
    )
    ir.add_argument("--index", required=True)
    ir.set_defaults(fn=_cmd_index_refresh)

    il = sub.add_parser(
        "index-lookup",
        help="source rows whose indexed column equals a value (JSON lines)",
    )
    il.add_argument("--index", required=True)
    il.add_argument("--values", required=True, help="comma-separated values")
    il.add_argument("--at-head", action="store_true",
                    help="read the source HEAD through the indexed keys "
                         "(async-index staleness) instead of the indexed version")
    il.add_argument("--limit", type=int, default=100)
    il.set_defaults(fn=_cmd_index_lookup)

    mvr = sub.add_parser("mv-refresh", help="advance a view to the source head")
    mvr.add_argument("--view", required=True)
    mvr.add_argument(
        "--rebuild-on-horizon", action="store_true",
        help="fall back to a full rebuild when the range was expired",
    )
    mvr.set_defaults(fn=_cmd_mv_refresh)

    v = sub.add_parser("vacuum", help="expire snapshots + delete orphans")
    v.add_argument("--table", required=True)
    v.add_argument("--keep-last", type=int, default=10)
    v.add_argument("--older-than-ms", type=int, default=None,
                   help="also require snapshots be older than this epoch-ms")
    v.add_argument("--min-age-s", type=float, default=3600.0,
                   help="grace period: skip unreferenced files younger than "
                        "this (live writers stage files before committing)")
    v.set_defaults(fn=_cmd_vacuum)

    s = sub.add_parser("show", help="table state summary")
    s.add_argument("--table", required=True)
    s.add_argument("--deltas", action="store_true")
    s.set_defaults(fn=_cmd_show)

    dw = sub.add_parser("delete-where", help="tombstone all rows matching a predicate")
    dw.add_argument("--table", required=True)
    dw.add_argument("--where", action="append", required=True,
                    help="col=val / col<val / ... (repeatable, ANDed)")
    dw.add_argument("--batch-id", default=None)
    dw.add_argument("--mode", choices=["cow", "mor"], default="cow")
    dw.set_defaults(fn=_cmd_delete_where)

    tg = sub.add_parser("tag", help="pin a snapshot version under a name")
    tg.add_argument("--table", required=True)
    tg.add_argument("--name", required=True)
    tg.add_argument("--version", type=int, default=None,
                    help="version to tag (default: current head)")
    tg.add_argument("--replace", action="store_true")
    tg.add_argument("--delete", action="store_true")
    tg.set_defaults(fn=_cmd_tag)

    tl = sub.add_parser("tags", help="list tags")
    tl.add_argument("--table", required=True)
    tl.set_defaults(fn=_cmd_tags)

    rb = sub.add_parser(
        "rollback", help="restore a prior version's state as a new commit"
    )
    rb.add_argument("--table", required=True)
    g = rb.add_mutually_exclusive_group(required=True)
    g.add_argument("--version", type=int)
    g.add_argument("--tag")
    rb.set_defaults(fn=_cmd_rollback)

    br = sub.add_parser(
        "branch", help="fork (or drop) an isolated branch for write-audit-publish"
    )
    br.add_argument("--table", required=True)
    br.add_argument("name")
    br.add_argument("--at", default=None, help="fork point: version or tag (default: head)")
    br.add_argument("--delete", action="store_true")
    br.set_defaults(fn=_cmd_branch)

    bl = sub.add_parser("branches", help="list branches -> head version")
    bl.add_argument("--table", required=True)
    bl.set_defaults(fn=_cmd_branches)

    pb = sub.add_parser(
        "publish", help="atomically fast-forward main to an audited branch head"
    )
    pb.add_argument("--table", required=True)
    pb.add_argument("name")
    pb.set_defaults(fn=_cmd_publish)

    q = sub.add_parser("scan", help="predicate scan (zone-map pruned) to JSON lines")
    q.add_argument("--table", required=True)
    q.add_argument("--version", type=int, default=None)
    q.add_argument("--where", action="append",
                   help="col=val / col<=val / ... (repeatable, ANDed)")
    q.add_argument("--limit", type=int, default=100)
    q.add_argument("--explain-pruning", action="store_true",
                   help="print files_total vs files_after_pruning to stderr")
    q.add_argument("--read-optimized", action="store_true",
                   help="base files only (MoR deltas invisible, no LWW pass)")
    q.set_defaults(fn=_cmd_scan)

    ins = sub.add_parser(
        "inspect", help="metadata tables (files/snapshots/partitions) as JSON lines"
    )
    ins.add_argument("what", choices=["files", "snapshots", "partitions", "orphans"])
    ins.add_argument("--table", required=True)
    ins.add_argument("--version", type=int, default=None)
    ins.add_argument("--all-branches", action="store_true")
    ins.add_argument("--limit", type=int, default=1000)
    ins.set_defaults(fn=_cmd_inspect)

    bs = sub.add_parser(
        "bootstrap",
        help="bulk-load a source snapshot into an empty table, recording the "
             "stream position for the incremental tail's handoff filter",
    )
    bs.add_argument("--table", required=True)
    bs.add_argument("--source", required=True, help="parquet path of the snapshot")
    bs.add_argument("--batch-id", default="bootstrap")
    bs.add_argument("--offset-hwm", type=int, default=None,
                    help="greatest change-stream position the snapshot reflects")
    bs.add_argument("--op-col", default=None,
                    help="op column naming delete rows (tombstone-preserving snapshots)")
    bs.add_argument("--cluster-by", default=None,
                    help="comma-separated columns to cluster each bucket by "
                         "(one: linear sort; several: Z-order) — the initial "
                         "load is the one free chance to lay the table out")
    bs.add_argument("--cluster-bits", type=int, default=None,
                    help="Z-order bits per dimension (default: cluster.DEFAULT_BITS)")
    bs.set_defaults(fn=_cmd_bootstrap)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
