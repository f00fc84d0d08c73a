"""Debezium change-event envelopes -> the engine's change contract.

The reference ingests CDC streams that arrive on Kafka as converter-typed
records (``GetGeoMesaKafkaRecord.scala:59-305`` reads the topic,
``PutGeoMesaRecord`` applies them); in the wider ecosystem the dominant
wire format for such streams is the Debezium envelope (public format,
debezium.io/documentation: ``before``/``after`` row images, ``source``
block with the log position, ``op`` in ``c|u|d|r``, ``ts_ms``).  This
module decodes that format — both the full envelope and the flattened
``ExtractNewRecordState`` SMT shape — into the columns
``merge_changes`` consumes, entirely with JVM ``from_json`` expressions
(whole-stage codegen, no Python in the path):

* ``op`` -> ``'delete'`` for ``d``, ``'upsert'`` for ``c``/``u``/``r``
  (snapshot reads are upserts: replaying a snapshot over a populated
  table must be idempotent, which LWW merge gives for free).  Unknown
  ops (``t`` truncate, ``m`` message) yield NULL rows for the caller's
  dead-letter routing.
* row image -> ``after`` for create/update/read, ``before`` for delete
  (a Debezium delete's ``after`` is null; the key must come from the
  before image).
* ``dbz_ts_ms``/``dbz_lsn`` -> event time + total-order tiebreak for
  LWW (``source.ts_ms``/``source.lsn`` with envelope ``ts_ms``
  fallback), so a table keyed on them replays any batching/ordering of
  the topic to the same state.
* Kafka log-compaction tombstones (null value AFTER the ``d`` event)
  carry no payload and no position — callers drop null-value records
  before decode; ``kafka_debezium_to_changes`` does so itself.

At 100 TB this matters because the decode is a pure projection: it
pushes through the scan, never shuffles, and the downstream merge sees
exactly the same shape the native generator produces, so every lake
optimization (bucket pruning, zone maps, broadcast resolution) applies
to Debezium input unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Debezium source block — the connector-agnostic core fields.  Connector
#: specific position fields are included for the common engines; absent
#: ones parse as NULL (from_json is permissive by name).
SOURCE_SCHEMA = T.StructType(
    [
        T.StructField("version", T.StringType()),
        T.StructField("connector", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("snapshot", T.StringType()),
        T.StructField("db", T.StringType()),
        T.StructField("schema", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("txId", T.LongType()),
        T.StructField("lsn", T.LongType()),      # postgres
        T.StructField("file", T.StringType()),   # mysql binlog
        T.StructField("pos", T.LongType()),      # mysql binlog
        T.StructField("scn", T.LongType()),      # oracle
    ]
)


def envelope_schema(payload_schema: T.StructType) -> T.StructType:
    """The full Debezium envelope for a row type of ``payload_schema``."""
    return T.StructType(
        [
            T.StructField("before", payload_schema),
            T.StructField("after", payload_schema),
            T.StructField("source", SOURCE_SCHEMA),
            T.StructField("op", T.StringType()),
            T.StructField("ts_ms", T.LongType()),
        ]
    )


def flat_schema(payload_schema: T.StructType) -> T.StructType:
    """The ``ExtractNewRecordState`` (new-record-state extraction SMT)
    shape: payload fields at top level plus ``__op``/``__deleted``/
    ``__ts_ms``/``__lsn`` metadata fields (``add.fields`` convention)."""
    return T.StructType(
        list(payload_schema.fields)
        + [
            T.StructField("__op", T.StringType()),
            T.StructField("__deleted", T.StringType()),
            T.StructField("__ts_ms", T.LongType()),
            T.StructField("__lsn", T.LongType()),
        ]
    )


def _op_to_change(op: Column) -> Column:
    """c/u/r -> upsert, d -> delete, anything else -> NULL (dead-letter)."""
    return (
        F.when(op == "d", F.lit("delete"))
        .when(op.isin("c", "u", "r"), F.lit("upsert"))
        .otherwise(F.lit(None).cast("string"))
    )


def debezium_to_changes(
    df: DataFrame,
    payload_schema: T.StructType,
    value_col: str = "value",
    include_snapshot_reads: bool = True,
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Decode full Debezium JSON envelopes in ``value_col`` (string or
    binary) into change rows: payload columns + ``op`` + ``dbz_ts_ms``
    (long, millis) + ``dbz_lsn`` (long, log position tiebreak).

    Rows whose envelope fails to parse, or whose op is outside
    ``c|u|d|r``, come out with NULL ``op`` — route them to the
    dead-letter path; they are never silently dropped here.
    ``include_snapshot_reads=False`` instead drops ``r`` (initial
    snapshot) events for pipelines that bootstrap the table out of band.
    """
    env = F.from_json(F.col(value_col).cast("string"), envelope_schema(payload_schema))
    row = F.when(env["op"] == "d", env["before"]).otherwise(env["after"])
    out = df.select(
        row.alias("_row"),
        _op_to_change(env["op"]).alias("op"),
        F.coalesce(env["source"]["ts_ms"], env["ts_ms"]).alias("dbz_ts_ms"),
        F.coalesce(
            env["source"]["lsn"], env["source"]["pos"], env["source"]["scn"],
            env["source"]["txId"], env["ts_ms"],
        ).alias("dbz_lsn"),
        env["op"].alias("_dbz_op"),
        *passthrough,
    )
    if not include_snapshot_reads:
        out = out.filter(F.coalesce(F.col("_dbz_op") != "r", F.lit(True)))
    names = [f.name for f in payload_schema.fields]
    return out.select(
        *[F.col("_row")[n].alias(n) for n in names],
        "op", "dbz_ts_ms", "dbz_lsn", *passthrough,
    )


def debezium_flat_to_changes(
    df: DataFrame,
    payload_schema: T.StructType,
    value_col: str = "value",
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Decode the flattened SMT shape (payload at top level + ``__op``/
    ``__deleted``/``__ts_ms``/``__lsn``) into the same output contract as
    :func:`debezium_to_changes`.

    ``__deleted='true'`` marks rewritten delete rows when the SMT is
    configured with ``delete.handling.mode=rewrite``; with
    ``add.fields=op`` the raw op survives as ``__op``.  Either signal
    marks a delete."""
    rec = F.from_json(F.col(value_col).cast("string"), flat_schema(payload_schema))
    is_del = (rec["__op"] == "d") | (F.lower(rec["__deleted"]) == "true")
    op = (
        F.when(is_del, F.lit("delete"))
        .when(
            rec["__op"].isin("c", "u", "r") | rec["__op"].isNull(), F.lit("upsert")
        )
        .otherwise(F.lit(None).cast("string"))
    )
    names = [f.name for f in payload_schema.fields]
    return df.select(
        *[rec[n].alias(n) for n in names],
        op.alias("op"),
        rec["__ts_ms"].alias("dbz_ts_ms"),
        rec["__lsn"].alias("dbz_lsn"),
        *passthrough,
    )


def kafka_debezium_to_changes(
    df: DataFrame,
    payload_schema: T.StructType,
    include_lineage: bool = True,
    flat: bool = False,
) -> DataFrame:
    """Decode Debezium values arriving on the standard Kafka record shape
    (``streaming/kafka.py::KAFKA_RECORD_SCHEMA``): drops log-compaction
    tombstones (null value), decodes the rest, and optionally carries the
    topic/partition/offset lineage columns the exactly-once ledger uses.
    """
    src = df.filter(F.col("value").isNotNull())
    lineage = tuple(
        c for c in ("topic", "partition", "offset")
        if include_lineage and c in df.columns
    )
    decode = debezium_flat_to_changes if flat else debezium_to_changes
    return decode(src, payload_schema, value_col="value", passthrough=lineage)


def encode_debezium(
    df: DataFrame,
    op_col: str = "op",
    ts_ms_col: str | None = None,
    lsn_col: str | None = None,
    source_name: str = "gns",
) -> DataFrame:
    """Encode change rows (engine contract: payload columns + ``op`` in
    ``'upsert'``/``'delete'``) as Debezium JSON envelope strings — the
    egress dual of :func:`debezium_to_changes`, and the deterministic
    generator the tests and the correctness gate replay through the
    decoder.  Upserts are emitted as ``u`` with only an ``after`` image,
    deletes as ``d`` with only a ``before`` image, per the format."""
    payload = [c for c in df.columns if c not in (op_col, ts_ms_col, lsn_col)]
    row = F.struct(*[F.col(c) for c in payload])
    is_del = F.col(op_col) == "delete"
    null_row = F.lit(None).cast(
        T.StructType([f for f in df.schema.fields if f.name in payload])
    )
    ts_ms = (
        F.col(ts_ms_col).cast("long") if ts_ms_col else F.lit(None).cast("long")
    )
    lsn = F.col(lsn_col).cast("long") if lsn_col else F.lit(None).cast("long")
    envelope = F.struct(
        F.when(is_del, row).otherwise(null_row).alias("before"),
        F.when(is_del, null_row).otherwise(row).alias("after"),
        F.struct(
            F.lit("2.5").alias("version"),
            F.lit("gns").alias("connector"),
            F.lit(source_name).alias("name"),
            ts_ms.alias("ts_ms"),
            F.lit("false").alias("snapshot"),
            F.lit(None).cast("string").alias("db"),
            F.lit(None).cast("string").alias("schema"),
            F.lit(None).cast("string").alias("table"),
            F.lit(None).cast("long").alias("txId"),
            lsn.alias("lsn"),
            F.lit(None).cast("string").alias("file"),
            F.lit(None).cast("long").alias("pos"),
            F.lit(None).cast("long").alias("scn"),
        ).alias("source"),
        F.when(is_del, F.lit("d")).otherwise(F.lit("u")).alias("op"),
        ts_ms.alias("ts_ms"),
    )
    return df.select(F.to_json(envelope).alias("value"))
