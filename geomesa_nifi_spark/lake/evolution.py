"""Schema reconciliation: create / evolve / reject against the live table.

Re-expresses the reference's ``checkSchema`` state machine
(``mixins/DataStoreIngestProcessor.scala:219-305`` and compatibility-mode enum
``processor/package.scala:92-95``):

    DoesNotExist      -> create the table
    Unchanged         -> no-op
    Compatible (additive) ->
        mode EXACT    -> error
        mode EXISTING -> warn + drop the extra incoming fields
        mode UPDATE   -> evolve the table schema (additive ALTER)
    AttributeRemoved  -> always error
    TypeChanged       -> always error

"Removed" here means the *declared* incoming schema no longer carries a
column the table has **when the caller says the incoming schema is
authoritative** (``strict_removal=True``).  A mere write batch that lacks a
column is fine — it is null-padded, matching the reference's by-name schema
adaptation (``AvroToPutGeoMesa.scala:201-222``).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field as dc_field

from pyspark.sql import types as T


class CompatibilityMode(str, enum.Enum):
    EXACT = "exact"
    EXISTING = "existing"
    UPDATE = "update"


class SchemaCompatibilityError(Exception):
    pass


@dataclass
class Reconciliation:
    """Outcome of comparing an incoming schema against the table schema."""

    action: str  # "create" | "unchanged" | "add_columns" | "drop_extras"
    write_schema: T.StructType  # schema the write should be projected to
    table_schema: T.StructType  # schema the table ends up with
    added: list[T.StructField] = dc_field(default_factory=list)
    dropped: list[str] = dc_field(default_factory=list)


def _by_name(schema: T.StructType) -> dict[str, T.StructField]:
    return {f.name: f for f in schema.fields}


def reconcile(
    table_schema: T.StructType | None,
    incoming: T.StructType,
    mode: CompatibilityMode = CompatibilityMode.UPDATE,
    strict_removal: bool = False,
) -> Reconciliation:
    """Decide what to do with a batch whose schema is ``incoming``.

    Matching is by name (case-sensitive, like Iceberg name-mapping).  Type
    comparison ignores nullability — the lake stores everything nullable.
    """
    if table_schema is None:
        return Reconciliation(
            action="create", write_schema=incoming, table_schema=_nullable(incoming)
        )

    tbl = _by_name(table_schema)
    inc = _by_name(incoming)

    # Type changes are always fatal (DataStoreIngestProcessor.scala:298-301).
    for name, f in inc.items():
        if name in tbl and not _same_type(tbl[name].dataType, f.dataType):
            raise SchemaCompatibilityError(
                f"column '{name}' type changed: table={tbl[name].dataType.simpleString()} "
                f"incoming={f.dataType.simpleString()}"
            )

    # Removal of a declared column is always fatal (:294-296) — but only when
    # the caller asserts the incoming schema is the full declared schema.
    missing = [n for n in tbl if n not in inc]
    if strict_removal and missing:
        raise SchemaCompatibilityError(
            f"declared schema removed column(s) {missing} present in the table"
        )

    extra = [f for n, f in inc.items() if n not in tbl]
    if not extra:
        return Reconciliation(
            action="unchanged", write_schema=table_schema, table_schema=table_schema
        )

    if mode is CompatibilityMode.EXACT:
        raise SchemaCompatibilityError(
            f"schema mismatch in EXACT mode: incoming adds {[f.name for f in extra]}"
        )
    if mode is CompatibilityMode.EXISTING:
        # Write only the table's columns; extras are dropped (warn upstream).
        return Reconciliation(
            action="drop_extras",
            write_schema=table_schema,
            table_schema=table_schema,
            dropped=[f.name for f in extra],
        )
    # UPDATE: additive evolution — append new columns to the table schema.
    evolved = T.StructType(list(table_schema.fields) + [_nullable_field(f) for f in extra])
    return Reconciliation(
        action="add_columns",
        write_schema=evolved,
        table_schema=evolved,
        added=[_nullable_field(f) for f in extra],
    )


# Pairs the lake silently coerces at write time instead of rejecting: a
# parquet timestamp read under a default Spark 4 session arrives as
# TIMESTAMP_NTZ while the table declares TIMESTAMP (or vice versa) — the
# stored micros are identical, only the session-TZ annotation differs, so the
# write path casts to the table's type rather than failing the batch.
_COERCIBLE: set[frozenset[str]] = {frozenset({"timestamp", "timestamp_ntz"})}


def _same_type(a: T.DataType, b: T.DataType) -> bool:
    sa, sb = a.simpleString(), b.simpleString()
    return sa == sb or frozenset((sa, sb)) in _COERCIBLE


def merge_schemas(base: T.StructType, other: T.StructType) -> T.StructType:
    """Union-by-name of two reconciled schemas (base's types win for shared
    columns).  Used to re-derive the committed schema after losing a commit
    race to a concurrent schema-evolving writer — rebasing with the stale
    pre-conflict schema would silently revert the winner's added columns."""
    base_names = {f.name for f in base.fields}
    extra = [_nullable_field(f) for f in other.fields if f.name not in base_names]
    return T.StructType([_nullable_field(f) for f in base.fields] + extra)


def _nullable_field(f: T.StructField) -> T.StructField:
    return T.StructField(f.name, f.dataType, True)


def _nullable(schema: T.StructType) -> T.StructType:
    return T.StructType([_nullable_field(f) for f in schema.fields])
