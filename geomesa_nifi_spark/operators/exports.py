"""Export sinks — the ``ConvertToGeoFile`` analogue (SURVEY.md §2.4).

The reference exports converted features to 11 formats
(``ConvertToGeoFile.scala:197-212``); the ones with a Spark-native writer —
csv, tsv, json (records), parquet — are supported in two shapes:

* ``export_dir``: a normal distributed write (the 100 TB shape).
* ``export_file``: one exact file, like one NiFi FlowFile output — used by
  the golden-byte tests (≙ ``ConvertToGeoFileTest.scala:20-65``).  Rows are
  ordered by an explicit sort key so bytes are deterministic.
* ``to_arrow``: in-memory Arrow table (≙ the arrow exporter with
  dictionary-encoded strings, ``ConvertToGeoFile.scala:226-238``);
  dictionary encoding is applied to string columns.

gml/leaflet/bin have no Spark writer and no tabular semantics — out of
scope (noted in SURVEY §2.4).
"""

from __future__ import annotations

import glob
import gzip as gzip_mod
import os
import shutil

from pyspark.sql import DataFrame

FORMATS = ("csv", "tsv", "json", "parquet")


def export_dir(df: DataFrame, fmt: str, path: str, header: bool = True, **options) -> None:
    """Distributed export: one directory of part files, Spark-native."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported export format {fmt!r}; supported: {FORMATS}")
    w = df.write.mode("overwrite")
    if fmt == "csv":
        w.option("header", str(header).lower()).options(**options).csv(path)
    elif fmt == "tsv":
        w.option("header", str(header).lower()).option("sep", "\t").options(**options).csv(path)
    elif fmt == "json":
        w.options(**options).json(path)
    else:
        w.options(**options).parquet(path)


def export_file(
    df: DataFrame,
    fmt: str,
    path: str,
    order_by: list[str] | None = None,
    header: bool = True,
    gzip_level: int | None = None,
) -> str:
    """Single-file export with deterministic bytes (FlowFile parity).

    Only for driver-sized results (exports of query outputs, samples);
    the distributed path is ``export_dir``.
    """
    if fmt not in ("csv", "tsv", "json"):
        raise ValueError(f"single-file export supports csv/tsv/json, got {fmt!r}")
    if order_by:
        df = df.orderBy(*order_by)
    staging = path + ".staging"
    one = df.coalesce(1)
    export_dir(one, fmt, staging, header=header)
    parts = sorted(glob.glob(os.path.join(staging, "part-*")))
    assert len(parts) == 1, parts
    if gzip_level is not None:
        with open(parts[0], "rb") as fin, gzip_mod.open(path, "wb", compresslevel=gzip_level) as fout:
            shutil.copyfileobj(fin, fout)
    else:
        shutil.move(parts[0], path)
    shutil.rmtree(staging, ignore_errors=True)
    return path


SCHEMA_LINE_PREFIX = "#schema "


def export_self_describing(
    df: DataFrame, path: str, order_by: list[str] | None = None
) -> str:
    """Schema-travels-with-the-file container — the GeoAvro capability
    (``records/GeoAvroRecordSetWriterFactory.scala:27-87``) without the Avro
    runtime (no spark-avro jar / Python avro lib in this environment): line 1
    is ``#schema <StructType JSON>``, every following line one JSON record.
    Any engine can read the data; ``read_self_describing`` restores the exact
    Spark types with no external registry or caller-provided schema.
    """
    import json as json_mod

    header = SCHEMA_LINE_PREFIX + json_mod.dumps(df.schema.jsonValue())
    tmp = path + ".rows"
    export_file(df, "json", tmp, order_by=order_by)
    with open(path, "w") as out, open(tmp) as rows:
        out.write(header + "\n")
        shutil.copyfileobj(rows, out)
    os.unlink(tmp)
    return path


def read_self_describing(spark, path: str) -> DataFrame:
    """Read a self-describing export (file or directory of files sharing one
    schema) without knowing the schema up front."""
    import json as json_mod

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    first = path
    if os.path.isdir(path):
        candidates = sorted(
            p for p in glob.glob(os.path.join(path, "*")) if os.path.isfile(p)
        )
        if not candidates:
            raise FileNotFoundError(f"no files under {path}")
        first = candidates[0]
    with open(first) as fh:
        header = fh.readline().rstrip("\n")
    if not header.startswith(SCHEMA_LINE_PREFIX):
        raise ValueError(f"{first} is not a self-describing export (no schema line)")
    schema = T.StructType.fromJson(json_mod.loads(header[len(SCHEMA_LINE_PREFIX):]))
    raw = spark.read.text(path)
    rows = raw.filter(~F.col("value").startswith(SCHEMA_LINE_PREFIX))
    return rows.select(F.from_json("value", schema).alias("r")).select("r.*")


def to_arrow(df: DataFrame, dictionary_encode_strings: bool = True):
    """Arrow export; string columns dictionary-encoded like the reference's
    arrow exporter hints."""
    import pyarrow as pa

    table = df.toArrow()
    if not dictionary_encode_strings:
        return table
    cols = []
    for name, col in zip(table.column_names, table.columns):
        if pa.types.is_string(col.type):
            col = col.combine_chunks().dictionary_encode()
        cols.append(col)
    return pa.table(dict(zip(table.column_names, cols)))
