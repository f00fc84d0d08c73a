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

gml2/gml (GML3) are deterministic XML templating over rows and ARE
supported (``export_gml``, golden-matched against
``ConvertToGeoFileTest.scala:87-178``); leaflet/bin have no tabular
semantics — out of scope (noted in SURVEY §2.4).
"""

from __future__ import annotations

import glob
import gzip as gzip_mod
import os
import shutil

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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


# ---------------------------------------------------------------------------
# GML export (ConvertToGeoFile gml2 / gml formats)
# ---------------------------------------------------------------------------

_GML_SRS = "http://www.opengis.net/gml/srs/epsg.xml#4326"

_GML2_HEADER = (
    '<?xml version="1.0" encoding="UTF-8"?>'
    '<wfs:FeatureCollection xmlns:xs="http://www.w3.org/2001/XMLSchema" '
    'xmlns:{ns}="{ns_uri}" xmlns:wfs="http://www.opengis.net/wfs" '
    'xmlns:gml="http://www.opengis.net/gml" xmlns:ogc="http://www.opengis.net/ogc">\n'
    "  <gml:boundedBy>\n"
    f'    <gml:Box srsName="{_GML_SRS}">\n'
    "      <gml:coord>\n"
    "        <gml:X>-180.0</gml:X>\n"
    "        <gml:Y>-90.0</gml:Y>\n"
    "      </gml:coord>\n"
    "      <gml:coord>\n"
    "        <gml:X>180.0</gml:X>\n"
    "        <gml:Y>90.0</gml:Y>\n"
    "      </gml:coord>\n"
    "    </gml:Box>\n"
    "  </gml:boundedBy>\n"
)

_GML3_HEADER = (
    '<?xml version="1.0" encoding="UTF-8"?>'
    '<wfs:FeatureCollection xmlns:xs="http://www.w3.org/2001/XMLSchema" '
    'xmlns:{ns}="{ns_uri}" xmlns:wfs="http://www.opengis.net/wfs" '
    'xmlns:gml="http://www.opengis.net/gml" xmlns:ogc="http://www.opengis.net/ogc" '
    'xmlns:ows="http://www.opengis.net/ows" xmlns:xlink="http://www.w3.org/1999/xlink">\n'
    "  <gml:boundedBy>\n"
    f'    <gml:Envelope srsDimension="2" srsName="{_GML_SRS}">\n'
    "      <gml:lowerCorner>-180 -90</gml:lowerCorner>\n"
    "      <gml:upperCorner>180 90</gml:upperCorner>\n"
    "    </gml:Envelope>\n"
    "  </gml:boundedBy>\n"
)


def _xml_escape(col: Column) -> Column:
    col = F.regexp_replace(col, "&", "&amp;")
    col = F.regexp_replace(col, "<", "&lt;")
    return F.regexp_replace(col, ">", "&gt;")


def gml_feature_fragment(
    df: DataFrame,
    version: int,
    fid_col: str,
    geom_cols: set[str],
    type_name: str = "example",
    ns: str = "geomesa",
) -> Column:
    """Per-feature GML fragment as ONE codegen'd column expression — the
    distributed part of the export; rows never leave the JVM.  Matches the
    GeoTools encoder output byte-for-byte (``ConvertToGeoFileTest.scala:
    87-178``): an attribute literally named ``name`` renders as the GML
    standard ``gml:name`` property, timestamps render Zulu-milli ISO,
    point geometries (WKT) keep their literal coordinate lexemes."""
    pad = "    "
    parts: list[Column] = []
    fid_attr = "fid" if version == 2 else "gml:id"
    parts.append(
        F.concat(
            F.lit(f'{pad}<{ns}:{type_name} {fid_attr}="'),
            _xml_escape(F.col(fid_col).cast("string")),
            F.lit('">\n'),
        )
    )
    for f in df.schema.fields:
        c = f.name
        if c == fid_col:
            continue
        if c in geom_cols:
            x = F.regexp_extract(F.col(c), r"POINT \(([^ ]+) ([^)]+)\)", 1)
            y = F.regexp_extract(F.col(c), r"POINT \(([^ ]+) ([^)]+)\)", 2)
            if version == 2:
                geom_xml = F.concat(
                    F.lit(
                        f"{pad}  <{ns}:{c}>\n"
                        f'{pad}    <gml:Point srsName="{_GML_SRS}">\n'
                        f"{pad}      <gml:coordinates>"
                    ),
                    x, F.lit(","), y,
                    F.lit(
                        f"</gml:coordinates>\n"
                        f"{pad}    </gml:Point>\n"
                        f"{pad}  </{ns}:{c}>\n"
                    ),
                )
            else:
                geom_xml = F.concat(
                    F.lit(
                        f"{pad}  <{ns}:{c}>\n"
                        f'{pad}    <gml:Point srsName="{_GML_SRS}" srsDimension="2">\n'
                        f"{pad}      <gml:pos>"
                    ),
                    x, F.lit(" "), y,
                    F.lit(
                        f"</gml:pos>\n"
                        f"{pad}    </gml:Point>\n"
                        f"{pad}  </{ns}:{c}>\n"
                    ),
                )
            parts.append(F.when(F.col(c).isNull(), F.lit("")).otherwise(geom_xml))
            continue
        if isinstance(f.dataType, (T.TimestampType, T.TimestampNTZType)):
            val = F.date_format(F.col(c), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
        else:
            val = _xml_escape(F.col(c).cast("string"))
        tag = "gml:name" if c == "name" else f"{ns}:{c}"
        parts.append(
            F.when(F.col(c).isNull(), F.lit("")).otherwise(
                F.concat(F.lit(f"{pad}  <{tag}>"), val, F.lit(f"</{tag}>\n"))
            )
        )
    parts.append(F.lit(f"{pad}</{ns}:{type_name}>"))
    return F.concat(*parts)


def export_gml(
    df: DataFrame,
    path: str,
    version: int = 2,
    fid_col: str | None = None,
    geom_cols: set[str] | None = None,
    type_name: str = "example",
    ns: str = "geomesa",
    ns_uri: str = "https://geomesa.org",
    order_by: list[str] | None = None,
) -> str:
    """``ConvertToGeoFile`` gml2 / gml (GML3) export
    (``ConvertToGeoFile.scala:197-212``): one exact file, golden-matched.

    Fragment generation is a pure column expression (distributed, codegen);
    only the final header/footer wrap and ordered concatenation run on the
    driver — the FlowFile-sized export shape, like ``export_file``.
    ``fid_col`` defaults to the first column; ``geom_cols`` defaults to
    columns whose values look like WKT points is NOT inferred — pass them
    explicitly (schema metadata carries no geometry kinds for plain frames).
    """
    if version not in (2, 3):
        raise ValueError("version must be 2 (gml2) or 3 (gml)")
    fid_col = fid_col or df.columns[0]
    geom_cols = geom_cols or set()
    if order_by:
        df = df.orderBy(*order_by)
    frags = [
        r[0]
        for r in df.select(
            gml_feature_fragment(df, version, fid_col, geom_cols, type_name, ns)
        ).collect()
    ]
    header = (_GML2_HEADER if version == 2 else _GML3_HEADER).format(ns=ns, ns_uri=ns_uri)
    out = [header]
    if version == 2:
        for frag in frags:
            out.append("  <gml:featureMember>\n" + frag + "\n  </gml:featureMember>\n")
    else:
        out.append("  <gml:featureMembers>\n")
        out.extend(frag + "\n" for frag in frags)
        out.append("  </gml:featureMembers>\n")
    out.append("</wfs:FeatureCollection>\n")
    with open(path, "w", encoding="utf-8") as fh:
        fh.write("".join(out))
    return path


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
