"""Converter-config -> DataFrame compiler.

The reference ingests untyped byte streams through declarative *converter*
configs (GeoMesa convert library, configured in the NiFi processors): field
extraction by position/path plus an expression language —
``$1::int``, ``date('yyyy-MM-dd', $4)``, ``concat($1, $2)``,
``try(expr, null)``, ``lineNo()`` — applied per record
(``mixins/ConvertInputProcessor.scala:81-129``; example configs
``geomesa-accumulo-bundle/.../test/resources/application.conf``
``example-csv``/``example-csv-attributes``).

This module compiles the same *shape* of config into a Spark read + select:
the fields become column expressions that Catalyst folds/pushes down, the
per-record loop disappears, and error isolation becomes PERMISSIVE-mode
corrupt-record routing (≙ LogErrors / RaiseErrors,
``ConvertInputProcessor.scala:175-182``).

Config model (dialect-neutral dict, mirroring the reference's HOCON keys):

    {
      "type": "delimited-text" | "json",
      "id-field": "md5(string2bytes($fid))" -> expression over fields,
      "fields": [
        {"name": "fid",  "transform": "$1::int"},
        {"name": "dtg",  "transform": "date('yyyy-MM-dd', $4)"},
        {"name": "name", "transform": "$2", "json-path": "$.name"},
      ],
      "options": {"error-mode": "log-errors" | "raise-errors"}
    }

Transform language supported (the subset the reference's test configs use):
``$N`` positional field, ``$name``, ``::int/::long/::double/::float/
::boolean/::string`` casts, ``date(fmt, x)``, ``dateTime(x)``,
``concat(a,b,...)``, ``try(expr, default)``, ``md5(x)``,
``string2bytes(x)``, ``toString(x)``, ``lineNo()``, string literals.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


class ConverterError(ValueError):
    pass


# --- tiny recursive-descent parser for the transform language ---------------

_TOKEN = re.compile(
    r"""\s*(?:
        (?P<lparen>\() | (?P<rparen>\)) | (?P<comma>,) |
        (?P<cast>::(?:int|long|double|float|boolean|string|bytes|date|uuid)) |
        (?P<str>'[^']*') |
        (?P<num>-?\d+(?:\.\d+)?) |
        (?P<ref>\$[A-Za-z_0-9]+) |
        (?P<name>[A-Za-z_][A-Za-z_0-9]*)
    )""",
    re.VERBOSE,
)

_CAST_TYPES = {
    "::int": "int",
    "::long": "long",
    "::double": "double",
    "::float": "float",
    "::boolean": "boolean",
    "::string": "string",
    "::bytes": "binary",
    "::date": "date",
}

_UUID_RE = (
    "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-"
    "[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"
)


def _tokenize(s: str):
    pos = 0
    out = []
    while pos < len(s):
        m = _TOKEN.match(s, pos)
        if not m:
            raise ConverterError(f"bad transform syntax at {s[pos:]!r}")
        pos = m.end()
        kind = m.lastgroup
        out.append((kind, m.group(kind)))
    return out


class _Parser:
    """expr := primary (cast)* ; primary := literal | ref | fn '(' args ')'"""

    def __init__(self, tokens, resolve_ref, line_no=None):
        self.toks = tokens
        self.i = 0
        self.resolve_ref = resolve_ref
        self.line_no = line_no

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def take(self, kind=None):
        k, v = self.peek()
        if kind and k != kind:
            raise ConverterError(f"expected {kind}, got {k} {v!r}")
        self.i += 1
        return k, v

    def parse(self) -> Column:
        col = self._expr()
        if self.i != len(self.toks):
            raise ConverterError(f"trailing tokens: {self.toks[self.i:]}")
        return col

    def _expr(self) -> Column:
        col = self._primary()
        while self.peek()[0] == "cast":
            _, cast = self.take()
            if cast == "::uuid":
                # normalized-or-null UUID validation (the reference's UUID
                # attribute type, SimpleFeatureRecordConverter.scala:442-449)
                s = col.cast("string")
                col = F.when(s.rlike(_UUID_RE), F.lower(s))
                continue
            # try_cast, not cast: one malformed record must route to the
            # failure output, not abort the job (LogErrors semantics,
            # ConvertInputProcessor.scala:175-182; Spark 4 is ANSI by
            # default, where a plain cast would throw).
            col = col.try_cast(_CAST_TYPES[cast])
        return col

    def _primary(self) -> Column:
        k, v = self.take()
        if k == "str":
            return F.lit(v[1:-1])
        if k == "num":
            return F.lit(float(v) if "." in v else int(v))
        if k == "ref":
            return self.resolve_ref(v[1:])
        if k == "name":
            return self._call(v)
        raise ConverterError(f"unexpected token {v!r}")

    def _call(self, fn: str) -> Column:
        self.take("lparen")
        args: list[Column] = []
        raw_args: list = []
        if self.peek()[0] != "rparen":
            while True:
                start = self.i
                args.append(self._expr())
                raw_args.append(self.toks[start:self.i])
                k, _ = self.take()
                if k == "rparen":
                    break
                if k != "comma":
                    raise ConverterError(f"expected , or ) in {fn}(...)")
        else:
            self.take("rparen")

        if fn == "concat":
            return F.concat(*[a.cast("string") for a in args])
        if fn == "date":
            # date('yyyy-MM-dd', $x) — Java pattern works verbatim in Spark;
            # try_ variant so malformed dates null out (row-level isolation)
            lit = raw_args[0][0]
            if lit[0] != "str":
                raise ConverterError("date() needs a literal pattern")
            return F.try_to_timestamp(args[1], F.lit(lit[1][1:-1]))
        if fn == "dateTime":
            return F.try_to_timestamp(args[0])
        if fn == "try":
            # try(expr, default): null-safe evaluation — Spark expressions
            # already yield null on cast/parse failure (ANSI off), so this
            # compiles to coalesce
            return F.coalesce(args[0], args[1]) if len(args) > 1 else args[0]
        if fn == "md5":
            return F.md5(args[0])
        if fn == "string2bytes":
            return args[0].cast("string").cast("binary")
        if fn == "toString":
            return args[0].cast("string")
        if fn == "lineNo":
            # 1-based record number within the input file, matching the
            # reference's lineNo() (NOT monotonically_increasing_id, whose
            # partition-encoded values look nothing like line numbers)
            if self.line_no is not None:
                return self.line_no()
            return partition_line_no()
        # --- type-system breadth (SimpleFeatureRecordConverter.scala:387-528):
        # lists, maps, nested records and geometries as first-class transform
        # outputs, all JVM expressions (from_json / element_at / to_json).
        if fn == "list":
            return F.array(*args)
        if fn == "jsonList":
            # jsonList('int', $x): parse a JSON array string into array<type>
            lit = raw_args[0][0]
            if lit[0] != "str":
                raise ConverterError("jsonList() needs a literal element type")
            return F.from_json(args[1].cast("string"), f"array<{lit[1][1:-1]}>")
        if fn == "jsonMap":
            return F.from_json(args[0].cast("string"), "map<string,string>")
        if fn == "mapValue":
            return F.element_at(args[0], args[1])
        if fn == "listItem":
            # 0-based like the reference's transform (list indexing)
            return F.element_at(args[0], args[1] + F.lit(1))
        if fn == "toJson":
            # nested record -> JSON string (Choice/record attribute fallback)
            return F.to_json(args[0])
        if fn == "point":
            # geometry as validated WKT text: no geometry runtime in this
            # environment, so POINT(x y) is carried as its canonical WKT —
            # the contract (storage + round-trip), not the JTS byte layout
            return F.concat(
                F.lit("POINT ("),
                args[0].try_cast("double").cast("string"),
                F.lit(" "),
                args[1].try_cast("double").cast("string"),
                F.lit(")"),
            )
        if fn == "geometry":
            # WKT passthrough with a shape sanity-check; malformed -> null
            s = F.trim(args[0].cast("string"))
            return F.when(
                F.upper(s).rlike(
                    r"^(POINT|LINESTRING|POLYGON|MULTIPOINT|MULTILINESTRING|"
                    r"MULTIPOLYGON|GEOMETRYCOLLECTION)\s*\(.*\)$"
                ),
                s,
            )
        raise ConverterError(f"unknown transform function {fn}()")


def partition_line_no() -> Column:
    """Per-partition 1-based row number — the lineNo() shape used when no
    file metadata is available.  Numbers rows within each *input partition*
    (the upper bits of the mono id), never a global ``Window.orderBy`` —
    that would funnel the entire read through ONE task, silently
    serializing a 100-TB ingest.  ``apply_converter``'s provider prefers
    per-file numbering and falls back to this same shape."""
    from pyspark.sql import Window

    mono = F.monotonically_increasing_id()
    w = Window.partitionBy(F.shiftrightunsigned(mono, 33)).orderBy(mono)
    return F.row_number().over(w).cast("long")


def compile_transform(expr: str, resolve_ref, line_no=None) -> Column:
    return _Parser(_tokenize(expr), resolve_ref, line_no=line_no).parse()


# --- converter application ---------------------------------------------------


def apply_converter(
    spark: SparkSession,
    config: dict,
    path: str | None = None,
    df: DataFrame | None = None,
    attributes: dict[str, str] | None = None,
) -> DataFrame:
    """Read + convert per the config; returns typed rows plus ``__fid``.

    ``attributes`` plays the FlowFile-attribute role: values are exposed to
    transforms as ``$attr_name`` references (constant-folded by Catalyst,
    ≙ ``ConvertInputProcessor.scala:107-114``).
    """
    ctype = config.get("type", "delimited-text")
    options = config.get("options", {})
    if df is None:
        if path is None:
            raise ConverterError("need a path or a DataFrame")
        if ctype == "delimited-text":
            reader = (
                spark.read.option("header", str(options.get("header", False)).lower())
                .option("mode", "PERMISSIVE")
                .option("columnNameOfCorruptRecord", CORRUPT_COL)
            )
            delim = options.get("delimiter", ",")
            df = reader.option("delimiter", delim).csv(path, inferSchema=False)
            df = df.toDF(*[f"_c{i}" for i in range(len(df.columns))])
        elif ctype == "json":
            df = (
                spark.read.option("mode", "PERMISSIVE")
                .option("columnNameOfCorruptRecord", CORRUPT_COL)
                .json(path)
            )
        elif ctype == "xml":
            # native Spark 4 XML datasource (the reference's XML converter
            # input, mixins/ConvertInputProcessor.scala:81-129); fields of the
            # rowTag element become typed columns referenced as $name, while
            # per-field "xpath" extraction below works on raw-string records
            df = (
                spark.read.format("xml")
                .option("rowTag", options.get("row-tag", "record"))
                .option("mode", "PERMISSIVE")
                .option("columnNameOfCorruptRecord", CORRUPT_COL)
                .load(path)
            )
        else:
            raise ConverterError(f"unsupported converter type {ctype}")

    attrs = attributes or {}

    def line_no() -> Column:
        """1-based line number within each source file (reference lineNo()).

        monotonically_increasing_id is ordered within a partition and
        partition order follows file offset, so row_number over it —
        per-file when file metadata exists — reproduces read order.  This is
        a window (one shuffle): only pay it when the config stores lineNo.

        Without file metadata (non-file source) the fallback numbers rows
        within each *input partition* (the upper bits of the mono id), never
        a global Window.orderBy — that would funnel the entire read through
        ONE task, silently serializing a 100-TB ingest.
        """
        from pyspark.sql import Window

        mono = F.monotonically_increasing_id()
        try:
            df.select(F.col("_metadata.file_name"))
            w = Window.partitionBy(F.col("_metadata.file_name")).orderBy(mono)
        except Exception:
            # mono id layout: (partition id << 33) | per-partition counter
            return partition_line_no()
        return F.row_number().over(w).cast("long")

    def resolve(ref: str) -> Column:
        if ref.isdigit():  # $1 = first field (1-based, like the reference)
            idx = int(ref)
            if ctype == "delimited-text":
                return F.col(f"_c{idx - 1}")
            raise ConverterError("positional refs only valid for delimited-text")
        if ref == "0":
            raise ConverterError("$0 (whole record) not supported")
        if ref in attrs:
            return F.lit(attrs[ref])
        return F.col(ref)

    record_col = config.get("record-column", "value")
    cols = []
    for field in config.get("fields", []):
        name = field["name"]
        if "json-path" in field and ctype == "json":
            src = F.get_json_object(F.to_json(F.struct(*df.columns)), field["json-path"])
            cols.append(src.alias(name))
            continue
        if "xpath" in field and ctype == "xml":
            # XPath over a raw XML string column (record mode): JVM-side
            # xpath_string, codegen'd — no Python in the row path.  An
            # optional "cast" try_casts the extracted text (malformed -> null)
            src = F.xpath_string(F.col(record_col), F.lit(field["xpath"]))
            if "cast" in field:
                src = src.try_cast(field["cast"])
            cols.append(src.alias(name))
            continue
        transform = field.get("transform", f"${name}")
        cols.append(compile_transform(transform, resolve, line_no=line_no).alias(name))

    if "id-field" in config:
        cols.append(
            compile_transform(config["id-field"], resolve, line_no=line_no).alias("__fid")
        )

    out = df.select(*cols)
    return out


def split_errors(df: DataFrame, required: list[str]) -> tuple[DataFrame, DataFrame]:
    """Error-isolating row routing (≙ per-record try/catch,
    ``PutGeoMesaRecord.scala:93-124``): rows with any required field null
    go to the failure output; the rest to success."""
    cond = None
    for c in required:
        this = F.col(c).isNotNull()
        cond = this if cond is None else (cond & this)
    good = df.filter(cond) if cond is not None else df
    bad = df.filter(~cond) if cond is not None else df.limit(0)
    return good, bad
