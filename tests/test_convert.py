"""Converter compiler + export sinks: the reference's example-csv shape,
expression language, error routing, golden single-file exports."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geomesa_nifi_spark.functions.convert import (
    ConverterError,
    apply_converter,
    compile_transform,
    split_errors,
)
from geomesa_nifi_spark.operators.exports import export_dir, export_file, to_arrow

# Same shape as the reference's example.csv fixture (FIXTURES.md F3):
# ID,Name,Age,LastSeen,Friends,Skills,Lon,Lat,Vis
CSV_TEXT = """\
10001,Ada,20,2015-05-06,"Grace, Edsger",skill->9,-100.2365,23,user
10002,Grace,25,2015-06-07,"Ada, Alan",skill->10,40.232,-53.2356,user
10003,Alan,30,2015-10-23,"Kurt, John",skill->8,3,-62.23,user&admin
"""

EXAMPLE_CSV_CONFIG = {
    # mirrors the reference's example-csv converter (application.conf):
    # id = toString($fid), fields with casts and a date parse
    "type": "delimited-text",
    "id-field": "toString($1)",
    "fields": [
        {"name": "fid", "transform": "$1::int"},
        {"name": "name", "transform": "$2::string"},
        {"name": "age", "transform": "$3::int"},
        {"name": "dtg", "transform": "date('yyyy-MM-dd', $4)"},
        {"name": "lon", "transform": "$7::double"},
        {"name": "lat", "transform": "$8::double"},
        {"name": "vis", "transform": "$9"},
    ],
}


@pytest.fixture
def csv_path(tmp_path):
    p = tmp_path / "example.csv"
    p.write_text(CSV_TEXT)
    return str(p)


def test_example_csv_converter(spark, csv_path):
    out = apply_converter(spark, EXAMPLE_CSV_CONFIG, path=csv_path)
    rows = {r.fid: r for r in out.collect()}
    assert set(rows) == {10001, 10002, 10003}
    r = rows[10001]
    assert r.name == "Ada" and r.age == 20
    assert r.dtg.year == 2015 and r.dtg.month == 5 and r.dtg.day == 6
    assert r.lon == -100.2365 and r.lat == 23.0
    assert r.vis == "user"
    assert r["__fid"] == "10001"  # id-field expression


def test_transform_language(spark):
    df = spark.createDataFrame([("7", "x")], ["a", "b"])
    resolve = lambda ref: F.col(ref)  # noqa: E731
    assert df.select(compile_transform("$a::int", resolve).alias("v")).first().v == 7
    assert (
        df.select(compile_transform("concat($a, '-', $b)", resolve).alias("v")).first().v
        == "7-x"
    )
    assert (
        df.select(compile_transform("try($b::int, 0)", resolve).alias("v")).first().v == 0
    )
    assert (
        len(df.select(compile_transform("md5($a)", resolve).alias("v")).first().v) == 32
    )
    with pytest.raises(ConverterError):
        compile_transform("nope($a)", resolve)
    with pytest.raises(ConverterError):
        compile_transform("$a::int extra", resolve)


def test_attribute_injection(spark, csv_path):
    cfg = {
        "type": "delimited-text",
        "fields": [
            {"name": "fid", "transform": "$1::int"},
            {"name": "source", "transform": "concat($input_name, '!')"},
        ],
    }
    out = apply_converter(spark, cfg, path=csv_path, attributes={"input_name": "fileA"})
    assert out.first().source == "fileA!"


def test_error_routing(spark, tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text("1,ok\nnot_an_int,bad\n2,ok2\n")
    cfg = {
        "type": "delimited-text",
        "fields": [
            {"name": "fid", "transform": "$1::int"},
            {"name": "name", "transform": "$2"},
        ],
    }
    out = apply_converter(spark, cfg, path=str(p))
    good, bad = split_errors(out, required=["fid"])
    assert good.count() == 2  # LogErrors semantics: keep going
    assert bad.count() == 1  # failure routed, not raised


def test_golden_csv_export(spark, csv_path, tmp_path):
    out = apply_converter(spark, EXAMPLE_CSV_CONFIG, path=csv_path).drop("__fid")
    dest = str(tmp_path / "out.csv")
    export_file(out.select("fid", "name", "age", "vis"), "csv", dest, order_by=["fid"])
    golden = (
        "fid,name,age,vis\n"
        "10001,Ada,20,user\n"
        "10002,Grace,25,user\n"
        "10003,Alan,30,user&admin\n"
    )
    assert open(dest).read() == golden  # byte-exact (≙ ConvertToGeoFileTest)


def test_exports_roundtrip(spark, tmp_path):
    df = spark.range(100).select(
        F.col("id"), F.concat(F.lit("n"), F.col("id")).alias("name")
    )
    for fmt in ["csv", "tsv", "json", "parquet"]:
        d = str(tmp_path / fmt)
        export_dir(df, fmt, d)
        back = (
            spark.read.option("header", True).option(
                "sep", "\t" if fmt == "tsv" else ","
            ).csv(d, inferSchema=True)
            if fmt in ("csv", "tsv")
            else (spark.read.json(d) if fmt == "json" else spark.read.parquet(d))
        )
        assert back.count() == 100
    gz = str(tmp_path / "out.json.gz")
    export_file(df, "json", gz, order_by=["id"], gzip_level=5)
    import gzip

    assert gzip.open(gz).read().startswith(b'{"id":0')


def test_arrow_export_dictionary(spark):
    df = spark.range(50).select(
        F.col("id"), (F.col("id") % 3).cast("string").alias("cat")
    )
    import pyarrow as pa

    t = to_arrow(df)
    assert t.num_rows == 50
    assert pa.types.is_dictionary(t.schema.field("cat").type)


XML_TEXT = """\
<features>
  <record><fid>1</fid><name>Ada</name><age>20</age></record>
  <record><fid>2</fid><name>Grace</name><age>notanint</age></record>
</features>
"""


def test_xml_file_converter(spark, tmp_path):
    """XML converter input via the native datasource (rowTag records);
    mirrors the reference's XML converter layer
    (mixins/ConvertInputProcessor.scala:81-129)."""
    p = tmp_path / "example.xml"
    p.write_text(XML_TEXT)
    cfg = {
        "type": "xml",
        "options": {"row-tag": "record"},
        "fields": [
            {"name": "fid", "transform": "$fid::int"},
            {"name": "name", "transform": "$name::string"},
            {"name": "age", "transform": "toString($age)::int"},
        ],
    }
    rows = {r.fid: r for r in apply_converter(spark, cfg, path=str(p)).collect()}
    assert rows[1].name == "Ada" and rows[1].age == 20
    assert rows[2].age is None  # malformed value nulls out, row survives


def test_xml_xpath_record_mode(spark):
    """xpath extraction over a raw XML string column (record mode)."""
    df = spark.createDataFrame(
        [('<e id="7"><k>41</k></e>',), ("<e><k>broken</k></e>",)], ["value"]
    )
    cfg = {
        "type": "xml",
        "fields": [
            {"name": "eid", "xpath": "/e/@id", "cast": "long"},
            {"name": "k", "xpath": "/e/k", "cast": "int"},
        ],
    }
    rows = apply_converter(spark, cfg, df=df).collect()
    assert (rows[0].eid, rows[0].k) == (7, 41)
    assert rows[1].eid is None and rows[1].k is None


def test_typed_transforms(spark):
    """list/map/UUID/geometry attribute types
    (SimpleFeatureRecordConverter.scala:387-528)."""
    df = spark.createDataFrame(
        [(1, '{"a": "10", "b": "x"}', "2.5", "POINT (1 2)")],
        ["i", "m", "lonstr", "wkt"],
    )
    cfg = {
        "fields": [
            {"name": "a", "transform": "mapValue(jsonMap($m), 'a')::int"},
            {"name": "missing", "transform": "mapValue(jsonMap($m), 'zz')"},
            {"name": "first", "transform": "listItem(list('p', 'q'), 0)"},
            {"name": "jl", "transform": "listItem(jsonList('long', '[5, 6]'), 1)"},
            {"name": "uuid_ok", "transform": "'123E4567-E89B-12D3-A456-426614174000'::uuid"},
            {"name": "uuid_bad", "transform": "'nope'::uuid"},
            {"name": "pt", "transform": "point($lonstr, $i)"},
            {"name": "geom_ok", "transform": "geometry($wkt)"},
            {"name": "geom_bad", "transform": "geometry('FOO (1 2)')"},
            {"name": "nested", "transform": "toJson(list($i, $i))"},
            {"name": "bin", "transform": "'ab'::bytes"},
            {"name": "d", "transform": "'2024-03-04'::date"},
        ]
    }
    r = apply_converter(spark, cfg, df=df).collect()[0]
    assert r.a == 10 and r.missing is None
    assert r.first == "p" and r.jl == 6
    assert r.uuid_ok == "123e4567-e89b-12d3-a456-426614174000"
    assert r.uuid_bad is None
    assert r.pt == "POINT (2.5 1.0)"
    assert r.geom_ok == "POINT (1 2)" and r.geom_bad is None
    assert r.nested == "[1,1]"
    assert bytes(r.bin) == b"ab"
    assert r.d.year == 2024 and r.d.month == 3 and r.d.day == 4


def test_line_no_is_one_based_per_file(spark, tmp_path):
    """lineNo() = 1-based line number within each input file (the reference's
    lineNo transform), not a partition-encoded id."""
    (tmp_path / "a.csv").write_text("x1\nx2\nx3\n")
    (tmp_path / "b.csv").write_text("y1\ny2\n")
    cfg = {
        "type": "delimited-text",
        "fields": [
            {"name": "v", "transform": "$1"},
            {"name": "ln", "transform": "lineNo()"},
        ],
    }
    rows = apply_converter(spark, cfg, path=str(tmp_path)).collect()
    got = {r.v: r.ln for r in rows}
    assert got == {"x1": 1, "x2": 2, "x3": 3, "y1": 1, "y2": 2}


def test_self_describing_export_roundtrip(spark, tmp_path):
    """Schema travels with the file (GeoAvro capability fallback): reader
    needs no registry and restores exact types."""
    import datetime as dt

    from pyspark.sql import Row, types as T

    from geomesa_nifi_spark.operators.exports import (
        export_self_describing,
        read_self_describing,
    )

    schema = T.StructType([
        T.StructField("k", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("n", T.LongType()),
        T.StructField("tags", T.ArrayType(T.StringType())),
        T.StructField("m", T.MapType(T.StringType(), T.IntegerType())),
    ])
    df = spark.createDataFrame(
        [
            Row(k="a", ts=dt.datetime(2024, 1, 2, 3, 4, 5), n=1,
                tags=["t1", "t2"], m={"x": 1}),
            Row(k="b", ts=dt.datetime(2024, 2, 2), n=None, tags=[], m={}),
        ],
        schema,
    )
    p = str(tmp_path / "out.gnsjson")
    export_self_describing(df, p, order_by=["k"])
    back = read_self_describing(spark, p)
    assert back.schema == schema
    rows = {r.k: r for r in back.collect()}
    assert rows["a"].ts == dt.datetime(2024, 1, 2, 3, 4, 5)
    assert rows["a"].tags == ["t1", "t2"] and rows["a"].m == {"x": 1}
    assert rows["b"].n is None


def test_line_no_fallback_is_per_partition_not_global(spark):
    """Without file metadata (in-memory source), lineNo() numbers rows
    within each input partition — a global Window.orderBy here would funnel
    the whole read through ONE task (the 100-TB serialization trap)."""
    df = spark.range(100).selectExpr("cast(id as string) as v").repartition(4)
    cfg = {
        "type": "json",
        "fields": [
            {"name": "v", "transform": "$v"},
            {"name": "ln", "transform": "lineNo()"},
        ],
    }
    out = apply_converter(spark, cfg, df=df)
    lns = [r.ln for r in out.collect()]
    assert len(lns) == 100
    # numbering restarts in each of the 4 partitions; a global window would
    # produce exactly one 1 and a max of 100
    assert lns.count(1) == 4
    assert max(lns) < 100


def test_standalone_compile_transform_line_no_is_per_partition(spark):
    """compile_transform WITHOUT a line_no provider (callers outside
    apply_converter) must use the same per-partition fallback — round 3
    still had the global Window.orderBy single-task funnel there."""
    from geomesa_nifi_spark.functions.convert import compile_transform

    df = spark.range(100).selectExpr("cast(id as string) as v").repartition(4)
    col = compile_transform("lineNo()", lambda ref: F.col(ref))
    out = df.select(F.col("v"), col.alias("ln"))
    # plan shape: no single-partition global sort anywhere
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan
    lns = [r.ln for r in out.collect()]
    assert lns.count(1) == 4 and max(lns) < 100
