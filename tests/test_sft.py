"""Declared-schema resolver: GeoMesa SFT spec strings + typesafe configs ->
StructType (+ options), mirroring SftArgResolver/SimpleFeatureTypeValidator
(FeatureTypeProcessor.scala:70-92, SimpleFeatureTypeValidatorTest.scala)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from geomesa_nifi_spark.functions.sft import (
    Sft,
    SftParseError,
    parse_config,
    parse_spec_string,
    resolve_sft,
)

# the reference validator's own fixtures (SimpleFeatureTypeValidatorTest.scala:19-27)
REF_VALID = [
    "geomesa {sfts {twitter = {fields = [{name = text, type = String}"
    "{name = username, type = String}{name = geom, type = Point, srid = 4326}]}}}",
    "geomesa { sfts { twitter = {fields = []}} }",
]
REF_INVALID = [
    "dsjhgjkdsfhgkjfdshgjisfkh",
    "geomesa { sfts {} }",
    "geomesa { sfts { twitter = {}} }",
]


@pytest.mark.parametrize("text", REF_VALID)
def test_reference_valid_configs_resolve(text):
    sft = resolve_sft(text)
    assert sft.name == "twitter"


@pytest.mark.parametrize("text", REF_INVALID)
def test_reference_invalid_configs_raise(text):
    with pytest.raises(SftParseError):
        resolve_sft(text)


def test_config_fields_and_srid():
    sft = parse_config(REF_VALID[0])
    assert sft.schema.fieldNames() == ["text", "username", "geom"]
    assert sft.schema["text"].dataType == T.StringType()
    geom = [f for f in sft.fields if f.name == "geom"][0]
    assert geom.geom_type == "Point" and geom.options["srid"] == "4326"
    # single geometry is implicitly the default one
    assert sft.default_geom == "geom"


def test_spec_string_basic():
    sft = parse_spec_string("name:String,age:Int,dtg:Date,*geom:Point:srid=4326")
    assert sft.schema.fieldNames() == ["name", "age", "dtg", "geom"]
    assert sft.schema["age"].dataType == T.IntegerType()
    assert sft.schema["dtg"].dataType == T.TimestampType()  # java.util.Date
    assert sft.default_geom == "geom"
    assert sft.dtg_field == "dtg"
    assert sft.fields[3].options == {"srid": "4326"}


def test_spec_string_user_data_suffix():
    sft = parse_spec_string(
        "name:String,dtg:Date;geomesa.table.sharing='true',geomesa.index.dtg=dtg"
    )
    assert sft.user_data == {
        "geomesa.table.sharing": "true",
        "geomesa.index.dtg": "dtg",
    }
    assert sft.dtg_field == "dtg"


def test_spec_string_collection_types():
    sft = parse_spec_string(
        "friends:List[String],skills:Map[String,Int],payload:Bytes,id:UUID"
    )
    s = sft.schema
    assert s["friends"].dataType == T.ArrayType(T.StringType())
    assert s["skills"].dataType == T.MapType(T.StringType(), T.IntegerType())
    assert s["payload"].dataType == T.BinaryType()
    assert s["id"].dataType == T.StringType()


@pytest.mark.parametrize(
    "bad",
    [
        "",
        "name",  # no type
        "name:Nope",  # unknown type
        "name:String,name:Int",  # duplicate
        "*age:Int",  # default flag on non-geometry
        "x y:String",  # invalid name
        "k=v:String",  # invalid name
    ],
)
def test_spec_string_invalid(bad):
    with pytest.raises(SftParseError):
        parse_spec_string(bad)


def test_all_geometry_kinds():
    spec = ",".join(
        f"g{i}:{t}"
        for i, t in enumerate(
            ["Point", "LineString", "Polygon", "MultiPoint", "MultiLineString",
             "MultiPolygon", "GeometryCollection", "Geometry"]
        )
    )
    sft = parse_spec_string(spec)
    assert [f.geom_type for f in sft.fields] == [
        "Point", "LineString", "Polygon", "MultiPoint", "MultiLineString",
        "MultiPolygon", "GeometryCollection", "Geometry",
    ]
    assert all(f.spark_type == T.StringType() for f in sft.fields)  # WKT carrier


def test_resolver_dispatch_and_name_override():
    assert isinstance(resolve_sft("a:String"), Sft)
    assert resolve_sft("a:String", name="pages").name == "pages"
    assert resolve_sft(REF_VALID[0]).name == "twitter"


def test_lake_table_from_spec_string(spark, tmp_path):
    """LakeTable.create accepts a declared spec: dtg becomes ts_col, user
    data lands in table properties."""
    from geomesa_nifi_spark.lake import LakeTable

    t = LakeTable.create(
        spark,
        str(tmp_path / "sft_table"),
        "url:String,warc_ts:Date,text:String;geomesa.z.splits='4'",
        key_col="url",
    )
    assert t.ts_col == "warc_ts"
    assert t.schema()["warc_ts"].dataType == T.TimestampType()
    assert t.snapshot().properties["sft.geomesa.z.splits"] == "4"
