"""GML export golden-byte parity with the reference's ConvertToGeoFile
gml2/gml outputs (ConvertToGeoFileTest.scala:87-178)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from geomesa_nifi_spark.operators.exports import export_gml

GML2_GOLDEN = """<?xml version="1.0" encoding="UTF-8"?><wfs:FeatureCollection xmlns:xs="http://www.w3.org/2001/XMLSchema" xmlns:geomesa="https://geomesa.org" xmlns:wfs="http://www.opengis.net/wfs" xmlns:gml="http://www.opengis.net/gml" xmlns:ogc="http://www.opengis.net/ogc">
  <gml:boundedBy>
    <gml:Box srsName="http://www.opengis.net/gml/srs/epsg.xml#4326">
      <gml:coord>
        <gml:X>-180.0</gml:X>
        <gml:Y>-90.0</gml:Y>
      </gml:coord>
      <gml:coord>
        <gml:X>180.0</gml:X>
        <gml:Y>90.0</gml:Y>
      </gml:coord>
    </gml:Box>
  </gml:boundedBy>
  <gml:featureMember>
    <geomesa:example fid="23623">
      <gml:name>Harry</gml:name>
      <geomesa:age>20</geomesa:age>
      <geomesa:dtg>2015-05-06T00:00:00.000Z</geomesa:dtg>
      <geomesa:geom>
        <gml:Point srsName="http://www.opengis.net/gml/srs/epsg.xml#4326">
          <gml:coordinates>-100.2365,23</gml:coordinates>
        </gml:Point>
      </geomesa:geom>
    </geomesa:example>
  </gml:featureMember>
  <gml:featureMember>
    <geomesa:example fid="26236">
      <gml:name>Hermione</gml:name>
      <geomesa:age>25</geomesa:age>
      <geomesa:dtg>2015-06-07T00:00:00.000Z</geomesa:dtg>
      <geomesa:geom>
        <gml:Point srsName="http://www.opengis.net/gml/srs/epsg.xml#4326">
          <gml:coordinates>40.232,-53.2356</gml:coordinates>
        </gml:Point>
      </geomesa:geom>
    </geomesa:example>
  </gml:featureMember>
  <gml:featureMember>
    <geomesa:example fid="3233">
      <gml:name>Severus</gml:name>
      <geomesa:age>30</geomesa:age>
      <geomesa:dtg>2015-10-23T00:00:00.000Z</geomesa:dtg>
      <geomesa:geom>
        <gml:Point srsName="http://www.opengis.net/gml/srs/epsg.xml#4326">
          <gml:coordinates>3,-62.23</gml:coordinates>
        </gml:Point>
      </geomesa:geom>
    </geomesa:example>
  </gml:featureMember>
</wfs:FeatureCollection>
"""

GML3_GOLDEN = """<?xml version="1.0" encoding="UTF-8"?><wfs:FeatureCollection xmlns:xs="http://www.w3.org/2001/XMLSchema" xmlns:geomesa="https://geomesa.org" xmlns:wfs="http://www.opengis.net/wfs" xmlns:gml="http://www.opengis.net/gml" xmlns:ogc="http://www.opengis.net/ogc" xmlns:ows="http://www.opengis.net/ows" xmlns:xlink="http://www.w3.org/1999/xlink">
  <gml:boundedBy>
    <gml:Envelope srsDimension="2" srsName="http://www.opengis.net/gml/srs/epsg.xml#4326">
      <gml:lowerCorner>-180 -90</gml:lowerCorner>
      <gml:upperCorner>180 90</gml:upperCorner>
    </gml:Envelope>
  </gml:boundedBy>
  <gml:featureMembers>
    <geomesa:example gml:id="23623">
      <gml:name>Harry</gml:name>
      <geomesa:age>20</geomesa:age>
      <geomesa:dtg>2015-05-06T00:00:00.000Z</geomesa:dtg>
      <geomesa:geom>
        <gml:Point srsName="http://www.opengis.net/gml/srs/epsg.xml#4326" srsDimension="2">
          <gml:pos>-100.2365 23</gml:pos>
        </gml:Point>
      </geomesa:geom>
    </geomesa:example>
    <geomesa:example gml:id="26236">
      <gml:name>Hermione</gml:name>
      <geomesa:age>25</geomesa:age>
      <geomesa:dtg>2015-06-07T00:00:00.000Z</geomesa:dtg>
      <geomesa:geom>
        <gml:Point srsName="http://www.opengis.net/gml/srs/epsg.xml#4326" srsDimension="2">
          <gml:pos>40.232 -53.2356</gml:pos>
        </gml:Point>
      </geomesa:geom>
    </geomesa:example>
    <geomesa:example gml:id="3233">
      <gml:name>Severus</gml:name>
      <geomesa:age>30</geomesa:age>
      <geomesa:dtg>2015-10-23T00:00:00.000Z</geomesa:dtg>
      <geomesa:geom>
        <gml:Point srsName="http://www.opengis.net/gml/srs/epsg.xml#4326" srsDimension="2">
          <gml:pos>3 -62.23</gml:pos>
        </gml:Point>
      </geomesa:geom>
    </geomesa:example>
  </gml:featureMembers>
</wfs:FeatureCollection>
"""


def _features(spark):
    rows = [
        Row(fid="23623", name="Harry", age=20,
            dtg=dt.datetime(2015, 5, 6), geom="POINT (-100.2365 23)"),
        Row(fid="26236", name="Hermione", age=25,
            dtg=dt.datetime(2015, 6, 7), geom="POINT (40.232 -53.2356)"),
        Row(fid="3233", name="Severus", age=30,
            dtg=dt.datetime(2015, 10, 23), geom="POINT (3 -62.23)"),
    ]
    return spark.createDataFrame(
        rows, "fid string, name string, age int, dtg timestamp, geom string"
    )


def test_gml2_golden_bytes(spark, tmp_path):
    p = export_gml(
        _features(spark), str(tmp_path / "example.gml2"), version=2,
        fid_col="fid", geom_cols={"geom"}, order_by=["dtg"],
    )
    assert open(p, encoding="utf-8").read() == GML2_GOLDEN


def test_gml3_golden_bytes(spark, tmp_path):
    p = export_gml(
        _features(spark), str(tmp_path / "example.gml"), version=3,
        fid_col="fid", geom_cols={"geom"}, order_by=["dtg"],
    )
    assert open(p, encoding="utf-8").read() == GML3_GOLDEN


def test_gml_escapes_markup(spark, tmp_path):
    df = spark.createDataFrame(
        [Row(fid="1", name="a & <b>", age=1, dtg=dt.datetime(2020, 1, 1),
             geom="POINT (1 2)")],
        "fid string, name string, age int, dtg timestamp, geom string",
    )
    p = export_gml(df, str(tmp_path / "esc.gml2"), version=2,
                   fid_col="fid", geom_cols={"geom"})
    text = open(p, encoding="utf-8").read()
    assert "<gml:name>a &amp; &lt;b&gt;</gml:name>" in text


def test_gml_null_attribute_omitted(spark, tmp_path):
    df = spark.createDataFrame(
        [Row(fid="1", name=None, age=7, dtg=None, geom=None)],
        "fid string, name string, age int, dtg timestamp, geom string",
    )
    p = export_gml(df, str(tmp_path / "nul.gml2"), version=2,
                   fid_col="fid", geom_cols={"geom"})
    text = open(p, encoding="utf-8").read()
    assert "<geomesa:age>7</geomesa:age>" in text
    assert "gml:name" not in text and "gml:Point" not in text
