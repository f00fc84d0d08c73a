"""WKT <-> WKB point serialization (records/package.scala:182-194,
geometry-serialization text|binary)."""

from __future__ import annotations

import struct

from pyspark.sql import functions as F

from geomesa_nifi_spark.functions.geometry import (
    wkb_point_bytes,
    wkb_point_to_wkt,
    wkt_point_to_wkb,
)


def test_wkb_bytes_layout():
    b = wkb_point_bytes(-100.2365, 23.0)
    assert len(b) == 21 and b[0] == 1
    assert struct.unpack("<I", b[1:5])[0] == 1  # point type
    assert struct.unpack("<dd", b[5:21]) == (-100.2365, 23.0)


def test_wkt_wkb_roundtrip(spark):
    df = spark.createDataFrame(
        [("a", "POINT (-100.2365 23)"), ("b", "POINT (3 -62.23)"),
         ("c", None), ("d", "LINESTRING (0 0, 1 1)")],
        "k string, wkt string",
    )
    out = df.select(
        "k", "wkt",
        wkt_point_to_wkb("wkt").alias("wkb"),
    ).select("k", "wkt", "wkb", wkb_point_to_wkt("wkb").alias("back")).collect()
    rows = {r["k"]: r for r in out}
    assert bytes(rows["a"]["wkb"]) == wkb_point_bytes(-100.2365, 23.0)
    assert rows["a"]["back"] == "POINT (-100.2365 23)"
    assert rows["b"]["back"] == "POINT (3 -62.23)"
    assert rows["c"]["wkb"] is None and rows["c"]["back"] is None
    assert rows["d"]["wkb"] is None  # non-point: null, not garbage


def test_wkb_big_endian_decodes(spark):
    import struct as st

    be = b"\x00" + st.pack(">I", 1) + st.pack(">dd", 1.5, 2.5)
    df = spark.createDataFrame([(bytearray(be),)], "wkb binary")
    r = df.select(wkb_point_to_wkt("wkb").alias("w")).first()
    assert r["w"] == "POINT (1.5 2.5)"
