"""WKB geometry functions (functions/geo.py).

Byte-level pinning against struct.pack proves the encoder emits real
standard WKB; decode tests cover arbitrary doubles (fractions,
negatives, subnormals) from Python-packed bytes; the native-type glue
round-trips through this build's GEOMETRY/GEOGRAPHY types.
"""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from iceberg_matrix_spark.functions.geo import (
    bbox_contains,
    geometry_to_wkb,
    to_geometry,
    wkb_point,
    wkb_x,
    wkb_y,
)
from iceberg_matrix_spark.session import local_df


def _pack(x: float, y: float) -> bytes:
    return struct.pack("<BIdd", 1, 1, float(x), float(y))


COORDS = [(0, 0), (1, 2), (-1, -2), (180, -90), (123456789, -987654321), (7, 0)]


def test_wkb_point_fractional_coords(spark):
    """The reflect-based encoder handles arbitrary doubles, not just
    integer-valued coordinates."""
    vals = [(1.5, -2.25), (-123.456, 789.0001), (1e-300, 5e-324)]
    df = local_df(spark, vals, "x double, y double").select(
        "x", "y", wkb_point("x", "y").alias("g")
    )
    for r in df.collect():
        assert bytes(r["g"]) == _pack(r["x"], r["y"]), (r["x"], r["y"])


def test_wkb_point_bytes_match_struct_pack(spark):
    df = local_df(spark, COORDS, "x long, y long").select(
        "x", "y", wkb_point("x", "y").alias("g")
    )
    for r in df.collect():
        assert bytes(r["g"]) == _pack(r["x"], r["y"]), (r["x"], r["y"])


def test_wkb_decode_roundtrip_integer_coords(spark):
    df = local_df(spark, COORDS, "x long, y long").select(
        "x", "y", wkb_point("x", "y").alias("g")
    )
    got = df.select("x", "y", wkb_x("g").alias("dx"), wkb_y("g").alias("dy")).collect()
    for r in got:
        assert r["dx"] == float(r["x"]) and r["dy"] == float(r["y"])


def test_wkb_decode_arbitrary_doubles(spark):
    """Decode must be bit-exact for any normal double, not just ints —
    bytes come from Python's struct, the reference encoder."""
    vals = [
        (1.5, -2.25),
        (-123.456, 789.0001),
        (3.141592653589793, -2.718281828459045),
        (1e-300, -1e300),
        (5e-324, 2.2250738585072014e-308),  # subnormal min + normal min
    ]
    rows = [(i, bytearray(_pack(x, y))) for i, (x, y) in enumerate(vals)]
    df = local_df(spark, rows, "i int, g binary")
    got = {r["i"]: (r["x"], r["y"]) for r in df.select(
        "i", wkb_x("g").alias("x"), wkb_y("g").alias("y")).collect()}
    for i, (x, y) in enumerate(vals):
        assert got[i] == (x, y), (i, got[i], (x, y))


def test_bbox_contains_filters(spark):
    pts = [(i, i * 10 - 50, i * 7 - 20) for i in range(11)]  # x∈[-50,50], y∈[-20,50]
    df = local_df(spark, pts, "i long, x long, y long").select(
        "i", "x", "y", wkb_point("x", "y").alias("g")
    )
    inside = df.filter(bbox_contains("g", -30.0, -10.0, 30.0, 25.0))
    expect = [i for i, x, y in pts if -30 <= x <= 30 and -10 <= y <= 25]
    assert sorted(r["i"] for r in inside.collect()) == expect


def test_bbox_plan_is_pure_catalyst(spark):
    df = local_df(spark, [(1, 2)], "x long, y long").select(
        wkb_point("x", "y").alias("g")
    )
    plan = df.filter(bbox_contains("g", 0.0, 0.0, 9.0, 9.0))._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan  # no Python worker anywhere in the plan


def test_native_geometry_roundtrip(spark):
    """WKB → native GEOMETRY(4326) → WKB through this build's st_* io
    (the reference's V3 GEOMETRY exercise, iceberg_feature_tests.py:1386)."""
    spark.conf.set("spark.sql.geospatial.enabled", "true")
    df = local_df(spark, [(3, 4)], "x long, y long").select(
        wkb_point("x", "y").alias("g")
    )
    native = df.select(to_geometry("g").alias("geom"))
    assert "geometry" in native.schema["geom"].dataType.simpleString().lower()
    back = native.select(geometry_to_wkb("geom").alias("g2")).collect()[0]["g2"]
    assert bytes(back) == _pack(3, 4)
    srid = native.select(F.expr("st_srid(geom)").alias("s")).collect()[0]["s"]
    assert srid == 4326
