"""GeoJSON exports (SNK-4): Point / LineString / Polygon builders emit
valid, correctly-shaped GeoJSON (parsed back with json.loads)."""

import json

import pytest
from pyspark.sql import functions as F

from dump1090_postgis_spark.functions.geo import (
    linestring_geojson,
    point_geojson,
    polygon_geojson,
)


def test_point_geojson(spark):
    out = (
        spark.range(1)
        .select(point_geojson(F.lit(-1.607778), F.lit(47.156944)).alias("g"))
        .collect()[0]
        .g
    )
    obj = json.loads(out)
    assert obj["type"] == "Point"
    assert obj["coordinates"] == [-1.607778, 47.156944]


def test_linestring_geojson_truncates_decimals(spark):
    df = spark.createDataFrame(
        [([{"lon": -1.123456789, "lat": 47.0}, {"lon": -1.2, "lat": 47.5}],)],
        "coords array<struct<lon:double,lat:double>>",
    )
    out = df.select(linestring_geojson(F.col("coords"), 6).alias("g")).collect()[0].g
    obj = json.loads(out)
    assert obj["type"] == "LineString"
    assert obj["coordinates"][0] == [-1.123457, 47.0]  # 6-dp rounding, zeros trimmed
    assert obj["coordinates"][1] == [-1.2, 47.5]


def test_polygon_geojson_closes_ring(spark):
    # open ring in → closed ring out (first vertex repeated)
    ring = [{"lon": 0.0, "lat": 0.0}, {"lon": 1.0, "lat": 0.0},
            {"lon": 1.0, "lat": 1.0}]
    df = spark.createDataFrame([(ring,)], "ring array<struct<lon:double,lat:double>>")
    out = df.select(polygon_geojson(F.col("ring")).alias("g")).collect()[0].g
    obj = json.loads(out)
    assert obj["type"] == "Polygon"
    coords = obj["coordinates"][0]
    assert coords[0] == coords[-1] == [0, 0]
    assert len(coords) == 4
