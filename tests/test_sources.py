"""Sources & sinks: CSV dimension loaders (SRC-4), binaryFile image
scan (SRC-5), live-retention view (SNK-2/3), id-remap copy (SNK-5),
conversion helpers."""

import datetime
import os
import struct

import pytest
from pyspark.sql import functions as F

from dump1090_postgis_spark.functions.conversions import (
    angle2compass,
    angle2winddir,
    feet2m,
    winddir2angle,
)
from dump1090_postgis_spark.operators.copy import remap_ids
from dump1090_postgis_spark.operators.retention import (
    positions_live,
    retention_delete_plan,
)
from dump1090_postgis_spark.sources.dims import (
    load_airlines_csv,
    load_aircraft_images,
)

D = datetime.datetime


def test_load_airlines_csv(spark, tmp_path):
    p = tmp_path / "airlines.csv"
    p.write_text(
        'id,name,alias,iata,icao,callsign,country,active\n'
        '1,"Air France",,AF,AFR,AIRFRANS,France,Y\n'
        '2,"Lufthansa",,LH,DLH,LUFTHANSA,Germany,Y\n'
    )
    out = load_airlines_csv(spark, str(p)).collect()
    assert len(out) == 2
    assert out[0].icao == "AFR" and out[0].country == "France"
    assert out[0].id == 1  # declared schema, no inference


def _tiny_bmp() -> bytes:
    # minimal BMP header (14 bytes) + fake pixel data — enough for the
    # binaryFile scan; content is opaque to the loader
    return b"BM" + struct.pack("<IHHI", 26, 0, 0, 26) + b"\x00" * 12


def test_load_aircraft_images(spark, tmp_path):
    (tmp_path / "A320.bmp").write_bytes(_tiny_bmp())
    (tmp_path / "B738.bmp").write_bytes(_tiny_bmp())
    (tmp_path / "notes.txt").write_text("ignored")  # glob excludes
    out = load_aircraft_images(spark, str(tmp_path)).collect()
    models = sorted(r.model for r in out)
    assert models == ["A320", "B738"]
    assert all(r.image_bytes == 26 for r in out)
    assert all(bytes(r.image[:2]) == b"BM" for r in out)


def test_positions_live_and_retention_complement(spark):
    now = D(2024, 5, 2, 12, 0)
    df = spark.createDataFrame(
        [
            (1, D(2024, 5, 2, 11, 0)),   # within 24 h
            (2, D(2024, 5, 1, 12, 0)),   # exactly 24 h → kept (>=)
            (3, D(2024, 5, 1, 11, 59)),  # older → deleted
        ],
        "id long, time timestamp",
    )
    live = {r.id for r in positions_live(df, now=now).collect()}
    dead = {r.id for r in retention_delete_plan(df, now=now).collect()}
    assert live == {1, 2} and dead == {3}
    assert live | dead == {1, 2, 3} and not (live & dead)


def test_remap_ids_fk_consistency(spark):
    flights = spark.createDataFrame(
        [(5, "AAA"), (9, "BBB"), (12, "CCC")], "id long, hexident string"
    )
    positions = spark.createDataFrame(
        [(1, 5), (2, 5), (3, 12), (4, 9)], "pid long, flight_id long"
    )
    new_flights, children = remap_ids(
        flights, {"positions": positions}, flight_ids=[5, 12], id_offset=1000
    )
    nf = {r.hexident: r.id for r in new_flights.collect()}
    assert nf == {"AAA": 1001, "CCC": 1002}  # dense, ordered by old id
    np_ = sorted((r.pid, r.flight_id) for r in children["positions"].collect())
    assert np_ == [(1, 1001), (2, 1001), (3, 1002)]  # fk follows; BBB's dropped


@pytest.mark.parametrize(
    "fn,inp,expected",
    [
        (feet2m, 1000.0, 304.8),
        (angle2compass, 90.0, 0.0),    # east (math) → north? no: (450-90)%360=0
        (angle2compass, 0.0, 90.0),    # math 0° (east) → compass 90°
        (winddir2angle, 270.0, 0.0),
        (angle2winddir, 0.0, 270.0),
    ],
)
def test_conversions(spark, fn, inp, expected):
    out = spark.range(1).select(fn(F.lit(inp)).alias("v")).collect()[0].v
    assert out == pytest.approx(expected)
