"""The reference's query API surface (plans.adsb): landings_on,
fromto, histograms, peak hour, flight paths, details star join,
matview refresh job."""

import datetime

import pytest
from pyspark.sql import functions as F

from dump1090_postgis_spark.plans import adsb

D = datetime.datetime


@pytest.fixture(scope="module")
def tables(spark):
    flights = spark.createDataFrame(
        [
            (1, "AAA111", "AFR123", D(2024, 5, 1, 9, 0), D(2024, 5, 1, 10, 0), "arrival"),
            (2, "BBB222", "DLH456", D(2024, 5, 2, 9, 0), D(2024, 5, 2, 10, 0), "departure"),
            (3, "CCC333", None, D(2024, 5, 2, 11, 0), D(2024, 5, 2, 12, 0), "unknown"),
        ],
        "id long, hexident string, callsign string, first_seen timestamp,"
        " last_seen timestamp, intention string",
    )
    landings = spark.createDataFrame(
        [
            (10, 1, D(2024, 5, 1, 9, 58), "03"),
            (11, 3, D(2024, 5, 2, 11, 30), "21"),
        ],
        "id long, flight_id long, time timestamp, runway string",
    )
    takeoffs = spark.createDataFrame(
        [(20, 2, D(2024, 5, 2, 9, 5), "21")],
        "id long, flight_id long, time timestamp, runway string",
    )
    positions = spark.createDataFrame(
        [
            (100, 1, D(2024, 5, 1, 9, 50), -1.60, 47.14, 300.0),
            (101, 1, D(2024, 5, 1, 9, 55), -1.61, 47.15, 100.0),
            (102, 1, D(2024, 5, 1, 9, 58), -1.62, 47.16, 0.0),
            (103, 2, D(2024, 5, 2, 9, 5), -1.70, 47.20, 50.0),
        ],
        "id long, flight_id long, time timestamp, longitude double,"
        " latitude double, altitude_m double",
    )
    airlines = spark.createDataFrame(
        [(1, "Air France", "AFR", "France"), (2, "Lufthansa", "DLH", "Germany")],
        "id int, name string, icao string, country string",
    )
    countries = spark.createDataFrame(
        [(1, "France", "EU"), (2, "Germany", "EU")],
        "id int, name string, continent string",
    )
    return dict(flights=flights, landings=landings, takeoffs=takeoffs,
                positions=positions, airlines=airlines, countries=countries)


def test_landings_on(tables):
    out = adsb.landings_on(tables["landings"], datetime.date(2024, 5, 1)).collect()
    assert [r.id for r in out] == [10]


def test_fromto_local_dates(tables):
    out = adsb.takeoffs_fromto(
        tables["takeoffs"], datetime.date(2024, 5, 2), datetime.date(2024, 5, 3)
    ).collect()
    assert [r.id for r in out] == [20]


def test_events_histogram_all_union_semantics(tables):
    # duplicate event rows across landings/takeoffs would be collapsed
    # by SQL UNION; counts come from the distinct union
    out = adsb.events_histogram_all(
        tables["landings"].select("flight_id", "time"),
        tables["takeoffs"].select("flight_id", "time"),
        D(2024, 5, 1), D(2024, 5, 3), "day",
        tz=None,
    ).collect()
    assert [r.events for r in out] == [1, 2, 0]


def test_peak_hour_all(tables):
    out = adsb.peak_hour_all(
        tables["landings"].select("time"), tables["takeoffs"].select("time")
    ).collect()
    assert len(out) == 2  # two local days with events
    assert all(r.events >= 1 for r in out)


def test_flight_path_wkt_ordering(tables):
    out = {r.flight_id: r.wkt for r in adsb.flight_path(tables["positions"]).collect()}
    assert out[1] == "LINESTRING (-1.6 47.14, -1.61 47.15, -1.62 47.16)"


def test_flight_path_geojson_selected_ids(tables):
    out = adsb.flight_path_geojson(tables["positions"], [2]).collect()
    assert len(out) == 1
    assert out[0].geojson == (
        '{"type":"LineString","coordinates":[[-1.7,47.2]]}'
    )


def test_landings_on_details_star(tables):
    out = adsb.landings_on_details(
        tables["landings"], tables["flights"], tables["airlines"],
        tables["countries"], datetime.date(2024, 5, 1),
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.airline == "Air France" and r.country == "France"
    assert r.runway == "03" and r.hexident == "AAA111"


def test_details_null_airline_for_unknown_callsign(tables):
    out = adsb.landings_on_details(
        tables["landings"], tables["flights"], tables["airlines"],
        tables["countries"], datetime.date(2024, 5, 2),
    ).collect()
    assert len(out) == 1 and out[0].airline is None  # callsign NULL → left join


def test_takeoff_paths_period(tables):
    out = adsb.takeoff_paths_period(
        tables["takeoffs"], tables["positions"],
        datetime.date(2024, 5, 1), datetime.date(2024, 5, 31),
    ).collect()
    assert len(out) == 1 and out[0].runway == "21" and "LINESTRING" in out[0].wkt
