"""Event-detail star join (SURVEY §2.3 JOIN-2; reference
create_graphql_functions.sql:30-104 landings_on_details /
takeoffs_on_details).

Shape: events (fact) ⋈ flights ON flight_id, then two LEFT joins to
small dimensions — airlines on the *expression key*
substring(callsign,1,3) = icao, countries on airline.country = name.

Scale: both dimension joins are explicit broadcasts (airlines ~6k
rows, countries ~250 in the reference) — no shuffle for the dims; the
fact⋈flights join shuffles once on flight_id or broadcasts the
filtered flights side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def event_details(
    events: DataFrame,
    flights: DataFrame,
    airlines: DataFrame,
    countries: DataFrame,
) -> DataFrame:
    """JOIN-2: enrich landing/takeoff events with flight, airline and
    country attributes."""
    f = flights.alias("f")
    e = events.alias("e")
    a = airlines.alias("a")
    c = countries.alias("c")
    return (
        e.join(f, F.col("e.flight_id") == F.col("f.id"), "inner")
        .join(
            F.broadcast(a),
            F.col("a.icao") == F.substring(F.col("f.callsign"), 1, 3),
            "left",
        )
        .join(F.broadcast(c), F.col("a.country") == F.col("c.name"), "left")
        .select(
            F.col("e.id").alias("event_id"),
            F.col("e.time").alias("time"),
            F.col("e.runway").alias("runway"),
            F.col("f.id").alias("flight_id"),
            F.col("f.hexident").alias("hexident"),
            F.col("f.callsign").alias("callsign"),
            F.col("a.name").alias("airline"),
            F.col("c.name").alias("country"),
            F.col("c.continent").alias("continent"),
        )
    )
