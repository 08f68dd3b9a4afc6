"""Batch ETL assembly: the reference's whole ingest pipeline
(SURVEY §3.1) as one deterministic batch job.

raw SBS-1 lines
  → SRC-3 gate + PRJ-1..5 parse/normalize
  → FLT-1 altitude filter (run.py:28 wires below=10000)
  → FLT-3 field dispatch
  → STATE-1 batch sessionization (gap > 300 s per hexident)
  → FLT-2 admission (a session only becomes a flight if its first
    message is MSG2 or MSG3 — flights.py:92-93)
  → AGG-6 flight summaries (the `flights` table)
  → FLT-4 position validity → the `positions` table (PRJ-5 meters)
  → STATE-3 edges + STATE-4 debounce + PRJ-7 interpolated track
  → JOIN-5 runway attribution
  → the `landings` / `takeoffs` tables

Surrogate ids are dense row_numbers over the natural ordering
(hexident, session start) so re-runs are bit-reproducible — the
reference's sequences are non-deterministic across runs, which its own
oracle problem notes (SURVEY §7 "Non-deterministic ids").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.conversions import interpolated_track
from ..operators import parse
from ..operators.attribution import attribute_runway
from ..operators.events import (
    classify_intention,
    debounce_events,
    detect_onground_edges,
)
from ..operators.sessionize import flight_summaries, sessionize


def build_tables(
    raw_lines: DataFrame,
    runways: DataFrame | None = None,
    airport: DataFrame | None = None,
    altitude_below: float = 10000.0,
    session_gap_s: int = 300,
) -> dict[str, DataFrame]:
    """Run the full pipeline; returns {'flights', 'positions',
    'landings', 'takeoffs'} DataFrames with the reference's table
    shapes (FIXTURES.md §3)."""
    msgs = parse.parse_sbs1_lines(raw_lines)
    msgs = parse.altitude_filter(msgs, below=altitude_below)
    msgs = parse.dispatch_fields(msgs)
    msgs = parse.with_altitude_m(msgs)

    sess = sessionize(msgs, gap_s=session_gap_s)

    # FLT-2 admission: first message of the session must be MSG2/MSG3
    first_type = F.min_by("transmission_type", F.struct("gen_date_time")).alias(
        "_first_type"
    )
    admitted_keys = (
        sess.groupBy("hexident", "session_id")
        .agg(first_type)
        .filter(F.col("_first_type").isin(2, 3))
        .select("hexident", "session_id")
    )
    sess = sess.join(admitted_keys, ["hexident", "session_id"], "left_semi")

    # flights table with dense deterministic ids
    summaries = flight_summaries(sess)
    # flight_summaries already carries last_onground (last-non-null
    # wins, AGG-6); only the first observation is added here
    onground_state = (
        sess.filter(F.col("onground").isNotNull())
        .groupBy("hexident", "session_id")
        .agg(F.min_by("onground", "gen_date_time").alias("first_onground"))
    )
    flights_w = Window.orderBy("first_seen", "hexident", "session_id")
    flights = (
        summaries.join(onground_state, ["hexident", "session_id"], "left")
        .withColumn("id", F.row_number().over(flights_w))
    )
    flights = classify_intention(flights).select(
        "id", "hexident", "session_id",
        F.col("last_callsign").alias("callsign"),
        "first_seen", "last_seen", "intention", "n_messages",
    )

    key = ["hexident", "session_id"]
    fid = flights.select(*key, F.col("id").alias("flight_id"))

    # positions table (FLT-4 validity, meters altitude)
    pos_w = Window.orderBy("time", "flight_id")
    positions = (
        parse.position_validity(sess)
        .join(fid, key)
        .select(
            F.col("flight_id"),
            F.col("gen_date_time").alias("time"),
            "longitude", "latitude", "altitude_m",
            F.col("verticalrate").cast("short").alias("verticalrate"),
            F.col("track").cast("short").alias("track"),
            "onground",
        )
        .withColumn("id", F.row_number().over(pos_w))
        .select("id", "flight_id", "time", "longitude", "latitude",
                "altitude_m", "verticalrate", "track", "onground")
    )

    # events: edges on the session stream, debounced, with PRJ-7 track
    tracked = interpolated_track(sess)
    # carry the last known position forward so MSG1/8-triggered flips
    # still have coordinates (reference uses the flight's last position)
    carry_w = (
        Window.partitionBy(*key)
        .orderBy("gen_date_time")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tracked = (
        tracked.withColumn("longitude", F.last("longitude", True).over(carry_w))
        .withColumn("latitude", F.last("latitude", True).over(carry_w))
        .withColumn("interp_track", F.last("interp_track", True).over(carry_w))
    )
    edges = debounce_events(detect_onground_edges(tracked))

    if runways is not None:
        edges = attribute_runway(edges, runways, airport)
    else:
        edges = edges.withColumn("runway", F.lit("UNK"))

    edges = edges.join(fid, key)
    ev_w = Window.orderBy("gen_date_time", "flight_id")
    events = edges.withColumn("eid", F.row_number().over(ev_w)).select(
        F.col("eid").alias("id"),
        "flight_id",
        F.col("gen_date_time").alias("time"),
        "runway",
        "event_type",
    )
    landings = events.filter(F.col("event_type") == "landing").drop("event_type")
    takeoffs = events.filter(F.col("event_type") == "takeoff").drop("event_type")

    return {
        "flights": flights.drop("session_id"),
        "positions": positions,
        "landings": landings,
        "takeoffs": takeoffs,
    }


def refresh_materialized(df: DataFrame, path: str) -> None:
    """Materialized-view refresh (SURVEY §2.1 #5,
    create_materialized_views.sql:51-76): overwrite-write the
    precomputed result — scheduling is the caller's concern."""
    df.write.mode("overwrite").parquet(path)
