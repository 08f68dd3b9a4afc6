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

Surrogate ids are dense, deterministic, and assigned fully in
parallel (operators.ids two-pass range-partition scheme) following the
natural ordering — the reference's sequences are non-deterministic
across runs, which its own oracle problem notes (SURVEY §7
"Non-deterministic ids").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.storagelevel import StorageLevel

from ..functions.conversions import interpolated_track
from ..operators import parse
from ..operators.attribution import attribute_runway
from ..operators.events import (
    classify_intention,
    debounce_events,
    detect_onground_edges,
)
from ..operators.ids import release_caches, with_dense_ids
from ..operators.sessionize import flight_summaries, sessionize


def build_tables(
    raw_lines: DataFrame,
    runways: DataFrame | None = None,
    airport: DataFrame | None = None,
    altitude_below: float = 10000.0,
    session_gap_s: int = 300,
    output_path: str | None = None,
    caches: list[DataFrame] | None = None,
) -> dict[str, DataFrame]:
    """Run the full pipeline; returns {'flights', 'positions',
    'landings', 'takeoffs'} DataFrames with the reference's table
    shapes (FIXTURES.md §3).

    Cache lifecycle (the session stream + each dense-id layout pin are
    persisted DISK_ONLY):

    - ``output_path`` given — the scale path: each table is written to
      ``{output_path}/{name}`` as parquet (time tables date-partitioned
      with a ``_dt`` directory column, positions clustered by
      flight_id — operators/storage.py; the read-back frames carry
      ``_dt`` and plans/adsb.py's FLT-5/6 helpers prune on it), every
      internal cache is unpersisted, and the returned DataFrames read
      back from parquet.  Nothing stays pinned after the call
      (asserted in tests).
    - ``caches`` given — lazy mode for composition: internal persists
      are appended; call ``operators.ids.release_caches(caches)`` after
      materializing the outputs.
    - neither — legacy lazy mode; caches stay pinned for the session
      (fine for short-lived jobs/tests, leaks in long-lived drivers).
    """
    registry: list[DataFrame] = caches if caches is not None else []
    msgs = parse.parse_sbs1_lines(raw_lines)
    msgs = parse.dispatch_fields(msgs)
    msgs = parse.with_altitude_m(msgs)

    # FLT-1/FLT-2 admission (flights.py:86-108 CASE B): the altitude
    # filter applies ONLY to the MSG3 admission test of an unknown
    # aircraft — post-admission messages are never filtered.  The
    # reference re-tries admission on every message, so a flight
    # starts at the session's FIRST ADMISSIBLE message (MSG2, or MSG3
    # with altitude present — the reference filter is strict — and in
    # band) and everything before it is dropped; gap sessionization
    # over ALL messages reproduces the pool's lifetime exactly
    # (pre-admission rows only ever glue boundaries, which matches the
    # reference's last_seen updates / unknown-aircraft drops in every
    # constructible sequence).
    admissible = (F.col("transmission_type") == 2) | (
        (F.col("transmission_type") == 3)
        & F.col("altitude").isNotNull()
        & (F.col("altitude") > F.lit(-1000.0))
        & (F.col("altitude") < F.lit(altitude_below))
    )

    # The session stream fans out into four output tables — persist it
    # so parse+sessionize (one scan + one shuffle) run once, not per
    # table.
    raw_sess = sessionize(msgs, gap_s=session_gap_s)
    key0 = ["hexident", "session_id"]
    admission_ts = (
        raw_sess.filter(admissible)
        .groupBy(*key0)
        .agg(F.min("gen_date_time").alias("_adm_ts"))
    )
    sess = (
        raw_sess.join(admission_ts, key0, "inner")  # drops never-admitted
        .filter(F.col("gen_date_time") >= F.col("_adm_ts"))
        .drop("_adm_ts")
        .persist(StorageLevel.DISK_ONLY)
    )
    registry.append(sess)

    # One groupBy produces the flight summaries AND the intention
    # inputs (no separate aggregations over the same key).
    admitted = flight_summaries(
        sess,
        extra_aggs=[
            F.min_by(
                F.col("onground"),
                F.when(F.col("onground").isNotNull(), F.col("gen_date_time")),
            ).alias("first_onground"),
            # airborne-in-between signal: splits a complete
            # gate-to-gate flight (→ departure, the reference's
            # first-position-onground rule) from a taxi-only session
            # (→ unknown) — endpoint flags alone cannot tell them
            # apart.  bool_or skips NULLs; all-NULL coalesces to
            # "never seen airborne" inside classify_intention.
            F.bool_or(F.col("onground") == F.lit(False)).alias(
                "any_airborne"
            ),
        ],
    )
    flights = with_dense_ids(
        admitted, ["first_seen", "hexident", "session_id"], "id", caches=registry
    )
    flights = classify_intention(flights).select(
        "id", "hexident", "session_id",
        F.col("last_callsign").alias("callsign"),
        "first_seen", "last_seen", "intention", "n_messages",
    )

    key = ["hexident", "session_id"]
    fid = flights.select(*key, F.col("id").alias("flight_id"))

    # positions table (FLT-4 validity, meters altitude); non-admitted
    # sessions drop out via the inner join on fid
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
    )
    positions = with_dense_ids(
        positions, ["time", "flight_id"], "id", caches=registry
    ).select(
        "id", "flight_id", "time", "longitude", "latitude",
        "altitude_m", "verticalrate", "track", "onground",
    )

    # Events fire ONLY from valid-position MSG2/MSG3 rows — the
    # reference's update_onground is called solely from the
    # append-position branches (models.py:196-215); onground carried by
    # MSG1/4/8 updates state silently, never events.  PRJ-7 heading is
    # therefore computed over consecutive POSITION rows, matching
    # `interpolate_track(positions[-2:])` (models.py:134-140).
    pos_rows = parse.position_validity(sess)
    tracked = interpolated_track(pos_rows)
    edges = debounce_events(detect_onground_edges(tracked))

    if runways is not None:
        edges = attribute_runway(edges, runways, airport)
    else:
        edges = edges.withColumn("runway", F.lit("UNK"))

    edges = edges.join(fid, key)
    # Landings and takeoffs are numbered INDEPENDENTLY — the reference
    # draws from separate per-table sequences (landings_id_seq /
    # takeoffs_id_seq, create_public_schema.sql:606-683), so each table
    # gets its own dense 1..n id space.
    event_cols = [
        "flight_id",
        F.col("gen_date_time").alias("time"),
        "runway",
    ]
    landings = with_dense_ids(
        edges.filter(F.col("event_type") == "landing"),
        ["gen_date_time", "flight_id"], "id", caches=registry,
    ).select("id", *event_cols)
    takeoffs = with_dense_ids(
        edges.filter(F.col("event_type") == "takeoff"),
        ["gen_date_time", "flight_id"], "id", caches=registry,
    ).select("id", *event_cols)

    tables = {
        "flights": flights.drop("session_id"),
        "positions": positions,
        "landings": landings,
        "takeoffs": takeoffs,
    }
    if output_path is not None:
        from ..operators.storage import write_time_partitioned

        spark = raw_lines.sparkSession
        out: dict[str, DataFrame] = {}
        for name, df in tables.items():
            path = f"{output_path}/{name}"
            # The Spark analog of the reference's physical schema
            # (create_public_schema.sql:759-811 btree-on-time indexes +
            # CLUSTER ON idx_positions_flight_id): time tables are
            # date-partitioned so FLT-5/6 predicates prune whole
            # directories, positions additionally clustered by
            # flight_id so trajectory assembly reads co-located,
            # pre-sorted keys.  Read-back frames therefore carry the
            # `_dt` partition column (adsb.py's date helpers use it).
            if name in ("positions", "landings", "takeoffs"):
                write_time_partitioned(
                    df, path, ts="time",
                    cluster_key="flight_id" if name == "positions" else None,
                )
                # explicit schema: an EMPTY partitioned write leaves no
                # data files to infer from (zero-takeoff captures)
                schema = T.StructType(
                    df.schema.fields + [T.StructField("_dt", T.DateType())]
                )
                out[name] = spark.read.schema(schema).parquet(path)
            else:
                df.write.mode("overwrite").parquet(path)
                out[name] = spark.read.parquet(path)
        release_caches(registry)
        return out
    return tables


def refresh_materialized(df: DataFrame, path: str) -> None:
    """Materialized-view refresh (SURVEY §2.1 #5,
    create_materialized_views.sql:51-76): overwrite-write the
    precomputed result — scheduling is the caller's concern."""
    df.write.mode("overwrite").parquet(path)
