"""Keyed sessionization with inactivity timeout + per-session summaries
(SURVEY §2.8 STATE-1, §2.4 AGG-6).

The reference holds a dict of live Flight objects keyed by hexident
and evicts entries older than MAX_AGE=300 s of *processing* time
(flights.py:14-137).  The deterministic batch analog (the documented,
testable semantics — SURVEY §7 "What's hard") is event-time gap
sessionization: a new session starts when the gap to the key's
previous message exceeds the timeout.

Spark shape: one window (lag + running sum) over
partitionBy(key).orderBy(ts) — a single hash-partition shuffle on the
session key, then everything else is within-partition.  At 100 TB this
is the minimal possible movement for a keyed-session computation: the
subsequent groupBy(key, session_id) reuses the same partitioning, so
Catalyst plans ZERO additional exchanges for the summary aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.timeutil import epoch_micros

SESSION_MAX_AGE_S = 300  # flights.py:18 MAX_AGE


def sessionize(
    df: DataFrame,
    key: str = "hexident",
    ts: str = "gen_date_time",
    gap_s: int = SESSION_MAX_AGE_S,
) -> DataFrame:
    """Assign a session_id per key: cumulative count of gap>timeout
    boundaries in event-time order (STATE-1 batch analog).

    Output adds `session_id` (0-based within key).
    """
    w = Window.partitionBy(key).orderBy(ts)
    gap = epoch_micros(F.col(ts)) - F.lag(epoch_micros(F.col(ts))).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_s * 1_000_000), 1).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(is_new).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        - 1,
    )


def flight_summaries(
    sessions: DataFrame,
    key: str = "hexident",
    ts: str = "gen_date_time",
    last_value_fields: tuple[str, ...] = (
        "callsign",
        "altitude",
        "speed",
        "track",
        "verticalrate",
        "squawk",
        "onground",
    ),
    extra_aggs: list | None = None,
) -> DataFrame:
    """AGG-6 (models.py:110-121,142-216): per (key, session_id) —
    first_seen = min(ts), last_seen = max(ts), last-non-null-wins for
    each tracked field, and per-transmission-type message counts.

    Last-non-null-wins is expressed as max_by(field, ts-where-non-null):
    deterministic regardless of partition order (Spark's
    last(ignorenulls) under groupBy is order-dependent — avoided).
    Runs as a single partial+final hash aggregation; no extra shuffle
    after ``sessionize`` because the grouping key prefix matches.
    """
    aggs = [
        F.min(ts).alias("first_seen"),
        F.max(ts).alias("last_seen"),
        F.count(F.lit(1)).alias("n_messages"),
    ]
    for f in last_value_fields:
        aggs.append(
            F.max_by(
                F.col(f), F.when(F.col(f).isNotNull(), F.col(ts))
            ).alias(f"last_{f}")
        )
    # per-type message counters (models.py:115,174)
    for t in range(1, 9):
        aggs.append(
            F.sum(
                F.when(F.col("transmission_type") == t, 1).otherwise(0)
            ).alias(f"n_msg{t}")
        )
    # callers fold additional per-session aggregates into the SAME
    # groupBy rather than re-aggregating sessions separately
    aggs.extend(extra_aggs or [])
    return sessions.groupBy(key, "session_id").agg(*aggs)


def active_session_count(sessions: DataFrame, at_ts, key: str = "hexident",
                         ts: str = "gen_date_time",
                         gap_s: int = SESSION_MAX_AGE_S) -> DataFrame:
    """AGG-8 (flights.py:58-59,133-134): pool size — sessions whose last
    message is within the timeout window of `at_ts`."""
    return (
        sessions.groupBy(key, "session_id")
        .agg(F.max(ts).alias("last_seen"))
        .filter(
            (F.col("last_seen") >= F.lit(at_ts) - F.expr(f"INTERVAL {gap_s} SECONDS"))
            & (F.col("last_seen") <= F.lit(at_ts))
        )
        .agg(F.count(F.lit(1)).alias("active_sessions"))
    )
