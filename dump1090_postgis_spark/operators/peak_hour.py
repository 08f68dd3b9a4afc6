"""Sliding-window peak-hour detection (SURVEY §2.4 AGG-2/3/4, §2.6
SET-1/SRT-2; reference create_public_schema.sql:344-465:
peak_hour_all / peak_hour_landings / peak_hour_takeoffs).

Semantics matched:
- event universe: landings ∪ takeoffs with SQL UNION (duplicate
  eliminating!) for peak_hour_all — Spark's union is UNION ALL, so an
  explicit .distinct() is required for parity (SET-1);
- per event: COUNT(*) OVER (ORDER BY time RANGE BETWEEN '1 hour'
  PRECEDING AND CURRENT ROW) — trailing-hour count evaluated at every
  event (AGG-2), microsecond-exact window membership;
- window midpoint label: date_trunc('minute', time - 30 min) (AGG-4);
- top-1 per local day via row_number over (events DESC, peak_hour
  DESC) (AGG-3), output ORDER BY events DESC, peak_hour DESC (SRT-2).

Scale design: the reference's global ``ORDER BY time`` range frame is
a single-partition window — a hard bottleneck at scale.  The default
implementation here partitions by day with a bounded overlap copy: an
event within `window_s` of midnight is replicated into the NEXT day's
partition as a non-emitting contributor, so every trailing window is
complete while the computation parallelizes across days.  Results are
identical to the global window (asserted in tests); the row blow-up
is bounded by window/86400 (~4% for the 1 h window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.timeutil import epoch_micros, to_local

PEAK_WINDOW_S = 3600


def union_events(landings: DataFrame, takeoffs: DataFrame) -> DataFrame:
    """SET-1: SQL UNION (dedup) of the two event streams.

    The reference unions FULL rows — ``select * from landings union
    select * from takeoffs`` (create_public_schema.sql peak_hour_all
    body) — with ids drawn from separate per-table sequences, so the
    distinct() practically never collapses cross-table rows; it exists
    for SQL-UNION parity.  Our ETL likewise numbers landings/takeoffs
    independently (plans/etl.py), matching that id regime.  Callers
    wanting instant-level dedup should project to (time, flight_id)
    before calling."""
    return landings.unionByName(takeoffs).distinct()


def sliding_hour_counts(
    events: DataFrame,
    ts: str = "time",
    window_s: int = PEAK_WINDOW_S,
    partitioned: bool = True,
) -> DataFrame:
    """AGG-2: events in the trailing `window_s`, evaluated at each
    event.  Adds `events` (count) and `peak_hour` (window midpoint,
    AGG-4).

    ``partitioned=True`` (default) computes per-day with an overlap
    copy — identical results, parallel across days.
    ``partitioned=False`` is the literal reference plan (one global
    window), kept for comparison/testing.
    """
    midpoint = F.date_trunc(
        "minute", F.col(ts) - F.expr(f"INTERVAL {window_s // 2} SECONDS")
    )

    if not partitioned:
        w = (
            Window.orderBy(epoch_micros(F.col(ts)))
            .rangeBetween(-window_s * 1_000_000, Window.currentRow)
        )
        return events.withColumn("events", F.count(F.lit(1)).over(w)).withColumn(
            "peak_hour", midpoint
        )

    day_of = F.to_date(F.col(ts))
    cols = events.columns
    base = events.withColumn("_day", day_of).withColumn("_own", F.lit(True))
    # events within window_s of midnight also feed the NEXT day's
    # trailing windows (contributors only, never emitted)
    spill = (
        events.filter(
            F.col(ts)
            >= F.date_add(day_of, 1).cast("timestamp_ntz")
            - F.expr(f"INTERVAL {window_s} SECONDS")
        )
        .withColumn("_day", F.date_add(day_of, 1))
        .withColumn("_own", F.lit(False))
    )
    both = base.unionByName(spill)
    w = (
        Window.partitionBy("_day")
        .orderBy(epoch_micros(F.col(ts)))
        .rangeBetween(-window_s * 1_000_000, Window.currentRow)
    )
    return (
        both.withColumn("events", F.count(F.lit(1)).over(w))
        .filter(F.col("_own"))
        .select(*cols, "events")
        .withColumn("peak_hour", midpoint)
    )


def peak_hour(
    events: DataFrame,
    ts: str = "time",
    tz: str = "Europe/Paris",
    window_s: int = PEAK_WINDOW_S,
    partitioned: bool = True,
) -> DataFrame:
    """AGG-2+3+4: the trailing-hour window with the most events, top-1
    per local-time day. Returns (day, peak_hour, events) ordered by
    events DESC, peak_hour DESC."""
    counted = sliding_hour_counts(events, ts, window_s, partitioned)
    day = F.to_date(to_local(F.col("peak_hour"), tz)).alias("day")
    ranked = counted.select(day, "peak_hour", "events").withColumn(
        "rnmax",
        F.row_number().over(
            Window.partitionBy("day").orderBy(
                F.desc("events"), F.desc("peak_hour")
            )
        ),
    )
    return (
        ranked.filter(F.col("rnmax") == 1)
        .drop("rnmax")
        .orderBy(F.desc("events"), F.desc("peak_hour"))
    )


def peak_hour_scalable(
    events: DataFrame,
    ts: str = "time",
    tz: str = "Europe/Paris",
    window_s: int = PEAK_WINDOW_S,
) -> DataFrame:
    """Alias — the day-partitioned path is now the default
    ``peak_hour``; kept for callers that named the scale variant
    explicitly."""
    return peak_hour(events, ts, tz, window_s, partitioned=True)
