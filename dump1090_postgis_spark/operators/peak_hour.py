"""Sliding-window peak-hour detection (SURVEY §2.4 AGG-2/3/4, §2.6
SET-1/SRT-2; reference create_public_schema.sql:344-465:
peak_hour_all / peak_hour_landings / peak_hour_takeoffs).

Semantics matched:
- event universe: landings ∪ takeoffs with SQL UNION (duplicate
  eliminating!) for peak_hour_all — Spark's union is UNION ALL, so an
  explicit .distinct() is required for parity (SET-1);
- per event: COUNT(*) OVER (ORDER BY time RANGE BETWEEN '1 hour'
  PRECEDING AND CURRENT ROW) — trailing-hour count evaluated at every
  event (AGG-2);
- window midpoint label: date_trunc('minute', time - 30 min) (AGG-4);
- top-1 per local day via row_number over (events DESC, peak_hour
  DESC) (AGG-3), output ORDER BY events DESC, peak_hour DESC (SRT-2).

Scale note: the reference's global `ORDER BY time` range frame is a
single-partition window — fine at ADS-B rates (one airport's daily
events), a bottleneck at 100 TB.  `peak_hour` keeps exact parity; for
the scale path partition the frame by coarse time bucket (day) first:
a trailing-1h frame never crosses a day boundary by more than 1h, so
compute per-day with a 1h overlap read from the previous day (see
``peak_hour_scalable``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.timeutil import epoch_micros, to_local

PEAK_WINDOW_S = 3600


def union_events(landings: DataFrame, takeoffs: DataFrame) -> DataFrame:
    """SET-1: SQL UNION (dedup) of the two event streams."""
    return landings.unionByName(takeoffs).distinct()


def sliding_hour_counts(
    events: DataFrame,
    ts: str = "time",
    window_s: int = PEAK_WINDOW_S,
) -> DataFrame:
    """AGG-2: events in the trailing `window_s`, evaluated at each event.

    Adds `events` (count) and `peak_hour` (window midpoint, AGG-4).
    """
    w = (
        Window.orderBy(epoch_micros(F.col(ts)))
        .rangeBetween(-window_s * 1_000_000, Window.currentRow)
    )
    return events.withColumn("events", F.count(F.lit(1)).over(w)).withColumn(
        "peak_hour",
        F.date_trunc(
            "minute", F.col(ts) - F.expr(f"INTERVAL {window_s // 2} SECONDS")
        ),
    )


def peak_hour(
    events: DataFrame,
    ts: str = "time",
    tz: str = "Europe/Paris",
    window_s: int = PEAK_WINDOW_S,
) -> DataFrame:
    """AGG-2+3+4: the trailing-hour window with the most events, top-1
    per local-time day. Returns (day, peak_hour, events) ordered by
    events DESC, peak_hour DESC."""
    counted = sliding_hour_counts(events, ts, window_s)
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
    """Scale path for AGG-2/3: identical results, but the sliding count
    is computed per-day with a copy of the previous day's trailing
    `window_s` of events, so the window partitions by day instead of
    running on a single global partition.

    Each event row is duplicated into at most 2 day-partitions (its own
    day, and the next day iff it falls within `window_s` of midnight) —
    bounded 2× blow-up, full parallelism across days.
    """
    day_of = F.to_date(F.col(ts))
    base = events.select(F.col(ts).alias("_ts"), day_of.alias("_day"),
                         F.lit(True).alias("_own"))
    # events close to midnight also feed the NEXT day's trailing windows
    spill = (
        events.filter(
            F.col(ts) >= F.date_add(F.to_date(F.col(ts)), 1).cast("timestamp_ntz")
            - F.expr(f"INTERVAL {window_s} SECONDS")
        )
        .select(
            F.col(ts).alias("_ts"),
            F.date_add(day_of, 1).alias("_day"),
            F.lit(False).alias("_own"),
        )
    )
    both = base.unionByName(spill)
    w = (
        Window.partitionBy("_day")
        .orderBy(epoch_micros(F.col("_ts")))
        .rangeBetween(-window_s * 1_000_000, Window.currentRow)
    )
    counted = (
        both.withColumn("events", F.count(F.lit(1)).over(w))
        .filter(F.col("_own"))  # spill rows only contribute, never emit
        .withColumn(
            "peak_hour",
            F.date_trunc(
                "minute", F.col("_ts") - F.expr(f"INTERVAL {window_s // 2} SECONDS")
            ),
        )
    )
    day = F.to_date(to_local(F.col("peak_hour"), tz)).alias("day")
    ranked = counted.select(day, "peak_hour", "events").withColumn(
        "rnmax",
        F.row_number().over(
            Window.partitionBy("day").orderBy(F.desc("events"), F.desc("peak_hour"))
        ),
    )
    return (
        ranked.filter(F.col("rnmax") == 1)
        .drop("rnmax")
        .orderBy(F.desc("events"), F.desc("peak_hour"))
    )
