"""Runway attribution: geometric lookup join (SURVEY §2.3 JOIN-5,
§2.8 STATE-5; reference airports.py:90-125, flights.py:140-195).

Reference logic per landing/takeoff event, at the event's position
with the flight's interpolated track:
1. try each runway: polygon contains point AND |direction − heading|
   ≤ 20° (circular) → that runway's name;
2. fallback: point inside the airport bbox AND heading matches some
   runway → that runway, but only if no direct runway hit;
3. else: no attribution (the reference drops the event; callers can
   keep 'UNK' per models.py:283-286).

Spark shape: events ⨯ broadcast(runways) theta join with the pure-SQL
ray-casting predicate (functions.geo), then a priority pick
(runway-hit beats bbox-fallback) via min_by over a rank column.  The
runway table is tiny (2 rows at NTE) — the join is a broadcast
nested-loop with a cheap codegen'd predicate; events never shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.geo import point_in_polygon, same_heading

HEADING_TOLERANCE_DEG = 20.0  # airports.py:51-67


def attribute_runway(
    events: DataFrame,
    runways: DataFrame,
    airport_bbox: DataFrame | None = None,
    lon: str = "longitude",
    lat: str = "latitude",
    heading: str = "interp_track",
    tolerance_deg: float = HEADING_TOLERANCE_DEG,
    keep_unmatched: bool = True,
) -> DataFrame:
    """JOIN-5: attach `runway` (name) to each event.

    `runways` columns: name, direction, polygon, airport_icao.
    `airport_bbox` columns: icao, bbox — enables the fallback tier.
    Unmatched events get runway='UNK' when keep_unmatched (the
    reference's models.py:283-286 default), else are dropped.
    """
    ev = events.withColumn("_eid", F.monotonically_increasing_id())

    r = F.broadcast(runways).alias("r")
    direct = (
        ev.alias("e")
        .join(
            r,
            point_in_polygon(F.col(f"e.{lon}"), F.col(f"e.{lat}"), F.col("r.polygon"))
            & same_heading(F.col("r.direction"), F.col(f"e.{heading}"), tolerance_deg),
            "inner",
        )
        .select(F.col("e._eid").alias("_eid"), F.col("r.name").alias("_rw"),
                F.lit(1).alias("_prio"))
    )

    tiers = [direct]
    if airport_bbox is not None:
        bbox = F.broadcast(airport_bbox).alias("b")
        fallback = (
            ev.alias("e")
            .join(
                bbox,
                point_in_polygon(F.col(f"e.{lon}"), F.col(f"e.{lat}"), F.col("b.bbox")),
                "inner",
            )
            .join(
                r,
                same_heading(F.col("r.direction"), F.col(f"e.{heading}"), tolerance_deg),
                "inner",
            )
            .select(F.col("e._eid").alias("_eid"), F.col("r.name").alias("_rw"),
                    F.lit(2).alias("_prio"))
        )
        tiers.append(fallback)

    candidates = tiers[0] if len(tiers) == 1 else tiers[0].unionByName(tiers[1])
    best = candidates.groupBy("_eid").agg(
        F.min_by("_rw", F.struct("_prio", "_rw")).alias("runway")
    )

    joined = ev.join(best, "_eid", "left")
    if keep_unmatched:
        joined = joined.withColumn("runway", F.coalesce(F.col("runway"), F.lit("UNK")))
    else:
        joined = joined.filter(F.col("runway").isNotNull())
    return joined.drop("_eid")
