"""Runway attribution: geometric lookup join (SURVEY §2.3 JOIN-5,
§2.8 STATE-5; reference airports.py:90-125, flights.py:140-195).

Reference logic per landing/takeoff event, at the event's position
with the flight's interpolated track:
1. iterate runways IN ORDER: polygon contains point AND
   |direction − heading| ≤ 20° → return that runway (first match);
2. fallback, again in order: point inside the airport bbox AND heading
   matches the runway → that runway;
3. else: no attribution (callers keep 'UNK' per models.py:283-286).

Spark shape: the runway table is a tiny broadcast-class dimension
(2 rows at NTE), so it is collected AT PLAN TIME and compiled into one
``coalesce(first-match...)`` scalar expression over the event columns —
no join, no shuffle, no row ids, whole-stage codegen'd, and exactly
the reference's first-match-in-iteration-order semantics.  (An earlier
join+groupBy formulation needed a synthetic row id, which is
nondeterministic across plan branches under retries.)

For genuinely large polygon tables, fall back to an explicit
crossJoin(broadcast(...)) + deterministic-natural-key ranking — not
needed for any airport-scale dimension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.geo import point_in_polygon, same_heading

HEADING_TOLERANCE_DEG = 20.0  # airports.py:51-67


def _poly_literal(vertices) -> Column:
    return F.array(
        *[
            F.struct(
                F.lit(float(v["lon"])).alias("lon"),
                F.lit(float(v["lat"])).alias("lat"),
            )
            for v in vertices
        ]
    )


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

    `runways` columns: name, direction, polygon (array<struct<lon,lat>>)
    — collected at plan time (broadcast-dim size).
    `airport_bbox` columns: icao, bbox — enables the fallback tier.
    Unmatched events get runway='UNK' when keep_unmatched (the
    reference's models.py:283-286 default), else are dropped.
    """
    rows = runways.select("name", "direction", "polygon").collect()
    plon, plat, phead = F.col(lon), F.col(lat), F.col(heading)

    direct = [
        F.when(
            point_in_polygon(plon, plat, _poly_literal(r.polygon))
            & same_heading(F.lit(float(r.direction)), phead, tolerance_deg),
            F.lit(r.name),
        )
        for r in rows
    ]

    tiers = list(direct)
    if airport_bbox is not None:
        bboxes = airport_bbox.select("bbox").collect()
        for b in bboxes:
            in_bbox = point_in_polygon(plon, plat, _poly_literal(b.bbox))
            tiers.extend(
                F.when(
                    in_bbox
                    & same_heading(F.lit(float(r.direction)), phead, tolerance_deg),
                    F.lit(r.name),
                )
                for r in rows
            )

    best = F.coalesce(*tiers, F.lit(None).cast("string"))
    out = events.withColumn("runway", best)
    if keep_unmatched:
        return out.withColumn("runway", F.coalesce(F.col("runway"), F.lit("UNK")))
    return out.filter(F.col("runway").isNotNull())
