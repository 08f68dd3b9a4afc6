"""Meta-schema GeoJSON views as driver queries (SURVEY §2.1 SNK-4;
reference create_meta_schema.sql:108-122 airports_geojson, :159-167
range_rings_geojson, :191-201 runways_geojson).

These views render the SEED dimensions (NTE airport/runways + generated
range rings), so the DuckDB oracle rebuilds the same GeoJSON from the
same Python-generated vertex literals — formatting (6-decimal
fixed-point with PostGIS-style trailing-zero trim) is computed
independently by each engine (Spark format_number+regexp vs DuckDB
printf+regexp), making the string comparison a real check of the
formatter, not a copied constant.
"""

from __future__ import annotations

from ..sources import dims
from . import adsb


def q_meta_airports_geojson(spark, sf):
    return adsb.airports_geojson(dims.nte_airport(spark))


def q_meta_runways_geojson(spark, sf):
    return adsb.runways_geojson(dims.nte_runways(spark))


def q_meta_range_rings_geojson(spark, sf):
    return adsb.range_rings_geojson(dims.nte_range_rings(spark))


# ---------------------------------------------------------------------------
# oracle SQL generation (vertex literals → printf-built GeoJSON)
# ---------------------------------------------------------------------------


def _fmt_sql(x: float) -> str:
    """DuckDB expression: fixed 6-decimal format, zeros-after-point
    trimmed — independent restatement of functions.geo._fmt."""
    return (
        f"regexp_replace(regexp_replace(printf('%.6f', {x!r}::DOUBLE), "
        r"'(\.\d*?)0+$', '\1'), '\.$', '')"
    )


def _pair_sql(p) -> str:
    lon, lat = (p["lon"], p["lat"]) if isinstance(p, dict) else p
    return f"'[' || {_fmt_sql(lon)} || ',' || {_fmt_sql(lat)} || ']'"


def _ring_sql(pts, close: bool) -> str:
    pts = list(pts)
    if close and (pts[0] != pts[-1]):
        pts = pts + [pts[0]]
    return " || ',' || ".join(_pair_sql(p) for p in pts)


def _sql_airports() -> str:
    bbox = _ring_sql(dims._NTE_BBOX, close=True)
    latlon = _pair_sql((-1.607778, 47.156944))
    return f"""
SELECT 'LFRS' AS icao, 'NTE' AS iata, 'Nantes Atlantique' AS name,
       'Nantes' AS city, 27.0 AS altitude, 'France' AS country,
       'fr_FR' AS locale, 'Europe/Paris' AS timezone,
       '{{"type":"Polygon","coordinates":[[' || {bbox} || ']]}}' AS bbox,
       '{{"type":"Point","coordinates":' || {latlon} || '}}' AS latlon
"""


def _sql_runways() -> str:
    ring = _ring_sql(dims._NTE_RUNWAY_POLY, close=True)
    geom = f"'{{\"type\":\"Polygon\",\"coordinates\":[[' || {ring} || ']]}}'"
    return f"""
SELECT * FROM (
  SELECT 1 AS id, 'LFRS' AS airport_icao, '03' AS name, 30 AS direction,
         2900.0 AS length, {geom} AS geom
  UNION ALL
  SELECT 2, 'LFRS', '21', 210, 2900.0, {geom}
)
"""


_CRS = '"crs":{"type":"name","properties":{"name":"EPSG:4326"}},'


def _sql_range_rings() -> str:
    # a flat `||` chain over 37 vertices exceeds DuckDB's binder
    # recursion limit — format via list_transform over one [lon,lat]
    # list literal instead
    fmt = (
        "regexp_replace(regexp_replace(printf('%.6f', {v}), "
        r"'(\.\d*?)0+$', '\1'), '\.$', '')"
    )
    selects = []
    for i, r in enumerate(dims.NTE_RING_RADII_KM):
        verts = dims.range_ring_vertices(-1.607778, 47.156944, r)
        lst = ", ".join(f"[{p['lon']!r}, {p['lat']!r}]" for p in verts)
        coords = (
            f"array_to_string(list_transform([{lst}]::DOUBLE[][], "
            f"p -> '[' || {fmt.format(v='p[1]')} || ',' || "
            f"{fmt.format(v='p[2]')} || ']'), ',')"
        )
        geom = (
            f"'{{\"type\":\"MultiLineString\",{_CRS}\"coordinates\":[[' || "
            f"{coords} || ']]}}'"
        )
        selects.append(
            f"SELECT {i + 1} AS id, {r!r} AS radius, 'LFRS' AS icao, "
            f"{geom} AS geom"
        )
    return "\nUNION ALL\n".join(selects)


REGISTRY: dict = {
    "meta_airports_geojson": (q_meta_airports_geojson, _sql_airports()),
    "meta_runways_geojson": (q_meta_runways_geojson, _sql_runways()),
    "meta_range_rings_geojson": (q_meta_range_rings_geojson, _sql_range_rings()),
}
