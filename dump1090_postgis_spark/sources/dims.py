"""Dimension-table loaders (SURVEY §2.1 SRC-4/SRC-5; reference
database/csv2db.sh:7-18, read_csv_data.sql:1-38) and the NTE seed
geometry (airports.py:129-164, create_meta_schema.sql:243).

Dimensions are small (airlines ~6k rows, countries ~250, runways 2) —
loaded with declared schemas (no inference) and meant to be used
broadcast (F.broadcast at the join site).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import (
    AIRLINE_SCHEMA,
    AIRPORT_SCHEMA,
    COUNTRY_SCHEMA,
    RUNWAY_SCHEMA,
)


def load_airlines_csv(spark: SparkSession, path: str) -> DataFrame:
    """SRC-4: `\\copy meta.airlines FROM csv HEADER QUOTE '"'`."""
    return spark.read.csv(path, header=True, quote='"', schema=AIRLINE_SCHEMA)


def load_countries_csv(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.csv(path, header=True, quote='"', schema=COUNTRY_SCHEMA)


def load_aircraft_images(spark: SparkSession, directory: str) -> DataFrame:
    """SRC-5 (read_csv_data.sql:24-38): scan a directory of .bmp
    silhouettes into (model, image) rows — `binaryFile` reader replaces
    the reference's plpgsql pg_ls_dir loop.  The model name is the file
    stem (split_part(fn,'.',1))."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bmp")
        .load(directory)
        .select(
            F.element_at(
                F.split(F.element_at(F.split(F.col("path"), "/"), -1), r"\."), 1
            ).alias("model"),
            F.col("content").alias("image"),
            F.col("length").alias("image_bytes"),
        )
    )


# ---------------------------------------------------------------------------
# Seed data: Nantes Atlantique (LFRS/NTE) — the reference's built-in
# airport. Two runway headings (03 → 30°, 21 → 210°) sharing one
# physical strip; polygons per airports.py:129-153, airport bbox per
# airports.py:155-164.
# ---------------------------------------------------------------------------

# Thin quadrilateral around the single physical strip (airports.py:129-153);
# both runway designators 03 (dir 30°) and 21 (dir 210°) share it.
_NTE_RUNWAY_POLY = [
    (-1.619792, 47.141703),
    (-1.603446, 47.163170),
    (-1.602936, 47.162999),
    (-1.619280, 47.141525),
]

# Airport boundary pentagon (airports.py:155-164).
_NTE_BBOX = [
    (-1.621437, 47.142339),
    (-1.603608, 47.165234),
    (-1.596542, 47.162784),
    (-1.600891, 47.153871),
    (-1.617134, 47.140760),
]


def _poly_rows(pts):
    return [{"lon": x, "lat": y} for (x, y) in pts]


def nte_runways(spark: SparkSession) -> DataFrame:
    """Seed meta.runways (create_meta_schema.sql:174-181 + airports.py
    constants). Runways 03/21 share one strip polygon but differ in
    direction — exactly the reference's parallel-runway caveat
    (airports.py:94-97)."""
    rows = [
        (1, "LFRS", "03", 30, 2900.0, _poly_rows(_NTE_RUNWAY_POLY)),
        (2, "LFRS", "21", 210, 2900.0, _poly_rows(_NTE_RUNWAY_POLY)),
    ]
    return spark.createDataFrame(rows, RUNWAY_SCHEMA)


def nte_airport(spark: SparkSession) -> DataFrame:
    """Seed meta.airports LFRS row (create_meta_schema.sql:40-52,243)."""
    rows = [
        (
            "LFRS",
            "NTE",
            "Nantes Atlantique",
            "Nantes",
            -1.607778,
            47.156944,
            27.0,
            "France",
            "fr_FR",
            "Europe/Paris",
            _poly_rows(_NTE_BBOX),
        )
    ]
    return spark.createDataFrame(rows, AIRPORT_SCHEMA)


# ---------------------------------------------------------------------------
# meta.range_rings seed (create_meta_schema.sql:144-149): concentric
# distance rings around the airport for QGIS range display.  The
# reference loads them externally (no generator in the repo); ours are
# generated deterministically — N-point circles in WGS84, radius in km,
# each ring one closed MultiLineString part.
# ---------------------------------------------------------------------------

_KM_PER_DEG_LAT = 110.574
_KM_PER_DEG_LON_EQ = 111.320


def range_ring_vertices(
    clon: float, clat: float, radius_km: float, points: int = 36
) -> list[dict]:
    """Closed circle ring (first vertex repeated last), WGS84 degrees."""
    import math

    lat_rad = math.radians(clat)
    out = []
    for k in range(points + 1):
        theta = 2.0 * math.pi * (k % points) / points
        lon = clon + (radius_km / (_KM_PER_DEG_LON_EQ * math.cos(lat_rad))) * math.cos(theta)
        lat = clat + (radius_km / _KM_PER_DEG_LAT) * math.sin(theta)
        out.append({"lon": lon, "lat": lat})
    return out


NTE_RING_RADII_KM = (5.0, 10.0, 25.0, 50.0)


def nte_range_rings(spark: SparkSession, points: int = 36) -> DataFrame:
    """Seed meta.range_rings: one MultiLineString (single closed part)
    per radius around LFRS."""
    from ..schemas import RANGE_RING_SCHEMA

    rows = [
        (i + 1, r, "LFRS", [range_ring_vertices(-1.607778, 47.156944, r, points)])
        for i, r in enumerate(NTE_RING_RADII_KM)
    ]
    return spark.createDataFrame(rows, RANGE_RING_SCHEMA)
