"""Dedup maintenance (SURVEY §2.3 JOIN-4; reference
database/sql/maintenance.sql:1-16).

The reference repairs duplicates after the fact with a self-join
DELETE keeping the max id per flight_id.  The Spark-first equivalent
is a ranking window (or max_by aggregate) — computed BEFORE write, so
the table never holds duplicates (SURVEY §4 row 7).

Scale: one shuffle on the dedup key; with AQE skew handling on. For
keep='any' semantics dropDuplicates() is cheaper (map-side partial
dedup); keep='max_id' needs the full groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_keep_max_id(
    df: DataFrame, key: str = "flight_id", id_col: str = "id"
) -> DataFrame:
    """JOIN-4 semantics: keep, per key, the row with the greatest id
    (`DELETE ... WHERE a.id < b.id AND a.flight_id = b.flight_id`)."""
    w = Window.partitionBy(key).orderBy(F.desc(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
