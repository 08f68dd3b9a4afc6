"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (zero-filled hourly events histogram,
the reference's signature analytics call) at sf0.001.

``queries()`` / ``oracle_sql()`` — the full SURVEY.md §2 operator
surface plus the training-data pipeline extensions, one entry per
operator, each (where SQL-expressible) with a DuckDB oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO_ROOT)
# Python workers of a driver-created SparkSession need this package
# importable too; exporting PYTHONPATH before the JVM starts covers
# any handler that pickles by module reference.
if _REPO_ROOT not in os.environ.get("PYTHONPATH", "").split(os.pathsep):
    os.environ["PYTHONPATH"] = (
        _REPO_ROOT
        + (os.pathsep + os.environ["PYTHONPATH"] if os.environ.get("PYTHONPATH") else "")
    )

from dump1090_postgis_spark.plans import full_registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: zero-filled hourly
    events histogram (AGG-1 + JOIN-3 + SRT-1)."""
    from dump1090_postgis_spark.plans.testdata_queries import (
        q_agg1_histogram_hour_utc,
    )

    return q_agg1_histogram_hour_utc(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ datapipe
    extensions)."""
    return {name: fn for name, (fn, _sql) in full_registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted for the few operators
    whose banded/iterative shape is impractical as one SQL statement —
    the driver records a rows-only check for those)."""
    return {
        name: sql for name, (_fn, sql) in full_registry().items() if sql is not None
    }
