"""Live-copy + retention (SURVEY §2.1 SNK-2/SNK-3; reference insert
RULEs create_public_schema.sql:819-855: every positions insert is
copied to positions_live, and positions_live is pruned to 24 h).

The Spark-first replacement is a filtered VIEW over positions — no
second physical copy, no delete job; the predicate prunes the scan
(with date partitioning it prunes whole partitions).  For sinks that
genuinely need a physical live table (e.g. a serving store), use
``dual_write`` inside foreachBatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LIVE_RETENTION_HOURS = 24  # create_public_schema.sql:819-822


def positions_live(
    positions: DataFrame,
    ts: str = "time",
    hours: int = LIVE_RETENTION_HOURS,
    now=None,
) -> DataFrame:
    """SNK-2/3 as a view: last-`hours` slice of positions. `now` defaults
    to current_timestamp; pass a literal for deterministic tests."""
    now_expr = F.current_timestamp() if now is None else F.lit(now).cast("timestamp_ntz")
    return positions.filter(
        F.col(ts) >= now_expr - F.expr(f"INTERVAL {hours} HOURS")
    )


def retention_delete_plan(
    positions: DataFrame, ts: str = "time", hours: int = LIVE_RETENTION_HOURS, now=None
) -> DataFrame:
    """The rows a physical retention job would DELETE (for Delta-style
    `DELETE WHERE` maintenance); complement of ``positions_live``."""
    now_expr = F.current_timestamp() if now is None else F.lit(now).cast("timestamp_ntz")
    return positions.filter(
        F.col(ts) < now_expr - F.expr(f"INTERVAL {hours} HOURS")
    )
