"""foreachBatch sink builders (SURVEY §2.1 SNK-1/SNK-2).

The reference commits batched SQLAlchemy sessions every second
(flights.py:119-131) and dual-writes positions into a `positions_live`
copy via an insert RULE.  In Spark the micro-batch IS the transaction
boundary: `foreachBatch` receives (batch_df, epoch_id) and each write
below is idempotent per epoch (append with epoch column, or
deterministic overwrite), giving effectively-once semantics on
restart.

For a real warehouse swap `_write` for `df.write.jdbc(...)` — the
structure (per-epoch batching, split by kind, dual targets) is
identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parquet_event_sink(base_dir: str):
    """SNK-1: split each micro-batch by kind and append to per-table
    parquet directories, tagged with the epoch for idempotent replay
    auditing."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        tagged = batch_df.withColumn("epoch", F.lit(epoch_id))
        events = tagged.filter(F.col("kind").isin("landing", "takeoff"))
        summaries = tagged.filter(F.col("kind") == "flight_summary")
        events.write.mode("append").parquet(f"{base_dir}/events")
        summaries.write.mode("append").parquet(f"{base_dir}/flight_summaries")

    return sink


def dual_write_sink(primary_dir: str, live_dir: str, retention_hours: int = 24):
    """SNK-2/SNK-3 physical variant: append to the primary table AND
    rewrite a bounded 'live' copy holding only the trailing retention
    window (the reference's RULE-maintained positions_live).  Prefer
    the view form (operators.retention.positions_live) when the store
    can evaluate predicates; this exists for sinks that can't."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_df.write.mode("append").parquet(primary_dir)
        primary = spark.read.parquet(primary_dir)
        live = primary.filter(
            F.col("event_time")
            >= F.current_timestamp() - F.expr(f"INTERVAL {retention_hours} HOURS")
        )
        live.write.mode("overwrite").parquet(live_dir)

    return sink
