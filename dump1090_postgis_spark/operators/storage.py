"""Storage layout for the persisted tables (SURVEY §4 rows 1-2).

The reference tunes Postgres physically: btree indexes on hot
predicates and ``CLUSTER ON idx_positions_flight_id`` to co-locate a
flight's positions (create_public_schema.sql:759-811).  The Spark
equivalents are layout decisions at WRITE time:

- ``write_time_partitioned`` — date-partition so FLT-5/6 range queries
  prune whole partitions (the index-on-time analog; parquet min/max
  gives intra-file skipping for free);
- ``write_clustered`` — repartition by key + sortWithinPartitions
  (the CLUSTER analog): a later groupBy/join on the key reads
  co-located, pre-sorted data, and trajectory assembly (AGG-5) becomes
  a within-partition operation;
- ``write_bucketed`` — saveAsTable with bucketing, so repeated joins
  on the key skip their shuffles entirely (needs a metastore-backed
  table; path-based parquet cannot persist bucket metadata).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_time_partitioned(
    df: DataFrame,
    path: str,
    ts: str = "time",
    cluster_key: str | None = None,
    num_partitions: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Partition by event date (`_dt` directory column — readers prune
    whole directories on a `_dt` predicate; plans/adsb.py's FLT-5/6
    helpers emit one automatically when the column is present); sort
    within files by time so min/max row-group stats stay tight.

    ``cluster_key`` additionally hash-spreads each date across tasks
    and co-sorts by (key, time) — the CLUSTER-ON analog, AND the
    scale guard: without it a hot date funnels through one task (a
    100 TB day must parallelize within the date, not across dates
    only)."""
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    staged = df.withColumn("_dt", F.to_date(F.col(ts)))
    keys = [F.col("_dt")] + ([F.col(cluster_key)] if cluster_key else [])
    sort_cols = ([cluster_key] if cluster_key else []) + [ts]
    (
        staged.repartition(n, *keys)
        .sortWithinPartitions("_dt", *sort_cols)
        .write.mode(mode)
        .partitionBy("_dt")
        .parquet(path)
    )


def write_clustered(
    df: DataFrame,
    path: str,
    key: str = "flight_id",
    sort: str = "time",
    num_partitions: int | None = None,
    mode: str = "overwrite",
) -> None:
    """CLUSTER-ON analog: co-locate and pre-sort each key's rows."""
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    (
        df.repartition(n, key)
        .sortWithinPartitions(key, sort)
        .write.mode(mode)
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str = "flight_id",
    sort: str = "time",
    num_buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: joins/groupBys on `key` across jobs
    reuse the bucketing instead of shuffling."""
    (
        df.write.mode(mode)
        .bucketBy(num_buckets, key)
        .sortBy(key, sort)
        .saveAsTable(table)
    )
