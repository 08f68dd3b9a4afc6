"""Dense, deterministic, fully-parallel surrogate ids.

``Window.orderBy(...)`` row_number with no partition key funnels the
whole table through one task — fine for unit fixtures, fatal at scale.
This is the standard two-pass dense-id assignment instead:

1. range-partition + sort by the (total) ordering key;
2. number rows within each partition;
3. offset each partition by the cumulative count of the partitions
   before it (a driver-side array of per-partition counts — thousands
   of longs, not data).

Partition boundaries from repartitionByRange are sampling-based and
may vary run-to-run, but the assigned ids depend only on the GLOBAL
order (offsets absorb boundary placement), so ids are reproducible as
long as the ordering is total — callers must include a tiebreaker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def release_caches(caches: list[DataFrame]) -> None:
    """Unpersist every DataFrame collected in a cache registry (see
    ``with_dense_ids(caches=...)``) and clear the list.  Call after the
    dependent outputs have been materialized (written / collected) —
    at 100× scale a lingering pinned table competes with the shuffle
    for executor memory for the rest of the job."""
    for df in caches:
        df.unpersist()
    caches.clear()


def with_dense_ids(
    df: DataFrame,
    order_cols: list[str],
    id_col: str = "id",
    offset: int = 0,
    caches: list[DataFrame] | None = None,
) -> DataFrame:
    """Add 1-based dense ids following the total order of `order_cols`.

    The internal persist (DISK_ONLY — this is a layout pin, not a hot
    cache; it must not evict executor heap at scale) is appended to
    ``caches`` when given so the caller can ``release_caches`` once the
    numbered output is materialized.
    """
    spark = df.sparkSession
    n_parts = max(2, spark.sparkContext.defaultParallelism)
    arranged = df.repartitionByRange(n_parts, *order_cols).sortWithinPartitions(
        *order_cols
    )
    # Persist BEFORE counting: repartitionByRange samples per
    # execution, so without pinning the layout the counting pass and
    # the numbering pass could see different partition boundaries —
    # colliding or gapping the ids.  The persist fixes one boundary
    # set for both passes.
    with_pid = arranged.withColumn("_pid", F.spark_partition_id()).persist(
        StorageLevel.DISK_ONLY
    )
    if caches is not None:
        caches.append(with_pid)
    counts = {
        r._pid: r.cnt
        for r in with_pid.groupBy("_pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets = {}
    acc = offset
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    # literal_dim, not createDataFrame: the offset map is re-read every
    # time the numbered plan executes, and a Python-RDD leaf would
    # relaunch Python workers for it on each broadcast build — as a
    # LocalRelation it folds into the plan (round-12 literal-dim sweep)
    from ..sources.dims import literal_dim

    offset_df = F.broadcast(
        literal_dim(
            spark,
            [(pid, off) for pid, off in sorted(offsets.items())],
            "_pid int, _poff long",
        )
    )
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    return (
        with_pid.join(offset_df, "_pid")
        .withColumn(id_col, F.row_number().over(w) + F.col("_poff"))
        .drop("_pid", "_poff")
    )
