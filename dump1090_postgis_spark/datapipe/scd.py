"""SCD2 interval compaction over corpus snapshots.

Extends the two-version diff (versioning.corpus_diff) to a HISTORY of
snapshots: given rows ``(snapshot_id, id, content_hash)`` — one row
per document per snapshot in which it exists — produce the classic
slowly-changing-dimension type-2 table: one row per (document,
content-run) with ``from_snap`` / ``to_snap`` validity bounds.

Semantics: a run BREAKS when the content hash changes OR when the
document is absent from an intermediate snapshot (a delete +
re-insert with identical text is two runs, not one — matching what a
warehouse MERGE with tombstones would record).

Spark shape: ONE shuffle on the document key; the change-flag lag and
the run-id running sum share that exchange (two chained WindowExecs,
same partitioning); the final run compaction is a groupBy on
(id, run) — co-partitioned, partial-agg.  State per document is the
snapshot count, never corpus-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def scd2_intervals(
    snapshots: DataFrame,
    id_col: str = "doc_id",
    hash_col: str = "text_hash",
    snap_col: str = "snapshot_id",
    current_snap: int | None = None,
) -> DataFrame:
    """Compact snapshot history into SCD2 rows:
    ``(id_col, hash_col, from_snap, to_snap, n_snaps, is_current)``.

    ``is_current`` marks runs alive in ``current_snap`` (default: the
    global max snapshot id, computed as a broadcast single-row frame —
    no driver round-trip).

    CONTRACT: snapshot ids must be DENSE consecutive integers (0,1,2,…
    or any step-1 run).  Gap detection is ``lag(snap) != snap - 1`` —
    a missing snapshot id is read as "row absent in that snapshot", so
    the run splits there (delete + re-insert semantics).  With sparse
    ids (date-coded like 20240115, or skipped snapshot numbers) every
    interval would split into per-snapshot runs; densify first
    (``dense_rank() over (order by snapshot_id)`` on the distinct ids)
    if your snapshot labels are not consecutive.
    """
    w = Window.partitionBy(id_col).orderBy(snap_col)
    # null-safe hash comparison: a NULL hash (md5 of a NULL text) must
    # BREAK the run like any other content change — plain != evaluates
    # to SQL NULL there, the OR stays NULL, sum() skips it, and the
    # NULL-hash snapshot silently merges into the previous run,
    # emitting OVERLAPPING validity intervals for the same doc.
    flagged = snapshots.select(id_col, snap_col, hash_col).withColumn(
        "_new_run",
        (
            (~F.lag(hash_col).over(w).eqNullSafe(F.col(hash_col)))
            | (F.lag(snap_col).over(w) != F.col(snap_col) - 1)
            | F.lag(snap_col).over(w).isNull()
        ).cast("int"),
    )
    runs = flagged.withColumn(
        "_run", F.sum("_new_run").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    compact = runs.groupBy(id_col, "_run", hash_col).agg(
        F.min(snap_col).cast("int").alias("from_snap"),
        F.max(snap_col).cast("int").alias("to_snap"),
        F.count(F.lit(1)).cast("bigint").alias("n_snaps"),
    )
    if current_snap is None:
        latest = snapshots.agg(F.max(snap_col).cast("int").alias("_cur"))
        compact = compact.crossJoin(F.broadcast(latest))
    else:
        compact = compact.withColumn("_cur", F.lit(int(current_snap)))
    return compact.select(
        id_col,
        hash_col,
        "from_snap",
        "to_snap",
        "n_snaps",
        (F.col("to_snap") == F.col("_cur")).alias("is_current"),
    )
