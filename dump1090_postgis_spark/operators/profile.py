"""Data-quality census over a table: per-column null / distinct counts.

The reference keeps its table statistics in Postgres (``ANALYZE`` +
planner ``ROWS`` hints, ``create_materialized_views.sql:9-11``); a
100 TB corpus needs the same census as an explicit, scalable query.

Spark-first shape: ONE scan of the table computing, for every profiled
column, ``count(*)``, ``sum(isnull)`` and ``count(distinct col)`` in a
single ``agg``.  Catalyst plans the multi-count-distinct as an Expand
(one duplicate of each input row per distinct-aggregate group) feeding
a two-level partial aggregation — no per-column rescan, no driver
loop.  The single result row is then unpivoted to one row per column
with ``stack``, which is a zero-shuffle projection.

At 100 TB the Expand multiplies the scanned rows by (#distinct aggs);
when that is too hot, callers can census columns in batches — the
per-column output schema is union-compatible by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def profile_columns(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Per-column census: ``(col_name, n_rows, n_nulls, n_distinct)``.

    ``n_distinct`` follows SQL ``count(DISTINCT c)`` semantics (NULLs
    excluded), matching the DuckDB oracle.  Output ordered by the
    caller via the registry's ORDER BY parity; one row per profiled
    column.
    """
    cols = list(cols) if cols is not None else list(df.columns)
    if not cols:
        raise ValueError("profile_columns needs at least one column")

    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_rows")]
    for c in cols:
        aggs.append(
            F.sum(F.col(c).isNull().cast("bigint")).cast("bigint").alias(f"__nulls_{c}")
        )
        aggs.append(F.count_distinct(F.col(c)).cast("bigint").alias(f"__distinct_{c}"))
    one_row = df.agg(*aggs)

    # Column-API stack (no SQL-string interpolation): a column named
    # with spaces/quotes would break — or inject into — the parsed
    # stack() expression; F.lit/F.col need no quoting rules.
    stack_args: list = []
    for c in cols:
        # df[name] (not F.col) — exact-name resolution, so a source
        # column containing a dot can't be read as a struct path
        stack_args += [
            F.lit(c), one_row[f"__nulls_{c}"], one_row[f"__distinct_{c}"]
        ]
    return one_row.select(
        F.col("n_rows"),
        F.stack(F.lit(len(cols)), *stack_args).alias(
            "col_name", "n_nulls", "n_distinct"
        ),
    ).select("col_name", "n_rows", "n_nulls", "n_distinct")
