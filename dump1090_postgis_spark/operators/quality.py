"""Declarative data-quality constraints over a table (Deequ-style).

The reference enforces integrity in Postgres DDL — NOT NULL columns,
CHECK constraints on enums and SRIDs, and FK references
(`create_public_schema.sql:539-683`, `create_meta_schema.sql:51-52`).
A lake table has no DDL enforcement; the equivalent is a constraint
REPORT the pipeline gates on: one row per rule with its violation
count.

Scale shape: every rule is a conditional-count aggregate, so the whole
suite compiles into ONE scan + one partial-agg reduction to a single
row (unpivoted with stack) — plus one extra aggregation per
uniqueness rule (group-count on the key) and one broadcast/shuffled
anti join per referential rule.  Nothing is row-materialized: a
billion violations still cost one bigint per rule.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def not_null(col: str) -> tuple[str, Column]:
    return f"not_null({col})", F.col(col).isNull()


def in_range(col: str, lo, hi) -> tuple[str, Column]:
    """Violation = non-NULL value outside [lo, hi] (NULLs are
    not_null's business, not a range violation)."""
    c = F.col(col)
    return (
        f"in_range({col},{lo},{hi})",
        c.isNotNull() & ~((c >= F.lit(lo)) & (c <= F.lit(hi))),
    )


def matches(col: str, pattern: str) -> tuple[str, Column]:
    c = F.col(col)
    return f"matches({col})", c.isNotNull() & ~c.rlike(pattern)


def is_in(col: str, allowed: list) -> tuple[str, Column]:
    c = F.col(col)
    return f"is_in({col})", c.isNotNull() & ~c.isin(*allowed)


def check_constraints(
    df: DataFrame,
    row_rules: list[tuple[str, Column]],
    unique: list[str] | None = None,
    references: list[tuple[str, DataFrame, str]] | None = None,
) -> DataFrame:
    """Constraint report: ``(rule, n_violations)``, one row per rule.

    - ``row_rules``: (name, violation-predicate Column) pairs — the
      helpers above, or any custom predicate; ONE scan for all.
    - ``unique``: key columns; violation count = rows beyond the first
      per duplicated key (``n - distinct``), from a group-count agg.
    - ``references``: (fk_col, dim_df, pk_col) — orphan fk count via a
      LEFT ANTI join (dim side broadcast when small; NULL fks are not
      orphans, matching SQL FK semantics).
    """
    if not row_rules and not unique and not references:
        raise ValueError("check_constraints needs at least one rule")
    frames = []
    if row_rules:
        aggs = [
            # coalesce: F.sum over ZERO rows is NULL — an empty (new)
            # partition must report 0 violations, not NULL
            F.coalesce(F.sum(pred.cast("bigint")), F.lit(0))
            .cast("bigint")
            .alias(f"_v{i}")
            for i, (_n, pred) in enumerate(row_rules)
        ]
        one = df.agg(*aggs)
        # Column-API stack: rule names are caller data (often derived
        # from column names) — interpolating them into a parsed SQL
        # string breaks on quotes/spaces and is an injection seam
        stack_args: list = []
        for i, (name, _p) in enumerate(row_rules):
            stack_args += [F.lit(name), F.col(f"_v{i}")]
        frames.append(
            one.select(
                F.stack(F.lit(len(row_rules)), *stack_args).alias(
                    "rule", "n_violations"
                )
            )
        )
    for key in unique or []:
        dup = (
            df.filter(F.col(key).isNotNull())
            .groupBy(key)
            .agg(F.count(F.lit(1)).alias("_n"))
            .agg(
                F.sum(F.col("_n") - 1).cast("bigint").alias("n_violations")
            )
            .select(
                F.lit(f"unique({key})").alias("rule"),
                F.coalesce(F.col("n_violations"), F.lit(0)).alias(
                    "n_violations"
                ),
            )
        )
        frames.append(dup)
    for fk, dim, pk in references or []:
        orphans = (
            df.filter(F.col(fk).isNotNull())
            .join(dim.select(F.col(pk).alias(fk)), fk, "left_anti")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_violations"))
            .select(
                F.lit(f"references({fk})").alias("rule"), "n_violations"
            )
        )
        frames.append(orphans)
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out
