"""Declarative data-quality constraints over a table (Deequ-style).

The reference enforces integrity in Postgres DDL — NOT NULL columns,
CHECK constraints on enums and SRIDs, and FK references
(`create_public_schema.sql:539-683`, `create_meta_schema.sql:51-52`).
A lake table has no DDL enforcement; the equivalent is a constraint
REPORT the pipeline gates on: one row per rule with its violation
count.

Scale shape: the WHOLE suite — row rules, uniqueness, referential —
compiles into ONE scan of the fact table.  Row rules are conditional
counts; a uniqueness rule is ``count(key IS NOT NULL) − count(DISTINCT
key)`` (algebraically the old group-count ``Σ(n−1)``, computed by the
same distinct-aggregate shuffle without a second scan); a referential
rule LEFT-joins the distinct dim keys (broadcast when small) and
counts unmatched non-NULL fks in the same aggregation.  The previous
shape paid one extra full scan per uniqueness rule and per FK rule —
three corpus passes for the flagship report; now every rule rides one
pass, and the single aggregate row is unpivoted with ``stack``.
Nothing is row-materialized: a billion violations still cost one
bigint per rule.
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
    """Constraint report: ``(rule, n_violations)``, one row per rule
    (row rules first, then uniqueness, then referential — the
    declaration order).

    - ``row_rules``: (name, violation-predicate Column) pairs — the
      helpers above, or any custom predicate.
    - ``unique``: key columns; violation count = rows beyond the first
      per duplicated key — ``count(key) − count(DISTINCT key)``.
    - ``references``: (fk_col, dim_df, pk_col) — orphan fk count via a
      LEFT join against the DISTINCT dim keys (broadcast when small;
      the distinct guarantees the join never multiplies fact rows, so
      every other rule's count is unaffected; NULL fks are not
      orphans, matching SQL FK semantics).

    All rules fold into ONE aggregation over one scan of ``df``.
    """
    if not row_rules and not unique and not references:
        raise ValueError("check_constraints needs at least one rule")
    unique = unique or []
    references = references or []

    work = df
    for i, (fk, dim, pk) in enumerate(references):
        ref = f"_ref{i}"
        dkeys = dim.select(F.col(pk).alias(ref)).distinct()
        work = work.join(dkeys, F.col(fk) == F.col(ref), "left")

    aggs: list[Column] = []
    # coalesce: F.sum over ZERO rows is NULL — an empty (new)
    # partition must report 0 violations, not NULL
    for i, (_n, pred) in enumerate(row_rules):
        aggs.append(
            F.coalesce(F.sum(pred.cast("bigint")), F.lit(0))
            .cast("bigint")
            .alias(f"_v{i}")
        )
    for i, key in enumerate(unique):
        n_notnull = F.coalesce(
            F.sum(F.col(key).isNotNull().cast("bigint")), F.lit(0)
        )
        aggs.append(
            (n_notnull - F.countDistinct(F.col(key)))
            .cast("bigint")
            .alias(f"_u{i}")
        )
    for i, (fk, _dim, _pk) in enumerate(references):
        orphan = F.col(fk).isNotNull() & F.col(f"_ref{i}").isNull()
        aggs.append(
            F.coalesce(F.sum(orphan.cast("bigint")), F.lit(0))
            .cast("bigint")
            .alias(f"_r{i}")
        )
    one = work.agg(*aggs)

    # Column-API stack: rule names are caller data (often derived
    # from column names) — interpolating them into a parsed SQL
    # string breaks on quotes/spaces and is an injection seam
    stack_args: list = []
    for i, (name, _p) in enumerate(row_rules):
        stack_args += [F.lit(name), F.col(f"_v{i}")]
    for i, key in enumerate(unique):
        stack_args += [F.lit(f"unique({key})"), F.col(f"_u{i}")]
    for i, (fk, _dim, _pk) in enumerate(references):
        stack_args += [F.lit(f"references({fk})"), F.col(f"_r{i}")]
    n_rules = len(row_rules) + len(unique) + len(references)
    return one.select(
        F.stack(F.lit(n_rules), *stack_args).alias("rule", "n_violations")
    )
