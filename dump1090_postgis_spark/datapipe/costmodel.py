"""Shared cost model for the ``engine='auto'`` dispatch gates.

Every vectorized/scale engine in this package (blocked brute-force
ANN, bucketed LSH verifies, the BLAS centroid assignment) is gated so
that oracle-checked scales stay on the bit-exact declarative path and
only genuinely large inputs pay the Arrow seam.  Until round 8 each
gate made that decision with its own eager ``df.count()`` — at 100 TB
that is a full scan (or at best a parquet-footer pass) just to pick an
engine, and a row-count threshold is blind to per-row width (a 4k-dim
corpus hits the interpreted-expression wall at far fewer rows than a
64-dim one).

This module is the one place the decision is made:

- the size source is hint → Catalyst plan statistics → a BOUNDED
  limit-probe (never an unbounded count);
- the unit is WORK (rows × units-per-row: dim for dense vectors,
  n·k·dim for assignment FLOPs), with plain rows as the degenerate
  case where per-row width genuinely doesn't matter (the minhash
  break-even was measured in docs at a fixed shingle profile).

The dispatch rule itself is a pure function of sizes so it is
unit-testable without a SparkSession (same discipline as
``similarity.resolve_assignment_probes``).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame


def plan_rows(df: DataFrame) -> int | None:
    """Catalyst's row-count estimate for ``df``, when the optimizer
    derived one (CBO statistics, a LocalRelation, an AQE-finalized
    stage) — ``None`` otherwise.  Never runs a job."""
    try:
        rc = df._jdf.queryExecution().optimizedPlan().stats().rowCount()
        if rc.isDefined():
            # Scala BigInt → via string, safe at any magnitude
            return int(str(rc.get()))
    except Exception:  # py4j / private-API drift: fall through to probe
        return None
    return None


def rows_at_least(
    df: DataFrame, threshold: int, size_hint: int | None = None
) -> bool:
    """True iff ``df`` has at least ``threshold`` rows, WITHOUT an
    unbounded count.

    Size source, in order: an explicit caller ``size_hint`` (the 100 TB
    contract — a pipeline that already knows its corpus size passes it
    and no job runs), Catalyst plan statistics (:func:`plan_rows`),
    else a bounded limit-probe: ``df.limit(threshold).count()`` — the
    LocalLimit stops every partition after ``threshold`` rows, so the
    probe's work is bounded by threshold × partitions touched, never
    the full input (the gate thresholds here are ≤ a few million rows,
    against corpora of billions)."""
    if threshold <= 0:
        return True
    if size_hint is not None:
        return int(size_hint) >= threshold
    est = plan_rows(df)
    if est is not None:
        return est >= threshold
    return df.limit(threshold).count() >= threshold


def work_rows_threshold(budget: float, units_per_row: float) -> int:
    """Rows at which ``rows × units_per_row`` first EXCEEDS ``budget``
    — the pure dispatch rule, unit-tested without Spark."""
    upr = max(1.0, float(units_per_row))
    return int(math.floor(float(budget) / upr)) + 1


def work_exceeds(
    df: DataFrame,
    budget: float,
    units_per_row: float,
    size_hint: int | None = None,
) -> bool:
    """True iff ``df``'s total work (rows × ``units_per_row``) exceeds
    ``budget``.  ``units_per_row`` carries the per-row width into the
    decision — dim for dense-vector scans, k·dim for nearest-centroid
    assignment — so the gate is a FLOPs wall, not a row wall."""
    return rows_at_least(
        df, work_rows_threshold(budget, units_per_row), size_hint
    )
