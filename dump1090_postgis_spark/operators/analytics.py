"""Behavioral analytics over event streams: ordered funnels, pivoted
activity matrices, exact n-tile banding.

The reference's analytics layer stops at time-binned histograms and
sliding peak-hour windows (`create_public_schema.sql:182-532`); an
event warehouse at 100 TB needs the next tier of product analytics.
All three operators are pure DataFrame compositions — one keyed
shuffle each, no Python UDFs, no driver-side loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def funnel_steps(
    df: DataFrame,
    steps: list[str],
    user: str = "user_id",
    ts: str = "ts",
    type_col: str = "event_type",
    within_seconds: int | None = None,
) -> DataFrame:
    """Ordered-funnel reach: ``(step_idx, step, n_users)`` — how many
    users performed each prefix of ``steps`` IN ORDER.

    Semantics: ``t_1`` = a user's earliest step-1 event; ``t_k`` = the
    earliest step-k event at ``ts >= t_{k-1}`` (same-timestamp events
    may satisfy consecutive steps, matching the SQL formulation).

    Scale shape: ONE shuffle on the user key, then ``len(steps)``
    chained unbounded-frame window minima over that same partitioning
    — Catalyst inserts a single Exchange and the follow-up WindowExecs
    reuse it (asserted in tests/test_plans.py).  Per-user window state
    is O(len(steps)) minima; the per-user reduction and the final
    single-row count are partial-agg shuffles on already-partitioned
    data.

    ``within_seconds`` bounds the whole conversion to a window
    anchored at the user's FIRST step-1 event (the greedy anchor — a
    later step-1 event never re-opens the window; this bounded
    semantics an independent SQL oracle can restate, unlike
    per-candidate-start retry funnels).
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    w = Window.partitionBy(user)
    cur = df
    t_cols: list[str] = []
    for i, step in enumerate(steps):
        cond = F.col(type_col) == step
        if t_cols:
            cond = cond & (F.col(ts) >= F.col(t_cols[-1]))
            if within_seconds is not None:
                cond = cond & (
                    F.col(ts)
                    <= F.col(t_cols[0])
                    + F.expr(f"INTERVAL {int(within_seconds)} SECONDS")
                )
        tcol = f"_funnel_t{i}"
        cur = cur.withColumn(tcol, F.min(F.when(cond, F.col(ts))).over(w))
        t_cols.append(tcol)
    per_user = cur.groupBy(user).agg(
        *[F.max(t).alias(t) for t in t_cols]
    )
    counts = per_user.agg(
        *[
            F.count(F.col(t)).cast("bigint").alias(f"_n{i}")
            for i, t in enumerate(t_cols)
        ]
    )
    # Column-API stack: step names are caller data ("add'l step")
    # — no SQL-string quoting/injection seam
    stack_args: list = []
    for i, s in enumerate(steps):
        stack_args += [F.lit(i + 1), F.lit(s), F.col(f"_n{i}")]
    return counts.select(
        F.stack(F.lit(len(steps)), *stack_args).alias(
            "step_idx", "step", "n_users"
        )
    ).select(F.col("step_idx").cast("int"), "step", "n_users")


def pivot_daily_activity(
    df: DataFrame,
    values: list[str],
    ts: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Wide activity matrix: one row per day, one zero-filled count
    column per event type in ``values``.

    The explicit ``values`` list keeps the pivot single-pass (no
    hidden distinct-scan job to discover the columns) and the output
    schema stable — the same rule Spark's own docs give for pivot at
    scale.  One partial-agg shuffle on the day key; the pivot itself
    is a map-side conditional projection.
    """
    out = df.groupBy(F.to_date(F.col(ts)).alias("day")).pivot(
        type_col, values
    ).count()
    return out.select(
        F.date_format("day", "yyyy-MM-dd").alias("day_s"),
        *[
            F.coalesce(F.col(f"`{v}`"), F.lit(0)).cast("bigint").alias(f"n_{v}")
            for v in values
        ],
    )


def sketch_accuracy_report(
    df: DataFrame,
    key: str = "event_type",
    id_col: str = "user_id",
    val_col: str = "value",
    rsd: float = 0.02,
    rel_tol: float = 0.05,
) -> DataFrame:
    """Approximate-aggregate contract check:
    ``(key, n_exact, hll_ok, pct_ok)``.

    At 100 TB the exact paths (countDistinct's Expand census, the
    per-group percentile buffer) give way to mergeable sketches —
    HyperLogLog++ (``approx_count_distinct``) and the KLL-style
    ``approx_percentile``.  A sketch's VALUE cannot be hash-compared
    against an independent engine, but its ERROR CONTRACT can: this
    report emits the exact statistic alongside booleans asserting the
    sketch landed within tolerance (``rel_tol`` relative, floor of 5
    absolute for HLL; ``rel_tol``·max(|p50|,1) for the percentile).
    The DuckDB oracle states the contract as literal TRUEs — a driver
    hash-match therefore VERIFIES the approximation bound, instead of
    silently excluding the approximate path from correctness.

    The distinct-count pair and the percentile pair aggregate in
    SEPARATE passes joined on the key: mixing ``count_distinct`` with
    buffer aggregates in one ``agg`` makes Catalyst Expand every input
    row across the distinct/non-distinct projections, tripling the
    aggregation cost (measured 3.3 s → 1.0 s at sf0.1).  Both post-agg
    sides are key-cardinality-sized, so the join broadcasts.
    """
    exact_n = F.count_distinct(F.col(id_col))
    hll = F.approx_count_distinct(F.col(id_col), rsd)
    p_exact = F.expr(f"percentile({val_col}, 0.5)")
    p_approx = F.expr(f"approx_percentile({val_col}, 0.5, 10000)")
    distinct_side = df.groupBy(key).agg(
        exact_n.cast("bigint").alias("n_exact"),
        (
            F.abs(hll - exact_n)
            <= F.greatest(exact_n * rel_tol, F.lit(5.0))
        ).alias("hll_ok"),
    )
    pct_side = df.groupBy(key).agg(
        # coalesce: a group whose val_col is entirely NULL has NULL
        # percentiles on both sides — vacuously in-contract (TRUE),
        # matching the oracle, not a NULL that would hash-mismatch
        F.coalesce(
            F.abs(p_approx - p_exact)
            <= rel_tol * F.greatest(F.abs(p_exact), F.lit(1.0)),
            F.lit(True),
        ).alias("pct_ok"),
    ).withColumnRenamed(key, "_pk")
    # null-safe join key: a NULL group must survive the split (the
    # single-agg formulation and the GROUP BY oracle both emit it)
    return distinct_side.join(
        F.broadcast(pct_side), F.col(key).eqNullSafe(F.col("_pk"))
    ).drop("_pk")


def ntile_bands(
    df: DataFrame,
    n: int = 4,
    key: str = "event_type",
    order_val: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Exact n-tile banding per key with band summaries:
    ``(key, band, n_rows, min_v, max_v)``.

    The ordering is the TOTAL order ``(order_val, id_col)`` so ties on
    the value never straddle a band boundary nondeterministically
    (ntile is order-sensitive; an under-specified sort would
    hash-mismatch any independent oracle).  NULL values are excluded —
    engines disagree on default NULL sort placement.

    Scale shape: ntile needs a per-key total sort, which is the right
    tool for bounded-cardinality keys (event types, languages,
    sources).  For heavy-tailed or high-cardinality keys use the
    bounded-histogram quantile gate (datapipe/sampling.quantile_filter)
    — exact nearest-rank without ever sorting a whole group.
    """
    w = Window.partitionBy(key).orderBy(F.col(order_val), F.col(id_col))
    banded = df.filter(F.col(order_val).isNotNull()).withColumn(
        "band", F.ntile(n).over(w)
    )
    return banded.groupBy(key, "band").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.min(order_val), 4).alias("min_v"),
        F.round(F.max(order_val), 4).alias("max_v"),
    ).select(
        key,
        F.col("band").cast("int").alias("band"),
        F.col("n_rows").cast("bigint").alias("n_rows"),
        "min_v",
        "max_v",
    )


def top_journeys(
    df: DataFrame,
    max_steps: int = 5,
    top_n: int = 20,
    user: str = "user_id",
    ts: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Journey mining: the ``top_n`` most common event-type paths —
    each user's first ``max_steps`` events (total (ts, id) order)
    joined into a '>' path, counted across users.

    One shuffle to the user key (sorted collect_list, state bounded by
    the user's events — cap upstream for pathological keys), one
    partial-agg path count, TakeOrdered for the cut.
    """
    path = F.array_join(
        F.slice(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.col(ts), F.col(id_col), F.col(type_col))
                    )
                ),
                lambda s: s[type_col],
            ),
            1,
            max_steps,
        ),
        ">",
    )
    paths = df.groupBy(user).agg(path.alias("path"))
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .orderBy(F.col("n_users").desc(), F.col("path"))
        .limit(top_n)
    )


def rfm_scores(
    df: DataFrame,
    user: str = "user_id",
    ts: str = "ts",
    val: str = "value",
) -> DataFrame:
    """RFM segmentation without a global window: per-user recency /
    frequency / monetary reduce in one groupBy; the quintile
    boundaries come from ONE `percentile` pass over the (much smaller)
    user frame, broadcast back as a single row; each score is
    ``1 + Σ (metric > boundary_i)`` — a projection, so a billion users
    never sort globally (the ntile formulation would).

    Boundary ties bin identically in any engine (pure comparisons on
    identically-interpolated quantiles).
    """
    from ..functions.timeutil import epoch_micros

    per_user = df.groupBy(user).agg(
        F.max(epoch_micros(F.col(ts))).cast("bigint").alias("r_raw"),
        F.count(F.lit(1)).cast("bigint").alias("f_raw"),
        F.round(F.sum(F.coalesce(F.col(val), F.lit(0.0))) * 100)
        .cast("bigint")
        .alias("m_cents"),
    )
    qs = per_user.agg(
        *[
            F.expr(
                f"percentile({c}, array(0.2, 0.4, 0.6, 0.8))"
            ).alias(f"_q_{c}")
            for c in ("r_raw", "f_raw", "m_cents")
        ]
    )

    def _score(c: str) -> F.Column:
        q = F.col(f"_q_{c}")
        return sum(
            ((F.col(c) > q[i]).cast("int") for i in range(4)), F.lit(1)
        )

    return per_user.crossJoin(F.broadcast(qs)).select(
        F.col(user),
        F.col("r_raw"),
        F.col("f_raw"),
        F.col("m_cents"),
        _score("r_raw").alias("r_score"),
        _score("f_raw").alias("f_score"),
        _score("m_cents").alias("m_score"),
    )


def mad_outliers(
    df: DataFrame,
    key: str = "event_type",
    val: str = "value",
    id_col: str = "event_id",
    threshold: float = 3.0,
) -> DataFrame:
    """Robust (median/MAD) outlier screen per key: rows whose value
    sits more than ``threshold`` robust standard deviations
    (MAD · 1.4826) from their group median.

    Two bounded-output aggregations on the key (median, then MAD of
    deviations) broadcast back — no per-group sort window, no O(group)
    state beyond the exact-percentile buffer, which the
    bounded-histogram quantile route replaces for heavy-tailed keys.
    Zero-MAD groups (constant values) flag nothing (guarded divide).
    """
    med = df.filter(F.col(val).isNotNull()).groupBy(key).agg(
        F.expr(f"percentile({val}, 0.5)").alias("_med")
    )
    with_med = df.filter(F.col(val).isNotNull()).join(F.broadcast(med), key)
    mad = with_med.groupBy(key).agg(
        F.expr(f"percentile(abs({val} - _med), 0.5)").alias("_mad")
    )
    scored = with_med.join(F.broadcast(mad), key).withColumn(
        "dev_ratio",
        F.round(
            F.try_divide(
                F.abs(F.col(val) - F.col("_med")),
                F.col("_mad") * F.lit(1.4826),
            ),
            4,
        ),
    )
    return scored.filter(
        F.col("dev_ratio").isNotNull() & (F.col("dev_ratio") > threshold)
    ).select(
        id_col,
        key,
        F.round(F.col(val), 4).alias("value_r"),
        "dev_ratio",
    )
