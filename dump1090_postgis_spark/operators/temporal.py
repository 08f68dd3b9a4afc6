"""Temporal join operators Spark lacks natively: as-of join and
interval (range) join, plus a hypertable-style multi-granularity time
rollup.

These are the classic time-series operators of TimescaleDB / kdb+ /
QuestDB, re-expressed as compositions of existing DataFrame ops so
Catalyst keeps whole-stage codegen and AQE keeps runtime re-planning:

- ``asof_join``   — union + keyed window ``last(ignorenulls)`` scan:
  ONE shuffle on the key (same exchange a sort-merge join would pay),
  no inequality join, no per-row probe.
- ``interval_join`` — time-bucketed equi join: both sides shuffle on
  a derived bucket key, the inequality is a post-join filter inside
  codegen.  Turns the O(n·m) theta join Spark would otherwise plan
  (BroadcastNestedLoopJoin) into a partition-local merge.
- ``multigrain_rollup`` — ``ROLLUP (day, hour)`` over one scan: Spark
  expands grouping sets map-side, so hourly/daily/total aggregates
  cost one shuffle of partially-aggregated rows, not three scans.

Reference parity: the reference keeps only *equi* joins
(``flights.id = positions.flight_id``, create_public_schema.sql) and
PostgREST range predicates; these operators extend the engine to the
temporal-join shapes a 100 TB event store needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window


def _secs(df: DataFrame, col: str) -> Column:
    """Column as epoch-seconds double (timestamp/ntz/date via an
    intermediate TIMESTAMP cast — NTZ→DOUBLE has no direct cast; the
    session timezone is pinned UTC by schemas.load_table so the NTZ
    reinterpretation is wall-clock stable)."""
    if isinstance(
        df.schema[col].dataType,
        (T.TimestampType, T.TimestampNTZType, T.DateType),
    ):
        return F.col(col).cast("timestamp").cast("double")
    return F.col(col).cast("double")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tolerance_s: float | None = None,
) -> DataFrame:
    """Backward as-of join: for each left row, the right row with the
    LARGEST ``right_ts`` <= ``left_ts`` within the same ``on`` key
    (kdb+ ``aj``, pandas ``merge_asof``, DuckDB ``ASOF JOIN``).

    Plan: tag the two sides, ``unionByName`` (right payload is NULL on
    left rows and vice versa), one window over (key) ordered by
    (ts, side) with right rows sorting first at ties so an exact
    timestamp match IS visible to its left row, then
    ``last(payload, ignorenulls=True)`` carries the latest right
    payload forward; keep only left rows.

    Scale: exactly ONE hash exchange on ``on`` plus a partition-local
    sort — identical to the shuffle a sort-merge equi join would pay,
    with no inequality-join fallback (Spark plans theta joins as
    BroadcastNestedLoopJoin — O(n·m) per partition).  The window
    partitions by the join key, so per-key data must fit a task: true
    for sensor/user/aircraft keys (bounded history per key), the same
    assumption kdb+ makes.  Skewed single keys → pre-split by a
    time-range salt and as-of join per range with a boundary overlap
    copy (same trick as operators/peak_hour.py).

    ``tolerance_s``: matches older than this many seconds are nulled
    out (pandas ``merge_asof(tolerance=...)``).
    """
    lt = _secs(left, left_ts)
    payload = [F.col(c).alias(f"_r_{c}") for c in right_cols]
    # drop NULL-timestamp right rows: they sort NULLS FIRST, and
    # last(ignorenulls) would carry their payload as the "as-of" match
    # for left rows with NO real earlier right row — a fabricated
    # match on the default no-tolerance path (match_t stays NULL, so
    # only the tolerance branch would mask it).
    r_tag = right.select(
        F.col(on).alias("_k"),
        _secs(right, right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        *payload,
    ).filter(F.col("_t").isNotNull())
    l_tag = left.select(
        F.col(on).alias("_k"),
        lt.alias("_t"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(r_tag.schema[f"_r_{c}"].dataType).alias(f"_r_{c}")
          for c in right_cols],
        F.struct(*left.columns).alias("_l"),
    )
    both = r_tag.select(
        "_k", "_t", "_side", *[f"_r_{c}" for c in right_cols],
        F.lit(None).cast(l_tag.schema["_l"].dataType).alias("_l"),
    ).unionByName(l_tag)

    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [
        F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_m_{c}")
        for c in right_cols
    ]
    match_t = F.last(F.when(F.col("_side") == 0, F.col("_t")),
                     ignorenulls=True).over(w).alias("_m_t")
    out = (
        both.select("_k", "_t", "_side", "_l", *carried, match_t)
        .filter(F.col("_side") == 1)
    )
    if tolerance_s is not None:
        in_tol = (F.col("_t") - F.col("_m_t")) <= F.lit(float(tolerance_s))
        out = out.select(
            "_k", "_t", "_side", "_l", "_m_t",
            *[F.when(in_tol, F.col(f"_m_{c}")).alias(f"_m_{c}")
              for c in right_cols],
        )
    return out.select(
        *[F.col("_l")[c].alias(c) for c in left.columns],
        *[F.col(f"_m_{c}").alias(f"asof_{c}") for c in right_cols],
    )


def interval_join(
    intervals: DataFrame,
    events: DataFrame,
    start: str,
    end: str,
    ts: str,
    bucket_s: int = 600,
) -> DataFrame:
    """Range join: every (interval, event) pair with
    ``start <= ts AND ts < end``, via time-bucket equi join.

    Each interval explodes to the bucket ids it covers
    (``sequence(floor(start/b), floor(end/b))`` — length/bucket_s + 1
    copies); each event maps to its single bucket id.  The join is
    then a plain hash/sort-merge EQUI join on the bucket id with the
    exact range predicate as a codegen'd post-filter.  An event's
    bucket is covered at most once per interval, so no dedup step is
    needed.

    Scale: both sides shuffle once on the bucket key — uniform in time
    unless the event stream itself is bursty, in which case AQE's
    skew-join split handles the hot bucket.  Pick ``bucket_s`` near
    the median interval length: smaller buckets duplicate intervals,
    larger buckets widen the post-filter's false-candidate band.
    Contrast: Spark's native plan for the inequality predicate is
    BroadcastNestedLoopJoin — every event probed against every
    interval.
    """
    overlap = sorted(set(intervals.columns) & set(events.columns))
    if overlap:
        # both sides are selected with '*': a shared name would yield
        # ambiguous duplicate output columns that blow up on FIRST USE
        # downstream (AMBIGUOUS_REFERENCE) — fail here with the fix.
        # The streaming twin (pipeline.interval_join_streams) prefixes
        # l_/r_ instead; batch callers control their projections.
        raise ValueError(
            f"interval_join: columns {overlap} exist on both sides — "
            "rename or drop them on one side before joining"
        )
    b = float(bucket_s)
    st, en = _secs(intervals, start), _secs(intervals, end)
    ivl = intervals.select(
        "*",
        st.alias("_st"),
        en.alias("_en"),
        F.explode(
            F.sequence(
                F.floor(st / b).cast("long"), F.floor(en / b).cast("long")
            )
        ).alias("_bkt"),
    )
    et = _secs(events, ts)
    ev = events.select(
        "*", et.alias("_ts"), F.floor(et / b).cast("long").alias("_bkt")
    )
    joined = ivl.join(ev, "_bkt").filter(
        (F.col("_ts") >= F.col("_st")) & (F.col("_ts") < F.col("_en"))
    )
    return joined.drop("_bkt", "_st", "_en", "_ts")


def multigrain_rollup(
    events: DataFrame,
    ts: str,
    aggs: list[Column],
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """Hypertable-style continuous aggregate at hour/day/total grains
    in ONE pass: ``ROLLUP (<extra_keys>, day, hour)``.

    Returns one row per (grouping-set, key) with ``grain`` ∈
    {'hour','day','total'} (plus intermediate key-subtotal levels when
    ``extra_keys`` is given) tagged from ``grouping_id`` and
    NULL-free string bucket labels (`''` above the grain).

    Scale: Spark's Expand operator replicates each input row once per
    grouping set BEFORE the exchange, but partial aggregation runs on
    the expanded rows map-side, so the shuffle carries one partial row
    per (set × key × partition) — for time rollups that is bounded by
    hours-in-corpus, not row count.  TimescaleDB materializes each
    grain as its own continuous aggregate; one ROLLUP scan replaces
    the N refresh jobs.
    """
    keys = list(extra_keys or [])
    day = F.date_format(F.col(ts), "yyyy-MM-dd").alias("day_s")
    hour = F.date_format(F.date_trunc("hour", F.col(ts)), "yyyy-MM-dd HH:00:00").alias("hour_s")
    base = events.select(day, hour, "*")
    rolled = base.rollup(*keys, "day_s", "hour_s").agg(
        F.grouping_id().alias("_gid"), *aggs
    )
    n = len(keys)
    # grouping_id bits, MSB-first over (keys..., day_s, hour_s):
    # 0 → (all keys, day, hour) = 'hour'; 1 → day grain; 3 → key
    # subtotal (or 'total' when no keys); full mask → grand total.
    grain = (
        F.when(F.col("_gid") == 0, "hour")
        .when(F.col("_gid") == 1, "day")
        .when(F.col("_gid") == (2 ** (n + 2)) - 1, "total")
        .otherwise(F.concat(F.lit("sub"), F.col("_gid").cast("string")))
    )
    return rolled.select(
        grain.alias("grain"),
        *[F.coalesce(F.col(k).cast("string"), F.lit("")).alias(k) for k in keys],
        F.coalesce("day_s", F.lit("")).alias("day_s"),
        F.coalesce("hour_s", F.lit("")).alias("hour_s"),
        *[c for c in rolled.columns if c not in ("_gid", "day_s", "hour_s", *keys)],
    )


def forward_fill(
    df: DataFrame,
    cols: list[str],
    key_cols: list[str],
    ts_col: str = "ts",
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Last-observation-carried-forward per key: for each listed
    column, NULLs take the most recent non-NULL value earlier in the
    key's timeline (the telemetry gap-fill every sparse sensor /
    irregular reading table needs — the reference interpolates missing
    track the same way at parse time, adsb_parser.py PRJ-7, but has no
    general imputation operator).

    ``last(ignorenulls) OVER (key, ROWS UNBOUNDED PRECEDING)`` —
    Spark's running-state window: ONE shuffle on the key, one
    partition-local sort, O(1) state per column while scanning.  Rows
    before a key's first observation stay NULL.  ``tiebreak`` must
    make the ordering total (same-timestamp rows otherwise make the
    fill nondeterministic).

    Filled values surface as ``<col>_ff`` next to the originals.
    """
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(ts_col, *(tiebreak or []))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.select(
        *df.columns,
        *[
            F.last(c, ignorenulls=True).over(w).alias(f"{c}_ff")
            for c in cols
        ],
    )


def rolling_range_agg(
    df: DataFrame,
    value: str,
    key_cols: list[str],
    ts_col: str = "ts",
    width_s: int = 3600,
) -> DataFrame:
    """Trailing time-window aggregate per key: for every row, count /
    sum / avg of ``value`` over the key's rows with event time in
    ``[t - width_s, t]`` seconds (inclusive both ends — the moving
    average an ops dashboard or anomaly detector reads per event, at
    event grain rather than the fixed bins of AGG-1/AGG-2).

    A RANGE frame over integer epoch-MICROSECOND ordering: exact
    sub-second membership (no float seconds), one shuffle on the key,
    partition-local sort, and Spark evaluates the frame with two
    sliding pointers — O(rows) per partition, not O(rows × frame).
    Same-timestamp rows share one frame by RANGE semantics, so no
    tiebreak is needed for determinism.
    """
    from ..functions.timeutil import epoch_micros

    w = (
        Window.partitionBy(*key_cols)
        .orderBy(epoch_micros(F.col(ts_col)))
        .rangeBetween(-int(width_s) * 1_000_000, 0)
    )
    return df.select(
        *df.columns,
        F.count(F.col(value)).over(w).cast("bigint").alias("n_window"),
        F.round(F.avg(F.col(value)).over(w), 4).alias("avg_window"),
    )
