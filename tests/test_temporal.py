"""Temporal operator semantics: as-of join (backward, ties, tolerance,
no-match), interval join (half-open bounds, bucket straddling),
multigrain rollup (grain labels sum consistently)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from dump1090_postgis_spark.operators.temporal import (
    asof_join,
    interval_join,
    multigrain_rollup,
)


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture()
def quotes(spark):
    # key, time, quote value
    return spark.createDataFrame(
        [
            ("a", 1.0, 10),
            ("a", 5.0, 50),
            ("a", 5.0, 50),  # duplicate-row tie: same payload, harmless
            ("b", 3.0, 30),
        ],
        "k string, t double, px int",
    )


def test_asof_backward_picks_latest_at_or_before(spark, quotes):
    trades = spark.createDataFrame(
        [("a", 0.5), ("a", 1.0), ("a", 7.0), ("b", 2.9), ("c", 9.0)],
        "k string, t double",
    )
    out = asof_join(
        trades, quotes, on="k", left_ts="t", right_ts="t", right_cols=["px"]
    )
    got = {(r["k"], r["t"]): r["asof_px"] for r in out.collect()}
    assert got == {
        ("a", 0.5): None,   # nothing at-or-before
        ("a", 1.0): 10,     # exact-timestamp match visible
        ("a", 7.0): 50,
        ("b", 2.9): None,   # b's quote is later
        ("c", 9.0): None,   # key absent from right side
    }
    assert out.count() == trades.count()  # left join: no row loss


def test_asof_tolerance_nulls_stale_matches(spark, quotes):
    trades = spark.createDataFrame(
        [("a", 1.5), ("a", 9.0)], "k string, t double"
    )
    out = asof_join(
        trades, quotes, on="k", left_ts="t", right_ts="t",
        right_cols=["px"], tolerance_s=1.0,
    )
    got = {r["t"]: r["asof_px"] for r in out.collect()}
    assert got == {1.5: 10, 9.0: None}  # 9.0 - 5.0 = 4.0 > tolerance


def test_asof_single_shuffle_no_nested_loop(spark, quotes):
    trades = spark.createDataFrame([("a", 2.0)], "k string, t double")
    out = asof_join(
        trades, quotes, on="k", left_ts="t", right_ts="t", right_cols=["px"]
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    # one exchange for the keyed window (the two scans feed one union)
    assert plan.count("Exchange hashpartitioning") == 1


def test_interval_join_half_open_and_straddle(spark):
    # interval [10, 30) with bucket_s=10 covers buckets 1,2,3
    ivl = spark.createDataFrame([(1, 10.0, 30.0)], "ivl_id int, s double, e double")
    ev = spark.createDataFrame(
        [(100, 9.99), (101, 10.0), (102, 19.0), (103, 29.99), (104, 30.0)],
        "eid int, t double",
    )
    out = interval_join(ivl, ev, start="s", end="e", ts="t", bucket_s=10)
    eids = sorted(r["eid"] for r in out.collect())
    assert eids == [101, 102, 103]  # start inclusive, end exclusive
    # no duplicate pairs despite the interval spanning 3 buckets
    assert out.count() == len(set(eids))


def test_interval_join_is_equi_not_nested_loop(spark):
    ivl = spark.createDataFrame([(1, 0.0, 100.0)], "ivl_id int, s double, e double")
    ev = spark.createDataFrame([(1, 50.0)], "eid int, t double")
    out = interval_join(ivl, ev, start="s", end="e", ts="t", bucket_s=60)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_multigrain_rollup_grains_are_consistent(spark):
    rows = [
        ("x", _ts("2024-01-01T00:10:00"), 1),
        ("x", _ts("2024-01-01T00:50:00"), 2),
        ("x", _ts("2024-01-01T05:00:00"), 4),
        ("y", _ts("2024-01-02T00:00:00"), 8),
    ]
    df = spark.createDataFrame(rows, "et string, ts timestamp, v long")
    out = multigrain_rollup(
        df, ts="ts", aggs=[F.sum("v").alias("sv")], extra_keys=["et"]
    ).collect()
    by_grain = {}
    for r in out:
        by_grain.setdefault(r["grain"], []).append(r)
    # grand total
    assert [r["sv"] for r in by_grain["total"]] == [15]
    # per-type subtotals
    assert {(r["et"], r["sv"]) for r in by_grain["sub3"]} == {("x", 7), ("y", 8)}
    # day grain sums to the total
    assert sum(r["sv"] for r in by_grain["day"]) == 15
    assert {(r["day_s"], r["sv"]) for r in by_grain["day"]} == {
        ("2024-01-01", 7), ("2024-01-02", 8),
    }
    # hour rows carry both day and hour labels
    hour = {(r["hour_s"], r["sv"]) for r in by_grain["hour"]}
    assert ("2024-01-01 00:00:00", 3) in hour and len(hour) == 3


def test_forward_fill_carries_last_observation(spark):
    from dump1090_postgis_spark.operators.temporal import forward_fill

    rows = [
        # (id, key, ts, reading)  — key 1: gap then new value; key 2:
        # leading NULLs stay NULL
        (1, 1, dt.datetime(2024, 1, 1, 0, 0), 10.0),
        (2, 1, dt.datetime(2024, 1, 1, 0, 1), None),
        (3, 1, dt.datetime(2024, 1, 1, 0, 2), None),
        (4, 1, dt.datetime(2024, 1, 1, 0, 3), 20.0),
        (5, 1, dt.datetime(2024, 1, 1, 0, 4), None),
        (6, 2, dt.datetime(2024, 1, 1, 0, 0), None),
        (7, 2, dt.datetime(2024, 1, 1, 0, 1), 5.0),
    ]
    df = spark.createDataFrame(rows, "id long, k long, ts timestamp, r double")
    got = {
        r.id: r.r_ff
        for r in forward_fill(df, ["r"], ["k"], tiebreak=["id"]).collect()
    }
    assert got == {1: 10.0, 2: 10.0, 3: 10.0, 4: 20.0, 5: 20.0,
                   6: None, 7: 5.0}


def test_rolling_range_agg_window_membership(spark):
    """Inclusive [t-width, t] membership, per-key isolation, and
    same-timestamp rows sharing one frame."""
    from dump1090_postgis_spark.operators.temporal import rolling_range_agg

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, 1, t0, 1.0),
        (2, 1, t0 + dt.timedelta(seconds=3600), 3.0),   # exactly on edge: in
        (3, 1, t0 + dt.timedelta(seconds=3601), 5.0),   # row 1 out now
        (4, 1, t0 + dt.timedelta(seconds=3601), 7.0),   # tie with row 3
        (5, 2, t0 + dt.timedelta(seconds=3600), 100.0), # other key isolated
    ]
    df = spark.createDataFrame(rows, "id long, k long, ts timestamp, v double")
    got = {
        r.id: (r.n_window, r.avg_window)
        for r in rolling_range_agg(df, "v", ["k"], width_s=3600).collect()
    }
    assert got[1] == (1, 1.0)
    assert got[2] == (2, 2.0)          # includes row 1 (inclusive edge)
    # rows 3+4 share a frame: {3.0, 5.0, 7.0} (row 1 aged out)
    assert got[3] == (3, 5.0) and got[4] == (3, 5.0)
    assert got[5] == (1, 100.0)
