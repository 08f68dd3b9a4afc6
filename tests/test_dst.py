"""Europe/Paris DST-boundary binning — SURVEY §7's "killer edge case".

The driver testdata spans only January 2024, so no oracle query ever
crosses a Paris DST transition; these tests bin synthetic frames across
the 2024 spring-forward gap (2024-03-31 02:00→03:00 local, the 02:xx
wall-clock hour does not exist) and the fall-back repeated hour
(2024-10-27 03:00→02:00 local, the 02:xx wall-clock hour happens
twice), in both the histogram (AGG-1) and peak-hour (AGG-2/3/4) paths,
and assert parity against a DuckDB oracle over the SAME synthetic
frame (DuckDB timezone conversion is ICU-backed like Spark's
``convert_timezone``, so the double AT TIME ZONE round-trip —
reference create_public_schema.sql:295-297 — is checkable end to end).
"""

from datetime import datetime, timedelta

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from dump1090_postgis_spark.operators.histogram import events_histogram
from dump1090_postgis_spark.operators.peak_hour import peak_hour


def _quarter_hour_events(start_utc: datetime, hours: float):
    """(event_id, ts) rows every 15 minutes from start for `hours`."""
    n = int(hours * 4)
    return [
        (i, start_utc + timedelta(minutes=15 * i)) for i in range(n)
    ]


def _histogram_oracle(pdf: pd.DataFrame, starts: str, ends: str) -> list:
    """DuckDB replica of the Paris hour histogram (the SQL_AGG1_PARIS
    shape with hour bins) over a registered synthetic frame."""
    con = duckdb.connect()
    con.register("ev", pdf)
    rows = con.sql(
        f"""
WITH loc AS (
  SELECT event_id, timezone('Europe/Paris', timezone('UTC', ts)) AS lts
  FROM ev
), bounds AS (
  SELECT timezone('Europe/Paris', timezone('UTC', TIMESTAMP '{starts}')) AS lo,
         timezone('Europe/Paris', timezone('UTC', TIMESTAMP '{ends}')) AS hi
), axis AS (
  SELECT unnest(generate_series(date_trunc('hour', (SELECT lo FROM bounds)),
                                date_trunc('hour', (SELECT hi FROM bounds)),
                                INTERVAL 1 HOUR)) AS interval
), binned AS (
  SELECT date_trunc('hour', lts) AS interval,
         count(event_id) AS events,
         list_sort(list(event_id)) AS ids
  FROM loc
  WHERE lts >= date_trunc('hour', (SELECT lo FROM bounds))
    AND lts < date_trunc('hour', (SELECT hi FROM bounds)) + INTERVAL 1 HOUR
  GROUP BY 1
)
SELECT strftime(axis.interval, '%Y-%m-%d %H:%M:%S') AS interval,
       COALESCE(binned.events, 0)::BIGINT AS events,
       COALESCE(binned.ids, []) AS ids
FROM axis LEFT OUTER JOIN binned ON axis.interval = binned.interval
ORDER BY axis.interval
"""
    ).fetchall()
    return [(i, int(e), [int(x) for x in ids]) for i, e, ids in rows]


def _run_histogram(spark, rows, starts, ends):
    df = spark.createDataFrame(rows, "event_id long, ts timestamp_ntz")
    out = [
        (r.interval.strftime("%Y-%m-%d %H:%M:%S"), r.events, list(r.ids))
        for r in events_histogram(
            df, starts, ends, "hour", ts="ts", id_col="event_id",
            tz="Europe/Paris",
        ).collect()
    ]
    oracle = _histogram_oracle(
        pd.DataFrame(rows, columns=["event_id", "ts"]), starts, ends
    )
    return out, oracle


def test_histogram_hour_paris_spring_forward(spark):
    """2024-03-31: Paris jumps 02:00→03:00.  UTC events map local
    01:xx then 03:xx — the generated local axis still contains the
    nonexistent 02:00 wall-clock bin, which must be zero-filled, and
    Spark must agree with the DuckDB oracle bin-for-bin."""
    rows = _quarter_hour_events(datetime(2024, 3, 30, 23, 0), 5)
    out, oracle = _run_histogram(
        spark, rows, "2024-03-31 00:00:00", "2024-03-31 03:00:00"
    )
    assert out == oracle
    by_bin = {i: e for i, e, _ in out}
    assert list(by_bin) == [
        "2024-03-31 01:00:00",  # UTC 00:xx (CET)
        "2024-03-31 02:00:00",  # the gap hour — no instant maps here
        "2024-03-31 03:00:00",  # UTC 01:xx (CEST)
        "2024-03-31 04:00:00",
        "2024-03-31 05:00:00",
    ]
    assert by_bin["2024-03-31 02:00:00"] == 0
    assert by_bin["2024-03-31 01:00:00"] == 4
    assert by_bin["2024-03-31 03:00:00"] == 4


def test_histogram_hour_paris_fall_back(spark):
    """2024-10-27: Paris repeats the 02:xx wall-clock hour (CEST then
    CET).  TWO UTC hours fold into the local 02:00 bin — it must carry
    both hours' events, and Spark must agree with DuckDB."""
    rows = _quarter_hour_events(datetime(2024, 10, 26, 22, 0), 5)
    out, oracle = _run_histogram(
        spark, rows, "2024-10-26 22:00:00", "2024-10-27 02:00:00"
    )
    assert out == oracle
    by_bin = {i: e for i, e, _ in out}
    assert by_bin == {
        "2024-10-27 00:00:00": 4,   # UTC 22:xx (CEST)
        "2024-10-27 01:00:00": 4,   # UTC 23:xx (CEST)
        "2024-10-27 02:00:00": 8,   # UTC 00:xx (CEST) + UTC 01:xx (CET)
        "2024-10-27 03:00:00": 4,   # UTC 02:xx (CET)
    }
    # the repeated hour's ids are the union of both UTC hours
    ids = dict((i, x) for i, _, x in out)["2024-10-27 02:00:00"]
    assert ids == [8, 9, 10, 11, 12, 13, 14, 15]


def _peak_oracle(pdf: pd.DataFrame) -> set:
    """DuckDB replica of the AGG-3 Paris peak-hour query (SQL_AGG3
    shape) over a registered synthetic frame."""
    con = duckdb.connect()
    con.register("ev", pdf)
    rows = con.sql(
        """
WITH counted AS (
  SELECT ts,
         count(*) OVER (ORDER BY ts RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                        AND CURRENT ROW) AS events,
         date_trunc('minute', ts - INTERVAL 30 MINUTE) AS peak_hour
  FROM ev
), ranked AS (
  SELECT CAST(CAST(timezone('Europe/Paris', timezone('UTC', peak_hour)) AS DATE) AS VARCHAR) AS day,
         strftime(peak_hour, '%Y-%m-%d %H:%M:%S') AS peak_hour,
         events::BIGINT AS events,
         row_number() OVER (
           PARTITION BY CAST(timezone('Europe/Paris', timezone('UTC', peak_hour)) AS DATE)
           ORDER BY events DESC, peak_hour DESC) AS rnmax
  FROM counted
)
SELECT day, peak_hour, events FROM ranked WHERE rnmax = 1
"""
    ).fetchall()
    return {(d, p, int(e)) for d, p, e in rows}


@pytest.mark.parametrize(
    "burst_utc, expect_day",
    [
        # fall-back night: a burst ending UTC 2024-10-26 23:50 is local
        # 2024-10-27 01:50 CEST — the peak must attribute to the 27th
        # even though its UTC date is still the 26th.
        (datetime(2024, 10, 26, 23, 30), "2024-10-27"),
        # spring-forward night: a burst ending UTC 2024-03-31 00:50 is
        # local 02:50 CET... which does NOT exist — ICU maps the label
        # into the gap's resolution; the assertion of record is
        # Spark == DuckDB row-for-row (both ICU), day checked against
        # the oracle's own answer below.
        (datetime(2024, 3, 31, 0, 30), None),
    ],
)
def test_peak_hour_paris_dst_day_attribution(spark, burst_utc, expect_day):
    """AGG-2/3/4 across a Paris DST transition: the trailing-window
    counts are pure UTC arithmetic, but the top-1-per-day partition key
    is the LOCAL date of the window midpoint — Spark and DuckDB must
    agree on every (day, peak_hour, events) row across the boundary."""
    rows = []
    eid = 0
    # background: one event per 20 minutes for ±6 hours around the burst
    for i in range(36):
        rows.append((eid, burst_utc - timedelta(hours=6) + timedelta(minutes=20 * i)))
        eid += 1
    # the burst: 12 events in 20 minutes ending burst_utc+20min
    for i in range(12):
        rows.append((eid, burst_utc + timedelta(minutes=i, seconds=30)))
        eid += 1
    df = spark.createDataFrame(
        [(t,) for _, t in rows], "ts timestamp_ntz"
    )
    got = {
        (
            r.day.strftime("%Y-%m-%d"),
            r.peak_hour.strftime("%Y-%m-%d %H:%M:%S"),
            r.events,
        )
        for r in peak_hour(df, ts="ts", tz="Europe/Paris").collect()
    }
    oracle = _peak_oracle(
        pd.DataFrame([(t,) for _, t in rows], columns=["ts"])
    )
    assert got == oracle and len(got) >= 1
    if expect_day is not None:
        top = max(got, key=lambda r: r[2])
        assert top[0] == expect_day
