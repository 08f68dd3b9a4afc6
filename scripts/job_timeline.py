#!/usr/bin/env python
"""Job-timeline profiler for the optimization rounds.

Runs ONE query (plan build + noop-sink materialization) with the Spark
event log enabled, then prints every job in submission order with its
duration and — the diagnostic the plain job COUNT hides — the GAP
between the previous job's end and this job's submission.  A long gap
is sequential DRIVER work (py4j plan build, sidecar reads, collect
post-processing); a cluster of short jobs with non-trivial gaps is a
barrier chain worth overlapping (guide §2.6) or folding (§5.3).

Usage:
    python scripts/job_timeline.py dedup_clusters_incremental
    RUNS=2 python scripts/job_timeline.py q      # timeline of the LAST run
"""

from __future__ import annotations

import gc
import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("RUNS", "2"))


def _collect(ev: dict, jobs: dict) -> None:
    if ev.get("Event") == "SparkListenerJobStart":
        props = ev.get("Properties") or {}
        jobs[ev["Job ID"]] = {
            "t0": ev["Submission Time"] / 1000.0,
            "desc": props.get("spark.job.description", ""),
            "stages": len(ev.get("Stage IDs", [])),
        }
    elif ev.get("Event") == "SparkListenerJobEnd":
        if ev["Job ID"] in jobs:
            jobs[ev["Job ID"]]["t1"] = ev["Completion Time"] / 1000.0


def _report(jobs: dict, name: str) -> None:
    want = f"timeline:{name}:run{RUNS - 1}"
    rows = sorted(
        (j for j in jobs.values() if j["desc"].startswith(want) and "t1" in j),
        key=lambda r: r["t0"],
    )
    print(f"{'#':>3} {'start':>8} {'dur_ms':>8} {'gap_ms':>8} {'stg':>3}")
    prev_end = None
    base = rows[0]["t0"] if rows else 0.0
    for i, r in enumerate(rows):
        gap = (r["t0"] - prev_end) * 1000 if prev_end is not None else 0.0
        print(
            f"{i:>3} {r['t0'] - base:>8.3f} {(r['t1'] - r['t0']) * 1000:>8.1f} "
            f"{gap:>8.1f} {r['stages']:>3}"
        )
        prev_end = max(prev_end or 0.0, r["t1"])
    total = rows[-1]["t1"] - rows[0]["t0"] if rows else 0.0
    busy = sum(r["t1"] - r["t0"] for r in rows)
    print(
        f"jobs={len(rows)} span={total:.3f}s sum_job={busy:.3f}s "
        f"gaps={max(total - busy, 0):.3f}s (overlap makes sum>span possible)"
    )


def main(argv: list[str]) -> int:
    from dump1090_postgis_spark.plans import full_registry
    from dump1090_postgis_spark.session import get_spark

    name = argv[0] if argv else sys.exit("pass one query name")
    evdir = tempfile.mkdtemp(prefix="spark_events_")
    spark = get_spark(
        app_name=f"job_timeline_{name}",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
        },
    )
    sc = spark.sparkContext
    registry = full_registry()
    fn, _sql = registry[name]

    for i in range(RUNS):
        marker = f"timeline:{name}:run{i}"
        sc.setJobDescription(marker)
        t0 = time.time()
        df = fn(spark, SF_DIR)
        t1 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.time()
        print(
            f"run {i}: build {t1 - t0:.3f}s exec {t2 - t1:.3f}s "
            f"total {t2 - t0:.3f}s",
            file=sys.stderr,
        )
        df = None
        spark.catalog.clearCache()
        gc.collect()

    # flush the event log and parse the LAST run's jobs
    sc._jsc.sc().listenerBus().waitUntilEmpty()
    app_id = sc.applicationId
    spark.stop()
    cand = glob.glob(os.path.join(evdir, f"*{app_id}*")) or glob.glob(
        os.path.join(evdir, "*")
    )
    if not cand:
        sys.exit(f"no event log under {evdir}")
    path = cand[0]
    if os.path.isdir(path):  # Spark 4 rolling event-log v2 layout
        files = sorted(glob.glob(os.path.join(path, "events_*")))
    else:
        files = [path]
    jobs: dict[int, dict] = {}
    for fp in files:
        with open(fp) as f:
            for line in f:
                _collect(json.loads(line), jobs)
    _report(jobs, name)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
