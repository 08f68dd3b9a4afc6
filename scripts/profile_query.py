#!/usr/bin/env python
"""Per-query profiling harness for the optimization rounds.

For each named query: build the plan (timed), run it to the noop sink
(timed), and report how many Spark jobs the whole call launched (plan
BUILD jobs are the hidden fixed cost on warm artifact paths — eager
checkpoints, witness scans, gate counts).  Prints one line per query:

    name  build_s  exec_s  total_s  n_jobs  runs

Usage:
    python scripts/profile_query.py q1 q2 ...       # min over RUNS=2
    RUNS=1 python scripts/profile_query.py q1
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("RUNS", "2"))


def main(argv: list[str]) -> int:
    from dump1090_postgis_spark.plans import full_registry
    from dump1090_postgis_spark.session import get_spark

    spark = get_spark(app_name="profile_query")
    sc = spark.sparkContext
    registry = full_registry()
    names = argv or sys.exit("pass query names")

    print(f"{'query':<36} {'build':>7} {'exec':>7} {'total':>7} {'jobs':>5}")
    for name in names:
        fn, _sql = registry[name]
        best = None
        for _ in range(RUNS):
            jobs0 = len(sc.statusTracker().getJobIdsForGroup(None) or [])
            sc.setJobDescription(f"profile:{name}")
            t0 = time.time()
            df = fn(spark, SF_DIR)
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            jobs1 = len(sc.statusTracker().getJobIdsForGroup(None) or [])
            row = (t1 - t0, t2 - t1, t2 - t0, jobs1 - jobs0)
            if best is None or row[2] < best[2]:
                best = row
            df = None
            spark.catalog.clearCache()
            gc.collect()
        b, e, t, j = best
        print(f"{name:<36} {b:>7.3f} {e:>7.3f} {t:>7.3f} {j:>5}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
