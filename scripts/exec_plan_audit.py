#!/usr/bin/env python
"""Audit the EXECUTED plan (isFinalPlan=true) of named queries.

Plan prints on an un-executed DataFrame show isFinalPlan=false and
never contain ReusedExchange — runtime exchange reuse only appears in
the QueryExecution that actually ran (OPTIMIZATION_r13.md, collocation
lesson).  This tool executes each query's own QueryExecution without
collecting rows (executedPlan().execute().count() — a distributed
count over internal rows), then audits the final adaptive plan.

Usage:
    python scripts/exec_plan_audit.py q1 q2 ...
    PLAN_DIR=/tmp/exec_plans python scripts/exec_plan_audit.py q1 ...
"""

from __future__ import annotations

import os
import re
import sys
import time
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PLAN_DIR = os.environ.get("PLAN_DIR", "")


def main(argv: list[str]) -> int:
    from dump1090_postgis_spark.plans import full_registry
    from dump1090_postgis_spark.session import get_spark

    spark = get_spark(app_name="exec_plan_audit")
    registry = full_registry()
    names = argv or sys.exit("pass query names")
    if PLAN_DIR:
        os.makedirs(PLAN_DIR, exist_ok=True)

    print(f"{'query':<34} {'scan':>4} {'xchg':>4} {'reuse':>5} {'smj':>3} "
          f"{'exec_s':>7}  dup-sources(final)")
    for name in names:
        fn, _sql = registry[name]
        spark.sparkContext.setJobDescription(f"exec_audit:{name}")
        df = fn(spark, SF_DIR)
        qe = df._jdf.queryExecution()
        t0 = time.time()
        qe.executedPlan().execute().count()
        dt = time.time() - t0
        text = df._sc._jvm.PythonSQLUtils.explainString(qe, "formatted")
        if PLAN_DIR:
            with open(os.path.join(PLAN_DIR, f"{name}_final.txt"), "w") as f:
                f.write(text)
        # Audit ONLY the final adaptive plan: the "== Initial Plan ==" tree
        # and its detail blocks re-list nodes the runtime deduplicated.
        tree = text.split("== Initial Plan ==")[0]
        final_ids = set(re.findall(r"\((\d+)\)", tree))
        blocks = re.split(r"\n(?=\(\d+\) )", text)
        kept = [b for b in blocks if (m := re.match(r"\((\d+)\) ", b)) and m.group(1) in final_ids]
        text = tree + "\n".join(kept)
        n_reuse = len(re.findall(r"ReusedExchange", text))
        n_x = len(re.findall(r"\bExchange\b", text)) - n_reuse
        n_smj = len(re.findall(r"\bSortMergeJoin\b", text))
        srcs = re.findall(
            r"Location: InMemoryFileIndex(?:\(\d+ paths\))? \[([^\],]+)", text
        )
        per_src = Counter(os.path.basename(s.rstrip("/")) for s in srcs)
        dup = ",".join(f"{k}x{v}" for k, v in sorted(per_src.items()) if v > 1) or "-"
        print(f"{name:<34} {sum(per_src.values()):>4} {n_x:>4} {n_reuse:>5} "
              f"{n_smj:>3} {dt:>7.3f}  {dup}")
        spark.catalog.clearCache()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
