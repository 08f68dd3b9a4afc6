#!/usr/bin/env python
"""Bulk plan-shape audit: dump .explain('formatted') for many queries in
one session and print a red-flag summary per query:

    name  n_scan  scans_per_source  n_exchange  n_smj  n_bhj  n_pyeval  codegen_fallback_nodes

Red flags worth a closer look: the same parquet source scanned more
than once (duplicated subtree), SortMergeJoin on frames that should
broadcast, BatchEvalPython/ArrowEvalPython in a path that could be
built-ins, and operators outside any WholeStageCodegen span.

Usage:
    python scripts/plan_sweep.py q1 q2 ...      # summary only
    PLAN_DIR=plans/r13_sweep python scripts/plan_sweep.py q1 ...  # + dump files
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PLAN_DIR = os.environ.get("PLAN_DIR", "")


def audit(text: str) -> dict:
    # Operator list lines look like "   +- PhotonX (nn)" in the header
    # block of explain('formatted'); scan sources appear as
    # "Scan parquet " with the file path in the detail block.
    n_exchange = len(re.findall(r"\bExchange\b", text)) - len(
        re.findall(r"ReusedExchange", text)
    )
    n_reused = len(re.findall(r"ReusedExchange", text))
    n_smj = len(re.findall(r"\bSortMergeJoin\b", text))
    n_bhj = len(re.findall(r"\bBroadcastHashJoin\b", text))
    n_bnlj = len(re.findall(r"\bBroadcastNestedLoopJoin\b", text))
    n_py = len(re.findall(r"BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|FlatMapGroupsInPandas", text))
    # scans per source file path
    srcs = re.findall(r"Location: InMemoryFileIndex(?:\(\d+ paths\))? \[([^\],]+)", text)
    per_src = Counter(os.path.basename(s.rstrip("/")) for s in srcs)
    dup_src = {k: v for k, v in per_src.items() if v > 1}
    n_window = len(re.findall(r"\bWindow\b", text))
    return {
        "scan": sum(per_src.values()),
        "dup": dup_src,
        "xchg": n_exchange,
        "reuse": n_reused,
        "smj": n_smj,
        "bhj": n_bhj,
        "bnlj": n_bnlj,
        "py": n_py,
        "win": n_window,
    }


def main(argv: list[str]) -> int:
    from dump1090_postgis_spark.plans import full_registry
    from dump1090_postgis_spark.session import get_spark

    spark = get_spark(app_name="plan_sweep")
    registry = full_registry()
    names = argv or sys.exit("pass query names")
    if PLAN_DIR:
        os.makedirs(PLAN_DIR, exist_ok=True)

    print(f"{'query':<34} {'scan':>4} {'xchg':>4} {'reuse':>5} {'smj':>3} "
          f"{'bhj':>3} {'bnlj':>4} {'py':>3} {'win':>3}  dup-sources")
    for name in names:
        fn, _sql = registry[name]
        try:
            df = fn(spark, SF_DIR)
            text = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 - audit tool, keep sweeping
            print(f"{name:<34} ERROR {type(e).__name__}: {e}")
            continue
        if PLAN_DIR:
            with open(os.path.join(PLAN_DIR, f"{name}.txt"), "w") as f:
                f.write(text)
        a = audit(text)
        dup = ",".join(f"{k}x{v}" for k, v in sorted(a["dup"].items())) or "-"
        print(f"{name:<34} {a['scan']:>4} {a['xchg']:>4} {a['reuse']:>5} "
              f"{a['smj']:>3} {a['bhj']:>3} {a['bnlj']:>4} {a['py']:>3} "
              f"{a['win']:>3}  {dup}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
