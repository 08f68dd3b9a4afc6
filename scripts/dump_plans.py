#!/usr/bin/env python
"""Dump .explain('formatted') for named queries to plans/<tag>/<name>_<suffix>.txt.

Usage:
    python scripts/dump_plans.py r13 before q1 q2 ...
    python scripts/dump_plans.py r13 after q1 q2 ...
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main(argv: list[str]) -> int:
    tag, suffix, *names = argv
    from dump1090_postgis_spark.plans import full_registry
    from dump1090_postgis_spark.session import get_spark

    spark = get_spark(app_name="dump_plans")
    registry = full_registry()
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        fn, _sql = registry[name]
        df = fn(spark, SF_DIR)
        text = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path} ({len(text.splitlines())} lines)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
