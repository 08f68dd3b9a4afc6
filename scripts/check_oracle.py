#!/usr/bin/env python
"""Local replica of the verification driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at the given scale
factor AND its ``oracle_sql()`` in DuckDB over the same parquet
tables, then compares row count, column-name set, and
order-insensitive values.

Usage:
    python scripts/check_oracle.py              # all queries @ sf0.01
    python scripts/check_oracle.py q1 q2        # subset
    SF_DIR=/root/testdata/sf0.001 python scripts/check_oracle.py
"""

from __future__ import annotations

import os
import sys
import time
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Canonical form: columns sorted by name, rows sorted by all
    columns, values stringified (mirrors an order-insensitive value
    hash)."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(lambda v: "NULL" if v is None or (isinstance(v, float) and pd.isna(v)) else str(v))
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main(argv: list[str]) -> int:
    # One registry build, one consistent snapshot: queries, oracles,
    # and THIS build's degraded-oracle map all come from the same
    # full_registry_with_degraded() call (round-9 advisor: the old
    # module-global read inside the loop could be swapped by any
    # interleaved rebuild).  __spark_entry__.queries()/oracle_sql()
    # remain the driver's contract and delegate to the same builder.
    from dump1090_postgis_spark.plans import full_registry_with_degraded

    registry, degraded = full_registry_with_degraded()
    qs = {n: fn for n, (fn, _sql) in registry.items()}
    oracles = {n: sql for n, (_fn, sql) in registry.items() if sql is not None}
    names = argv or list(qs)

    from dump1090_postgis_spark.session import get_spark

    spark = get_spark(app_name="check_oracle")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    n_pass = n_fail = 0
    results: dict[str, dict] = {}
    for name in names:
        if name not in qs:
            print(f"UNKNOWN {name}")
            continue
        t0 = time.time()
        try:
            sdf = qs[name](spark, SF_DIR).toPandas()
        except Exception:
            print(f"FAIL  {name}: spark query raised")
            traceback.print_exc()
            n_fail += 1
            results[name] = {"status": "fail", "err": "spark_raised"}
            continue
        if name not in oracles:
            # Distinguish a BY-DESIGN rows-only entry (no SQL oracle was
            # ever registered) from an entry whose oracle BUILDER failed
            # environmentally during this registry build — silent oracle
            # loss must be visible, and a degraded entry counts as FAIL.
            if name in degraded:
                why = degraded[name]
                print(f"FAIL  {name}: oracle DEGRADED ({why}) rows={len(sdf)}")
                n_fail += 1
                results[name] = {
                    "status": "degraded",
                    "spark_rows": len(sdf),
                    "err": why[:300],
                }
                continue
            print(f"check {name}: rows-only (no oracle) rows={len(sdf)} "
                  f"[{time.time()-t0:.1f}s]")
            n_pass += 1
            results[name] = {"status": "rows_only", "spark_rows": len(sdf)}
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception:
            print(f"FAIL  {name}: oracle SQL raised")
            traceback.print_exc()
            n_fail += 1
            results[name] = {"status": "fail", "err": "oracle_raised"}
            continue

        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rowcount spark={len(sdf)} oracle={len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"columns spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        if not problems:
            cs, co = canon(sdf), canon(odf)
            if not cs.equals(co):
                neq = (cs != co).any(axis=1)
                idx = list(cs.index[neq])[:3]
                detail = []
                for i in idx:
                    detail.append(f"row{i}: spark={cs.loc[i].to_dict()} oracle={co.loc[i].to_dict()}")
                problems.append("values differ; " + " | ".join(detail))
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            n_fail += 1
            results[name] = {"status": "fail", "err": "; ".join(problems)[:300]}
        else:
            print(f"PASS  {name} rows={len(sdf)} [{time.time()-t0:.1f}s]")
            n_pass += 1
            results[name] = {"status": "pass", "spark_rows": len(sdf)}

    print(f"\n{n_pass} pass, {n_fail} fail (sf_dir={SF_DIR})")
    out_path = os.environ.get("CHECK_JSON")
    if out_path:
        import json

        with open(out_path, "w") as fh:
            json.dump({"sf_dir": SF_DIR, "results": results}, fh, indent=1)
        print(f"wrote {out_path}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
