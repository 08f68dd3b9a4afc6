#!/usr/bin/env python
"""Text MinHash-LSH candidate recall vs EXACT all-pairs ground truth.

The dedup story's load-bearing claim is that the banded candidate
generator loses (almost) nothing above the verify threshold.  This
measures it: exact shingle Jaccard over ALL O(n²) pairs (tractable at
sf0.01: 500 docs → 124,750 pairs) as ground truth, then candidate
recall of both hash families at several thresholds.

Usage:
    python scripts/bench_lsh_recall.py            # sf0.01
    SF_DIR=/root/testdata/sf0.001 python scripts/bench_lsh_recall.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")


def main() -> int:
    from pyspark.sql import functions as F

    from dump1090_postgis_spark.datapipe import dedup as dd
    from dump1090_postgis_spark.schemas import load_table
    from dump1090_postgis_spark.session import get_spark

    spark = get_spark(app_name="bench_lsh_recall")
    docs = load_table(spark, SF_DIR, "documents")
    n = docs.count()

    all_pairs = docs.select(F.col("doc_id").alias("id_a")).join(
        docs.select(F.col("doc_id").alias("id_b")), F.col("id_b") > F.col("id_a")
    )
    t0 = time.time()
    truth = {
        (r.id_a, r.id_b): r.jaccard
        for r in dd.jaccard_pairs(docs, all_pairs, threshold=0.0).collect()
    }
    t_exact = time.time() - t0

    points = []
    cands = {
        fam: {
            (r.id_a, r.id_b)
            for r in dd.lsh_candidate_pairs(docs, hash_family=fam).collect()
        }
        for fam in ("xxhash64", "md5")
    }
    for thr in (0.5, 0.7, 0.9):
        gt = {k for k, v in truth.items() if v > thr}
        for fam, cs in cands.items():
            recall = (len(gt & cs) / len(gt)) if gt else None
            points.append(
                {"threshold": thr, "family": fam, "true_pairs": len(gt),
                 "recall": round(recall, 4) if recall is not None else None}
            )
            print(f"thr={thr} fam={fam}: true={len(gt)} recall={recall}")

    print(json.dumps({
        "metric": "lsh_candidate_recall",
        "sf_dir": SF_DIR,
        "n_docs": n,
        "exact_allpairs_sec": round(t_exact, 2),
        "candidates": {f: len(c) for f, c in cands.items()},
        "points": points,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
