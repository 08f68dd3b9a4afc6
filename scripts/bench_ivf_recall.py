#!/usr/bin/env python
"""IVF recall/latency curve at reduced probe counts.

The ANN story at scale hinges on nprobe « nlist: each query scans only
probes/nlist of the corpus, so the interesting operating points are the
ones where recall must be EARNED, not the degenerate full-probe point
(which equals brute force by construction).  This script measures
recall@k of ``ivf_topk`` against the exact brute-force baseline on the
real embeddings table, at nprobe in {1, 2, 4, nlist}, and reports
wall-clock per setting.

Usage:
    python scripts/bench_ivf_recall.py                 # sf0.1
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python scripts/bench_ivf_recall.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
K = 5
NLISTS = (16, 32)
N_QUERIES = 100
LLOYD_ITERS = 2


def main() -> int:
    from pyspark.sql import functions as F

    from dump1090_postgis_spark.datapipe import similarity as sim
    from dump1090_postgis_spark.schemas import load_table
    from dump1090_postgis_spark.session import get_spark

    spark = get_spark(app_name="bench_ivf_recall")
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)

    t0 = time.time()
    exact = {
        (r.query_id, r.neighbor_id)
        for r in sim.brute_force_topk(emb, queries, k=K).collect()
    }
    t_exact = time.time() - t0
    n_q = len({q for q, _ in exact})

    rows = []
    train_secs = {}
    for nlist in NLISTS:
        t0 = time.time()
        centroids = sim.build_centroids(
            emb, num_centroids=nlist, iterations=LLOYD_ITERS
        ).persist()
        centroids.count()
        train_secs[str(nlist)] = round(time.time() - t0, 2)
        for probes in (1, 2, 4, 8, nlist):
            if probes > nlist:
                continue
            t0 = time.time()
            approx = {
                (r.query_id, r.neighbor_id)
                for r in sim.ivf_topk(
                    emb, queries, centroids, k=K, probes=probes
                ).collect()
            }
            dt = time.time() - t0
            recall = len(exact & approx) / len(exact)
            # IVF-PQ at the SAME centroids/probes — identical candidate
            # sets, so the recall delta isolates the residual-int8 cost
            t0 = time.time()
            approx_pq = {
                (r.query_id, r.neighbor_id)
                for r in sim.ivf_pq_topk(
                    emb, queries, centroids, k=K, probes=probes
                ).collect()
            }
            dt_pq = time.time() - t0
            recall_pq = len(exact & approx_pq) / len(exact)
            rows.append(
                {
                    "nlist": nlist,
                    "nprobe": probes,
                    "recall_at_k": round(recall, 4),
                    "recall_at_k_pq": round(recall_pq, 4),
                    "sec": round(dt, 2),
                    "sec_pq": round(dt_pq, 2),
                    "scan_fraction": round(probes / nlist, 3),
                }
            )
            print(
                f"nlist={nlist:>2} nprobe={probes:>2}  recall@{K}={recall:.4f}  "
                f"pq={recall_pq:.4f}  {dt:.2f}s/{dt_pq:.2f}s  "
                f"(scans ~{probes}/{nlist} of corpus per query)"
            )
        centroids.unpersist()

    out = {
        "metric": "ivf_recall_curve",
        "sf_dir": SF_DIR,
        "k": K,
        "lloyd_iterations": LLOYD_ITERS,
        "n_queries": n_q,
        "brute_force_sec": round(t_exact, 2),
        "train_sec": train_secs,
        "points": rows,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
