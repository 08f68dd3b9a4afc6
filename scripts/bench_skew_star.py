#!/usr/bin/env python
"""Megastar skew stress for the dedup graph paths (round-8 item: no
decade run ever had a single hot node/bucket — this one does).

Two stresses at ×N scale (default ×1000 ≈ 5M docs):

1. **megafamily** — ONE exact-duplicate family of ~N×200 members
   (1M at ×1000) planted into the replicated documents table, then the
   production near-dup clustering pipeline: contract_families →
   rep-only banded signatures → bucketed verify (cap 1024) →
   duplicate_clusters(contract=...).  The family contracts to ONE
   representative, so pair generation and CC stay linear in distinct
   content while the family's bucket would otherwise be 10⁶ wide (the
   cap audit row records what the cap dropped on the UNCONTRACTED
   signature frame for comparison).

2. **megastar CC** — a synthetic 1M-spoke star EDGE list (hub 0,
   spokes 1..1M, diameter 2) through connected_components +
   duplicate_clusters directly: the hot-node neighborhood min is a
   partial-agg groupBy (cluster.py's skew claim), so the reduce side
   sees one row per map partition for the hub, not 1M.

Usage:
    SPARK_GRAFT_SCALE=1000 python scripts/bench_skew_star.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCALE = int(os.environ.get("SPARK_GRAFT_SCALE", "1000"))
SF_DIR = os.path.join(REPO, f".bench_sf1_x{SCALE}")
FAMILY_MOD = 5  # every 5th doc joins the megafamily → N×1000 members


def main() -> int:
    from pyspark.sql import functions as F

    from dump1090_postgis_spark.datapipe import cluster as cl
    from dump1090_postgis_spark.datapipe import dedup as dd
    from dump1090_postgis_spark.schemas import load_table
    from dump1090_postgis_spark.session import get_spark

    spark = get_spark(app_name=f"bench_skew_star_x{SCALE}")
    if not os.path.exists(os.path.join(SF_DIR, "documents.parquet")):
        print(
            f"missing {SF_DIR}/documents.parquet — generate via "
            "SPARK_GRAFT_BENCH_TABLES=documents scripts/bench_scale.py",
            file=sys.stderr,
        )
        return 2

    out: dict = {"metric": "bench_skew_star", "scale": SCALE, "unit": "sec"}

    # ---- stress 1: megafamily through the contraction pipeline ------
    docs = load_table(spark, SF_DIR, "documents").withColumn(
        "text",
        F.when(
            F.pmod(F.col("doc_id"), F.lit(FAMILY_MOD)) == 0,
            F.lit(
                "megafamily boilerplate page exactly duplicated across "
                "the whole crawl every mirror serves this same text"
            ),
        ).otherwise(F.col("text")),
    )
    n_docs = docs.count()
    fam_size = docs.filter(
        F.pmod(F.col("doc_id"), F.lit(FAMILY_MOD)) == 0
    ).count()
    out["n_docs"] = n_docs
    out["family_size"] = fam_size

    t0 = time.monotonic()
    fam = cl.contract_families(docs)
    rep_docs = docs.join(
        fam.filter(F.col("node") == F.col("rep")).select(
            F.col("node").alias("doc_id")
        ),
        "doc_id",
        "semi",
    )
    banded = dd.minhash_banded(rep_docs, hash_family="xxhash64")
    rpairs = dd.bucketed_jaccard_pairs(rep_docs, banded, threshold=0.5)
    clusters = cl.duplicate_clusters(docs, rpairs, contract=fam)
    mega = (
        clusters.groupBy("component")
        .agg(F.count(F.lit(1)).alias("sz"))
        .agg(F.max("sz").alias("mx"))
        .first()["mx"]
    )
    out["megafamily"] = {
        "sec": round(time.monotonic() - t0, 1),
        "largest_cluster": int(mega),
    }
    print(f"megafamily: {out['megafamily']}", file=sys.stderr)
    if mega < fam_size:
        print("FAIL: megafamily did not resolve to one cluster", file=sys.stderr)
        return 1

    # cap audit on the UNCONTRACTED frame — what the cap would have
    # silently dropped without contraction
    t0 = time.monotonic()
    cap_row = dd.bucket_cap_stats(
        dd.minhash_banded(docs, hash_family="xxhash64")
    ).first()
    out["uncontracted_cap_audit"] = {
        "sec": round(time.monotonic() - t0, 1),
        "n_buckets_dropped": int(cap_row["n_buckets_dropped"]),
        "n_members_dropped": int(cap_row["n_members_dropped"]),
        "max_bucket_size_seen": int(cap_row["max_bucket_size_seen"]),
    }
    print(f"cap audit: {out['uncontracted_cap_audit']}", file=sys.stderr)

    # ---- stress 2: 1M-spoke star through iterative CC ---------------
    n_spokes = 1_000_000
    star = spark.range(1, n_spokes + 1).select(
        F.lit(0).cast("bigint").alias("id_a"), F.col("id").alias("id_b")
    )
    ids = spark.range(0, n_spokes + 1).select(F.col("id").alias("doc_id"))
    t0 = time.monotonic()
    star_clusters = cl.duplicate_clusters(ids, star)
    top = (
        star_clusters.groupBy("component")
        .agg(F.count(F.lit(1)).alias("sz"))
        .orderBy(F.desc("sz"))
        .first()
    )
    out["megastar_cc"] = {
        "sec": round(time.monotonic() - t0, 1),
        "component": int(top["component"]),
        "size": int(top["sz"]),
    }
    print(f"megastar: {out['megastar_cc']}", file=sys.stderr)
    if top["component"] != 0 or top["sz"] != n_spokes + 1:
        print("FAIL: star did not resolve to one component", file=sys.stderr)
        return 1

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
