#!/usr/bin/env python
"""Scale bench: synthesize an sf1-equivalent dataset (×10 replication
of sf0.1 with shifted keys) under the repo scratch dir, then run the
bench headline queries against it.

sf0.1 (~600k lineitem rows) finishes in seconds per query — mostly
fixed overhead; regressions in shuffle structure hide below the noise
floor.  This ×10 set (~6M lineitem / ~1M events / 50k docs) is where
exchanges start to dominate, so round-over-round comparisons at this
scale actually measure plan quality.

Replication semantics (deterministic, seed-free):
- fact tables (events, lineitem, orders, documents, embeddings) are
  unioned ×N with key offsets — new users/orders/docs, same value
  distributions, timestamps unchanged (so time-bounded queries see ×N
  density, the realistic scale-up);
- dimension tables are copied as-is (facts reference copy-0 keys).

Usage:
    python scripts/bench_scale.py            # generate if missing + bench
    SPARK_GRAFT_SCALE=20 python scripts/bench_scale.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALE = int(os.environ.get("SPARK_GRAFT_SCALE", "10"))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DST = os.path.join(REPO, f".bench_sf1_x{SCALE}")

# fact table -> columns to offset per copy (key-space shift)
FACT_OFFSETS = {
    "events": ["event_id", "user_id"],
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ["region", "nation", "customer", "supplier", "part"]

BENCH_QUERIES = [
    "agg1_histogram_hour_utc",
    "agg1_histogram_noids",
    "agg2_sliding_hour_counts",
    "state1_sessions",
    "agg6_session_summaries",
    "join2_details_star",
    "tpch_q1_pricing",
    "tpch_q3_shipping",
    "dedup_exact",
    "dedup_minhash_lsh_fast",
    "dedup_embedding_lsh",
    "ann_topk_bruteforce",
    "ann_topk_ivf",
    "text_fingerprint",
    # round-3 curation additions
    "decontaminate_ngram",
    "text_repetition",
    "dedup_incremental",
    "pack_sequences",
    "tfidf_top_terms",
    # round-4 additions + re-staged hot paths
    "ann_topk_quantized",
    "quality_quantile_filter",
    "vocab_top_tokens",
    "corpus_shuffle_shard",
    "vocab_apply_oov",
    # round-5 additions
    "passage_coverage_filter",
    "semdedup_prune",
    "decontaminate_bloom",
    "kmeans_refine",
    "token_zipf",
    "length_buckets",
    "forward_fill_reading",
    "rolling_value_avg",
    "gram_novelty",
    "source_overlap",
    "event_transitions",
    "profile_events",
    "session_window_native",
    "collocation_pmi",
    "containment_pairs",
    # round-5 second wave
    "funnel_conversion",
    "pivot_type_by_day",
    "ntile_value_bands",
    "cube_priority_flag",
    "approx_sketch_report",
    "inverted_postings",
    "bm25_search",
    "scd2_doc_intervals",
    "multimodal_frame_sample",
    "tpch_q10_returned_items",
    "tpch_q21_sole_late_supplier",
    "ann_hard_negatives",
    "bm25_rerank",
    "zorder_events_key",
    "dq_constraints",
    "incremental_histogram_merge",
    "top_journeys",
    "rfm_scores",
    "mad_outliers",
    "pagerank_event_types",
    "stratified_split",
    "funnel_windowed",
    # round-12 additions
    "join5_runway_attribution_grid",
    "decontaminate_fuzzy",
    "dedup_keep_best",
    "text_token_rarity",
]


def generate(spark) -> None:
    from pyspark.sql import functions as F

    from dump1090_postgis_spark.schemas import load_table

    os.makedirs(DST, exist_ok=True)
    for name in DIMS:
        out = f"{DST}/{name}.parquet"
        if not os.path.exists(out):
            spark.read.parquet(f"{SRC}/{name}.parquet").write.mode(
                "overwrite"
            ).parquet(out)
    # Table subset for decade runs past the full-set disk budget:
    # ×10000 lineitem would be ~95 GB, but the datapipe decade only
    # needs documents+embeddings (~300 MB per ×1000).  Queries that
    # load an ungenerated table fail loudly on the missing path.
    tsub = os.environ.get("SPARK_GRAFT_BENCH_TABLES")
    facts = (
        {t: FACT_OFFSETS[t] for t in tsub.split(",") if t}
        if tsub
        else FACT_OFFSETS
    )
    for name, keys in facts.items():
        out = f"{DST}/{name}.parquet"
        if os.path.exists(out):
            continue
        base = load_table(spark, SRC, name)
        maxes = base.agg(*[F.max(k).alias(k) for k in keys]).collect()[0]
        # one scan, one explode — identical key shifts to the old
        # SCALE-branch union (copy i shifts key k by i*(max+1)), but
        # the plan stays O(1) in SCALE, so x300/x1000 replication
        # neither rescans the base N times nor builds an N-way Union.
        # spread the base across the cores BEFORE exploding: a small
        # source parquet scans as 1-3 splits, and each scan task emits
        # SCALE copies — without this, 3 tasks do all the replication
        # work (observed: the x1000 lineitem write serialized on a
        # 3-task stage).
        df = base.repartition(32).withColumn(
            "_rep", F.explode(F.sequence(F.lit(0), F.lit(SCALE - 1)))
        )
        for k in keys:
            df = df.withColumn(
                k, F.col(k) + F.col("_rep") * F.lit(maxes[k] + 1)
            )
        df = df.drop("_rep")
        df.repartition(32).write.mode("overwrite").parquet(out)
        print(f"generated {name} x{SCALE}", file=sys.stderr)


SKEW_DST = os.path.join(REPO, f".bench_skew_x{SCALE}")

# Hot-key stress set: the operators whose shuffle/window keys the hot
# session key actually hits.
SKEW_QUERIES = [
    "state1_sessions",
    "agg2_sliding_hour_counts",
    "agg6_session_summaries",
]


def generate_skew(spark) -> None:
    """Skewed twin of the ×N events table: ONE hot session key owns
    80% of the rows (deterministic event_id split); every other table
    is shared with the uniform set via symlink."""
    from pyspark.sql import functions as F

    from dump1090_postgis_spark.schemas import load_table

    os.makedirs(SKEW_DST, exist_ok=True)
    out = f"{SKEW_DST}/events.parquet"
    if not os.path.exists(out):
        ev = load_table(spark, DST, "events")
        skewed = ev.withColumn(
            "user_id",
            F.when(F.pmod(F.col("event_id"), 10) < 8, F.lit(1)).otherwise(
                F.col("user_id")
            ),
        )
        skewed.repartition(32).write.mode("overwrite").parquet(out)
        print(f"generated skewed events x{SCALE} (80% one key)", file=sys.stderr)
    for name in list(FACT_OFFSETS) + DIMS:
        if name == "events":
            continue
        dst = f"{SKEW_DST}/{name}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{DST}/{name}.parquet", dst)


def bench_skew(spark) -> int:
    """Hot-session-key stress: the SKEW_QUERIES against the skewed
    events twin, plus naive-vs-salted rollup on the hot key itself —
    the evidence row that the skew story (operators/skew.py + AQE)
    holds at ×N."""
    from pyspark.sql import functions as F

    from dump1090_postgis_spark.operators.skew import salted_counts
    from dump1090_postgis_spark.plans import full_registry
    from dump1090_postgis_spark.schemas import load_table

    generate_skew(spark)
    registry = full_registry()
    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))

    def timed(build):
        best = None
        for _ in range(runs):
            t0 = time.time()
            build().write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            spark.catalog.clearCache()
        return round(best, 3)

    timings: dict[str, float] = {}
    for name in SKEW_QUERIES:
        fn, _sql = registry[name]
        timings[name] = timed(lambda: fn(spark, SKEW_DST))

    ev = load_table(spark, SKEW_DST, "events")
    timings["rollup_naive"] = timed(
        lambda: ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("rows"))
    )
    timings["rollup_salted"] = timed(lambda: salted_counts(ev, "user_id"))

    print(json.dumps({
        "metric": "bench_skew_runtime",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": 0.1 * SCALE,
        "hot_key_share": 0.8,
    }))
    return 0


def main() -> int:
    from dump1090_postgis_spark.plans import full_registry
    from dump1090_postgis_spark.session import get_spark

    spark = get_spark(app_name="bench_scale")
    generate(spark)
    if os.environ.get("SPARK_GRAFT_SKEW") == "1":
        return bench_skew(spark)

    registry = full_registry()
    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    # Subset override for decade runs (×100 generation + the full list
    # would be hours): comma-separated query names.
    subset = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    names = [s for s in subset.split(",") if s] if subset else BENCH_QUERIES
    # Single-JVM hygiene knob: shuffle files and broadcasts from one
    # query linger until the DRIVER GC runs (ContextCleaner cleans on
    # weak-ref collection) — at ×100 a later shuffle-heavy query can
    # pay a prior query's accumulated spill (measured: agg6 2-5 s
    # isolated vs 28-50 s mid-sequence, restored by System.gc()).  A
    # real cluster churns its cleaner continuously across jobs; GC
    # between queries approximates per-job isolation here.
    gc_between = os.environ.get("SPARK_GRAFT_BENCH_GC") == "1"
    timings: dict[str, float] = {}
    for name in names:
        fn, _sql = registry[name]
        best = None
        for _ in range(runs):
            # timer wraps plan build too — see bench.py: queries with
            # eager build-time stages must pay them inside the clock
            t0 = time.time()
            df = fn(spark, DST)
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            df = None
            spark.catalog.clearCache()
            if gc_between:
                spark._jvm.System.gc()
        timings[name] = round(best, 3)
        # progress to stderr so a decade run that dies mid-sequence
        # (disk, OOM) still leaves every completed timing on record
        print(f"done {name}: {timings[name]}s", file=sys.stderr)
    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "bench_scale_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": 0.1 * SCALE,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
