#!/usr/bin/env python
"""Measure the >4,096-probed-cells cell-store fallback at decade scale
(round-11 verdict #5).

``_probed_store_scan`` pushes the probed cells as a static
``list_id IN (...)`` partition filter — but past
``_STORE_ISIN_MAX_CELLS`` (4,096) the literal is skipped and the scan
degrades to the storeless I/O shape, kept honest only by the list_id
equi-join.  The claim to verify: the fallback still KEEPS the
zero-query-time-assignment win (the store's coded/float columns are
read as-is; the storeless path must re-assign + re-encode the whole
corpus per query batch).  Parity store≡storeless is pytest-pinned;
this script records the WALL numbers at ×1000 (2M vectors), with
nlist and the query batch sized so the probed-cell count crosses the
cap.

Protocol: every leg runs in its OWN fresh process (the ×1000 lesson in
BASELINE.md: in-sequence readings carry process-position bias), built
on the same cached perturbed corpus and the same deterministic
centroids; result hashes are compared across legs as a cheap parity
witness.  Legs:

- build        write_ivf_cell_store at nlist=N_LIST (one-time cost)
- store_fb     ivf_pq_topk(corpus_store=...) with the big batch
               (probed cells > 4,096 → IN literal skipped, join-cull
               fallback; the leg asserts the crossing)
- storeless    same query, no store (per-batch assignment + encode)

Usage:
    python scripts/bench_store_fallback.py            # orchestrates legs
    SPARK_GRAFT_FB_SCALE=1000 ...                     # replication factor
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALE = int(os.environ.get("SPARK_GRAFT_FB_SCALE", "1000"))
N_QUERIES = int(os.environ.get("SPARK_GRAFT_FB_QUERIES", "8192"))
N_PROBES = int(os.environ.get("SPARK_GRAFT_FB_PROBES", "8"))
K = 5
PERTURB = 0.6  # same deterministic smear as bench_ivf_recall decade mode
CORPUS = os.path.join(REPO, f".bench_ivf_x{SCALE}", "embeddings.parquet")
#: Legs to run (comma list) — lets the auto-nlist row skip store_in
#: (no IN-cap crossing to isolate at single-digit nlist).
LEGS = [
    l for l in os.environ.get(
        "SPARK_GRAFT_FB_LEGS", "build,store_fb,store_in,storeless"
    ).split(",") if l
]


def _resolve_nlist() -> int:
    """SPARK_GRAFT_FB_NLIST: an int, or 'auto' → similarity.auto_nlist
    from the cached decade corpus's REAL on-disk bytes + row count
    (round-12 verdict #2: the measured sizing rule made executable).
    'auto' requires the corpus cache to exist (run any numeric-nlist
    leg, or bench_ivf_recall, first)."""
    raw = os.environ.get("SPARK_GRAFT_FB_NLIST", "5000")
    if raw != "auto":
        return int(raw)
    import pyarrow.parquet as pq

    from dump1090_postgis_spark.datapipe.similarity import auto_nlist

    if not os.path.isdir(CORPUS):
        raise SystemExit(
            f"FB_NLIST=auto needs the cached corpus at {CORPUS}"
        )
    files = [
        os.path.join(CORPUS, f)
        for f in os.listdir(CORPUS)
        if f.endswith(".parquet")
    ]
    nbytes = sum(os.path.getsize(f) for f in files)
    nrows = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    n = auto_nlist(corpus_rows=nrows, corpus_bytes=nbytes)
    print(
        f"[fb] auto_nlist(rows={nrows}, bytes={nbytes}) = {n}",
        file=sys.stderr,
    )
    return n


N_LIST = _resolve_nlist()
STORE = os.path.join(REPO, f".bench_fb_x{SCALE}", f"store_nlist{N_LIST}")


def _corpus(spark):
    """The bench_ivf_recall decade corpus (shared cache dir): sf0.1
    embeddings ×SCALE with vec_id shifts and the deterministic
    sin-based perturbation."""
    from pyspark.sql import functions as F

    from dump1090_postgis_spark.schemas import load_table

    if not os.path.exists(CORPUS):
        os.makedirs(os.path.dirname(CORPUS), exist_ok=True)
        base = load_table(spark, SF_DIR, "embeddings")
        mx = base.agg(F.max("vec_id")).collect()[0][0]
        rep = (
            base.repartition(32)
            .withColumn(
                "_rep", F.explode(F.sequence(F.lit(0), F.lit(SCALE - 1)))
            )
            .withColumn("vec_id", F.col("vec_id") + F.col("_rep") * (mx + 1))
            .drop("_rep")
            .withColumn(
                "embedding",
                F.transform(
                    "embedding",
                    lambda x, i: x.cast("double")
                    + PERTURB
                    * F.sin(
                        (F.pmod(F.col("vec_id"), F.lit(8191)) + 1).cast(
                            "double"
                        )
                        * (i + 1).cast("double")
                    ),
                ),
            )
        )
        rep.repartition(32).write.mode("overwrite").parquet(CORPUS)
        print(f"generated perturbed embeddings x{SCALE}", file=sys.stderr)
    return spark.read.parquet(CORPUS)


def _centroids(spark, emb):
    """Deterministic coarse quantizer, cached beside the store so every
    leg (and the store's sidecar check) sees bit-identical centroids."""
    from dump1090_postgis_spark.datapipe import similarity as sim

    path = os.path.join(os.path.dirname(STORE), f"centroids_{N_LIST}")
    if not os.path.exists(path):
        cen = sim.build_centroids(emb, num_centroids=N_LIST, iterations=0)
        cen.coalesce(1).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def _leg(name: str) -> dict:
    """Run one leg in THIS process and return its row."""
    from pyspark.sql import functions as F

    from dump1090_postgis_spark.datapipe import similarity as sim
    from dump1090_postgis_spark.session import get_spark

    spark = get_spark(app_name=f"bench_fb_{name}")
    emb = _corpus(spark)
    cen = _centroids(spark, emb)
    n = emb.count()
    queries = emb.filter(F.col("vec_id") < N_QUERIES)

    if name == "build":
        try:  # reuse a store whose sidecar matches (same corpus+cen)
            sim._load_ivf_cell_store(
                spark, STORE, sim._collect_centroids(cen),
                "embedding", "vec_id",
            )
            return {"leg": name, "sec": 0.0, "reused": True}
        except Exception:
            pass
        t0 = time.time()
        sim.write_ivf_cell_store(
            emb, cen, STORE, corpus_rows=n, num_partitions=256
        )
        return {"leg": name, "sec": round(time.time() - t0, 2)}

    # how many distinct cells does this batch probe? (query-side-only
    # job, the same projection _probed_store_scan collects) — the run
    # is only meaningful when this CROSSES the 4,096 IN-literal cap
    probed = (
        sim.with_probed_centroids(queries, cen, N_PROBES, "embedding")
        .select("list_id").distinct().count()
    )
    if name == "store_in":
        # same batch THROUGH the IN literal: lift the cap so the
        # probed-cell predicate is inlined even past 4,096 terms —
        # isolates what the literal itself costs vs the join-cull
        # fallback on the identical store/scan
        sim._STORE_ISIN_MAX_CELLS = 10**9
    t0 = time.time()
    out = sim.ivf_pq_topk(
        emb, queries, cen, k=K, probes=N_PROBES, corpus_rows=n,
        rerank=True,
        corpus_store=None if name == "storeless" else STORE,
    )
    rows = sorted((r.query_id, r.rank, r.neighbor_id) for r in out.collect())
    sec = round(time.time() - t0, 2)
    import hashlib

    digest = hashlib.sha256(repr(rows).encode()).hexdigest()[:16]
    return {
        "leg": name, "sec": sec, "rows": len(rows),
        "probed_cells": probed, "hash": digest,
    }


def main() -> int:
    if len(sys.argv) > 1:  # child mode: one leg
        print(json.dumps(_leg(sys.argv[1])))
        return 0
    results = {}
    for leg in LEGS:
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), leg],
            capture_output=True, text=True, cwd=REPO,
        )
        line = next(
            (ln for ln in reversed(proc.stdout.splitlines())
             if ln.startswith("{")), None,
        )
        if proc.returncode != 0 or line is None:
            print(proc.stderr[-3000:], file=sys.stderr)
            raise SystemExit(f"leg {leg} failed rc={proc.returncode}")
        results[leg] = json.loads(line)
        print(
            f"[fb] {leg}: {results[leg]['sec']}s "
            f"(wall {round(time.time() - t0, 1)}s)",
            file=sys.stderr,
        )
    probed = (results.get("store_fb") or {}).get("probed_cells") or 0
    if "store_in" in results and probed <= 4096:
        print(
            f"WARNING: batch probed only {probed} cells — the IN-literal "
            "cap was NOT crossed; raise N_LIST/N_QUERIES/N_PROBES",
            file=sys.stderr,
        )
    query_legs = [
        l for l in ("store_fb", "store_in", "storeless") if l in results
    ]
    out = {
        "metric": "ivf_store_fallback_x" + str(SCALE),
        "nlist": N_LIST, "queries": N_QUERIES, "probes": N_PROBES,
        "isin_cap": 4096,
        "legs": results,
        "parity": len({results[l].get("hash") for l in query_legs}) == 1,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
