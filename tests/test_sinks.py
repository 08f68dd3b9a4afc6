"""foreachBatch sinks: per-epoch parquet append split by kind (SNK-1)
and the dual-write live copy (SNK-2/3), driven by the real streaming
pipeline."""

import time

import pytest
from pyspark.sql import functions as F

from dump1090_postgis_spark.datapipe.similarity import normalize_vectors
from dump1090_postgis_spark.streaming.pipeline import (
    event_stream,
    parsed_stream,
    start_pipeline,
)
from dump1090_postgis_spark.streaming.sinks import parquet_event_sink

LINES = [
    "MSG,3,1,1,5AC001,1,2024/05/01,10:00:00.000,2024/05/01,10:00:00.000,,500,,,47.10,-1.60,,,0,,0,0",
    "MSG,3,1,1,5AC001,1,2024/05/01,10:00:05.000,2024/05/01,10:00:05.000,,20,,,47.11,-1.61,,,0,,0,-1",
]


def test_parquet_event_sink_end_to_end(spark, tmp_path):
    drop = tmp_path / "drop"
    drop.mkdir()
    (drop / "cap.txt").write_text("\n".join(LINES))
    out = tmp_path / "out"
    q = start_pipeline(
        spark.readStream.text(str(drop)),
        parquet_event_sink(str(out)),
        checkpoint_dir=str(tmp_path / "ckpt"),
        trigger="1 second",
    )
    deadline = time.time() + 90
    rows = []
    while time.time() < deadline:
        try:
            rows = spark.read.parquet(str(out / "events")).collect()
            if rows:
                break
        except Exception:
            pass
        time.sleep(2)
    q.stop()
    assert len(rows) == 1
    assert rows[0].kind == "landing" and rows[0].hexident == "5AC001"
    assert rows[0].epoch >= 0  # epoch tag present for idempotence auditing


def test_normalize_vectors(spark):
    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    out = {r.vec_id: r.embedding for r in normalize_vectors(df).collect()}
    assert out[1] == pytest.approx([0.6, 0.8])
    assert out[2] == [0.0, 0.0]  # zero vector untouched, no div-by-zero


def test_kmeans_refinement_improves_or_holds_recall(spark):
    import random

    from dump1090_postgis_spark.datapipe.similarity import (
        brute_force_topk,
        build_centroids,
        ivf_topk,
    )

    rnd = random.Random(3)
    # two well-separated clusters so refined centroids should find them
    rows = []
    for i in range(30):
        base = 1.0 if i % 2 else -1.0
        rows.append((i, [base + rnd.gauss(0, 0.05) for _ in range(8)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = emb.filter(F.col("vec_id") < 3)
    exact = {(r.query_id, r.neighbor_id)
             for r in brute_force_topk(emb, queries, k=3).collect()}

    refined = build_centroids(emb, num_centroids=2, iterations=2)
    approx = {(r.query_id, r.neighbor_id)
              for r in ivf_topk(emb, queries, refined, k=3, probes=1).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall == 1.0  # clean clusters + refined centroids → exact recall
