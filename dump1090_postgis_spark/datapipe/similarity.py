"""Similarity search over an embedding column (array<float>).

Two paths:
- ``brute_force_topk`` — exact cosine top-k: queries ⨯ corpus with the
  small side broadcast; one codegen'd dot product per pair, then a
  per-query ranking window.  The baseline and the verifier.
- ``ivf_topk`` — IVF-style scale path: corpus pre-assigned to the
  nearest of C centroids (one pass), queries probe the P nearest
  centroids only — the pair count drops by ~C/P versus brute force.
  With a centroid table of a few thousand rows the probe join is a
  broadcast; the heavy side shuffles once on centroid_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import embedding_cosine


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k neighbors (self excluded) for each query row.

    Returns (query_id, rank, neighbor_id, cosine) — rank 1..k by cosine
    desc with neighbor-id tiebreak (deterministic).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec).alias("_qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec).alias("_cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", F.round(embedding_cosine(F.col("_qv"), F.col("_cv")), 4) + F.lit(0.0))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def normalize_vectors(df: DataFrame, vec: str = "embedding",
                      out: str | None = None) -> DataFrame:
    """L2-normalize an embedding column (pure expressions).  After
    normalization, cosine == dot product, halving the per-pair cost of
    every downstream similarity join."""
    out = out or vec
    v = F.transform(F.col(vec), lambda x: x.cast("double"))
    norm = F.sqrt(
        F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0), lambda s, x: s + x)
    )
    return df.withColumn(
        out,
        F.when(norm > 0, F.transform(v, lambda x: x / norm)).otherwise(v),
    )


def _mean_centroids(assigned: DataFrame) -> DataFrame:
    """Element-wise mean per centroid via posexplode + groupBy (scales
    to any dimensionality; shuffle keyed on (centroid, dim))."""
    exploded = assigned.select("centroid_id", F.posexplode("_v").alias("pos", "x"))
    return (
        exploded.groupBy("centroid_id", "pos")
        .agg(F.avg("x").alias("m"))
        .groupBy("centroid_id")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("_pm"))
        .select(
            "centroid_id",
            F.transform(F.col("_pm"), lambda s: s["m"]).alias("centroid"),
        )
    )


def build_centroids(corpus: DataFrame, num_centroids: int = 16,
                    vec: str = "embedding", id_col: str = "vec_id",
                    iterations: int = 0) -> DataFrame:
    """Deterministic IVF centroids: hash-assigned seed means, then
    `iterations` Lloyd (k-means) refinement steps — each step is one
    broadcast-join assignment plus one mean aggregation, fully
    distributed and reproducible (no RNG)."""
    assigned = corpus.select(
        (F.pmod(F.col(id_col), F.lit(num_centroids))).alias("centroid_id"),
        F.transform(F.col(vec), lambda x: x.cast("double")).alias("_v"),
    )
    centroids = _mean_centroids(assigned)
    for _ in range(iterations):
        scored = (
            corpus.select(
                F.col(id_col).alias("_id"),
                F.transform(F.col(vec), lambda x: x.cast("double")).alias("_v"),
            )
            .crossJoin(F.broadcast(centroids))
            .withColumn("_sim", embedding_cosine(F.col("_v"), F.col("centroid")))
        )
        w = Window.partitionBy("_id").orderBy(F.desc("_sim"), F.asc("centroid_id"))
        reassigned = (
            scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("centroid_id", "_v")
        )
        centroids = _mean_centroids(reassigned)
    return centroids


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    probes: int = 4,
    vec: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF approximate top-k: corpus rows live in their nearest
    centroid's list; each query scans only its `probes` nearest lists."""
    cen = F.broadcast(centroids)

    def nearest(df: DataFrame, n: int, out: str) -> DataFrame:
        scored = df.crossJoin(cen).withColumn(
            "_sim", embedding_cosine(F.col(vec), F.col("centroid"))
        )
        w = Window.partitionBy(id_col).orderBy(F.desc("_sim"), F.asc("centroid_id"))
        return (
            scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= n)
            .select(df["*"], F.col("centroid_id").alias(out))
        )

    corpus_assigned = nearest(corpus, 1, "list_id")
    query_probes = nearest(queries, probes, "list_id")

    q = query_probes.select(
        F.col(id_col).alias("query_id"), F.col(vec).alias("_qv"), "list_id"
    )
    c = corpus_assigned.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec).alias("_cv"), "list_id"
    )
    scored = (
        c.join(F.broadcast(q), "list_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", F.round(embedding_cosine(F.col("_qv"), F.col("_cv")), 4) + F.lit(0.0))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )
