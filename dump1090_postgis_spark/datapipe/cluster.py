"""Duplicate-cluster resolution: near-dup PAIRS → connected
components → one canonical document per cluster.

Pair generators (exact hash, MinHash-LSH, SimHash, embedding LSH — see
:mod:`.dedup`) emit edges; an actionable dedup pipeline needs the
transitive closure of those edges (A~B, B~C ⇒ {A,B,C} is ONE cluster,
keep exactly one member).  This module computes min-label connected
components with plain DataFrame joins/aggregations.

Scale design:

- **Iterative min-label propagation.**  Each round joins the label
  frame to the symmetric edge list on node id and takes the min over
  each node's neighborhood (groupBy → partial aggregation, so only
  (node, min-label) pairs cross the wire).  Rounds needed = graph
  diameter.  Duplicate graphs from LSH bucket pairs are near-cliques
  (every pair in a bucket is emitted, so the diameter of a duplicate
  cluster is 1–2); propagation converges in 2–3 rounds where a
  general-graph algorithm (large-star/small-star, Kiveris et al.,
  "Connected Components in MapReduce and Beyond", SoCC'14) budgets
  O(log n).  The `max_iter` guard bounds pathological chain graphs.
- **Lineage truncation.**  Iterative plans grow per round; each label
  frame is `localCheckpoint`ed (eager) so round k+1's plan does not
  re-derive rounds 1..k.  The same action doubles as the convergence
  check (count of labels that changed) — one job per round, no extra
  pass.
- **Exchange reuse.**  Labels and the edge list are both hash-
  partitioned on node id, so every round's join reuses one exchange;
  the only new shuffle per round is the neighborhood min groupBy.
- **Skew.**  A hot node (one doc near-dup to millions) skews the
  neighborhood groupBy; AQE's skew-join split handles the join side,
  and the groupBy is a partial-agg min, so the reduce side only sees
  one row per (node) per map partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Undirected connected components over an edge list.

    Returns (node, component) for every node that appears in an edge,
    where component = the minimum node id reachable from it.  Isolated
    nodes don't appear (callers attach them with component = own id;
    :func:`duplicate_clusters` does).
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    n_parts = edges.sparkSession.sparkContext.defaultParallelism
    sym = sym.repartition(n_parts, "b").localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        nbr_min = (
            sym.join(
                labels.select(F.col("node").alias("b"), F.col("lbl").alias("nb_lbl")),
                "b",
            )
            .groupBy("a")
            .agg(F.min("nb_lbl").alias("nb_min"))
        )
        new_labels = (
            labels.join(nbr_min.withColumnRenamed("a", "node"), "node", "left")
            .select(
                "node",
                F.least(F.col("lbl"), F.coalesce("nb_min", "lbl")).alias("lbl"),
                (F.col("nb_min") < F.col("lbl")).alias("_chg"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter(F.col("_chg")).count()
        labels = new_labels.drop("_chg")
        if changed == 0:
            break
    return labels.select("node", F.col("lbl").alias("component"))


def duplicate_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Resolve near-dup pairs into clusters over the full corpus.

    Output: (id_col, component, cluster_size, is_canonical) for EVERY
    document — singletons get component = own id, size 1, canonical
    true.  `is_canonical` keeps exactly one doc per cluster (min id),
    i.e. ``docs.join(duplicate_clusters(...), id_col)
    .filter("is_canonical")`` IS the deduplicated corpus.

    The docs side is only scanned for ids (Catalyst prunes the rest);
    the component frame is duplicate-cluster-sized — tiny next to the
    corpus — so the attach join broadcasts at real scale.
    """
    comp = connected_components(pairs, src, dst, max_iter)
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    labeled = comp.join(sizes, "component")
    return (
        docs.select(F.col(id_col).alias("node"))
        .join(labeled, "node", "left")
        .select(
            F.col("node").alias(id_col),
            F.coalesce("component", "node").alias("component"),
            F.coalesce("cluster_size", F.lit(1)).cast("bigint").alias("cluster_size"),
            (F.coalesce("component", "node") == F.col("node")).alias("is_canonical"),
        )
    )
