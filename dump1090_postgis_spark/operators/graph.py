"""Iterative graph analytics over edge frames.

Companion to the min-label connected components in
``datapipe/cluster.py`` (the other iterative operator): weighted
PageRank over an edge list, here applied to the event-transition
graph (operators/events.transition_counts) to score event types by
behavioral centrality.

Determinism design: float summation order differs between engines and
between Spark partial-agg schedules, so rank mass is kept in integer
PARTS-PER-MILLION — every edge contribution rounds to a bigint before
the per-node sum, making each iteration exact integer arithmetic
(associative, engine-order-independent) and therefore
oracle-checkable as chained SQL CTEs.

Scale shape: one iteration = rank ⋈ edges on the source key (broadcast
when ranks are node-cardinality-small, keyed shuffle otherwise) + a
partial-agg groupBy on the destination.  Iterations chain plans
linearly; for deep iteration counts interpose ``localCheckpoint`` the
way cluster.connected_components does.  Dangling nodes (no out-edges)
keep the teleport term only — their mass is not redistributed
(documented divergence from the strict random-surfer model; the
oracle states the same rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

PPM = 1_000_000


def pagerank_ppm(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
    checkpoint_edges: bool = False,
) -> DataFrame:
    """Weighted PageRank, rank mass in integer ppm:
    ``(node, rank_ppm)``.

    ``rank_ppm`` starts uniform (round(1e6/N)); each iteration every
    node sends ``round(d · rank · w/out)`` ppm down each out-edge and
    receives the teleport base ``round((1−d)·1e6/N)`` plus its inbound
    contributions.
    """
    if iterations < 1:
        raise ValueError("need at least one iteration")
    # Pin the edge projection (lazy localCheckpoint: materialized once
    # by the first action, shared by every reference).  The edge frame
    # is referenced 4× up front (nodes twice, out-degree, e_norm) and
    # transitively by every iteration — unpinned, the caller's edge
    # PIPELINE (for the event-transition entry: the full events scan +
    # per-user lag window) was inlined into each reference: 44 window
    # copies / 144 Exchanges in the 3-iteration physical plan, and the
    # sf0.1 noop run measured 2.03 s → 0.99 s pinned (round-13 opt,
    # identical rank_ppm).  At corpus scale the pin is also the right
    # plan: the aggregated transition graph is tiny next to the event
    # log that produces it, and one materialization replaces four
    # corpus-wide window passes.
    e = edges.select(
        F.col(src).alias("_s"), F.col(dst).alias("_d"),
        F.col(weight).cast("double").alias("_w"),
    ).localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("_s").alias("node"))
        .unionByName(e.select(F.col("_d").alias("node")))
        .distinct()
    )
    n_nodes = nodes.agg(F.count(F.lit(1)).cast("bigint").alias("_n"))
    out = e.groupBy("_s").agg(F.sum("_w").alias("_out"))
    e_norm = e.join(out, "_s").select(
        "_s", "_d", (F.col("_w") / F.col("_out")).alias("_frac")
    )
    if checkpoint_edges:
        # For DEEP iteration counts: cut the lineage so the plan does
        # not grow linearly in iterations.  At the default depth this
        # measures as a wash — Catalyst's ReuseExchange already dedups
        # the identical edge subtrees across iterations, so the eager
        # materialization only buys plan-size headroom, not time.
        e_norm = e_norm.localCheckpoint()

    ranks = nodes.crossJoin(F.broadcast(n_nodes)).select(
        "node",
        F.round(F.lit(float(PPM)) / F.col("_n")).cast("bigint").alias("rank_ppm"),
    )
    base = nodes.crossJoin(F.broadcast(n_nodes)).select(
        "node",
        F.round(F.lit((1.0 - damping) * PPM) / F.col("_n"))
        .cast("bigint")
        .alias("_base"),
    )
    for _ in range(iterations):
        contrib = (
            e_norm.join(
                ranks.select(F.col("node").alias("_s"), "rank_ppm"), "_s"
            )
            .select(
                F.col("_d").alias("node"),
                F.round(F.lit(damping) * F.col("rank_ppm") * F.col("_frac"))
                .cast("bigint")
                .alias("_c"),
            )
            .groupBy("node")
            .agg(F.sum("_c").cast("bigint").alias("_in"))
        )
        ranks = base.join(contrib, "node", "left").select(
            "node",
            (F.col("_base") + F.coalesce(F.col("_in"), F.lit(0)))
            .cast("bigint")
            .alias("rank_ppm"),
        )
    return ranks
