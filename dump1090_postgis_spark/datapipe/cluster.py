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


def _persistent_ids(sc) -> set:
    """ids of the RDDs currently pinned in the block manager
    (diagnostic/test helper — the release path below no longer diffs
    this global state, see :func:`_checkpointed_rdd_id`)."""
    return set(sc._jsc.getPersistentRDDs().keySet().toArray())


def _checkpointed_rdd_id(df: DataFrame) -> int | None:
    """The block-manager RDD id of an eagerly ``localCheckpoint``ed
    DataFrame, read DIRECTLY off its plan (the analyzed plan of a
    checkpointed frame is a ``LogicalRDD`` wrapping the persisted RDD).

    This is what makes the per-round block release safe under
    concurrent driver threads: the previous implementation set-diffed
    ``getPersistentRDDs()`` around the checkpoint call, so any RDD
    persisted by ANOTHER thread between the snapshots was attributed
    to the round and unpersisted next iteration — and unpersisting a
    foreign localCheckpointed RDD truncates its lineage unrecoverably.
    Returns None when the plan shape is unexpected (release is then
    skipped for that frame — leak-toward-GC, never break a peer)."""
    try:
        node = df._jdf.queryExecution().analyzed()
        if node.getClass().getName().endswith("LogicalRDD"):
            return int(node.rdd().id())
    except Exception:  # noqa: BLE001 — internals shifted; fall back to GC
        pass
    return None


def _unpersist_blocks(sc, ids: set) -> None:
    """Release the block-manager storage of the given persisted RDD
    ids (non-blocking).  localCheckpoint blocks are otherwise freed
    only when the DRIVER JVM garbage-collects the RDD reference and
    ContextCleaner notices — on a long iterative job that means every
    round's checkpoint accumulates on local scratch until some later
    GC (measured: the ×300 dedup_clusters run exhausted a 60 GB
    scratch budget largely on dead round-(k−1) blocks)."""
    jmap = sc._jsc.getPersistentRDDs()
    it = jmap.entrySet().iterator()
    while it.hasNext():
        e = it.next()
        if e.getKey() in ids:
            e.getValue().unpersist(False)


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

    Scratch discipline: each round's label frame is an eager
    localCheckpoint (lineage truncation + convergence count in one
    job); once round k's checkpoint has materialized, round k−1's
    blocks can never be read again, so they are unpersisted
    IMMEDIATELY (:func:`_unpersist_blocks`) instead of waiting for
    driver GC — the checkpoint footprint stays at one label frame
    (plus the symmetric edge list) regardless of round count.
    """
    if max_iter < 1:
        raise ValueError(f"max_iter must be >= 1, got {max_iter}")
    sc = edges.sparkSession.sparkContext
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    n_parts = sc.defaultParallelism
    sym = sym.repartition(n_parts, "b").localCheckpoint(eager=True)
    sym_ids = {_checkpointed_rdd_id(sym)} - {None}
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node"))
        .localCheckpoint(eager=True)
    )
    prev_ids = {_checkpointed_rdd_id(labels)} - {None}
    changed = 0
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
        new_ids = {_checkpointed_rdd_id(new_labels)} - {None}
        # round k is materialized (eager) — round k−1's blocks are
        # dead; free them now rather than at some future driver GC.
        # Ids are read off each frame's OWN LogicalRDD plan node, so a
        # concurrently-persisting driver thread can never be hit.
        _unpersist_blocks(sc, prev_ids)
        prev_ids = new_ids
        changed = new_labels.filter(F.col("_chg")).count()
        labels = new_labels.drop("_chg")
        if changed == 0:
            break
    pending = 0
    if changed:
        # convergence is only OBSERVABLE one round late (round k's
        # changes may themselves be the fixed point), so a loop that
        # exhausts with changed > 0 gets ONE read-only probe — the
        # next round's min-neighbor check without a label update —
        # before declaring non-convergence; otherwise max_iter would
        # effectively need one spare round, and a converged result
        # would be thrown away (round-10 advisor).
        pending = (
            sym.join(
                labels.select(
                    F.col("node").alias("b"), F.col("lbl").alias("nb_lbl")
                ),
                "b",
            )
            .groupBy("a")
            .agg(F.min("nb_lbl").alias("nb_min"))
            .join(labels.withColumnRenamed("node", "a"), "a")
            .filter(F.col("nb_min") < F.col("lbl"))
            .limit(1)
            .count()
        )
    # the returned labels frame keeps ITS checkpoint blocks (the
    # caller reads them); the symmetric edge list — 2× the pair list,
    # the largest scratch frame here — is dead the moment the loop
    # exits, so free it now instead of at driver GC (the same
    # accumulation hazard _unpersist_blocks documents, but per CALL:
    # a per-day clustering pipeline would otherwise leak one edge-list
    # checkpoint per invocation).
    _unpersist_blocks(sc, sym_ids)
    if pending:
        # min-label propagation moves one hop per round: a duplicate
        # CHAIN longer than max_iter (successive revisions each
        # similar only to their neighbors) is still merging when the
        # loop exhausts.  Returning here would hand the caller
        # SILENTLY SPLIT components — duplicate_clusters would then
        # mark several docs of one true family canonical and the
        # duplicates would survive dedup unnoticed.  The labels frame
        # is not returned on this path — free its blocks too.
        _unpersist_blocks(sc, prev_ids)
        raise RuntimeError(
            f"connected_components did not converge in max_iter="
            f"{max_iter} rounds (labels still moving): the duplicate "
            "graph has a chain longer than max_iter hops — raise "
            "max_iter (cost is one join+groupBy round each)"
        )
    return labels.select("node", F.col("lbl").alias("component"))


def contract_families(
    docs: DataFrame, text: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(node, rep) supernode mapping over exact-duplicate families:
    rep = the MINIMUM id among rows with identical normalized text
    (the same md5 family as :func:`.dedup.exact_dedup`).

    This is the SemDeDup exact-collapse trick applied to the duplicate
    GRAPH: replicated corpora make the near-dup edge list quadratic in
    family size (every member shares every signature, so LSH emits all
    within-family pairs and replicates every cross-family pair), while
    the REP graph is linear in distinct content.  Running pair
    generation + connected components on representatives only, then
    fanning the component out through this mapping, yields the same
    clusters: identical texts have identical signatures, so member m
    pairs with doc x iff rep(m) does, and within-family connectivity
    is by construction (jaccard of identical shingle sets is 1).  The
    only divergence is in the capped-bucket regime, where the full
    graph may MISS within-family edges the contraction guarantees —
    i.e. contraction is never less connected than the capped LSH
    graph.  One md5 groupBy + one hash join back — linear, no
    quadratic term anywhere.
    """
    from .dedup import normalize_text

    fam = docs.select(
        F.md5(normalize_text(F.col(text))).alias("_fam"),
        F.col(id_col).alias("node"),
    )
    reps = fam.groupBy("_fam").agg(F.min("node").alias("rep"))
    return fam.join(reps, "_fam").select("node", "rep")


def duplicate_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
    contract: DataFrame | None = None,
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

    ``contract`` (optional): a (node, rep) supernode mapping from
    :func:`contract_families`.  Edges are rewritten to rep–rep (self
    edges dropped, duplicates collapsed) BEFORE the iterative CC, and
    every node inherits its rep's component afterwards — the min-label
    semantics survive because rep = min(family): the min node
    reachable in the full graph IS the min rep reachable in the rep
    graph.  A ≥2-member family whose rep has no cross-family edge is
    still one cluster (component = rep), matching the full graph where
    its members pair with each other.  This turns the
    replication-quadratic duplicate graph (the ×300 scratch blowout)
    into one linear in distinct content.
    """
    if contract is not None:
        m_src = contract.select(
            F.col("node").alias(src), F.col("rep").alias("_ra")
        )
        m_dst = contract.select(
            F.col("node").alias(dst), F.col("rep").alias("_rb")
        )
        rep_edges = (
            pairs.select(src, dst)
            .join(m_src, src)
            .join(m_dst, dst)
            .filter(F.col("_ra") != F.col("_rb"))
            .select(F.col("_ra").alias(src), F.col("_rb").alias(dst))
            .distinct()
        )
        comp = connected_components(rep_edges, src, dst, max_iter)
        attached = (
            docs.select(F.col(id_col).alias("node"))
            .join(contract, "node", "left")
            .withColumn("_rep", F.coalesce("rep", "node"))
            .join(
                comp.select(
                    F.col("node").alias("_rep"),
                    F.col("component").alias("_comp"),
                ),
                "_rep",
                "left",
            )
            .select(
                "node", F.coalesce("_comp", "_rep").alias("component")
            )
        )
        sizes = attached.groupBy("component").agg(
            F.count(F.lit(1)).alias("cluster_size")
        )
        return (
            attached.join(sizes, "component")
            .select(
                F.col("node").alias(id_col),
                "component",
                F.col("cluster_size").cast("bigint").alias("cluster_size"),
                (F.col("component") == F.col("node")).alias("is_canonical"),
            )
        )
    comp = connected_components(pairs, src, dst, max_iter)
    # canonical = the min DOC id in the component, NOT the component
    # label itself: a pair endpoint that is not in docs (pairs
    # computed against a wider corpus than this batch) can be the
    # component min, and `component == node` would then mark NO doc
    # in that cluster canonical — filter("is_canonical") would drop
    # every one of its docs from the deduplicated corpus.  Membership
    # and cluster_size count DOC members only, matching the contract
    # path (whose rep joins drop foreign edges outright).  For pairs
    # fully inside docs — every pipeline in this package — min doc ==
    # component and the output is unchanged.  Cost: docs ids are
    # scanned twice (column-pruned), and comp / member / canon are all
    # duplicate-cluster-sized, so both attach joins broadcast.
    doc_nodes = docs.select(F.col(id_col).alias("node"))
    member = doc_nodes.join(comp, "node")
    canon = member.groupBy("component").agg(
        F.min("node").alias("_canon"),
        F.count(F.lit(1)).alias("cluster_size"),
    )
    labeled = member.join(canon, "component")
    return (
        doc_nodes
        .join(labeled, "node", "left")
        .select(
            F.col("node").alias(id_col),
            F.coalesce("component", "node").alias("component"),
            F.coalesce("cluster_size", F.lit(1)).cast("bigint").alias("cluster_size"),
            (F.col("node") == F.coalesce("_canon", "node")).alias("is_canonical"),
        )
    )
