"""Connected components for duplicate-cluster resolution (§2.13).

Near-dup detection yields PAIRS; deduplication needs CLUSTERS (keep
one canonical doc per component of the similarity graph). This is the
standard iterative min-label propagation:

    label(v) <- min(label(v), min over neighbors(label(u)))

repeated until fixpoint. Each iteration is one join + one groupBy —
fully distributed; the driver only checks a scalar convergence
indicator. Iteration count is bounded by the graph diameter, and
near-dup graphs are overwhelmingly tiny star/clique components, so
2-4 iterations settle real corpora. (GraphFrames implements the same
algorithm with large-graph optimizations; this dependency-free version
keeps the engine self-contained.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 20,
    strict: bool = True,
) -> DataFrame:
    """(id, component) — component = min node id reachable from id.

    ``nodes``: one row per vertex; singletons keep their own id.
    ``edges``: undirected pairs (each edge propagates both ways).

    BEHAVIOR CHANGE (round 5): non-convergence within ``max_iter``
    RAISES RuntimeError instead of silently returning partial labels —
    unconverged labels split real components, which corrupted dedup
    clusters at sf0.1 before the fix. Callers that prefer the old
    best-effort degraded output over a hard failure (e.g. exploratory
    runs with a deliberately small iteration budget) pass
    ``strict=False``; the returned labels are then possibly
    UNCONVERGED (one component may carry several labels)."""
    # Iterative jobs MUST materialize between rounds: a lazy loop would
    # re-derive the whole upstream plan (here: the similarity self-join
    # producing the edges) once per iteration, and the lineage would
    # deepen every round. localCheckpoint truncates lineage and caches
    # partitions executor-side; at cluster scale swap for reliable
    # checkpoint(dir) — same structure.
    #
    # Checkpoints are LAZY (eager=False): the per-round convergence agg
    # is the action that materializes them, so each round costs ONE job
    # (join + groupBy + sum over the freshly-cached partitions) instead
    # of a materialization job followed by a separate agg job.
    # The loop runs ONLY over edge ENDPOINTS: a node with no incident
    # edge can never receive a smaller label, so singletons are their
    # own component by construction and rejoin at the end. On a real
    # near-dup corpus the endpoint set is proportional to collision
    # density (a sliver of the corpus), so every per-round join/agg
    # touches a table orders of magnitude smaller than `nodes` — at
    # 100 TB this is the difference between iterating over megabytes
    # and iterating over the whole corpus.
    sym = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .unionByName(edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b")))
        .localCheckpoint(eager=False)
    )
    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("component"))
        .localCheckpoint(eager=False)
    )
    prev_sum = None
    converged = False

    for r in range(max_iter):
        msgs = (
            sym.join(labels, sym.a == labels.id)
            .select(F.col("b").alias("id"), F.col("component"))
        )
        prop = (
            labels.unionByName(msgs)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
        )
        if r < 2:
            # Shallow near-dup graphs (tight clusters) converge in 1-2
            # plain rounds; don't pay the jump join for them.
            new_labels = prop.localCheckpoint(eager=False)
        else:
            # Pointer jump (path compression): from round 3 on, each
            # label also adopts its LABEL's label — propagation distance
            # doubles per round, so chain-shaped graphs (exactly what
            # mid-threshold similarity pair sets produce) converge in
            # O(log diameter) rounds instead of exhausting max_iter.
            # Silently returning unconverged labels is the failure mode
            # this replaces — non-convergence now RAISES below. prop is
            # referenced on both sides of the join: checkpoint so the
            # propagation agg runs once. Every component value is itself
            # an endpoint id, so the self-join is total (left join
            # guards the invariant anyway).
            prop = prop.localCheckpoint(eager=False)
            jump = prop.select(
                F.col("id").alias("_jid"), F.col("component").alias("_jcomp")
            )
            new_labels = (
                prop.join(jump, prop.component == F.col("_jid"), "left")
                .select(
                    "id",
                    F.least(
                        F.col("component"),
                        F.coalesce(F.col("_jcomp"), F.col("component")),
                    ).alias("component"),
                )
                .localCheckpoint(eager=False)
            )
        # Converged when no label decreased: labels only ever decrease,
        # so an unchanged sum == identical assignment. This agg is the
        # single action of the round — it both materializes new_labels'
        # checkpoint and returns the indicator. (No separate job to
        # seed prev_sum: round 1 always runs, and its sum primes the
        # comparison.)
        new_sum = new_labels.agg(F.sum("component")).first()[0]
        labels = new_labels
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum
    if not converged and strict:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(doubled propagation covers diameter 2^rounds — raise max_iter, "
            "or pass strict=False to accept best-effort labels)"
        )
    # Singletons (no incident edges) rejoin with component = own id.
    # The label table is collision-density-sized, so AQE will broadcast
    # it against a large node table on a real cluster.
    return nodes.select(F.col(id_col).alias("id")).join(
        labels.withColumnRenamed("id", "_lid"),
        F.col("id") == F.col("_lid"),
        "left",
    ).select("id", F.coalesce("component", "id").alias("component"))


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    pair_a: str = "id_a",
    pair_b: str = "id_b",
    max_iter: int = 20,
    strict: bool = True,
) -> DataFrame:
    """(doc_id, cluster_id, is_canonical) from near-dup pairs.

    cluster_id = min doc id in the component; the canonical row is the
    one to KEEP when deduplicating a corpus.

    Since round 5 this RAISES on non-convergence (previously returned
    best-effort labels, which silently split clusters); pass
    ``strict=False`` to opt back into tolerant degraded output.
    """
    comp = connected_components(
        docs.select(id_col), pairs, id_col=id_col, src_col=pair_a, dst_col=pair_b,
        max_iter=max_iter, strict=strict,
    )
    return comp.select(
        F.col("id").alias(id_col),
        F.col("component").alias("cluster_id"),
        (F.col("id") == F.col("component")).alias("is_canonical"),
    )
