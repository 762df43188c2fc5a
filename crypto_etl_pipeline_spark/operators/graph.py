"""Graph algorithms over edge DataFrames (beyond connected components).

PageRank as the canonical driver-looped iterative workload: each
iteration is one join + one keyed aggregation, fully distributed; the
driver holds only the loop counter. At scale the edge table is the
dataset — pre-partitioning edges and ranks on the join key lets every
iteration reuse one exchange, and lineage is truncated the same way as
operators/cluster.py (localCheckpoint per few rounds) when iteration
counts grow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iters: int = 2,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    every_node_has_in_edges: bool = False,
) -> DataFrame:
    """(node, rank) after ``iters`` power iterations from rank=1.0.

    Standard formulation: rank(v) = (1-d) + d * sum over in-edges of
    rank(u)/outdeg(u). Nodes without in-edges settle at (1-d); nodes
    are the union of both endpoint sets, so dangling-only nodes are
    kept. Fixed iteration count (not convergence-tested) keeps the
    result exactly reproducible in the unrolled SQL oracle.
    """
    # nodes and the degree-annotated edge table are loop INVARIANTS:
    # lazy localCheckpoints stop each iteration's plan from re-embedding
    # (and re-executing) their whole subtrees — the same lineage
    # discipline as operators/cluster.py (swap for reliable
    # checkpoint(dir) on a real cluster).
    deg = edges.groupBy(src).agg(F.count(F.lit(1)).alias("_deg"))
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    e = edges.join(deg, src).localCheckpoint(eager=False)
    ranks = nodes.withColumn("rank", F.lit(1.0))
    for _ in range(iters):
        contribs = (
            e.join(ranks, e[src] == ranks["node"])
            .select(F.col(dst).alias("node"), (F.col("rank") / F.col("_deg")).alias("_c"))
            .groupBy("node")
            .agg(F.sum("_c").alias("_s"))
        )
        base = (1.0 - damping) + damping * F.coalesce(F.col("_s"), F.lit(0.0))
        if every_node_has_in_edges:
            # e.g. a bidirectional edge set: contribs already covers
            # every node, so the per-iteration left join back to the
            # node table (and its stages) is dead weight.
            ranks = contribs.select("node", base.alias("rank"))
        else:
            ranks = nodes.join(contribs, "node", "left").select(
                "node", base.alias("rank")
            )
    return ranks
