"""Iterative graph algorithms over DataFrame edge lists.

Companion to `dedup.connected_components` (min-label propagation):
`pagerank` adds the weighted-importance surface over the same
candidate-pair graphs the dedup family produces — e.g. ranking
documents inside duplicate clusters by how centrally duplicated they
are, the standard "canonical copy" picker.

Scale shape: the edge list is the only big dataset; each iteration is
one join keyed on the source + one hash aggregate keyed on the
destination (map-side combine on the contribution sums). Degrees are
pre-joined once and the combined (edge, degree) relation is persisted
so iterations never recompute the upstream candidate machinery. Node
count is the lone driver scalar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    damping: float = 0.85,
    round_dp: int = 6,
) -> DataFrame:
    """PageRank with a FIXED iteration count (deterministic, oracle-
    replayable by unrolling the same arithmetic). Assumes every node
    has at least one out-edge — true for symmetric (undirected) edge
    sets like near-dup pairs; dangling-node redistribution is out of
    scope. The per-destination contribution sum rounds only at the
    END (round_dp), so cross-engine float noise stays at ~1e-15 and
    never compounds through rounding.

    Returns (node, pagerank) for every node in the edge set.
    """
    from .caching import release_after

    deg = edges.groupBy(src).agg(F.count(F.lit(1)).alias("_deg"))
    edges_deg = edges.join(deg, src).persist()
    n = edges_deg.select(src).distinct().count()
    if n == 0:
        # Empty graph: no nodes, no ranks — and no 1/0 base term
        # (ANSI mode makes that an error, not a NULL).
        edges_deg.unpersist()
        return edges.select(
            F.col(src).alias("node"),
            F.lit(0.0).alias("pagerank"),
        ).limit(0)
    base = F.lit(1.0 - damping) / F.lit(float(n))
    pr = (
        edges_deg.select(F.col(src).alias("node")).distinct()
        .withColumn("pr", F.lit(1.0) / F.lit(float(n)))
    )
    for _ in range(iters):
        pr = (
            edges_deg.join(pr, edges_deg[src] == pr["node"])
            .select(
                F.col(dst).alias("node"),
                (F.col("pr") / F.col("_deg")).alias("_c"),
            )
            .groupBy("node")
            .agg((base + F.lit(damping) * F.sum("_c")).alias("pr"))
        )
    out = pr.select("node", F.round("pr", round_dp).alias("pagerank"))
    return release_after(out, edges_deg)
