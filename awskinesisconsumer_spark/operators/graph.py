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
    replayable by unrolling the same arithmetic), correct for
    DIRECTED edge lists: the node set is the union of both endpoints
    (sink-only nodes keep receiving the base term every iteration
    instead of dropping out), and the rank mass of DANGLING nodes (no
    out-edges) is redistributed uniformly each iteration — the
    standard random-surfer teleport on a dead end. On a symmetric
    (undirected) edge set — e.g. near-dup pairs, the gated use — the
    dangling mass is exactly 0.0 and both endpoint sets coincide, so
    results are bit-identical to the plain formulation the DuckDB
    oracle unrolls (x + 0.0 == x in IEEE754). The per-destination
    contribution sum rounds only at the END (round_dp), so
    cross-engine float noise stays at ~1e-15 and never compounds
    through rounding.

    Each iteration is one src-keyed join + one dst-keyed hash agg;
    the new rank vector is localCheckpoint-ed per round so lineage
    stays O(1) at any iteration count (without it, iters > ~5 would
    re-plan an exponentially deepening tree). The dangling mass is a
    one-row broadcast, not a driver round-trip.

    Returns (node, pagerank) for every node in the edge set.
    """
    from .caching import release_after

    deg = edges.groupBy(src).agg(F.count(F.lit(1)).alias("_deg"))
    edges_deg = edges.join(deg, src).persist()
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    if n == 0:
        # Empty graph: no nodes, no ranks — and no 1/0 base term
        # (ANSI mode makes that an error, not a NULL).
        edges_deg.unpersist()
        nodes.unpersist()
        return edges.select(
            F.col(src).alias("node"),
            F.lit(0.0).alias("pagerank"),
        ).limit(0)
    base = F.lit(1.0 - damping) / F.lit(float(n))
    pr = nodes.withColumn("pr", F.lit(1.0) / F.lit(float(n)))
    out_deg = deg.select(F.col(src).alias("node"))
    for _ in range(iters):
        contrib = (
            edges_deg.join(pr, edges_deg[src] == pr["node"])
            .select(
                F.col(dst).alias("node"),
                (F.col("pr") / F.col("_deg")).alias("_c"),
            )
            .groupBy("node")
            .agg(F.sum("_c").alias("_s"))
        )
        dangling = (
            pr.join(out_deg, "node", "left_anti")
            .agg(F.coalesce(F.sum("pr"), F.lit(0.0)).alias("_dm"))
        )
        pr = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (base + F.lit(damping) * (
                    F.coalesce(F.col("_s"), F.lit(0.0))
                    + F.col("_dm") / F.lit(float(n))
                )).alias("pr"),
            )
            .localCheckpoint(eager=True)
        )
    out = pr.select("node", F.round("pr", round_dp).alias("pagerank"))
    nodes.unpersist()
    return release_after(out, edges_deg)
