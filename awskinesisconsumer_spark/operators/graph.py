"""Iterative graph algorithms over DataFrame edge lists.

Companion to `dedup.connected_components` (min-label propagation):
`pagerank` adds the weighted-importance surface over the same
candidate-pair graphs the dedup family produces — e.g. ranking
documents inside duplicate clusters by how centrally duplicated they
are, the standard "canonical copy" picker.

Scale shape: the edge list is the only big dataset; each iteration is
one join keyed on the source + one hash aggregate keyed on the
destination (map-side combine on the contribution sums). Degrees are
pre-joined once and the combined (edge, degree) relation is
localCheckpoint-ed — materialized AND plan-truncated — so iterations
neither recompute nor re-analyze the upstream candidate machinery.
Node count is the lone driver scalar.
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
    past the default iteration count (iters > 3) the rank vector is
    localCheckpoint-ed per round so lineage stays O(1) at any depth
    (without it, deep runs re-plan an ever-deepening tree). The
    dangling mass is a one-row broadcast, not a driver round-trip,
    and on graphs that need neither correction (checked upfront) the
    loop keeps the minimal join+agg plan.

    Returns (node, pagerank) for every node in the edge set.
    """
    # Two materialization strategies, picked by upstream plan depth —
    # each measured strictly better in its regime:
    #
    # DEEP upstream plans (the gated use: a multi-stage candidate-pair
    # pipeline feeding a small graph) pay Catalyst re-analysis of the
    # whole lineage on EVERY iteration and on the final action if the
    # (edge, degree) relation is merely persisted — measured 2-3x the
    # total wall at sf0.1. There: persist the raw edge list (so the
    # degree agg and the join probe share ONE upstream execution —
    # exchange reuse does not always bridge an expensive multi-stage
    # subtree), localCheckpoint the joined relation (truncates the
    # plan to the materialized blocks), and drop the raw cache
    # immediately. The recompute-on-executor-loss trade is the same
    # one the deep-iteration rank vectors below make.
    #
    # SHALLOW plans over big edge lists (millions of rows a few ops
    # from a scan): re-analysis is cheap, and the serialized
    # checkpoint write costs more than it saves (5.7s -> 9.5s at 8M
    # edges), as does double-caching the raw edges (the join's
    # self-referenced shuffle is covered by ReusedExchange). There:
    # plain columnar persist of the joined relation only.
    try:
        deep_plan = (
            edges._jdf.queryExecution().analyzed().toString().count("\n")
            > 40
        )
    except Exception:  # no JVM plan handle (e.g. Connect) — the
        deep_plan = True  # truncation-safe choice

    if deep_plan:
        edges = edges.persist()
        deg = edges.groupBy(src).agg(F.count(F.lit(1)).alias("_deg"))
        edges_deg = edges.join(deg, src).localCheckpoint(eager=True)
        edges.unpersist()
        edges_deg_cached = None
    else:
        deg = edges.groupBy(src).agg(F.count(F.lit(1)).alias("_deg"))
        edges_deg = edges.join(deg, src).persist()
        edges_deg_cached = edges_deg
    # EVERYTHING below derives from the cached edges_deg — deriving
    # from raw `edges` would re-run the (possibly expensive) upstream
    # candidate-pair machinery once per derived table. One pass over
    # the cached edges builds the node table WITH per-node
    # out/in-edge flags, and a single scalar aggregate over it yields
    # the three numbers that shape the loop (n, dangling count,
    # in-degree-less count) — one job, not three.
    node_flags = (
        edges_deg.select(
            F.col(src).alias("node"),
            F.lit(1).alias("_has_out"), F.lit(0).alias("_has_in"),
        )
        .union(edges_deg.select(
            F.col(dst).alias("node"),
            F.lit(0).alias("_has_out"), F.lit(1).alias("_has_in"),
        ))
        .groupBy("node")
        .agg(F.max("_has_out").alias("_has_out"),
             F.max("_has_in").alias("_has_in"))
        .persist()
    )
    stats = node_flags.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(1 - F.col("_has_out")).alias("n_no_out"),
        F.sum(1 - F.col("_has_in")).alias("n_no_in"),
    ).first()
    n = int(stats["n"])
    if n == 0:
        # Empty graph: no nodes, no ranks — and no 1/0 base term
        # (ANSI mode makes that an error, not a NULL).
        node_flags.unpersist()
        if edges_deg_cached is not None:
            edges_deg_cached.unpersist()
        return edges.select(
            F.col(src).alias("node"),
            F.lit(0.0).alias("pagerank"),
        ).limit(0)
    base = F.lit(1.0 - damping) / F.lit(float(n))
    nodes = node_flags.select("node")
    pr = nodes.withColumn("pr", F.lit(1.0) / F.lit(float(n)))
    out_deg = node_flags.where(F.col("_has_out") == 1).select("node")
    # The scalars decide the loop shape: a graph where every node has
    # BOTH an out-edge (no dangling mass to redistribute) and an
    # in-edge (the contribution agg alone already yields every node)
    # — true for every symmetric/undirected edge set, e.g. near-dup
    # pairs, the gated use — needs neither the dangling term nor the
    # rank-preserving left join, so the per-iteration plan stays the
    # minimal join+agg.
    n_no_out = int(stats["n_no_out"])
    n_no_in = int(stats["n_no_in"])
    # Lineage is O(iters) without checkpointing — fine at the default
    # 3; localCheckpoint per round only when the tree would deepen
    # past that (each round otherwise re-plans the whole prefix).
    # Checkpointed rank vectors (tiny: one row per node) stay in
    # block storage until Spark's ContextCleaner collects the
    # dropped references — bounded by iters, reclaimed automatically.
    ckpt = iters > 3
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
        if n_no_out == 0 and n_no_in == 0:
            pr = contrib.select(
                "node", (base + F.lit(damping) * F.col("_s")).alias("pr")
            )
        else:
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
            )
        if ckpt:
            pr = pr.localCheckpoint(eager=True)
    out = pr.select("node", F.round("pr", round_dp).alias("pagerank"))
    # release_after semantics: materialize the (small) result, then
    # free the internal caches (on the deep-plan path edges_deg's
    # checkpoint blocks are reclaimed by the ContextCleaner once the
    # reference drops).
    out = out.persist()
    out.count()
    node_flags.unpersist()
    if edges_deg_cached is not None:
        edges_deg_cached.unpersist()
    return out
