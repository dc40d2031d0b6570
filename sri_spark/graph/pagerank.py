"""Fixed-iteration PageRank as pure DataFrame algebra.

The power-iteration update r' = (1-d)/N + d * Σ_in r/deg is one
join + hash aggregate per iteration — the textbook Pregel message round
expressed relationally. A FIXED iteration count keeps the operator
oracle-checkable (DuckDB runs the same unrolled rounds) and is standard
practice for rank features in data pipelines (rank converges geometrically;
3-5 rounds is feature-grade).

Scale shape: edges and degrees are computed once and persisted; each round
shuffles (node, contribution) pairs — never adjacency lists — so skewed
high-degree nodes cost map-side partial aggregation, not memory. With an
undirected edge set every node has degree ≥ 1, so there is no dangling-mass
term to redistribute.

Measured non-improvement (keep it this way): persisting the RAW edge frame
before deriving deg/out/nodes buys nothing at sf0.1 — 6.28 s vs 6.34 s
median-of-3 warm on the trade graph, inside run noise — because exchange
reuse already dedupes the repeated edge-derivation subtrees within the
single action; the extra cache write only spends executor memory. Only the
two frames read once PER ROUND (out, nodes) earn a persist. (Beware
measuring this with .count(): Catalyst eliminates the unique-key left
joins under a count and skips the rank rounds entirely, making any
variant look ~3x faster than the real noop-sink evaluation.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAMPING = 0.85


def pagerank(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping: float = DAMPING,
    broadcast_ranks: bool = False,
) -> DataFrame:
    """PageRank over the DIRECTED edge set after `iterations` power rounds.

    `edges` must already contain both directions if the graph is
    undirected. Returns (id, rank). The only actions are inside Spark; the
    node count N enters the plan as a scalar via a cross join with a 1-row
    aggregate (no driver round-trip in the lazy plan).

    `broadcast_ranks=True` forces each round's arcs⋈ranks join to
    broadcast the node-sized ranks frame instead of letting the planner
    fall back to a sort-merge join once the node count crosses the
    autoBroadcast estimate. With the arc table persisted pre-partitioned
    by dst, a broadcast join keeps every round EXCHANGE- AND SORT-FREE on
    the data-sized side (the contribution aggregate finishes partition-
    locally) — the r13 spill attribution of the 117M-arc 100x point
    (docs/GRAPH_SPILL_ATTRIB_r13.json) traced its 2.2 GiB disk spill to
    the per-round SMJ sorting the arcs. Use it when ranks (16 bytes/node)
    fit comfortably in executor memory — ~1.6M nodes ≈ 26 MiB at the
    100x point; leave it False for billion-node graphs, where the SMJ's
    spill is the memory-safe trade.
    """
    from sri_spark.operators.caching import scoped_persist

    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    # (src, dst, deg), reused per round — persisted pre-laid-out for the
    # join regime the knob selects (r14, round-13 verdict item 4):
    # - broadcast_ranks: HASH-PARTITIONED BY dst. The broadcast join
    #   preserves the cached partitioning, so every round's contribution
    #   aggregate (grouped by dst) finishes partition-locally and the
    #   per-round exchange of the (data-sized) arc table disappears.
    # - SMJ path (broadcast off — the billion-node regime the 100x replay
    #   models): partitioned AND SORTED BY src. The per-round arcs⋈ranks
    #   sort-merge join reads the cache exchange- AND sort-free (the r13
    #   spill attribution traced the replay's 10.1 GiB spill to exactly
    #   this per-round sort of the 117M-arc table); only the node-sized
    #   ranks side shuffles+sorts, and the contribution aggregate's
    #   exchange carries narrow (id, partial-sum) pairs after map-side
    #   combine. The dst layout is useless here — the SMJ's src exchange
    #   destroyed it every round.
    deg_side = F.broadcast(deg) if broadcast_ranks else deg
    joined = e.join(deg_side, "src")
    out = scoped_persist(
        joined.repartition(F.col("dst"))
        if broadcast_ranks
        else joined.repartition(F.col("src")).sortWithinPartitions("src")
    )
    nodes = scoped_persist(
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    n1 = nodes.agg(F.count("*").alias("__n"))

    ranks = nodes.join(n1).select("id", (F.lit(1.0) / F.col("__n")).alias("rank"))
    for _ in range(iterations):
        rank_side = F.broadcast(ranks) if broadcast_ranks else ranks
        contrib = (
            out.join(rank_side, out["src"] == rank_side["id"])
            .select(F.col("dst").alias("id"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            # contrib is node-sized like ranks: under broadcast_ranks the
            # rank-update left join builds on it instead of sort-merging
            # two node-sized frames per round
            nodes.join(
                F.broadcast(contrib) if broadcast_ranks else contrib,
                "id",
                "left",
            )
            .join(n1)
            .select(
                "id",
                (
                    (1.0 - damping) / F.col("__n")
                    + damping * F.coalesce(F.col("inflow"), F.lit(0.0))
                ).alias("rank"),
            )
        )
    return ranks
