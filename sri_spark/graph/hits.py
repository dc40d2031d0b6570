"""Fixed-iteration HITS (hubs & authorities) on a bipartite edge set,
as pure DataFrame algebra.

Kleinberg's update is hub(c) = sum of auth over c's neighbors and
auth(s) = sum of hub over s's neighbors. This implementation runs a FIXED
number of rounds UNNORMALIZED: starting from hub = 1, every intermediate
score is a count of alternating paths — an INTEGER carried exactly in a
double — so the DuckDB oracle matches bit-for-bit with no rounding channel
and no flake risk from summation order (cf. the IRLS flake note in
plans/stats_regression_queries.py). Per-round L1/L2 normalization only
rescales scores (the ranking is identical), and skipping it keeps the lazy
plan LINEAR in rounds: a normalizing round references its raw aggregate
twice, doubling the plan tree per iteration — the exact optimizer trap
documented for iterative plans in this repo's verify notes.

Scale shape: the edge list is scoped-persisted once; each half-round is
one join of the arcs against a node-sized score frame (AQE broadcasts it)
followed by one (node, double) hash aggregate with map-side partials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hits_bipartite(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    broadcast_scores: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """(hubs, authorities) after `iterations` unnormalized HITS rounds.

    `edges` is the DIRECTED bipartite edge list (src = hub side, dst =
    authority side), one row per distinct edge. Returns two frames:
    (id, hub) over the src side and (id, auth) over the dst side. Scores
    are alternating-path counts (exact integers in doubles).

    `iterations` must be >= 1: round 0 has no authority frame (auth is
    only defined after the first half-round), so a 0-round call has no
    meaningful (hubs, auth) pair to return.

    `broadcast_scores=True` forces each half-round's arcs⋈scores join to
    broadcast the NODE-sized score frame (16 bytes/node) instead of
    letting the planner sort-merge the edge list against it — the same
    node-count rule as pagerank's `broadcast_ranks` (graph/pagerank.py
    documents the billion-node cutoff where the SMJ's spill is the
    memory-safe trade). With it on, every half-round is one exchange-free
    broadcast join of the cached edges plus the hash aggregate.
    """
    if iterations < 1:
        raise ValueError(
            f"hits_bipartite requires iterations >= 1, got {iterations}"
        )
    from sri_spark.operators.caching import scoped_persist

    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if broadcast_scores:
        # pre-partition the persisted edges by dst (the pagerank
        # repartition trick): every auth half-round groups the
        # broadcast-joined edges by dst, so the cached partitioning makes
        # those aggregates exchange-free; the hub half-rounds (grouped by
        # src) still pay their exchange — but only of node-sized partial
        # sums after map-side combine (r13)
        e_src = e_dst = scoped_persist(e.repartition(F.col("dst")))
    else:
        # SMJ regime (billion-node graphs, the knob's documented cutoff):
        # the arc-sized exchange+sort INSIDE each half-round's sort-merge
        # join is the cost, so keep TWO cached copies laid out per JOIN
        # key — auth half-rounds join scores on src, hub half-rounds on
        # dst — and each SMJ reads its copy exchange- and sort-free on
        # the data-sized side; only the node-sized score frames shuffle.
        # Twice the cache for an arc table that no longer re-sorts every
        # half-round (2 upfront passes replace 2·iterations in-round
        # ones); the second copy derives from the first so the upstream
        # edge construction runs once (r14, round-13 verdict item 4/8).
        e_src = scoped_persist(
            e.repartition(F.col("src")).sortWithinPartitions("src")
        )
        e_dst = scoped_persist(
            e_src.repartition(F.col("dst")).sortWithinPartitions("dst")
        )
    hubs = (
        e_src.select("src").distinct().withColumn("hub", F.lit(1.0))
    )
    auth: DataFrame | None = None
    for i in range(iterations):
        auth = (
            e_src.join(F.broadcast(hubs) if broadcast_scores else hubs, "src")
            .groupBy("dst")
            .agg(F.sum("hub").alias("auth"))
        )
        if i == iterations - 1:
            # the FINAL auth frame is read twice — once by the last hub
            # half-round below and once as the returned authorities leg —
            # so persist it (node-sized) to compute the subtree once
            auth = scoped_persist(auth)
        hubs = (
            e_dst.join(F.broadcast(auth) if broadcast_scores else auth, "dst")
            .groupBy("src")
            .agg(F.sum("auth").alias("hub"))
        )
    return (
        hubs.select(F.col("src").alias("id"), "hub"),
        auth.select(F.col("dst").alias("id"), "auth"),
    )
