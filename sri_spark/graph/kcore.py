"""Fixed-round k-core peeling as pure DataFrame algebra.

The k-core of a graph is the maximal subgraph where every node has degree
>= k; the classic algorithm peels sub-k nodes until a fixed point. A FIXED
round count keeps the operator oracle-checkable (DuckDB runs the same
unrolled peels) and matches how core-ness is used as a feature in data
pipelines (spam/boilerplate nodes die in the first peel or two; deep
cores stabilize geometrically). Same fixed-unroll contract as
graph/pagerank.py's PR_ITERS.

Scale shape: each round is one degree aggregate — a (node, count) shuffle,
never adjacency lists — plus two semi-joins of the surviving arcs against
a NODE-sized keep set, which AQE broadcast-joins at runtime, so the
arc-sized frame is never reshuffled. Arcs shrink monotonically, so round
cost is non-increasing; each round's survivor arcs are scoped-persisted
because the next round reads them twice (degree + semi-join left side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kcore_peel(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    k: int = 2,
    rounds: int = 3,
    broadcast_keep: bool = False,
) -> DataFrame:
    """Surviving nodes and their within-subgraph degree after `rounds`
    peels at threshold `k`.

    `edges` must contain both directions of every undirected edge (the
    pagerank convention), so the degree-by-src aggregate is the full
    undirected degree. Returns (id, deg) where deg is the node's degree
    among round-`rounds` survivors — after convergence every deg >= k; a
    fixed unroll may legitimately emit sub-k stragglers whose neighbors
    died in the final round (documented contract, verified cross-engine).

    `broadcast_keep=True` forces both per-round semi-joins to broadcast
    the NODE-sized keep set (8 bytes/node) instead of letting the planner
    sort-merge the arc table against it — the same node-count rule as
    pagerank's `broadcast_ranks` (graph/pagerank.py documents the
    billion-node cutoff where the SMJ's spill is the memory-safe trade).
    With it on, every round is one degree aggregate plus two
    exchange-free broadcast semi-joins of the cached arcs.
    """
    from sri_spark.operators.caching import scoped_persist

    arcs = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    # pre-partition the arcs by src ONCE (the pagerank repartition trick),
    # independent of join strategy (r14, round-13 verdict item 4): every
    # round's degree aggregate — and the final one — groups by src. Under
    # broadcast semis the layout survives every round; under SMJ it is
    # additionally SORTED so round 1's degree aggregate and src semi-join
    # read the cache exchange- and sort-free on the arc side, and the
    # semi-join ORDER below keeps that true for every later round.
    arcs = arcs.repartition(F.col("src"))
    if not broadcast_keep:
        arcs = arcs.sortWithinPartitions("src")
    for _ in range(rounds):
        arcs = scoped_persist(arcs)
        keep = (
            arcs.groupBy("src")
            .agg(F.count("*").alias("deg"))
            .filter(F.col("deg") >= k)
            .select("src")
        )
        keep_dst = keep.withColumnRenamed("src", "dst")
        if broadcast_keep:
            arcs = arcs.join(F.broadcast(keep), "src", "left_semi").join(
                F.broadcast(keep_dst), "dst", "left_semi"
            )
        else:
            # SMJ regime: dst semi FIRST, src semi LAST — the two
            # set-intersection filters commute, and ending on the src
            # sort-merge leaves the survivors partitioned AND sorted by
            # src, so the next round's persist hands its degree aggregate
            # and src semi-join the layout for free (only the dst
            # semi-join pays the arc-sized exchange+sort each round)
            arcs = arcs.join(keep_dst, "dst", "left_semi").join(
                keep, "src", "left_semi"
            )
    return (
        arcs.groupBy("src")
        .agg(F.count("*").alias("deg"))
        .select(F.col("src").alias("id"), "deg")
    )
