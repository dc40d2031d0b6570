"""Graph catalog queries: PageRank over the customer-supplier trade graph
(nodes = customers + suppliers, an undirected edge per distinct pair that
traded through an order). The oracle unrolls the same power iterations as
CTE rounds, so an iterative algorithm gets a full value-level SQL check —
same approach as dedup_clusters_star's recursive-CTE oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sri_spark.graph.pagerank import DAMPING, pagerank
from sri_spark.plans.registry import register
from sri_spark.sources.testdata import load_table

PR_ITERS = 3


def _pagerank_oracle(iters: int = PR_ITERS, d: float = DAMPING) -> str:
    rounds = []
    for i in range(1, iters + 1):
        rounds.append(
            f"""r{i} AS (
      SELECT n.id,
             {(1.0 - d)!r}::DOUBLE / nn.n
               + {d!r}::DOUBLE * coalesce(sum(r{i - 1}.rank / deg.deg), 0) AS rank
      FROM nodes n CROSS JOIN nn
      LEFT JOIN arcs b ON b.dst = n.id
      LEFT JOIN r{i - 1} ON r{i - 1}.id = b.src
      LEFT JOIN deg ON deg.src = b.src
      GROUP BY n.id, nn.n
    )"""
        )
    joined_rounds = ",\n    ".join(rounds)
    return f"""
    WITH pairs AS (
      SELECT DISTINCT 'c' || o_custkey AS c_id, 's' || l_suppkey AS s_id
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    arcs AS (
      SELECT c_id AS src, s_id AS dst FROM pairs
      UNION ALL
      SELECT s_id AS src, c_id AS dst FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS id FROM arcs),
    deg AS (SELECT src, count(*) AS deg FROM arcs GROUP BY src),
    nn AS (SELECT count(*) AS n FROM nodes),
    r0 AS (SELECT id, 1.0::DOUBLE / nn.n AS rank FROM nodes CROSS JOIN nn),
    {joined_rounds}
    SELECT id, round(rank, 9) AS rank FROM r{iters}
    """


@register("graph_pagerank_trade", _pagerank_oracle())
def graph_pagerank_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-round PageRank over the customer-supplier trade graph. Emits EVERY
    node's rank (node count = |customers| + |suppliers|, dimension-sized)
    rather than a top-k — a rank cut on near-equal float scores would make
    the boundary engine-dependent. Shape: the edge set and degrees
    materialize once; each round is one (node, contribution) shuffle.

    Node ids are LONGS through every iteration (customer 2k, supplier
    2k+1) and become the oracle's 'c{k}'/'s{k}' strings only in the final
    projection: 9 shuffles move 8-byte keys instead of variable-length
    strings — the same shuffle-payload discipline as
    dedup/shingles.shingle_hashes_df (measured ~25% off the query's wall
    time at sf0.1)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    pairs = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("c_id"),
            (F.col("l_suppkey") * 2 + 1).alias("s_id"),
        )
        .distinct()
    )
    both = pairs.select(
        F.col("c_id").alias("src"), F.col("s_id").alias("dst")
    ).union(pairs.select(F.col("s_id").alias("src"), F.col("c_id").alias("dst")))
    ranks = pagerank(both, iterations=PR_ITERS)
    return ranks.select(
        F.when(
            F.col("id") % 2 == 0, F.concat(F.lit("c"), F.expr("id div 2"))
        )
        .otherwise(F.concat(F.lit("s"), F.expr("(id - 1) div 2")))
        .alias("id"),
        F.round("rank", 9).alias("rank"),
    )
