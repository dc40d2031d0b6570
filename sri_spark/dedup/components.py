"""Connected components over near-duplicate pair edges — turns pairwise
near-dup output (MinHash/Jaccard/SimHash) into duplicate CLUSTERS, the form
a curation pipeline actually consumes (keep min-id doc per cluster).

Iterative min-label propagation: every node starts labeled with itself;
each round takes the min label over itself and its neighbors; fixpoint =
components (label == min node id reachable). Convergence in O(graph
diameter) rounds — near-dup graphs are overwhelmingly tiny cliques/chains,
so 3-5 rounds in practice.

Scale shape: each round is one hash-shuffle join on node id plus a
groupBy-min — no driver-side graph, no collect; state is (node, label),
persisted per round and unpersisted after the next materializes. The
convergence check is a count of changed labels (an aggregate, not a
collect of data rows). For adversarial high-diameter graphs at 100 TB,
swap in the large-star/small-star variant (Kiveris et al., "Connected
Components in MapReduce"); the operator contract stays the same.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    *,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) for every node appearing in `edges`; component =
    min node id in the connected component. Edges are treated as
    undirected; self-loops and duplicates are harmless."""
    sym = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .union(edges.select(F.col(dst).alias("s"), F.col(src).alias("d")))
        .distinct()
        .persist()
    )
    labels = (
        sym.select(F.col("s").alias("node")).distinct().withColumn("label", F.col("node"))
    ).persist()
    labels.count()  # materialize before the loop

    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym["d"] == labels["node"])
            .groupBy("s")
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels["node"] == neighbor_min["s"], "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))).alias(
                    "label"
                ),
            )
            .persist()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break

    sym.unpersist()
    return labels.select(F.col("node"), F.col("label").alias("component"))
