"""PageRank operator invariants."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from sri_spark.graph import pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_rank_mass_conserved(spark):
    # undirected triangle + pendant: ranks must sum to 1 (no dangling mass)
    und = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")]
    e = _edges(spark, und + [(y, x) for x, y in und])
    rows = pagerank(e, iterations=5).collect()
    assert abs(sum(r["rank"] for r in rows) - 1.0) < 1e-9
    assert len(rows) == 4


def test_symmetric_graph_uniform_ranks(spark):
    # a 4-cycle is vertex-transitive: every node must get the same rank
    cyc = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")]
    e = _edges(spark, cyc + [(y, x) for x, y in cyc])
    ranks = [r["rank"] for r in pagerank(e, iterations=4).collect()]
    assert max(ranks) - min(ranks) < 1e-12
    assert abs(ranks[0] - 0.25) < 1e-9


def test_hub_outranks_pendant(spark):
    # star: hub h connected to 3 leaves; hub must outrank every leaf
    star = [("h", x) for x in "abc"]
    e = _edges(spark, star + [(y, x) for x, y in star])
    got = {r["id"]: r["rank"] for r in pagerank(e, iterations=4).collect()}
    assert all(got["h"] > got[leaf] for leaf in "abc")


def test_zero_iterations_is_uniform(spark):
    e = _edges(spark, [("a", "b"), ("b", "a")])
    got = {r["id"]: r["rank"] for r in pagerank(e, iterations=0).collect()}
    assert got == {"a": 0.5, "b": 0.5}


def test_directed_sink_accumulates(spark):
    # a -> b only (b re-distributes nothing back; damping teleport keeps
    # totals finite): b must outrank a
    e = _edges(spark, [("a", "b"), ("b", "a"), ("c", "b"), ("b", "c")])
    extra = _edges(spark, [("a", "b")])
    got = {r["id"]: r["rank"] for r in pagerank(e.union(extra), iterations=3).collect()}
    assert got["b"] > got["a"]


def test_matches_networkx_free_reference(spark):
    """Hand-computed 2-node check: symmetric pair converges to 0.5/0.5
    from any damping (closed form for the 2-cycle)."""
    e = _edges(spark, [("x", "y"), ("y", "x")])
    got = {r["id"]: r["rank"] for r in pagerank(e, iterations=7).collect()}
    assert abs(got["x"] - 0.5) < 1e-12 and abs(got["y"] - 0.5) < 1e-12


def test_trade_graph_triangles_and_components(spark, sf_dir):
    from sri_spark.plans.graph_queries import (
        graph_components_trade,
        graph_triangle_count,
    )

    tri = graph_triangle_count(spark, sf_dir).collect()[0]
    assert 0 < tri.n_edges <= 30
    assert tri.n_triangles >= 0
    comps = graph_components_trade(spark, sf_dir).collect()
    # intra-region edges: components never span regions -> at most 5, and
    # every component is at most one region's 5 nations
    assert 1 <= len(comps) <= 5
    assert all(1 <= r.n_nodes <= 5 for r in comps)


def test_broadcast_ranks_variant_matches_default(spark):
    """The r13 spill-attribution knob (broadcast the node-sized ranks
    frame per round) must be a pure physical-plan change: identical
    scores to the default join path on every node, up to summation-order
    ulps."""
    edges = spark.createDataFrame(
        [(a, b) for a, b in [(1, 2), (2, 3), (3, 1), (3, 4), (4, 1), (2, 4)]],
        "src int, dst int",
    )
    base = {r["id"]: r["rank"] for r in pagerank(edges, iterations=3).collect()}
    bc = {
        r["id"]: r["rank"]
        for r in pagerank(edges, iterations=3, broadcast_ranks=True).collect()
    }
    assert set(base) == set(bc)
    for node in base:
        assert bc[node] == pytest.approx(base[node], rel=1e-12)
