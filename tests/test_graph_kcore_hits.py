"""Hand-graph unit tests for the round-12 graph operators (kcore_peel,
hits_bipartite) — values computed by hand, so the DataFrame algebra is
checked against ground truth independent of the DuckDB oracle (which runs
the same unrolled rounds and could share a bug)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sri_spark.graph.hits import hits_bipartite
from sri_spark.graph.kcore import kcore_peel


def _edges(spark, pairs):
    und = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    return spark.createDataFrame(und, "src long, dst long")


def test_kcore_peels_pendant_keeps_triangle(spark):
    # triangle 1-2-3 plus pendant 4 hanging off 1: k=2 kills the pendant
    # in round 1; the triangle survives with degree 2 everywhere — and
    # node 1's degree DROPS from 3 to 2 once its dead neighbor is removed
    e = _edges(spark, [(1, 2), (2, 3), (1, 3), (1, 4)])
    out = {r["id"]: r["deg"] for r in kcore_peel(e, k=2, rounds=3).collect()}
    assert out == {1: 2, 2: 2, 3: 2}


def test_kcore_path_graph_peels_to_empty(spark):
    # path 1-2-3-4-5 at k=2: endpoints die round 1; round 2's keep set is
    # {3} but 3's arcs both led to dead neighbors, so the surviving arc
    # set — and with it the degree output — is already empty at round 2
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert kcore_peel(e, k=2, rounds=3).count() == 0
    assert kcore_peel(e, k=2, rounds=2).count() == 0
    # straggler contract: after only ONE round nodes 2 and 4 survive with
    # sub-k degree 1 (their endpoint neighbors died this round) — the
    # fixed unroll may emit such stragglers, by documented design
    one = {r["id"]: r["deg"] for r in kcore_peel(e, k=2, rounds=1).collect()}
    assert one == {2: 1, 3: 2, 4: 1}


def test_kcore_k3_clique_survives_k2_core_dies(spark):
    # 4-clique plus a 2-core cycle 5-6-7: at k=3 the cycle dies round 1,
    # the clique keeps degree 3
    clique = [(a, b) for a in (1, 2, 3, 4) for b in (1, 2, 3, 4) if a < b]
    e = _edges(spark, clique + [(5, 6), (6, 7), (5, 7)])
    out = {r["id"]: r["deg"] for r in kcore_peel(e, k=3, rounds=3).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}


def test_hits_fibonacci_by_hand(spark):
    # c1-{s1,s2}, c2-{s1}: from hub=1 the unnormalized updates walk the
    # Fibonacci sequence — a1: s1=2 s2=1; h1: c1=3 c2=2; a2: s1=5 s2=3;
    # h2: c1=8 c2=5; a3: s1=13 s2=8; h3: c1=21 c2=13
    e = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 1)], "src long, dst long"
    )
    hubs, auth = hits_bipartite(e, iterations=3)
    h = {r["id"]: r["hub"] for r in hubs.collect()}
    a = {r["id"]: r["auth"] for r in auth.collect()}
    assert h == {1: 21.0, 2: 13.0}
    assert a == {1: 13.0, 2: 8.0}


def test_hits_scores_are_exact_integers(spark):
    # the zero-flake oracle contract rests on scores being exact integer
    # path counts — verify on a denser random-ish bipartite graph
    pairs = [(c, s) for c in range(1, 8) for s in range(1, 6) if (c * s) % 3]
    e = spark.createDataFrame(pairs, "src long, dst long")
    hubs, auth = hits_bipartite(e, iterations=3)
    vals = [r["hub"] for r in hubs.collect()] + [r["auth"] for r in auth.collect()]
    assert vals and all(v == int(v) for v in vals)


def test_hits_rejects_zero_iterations(spark):
    """iterations=0 has no authority frame — the contract requires >=1
    and the guard must say so instead of crashing on auth=None."""
    import pytest as _pytest

    from sri_spark.graph.hits import hits_bipartite

    edges = spark.createDataFrame([(1, 2)], "src int, dst int")
    with _pytest.raises(ValueError, match="iterations >= 1"):
        hits_bipartite(edges, iterations=0)


def test_kcore_broadcast_keep_variant_matches_default(spark):
    """broadcast_keep (the r13 node-sized-broadcast knob) must be a pure
    physical-plan change: identical surviving (id, deg) rows."""
    e = _edges(spark, [(1, 2), (2, 3), (1, 3), (1, 4), (4, 5), (5, 6)])
    base = {r["id"]: r["deg"] for r in kcore_peel(e, k=2, rounds=3).collect()}
    bc = {
        r["id"]: r["deg"]
        for r in kcore_peel(e, k=2, rounds=3, broadcast_keep=True).collect()
    }
    assert base == bc


def test_hits_broadcast_scores_variant_matches_default(spark):
    """broadcast_scores must be a pure physical-plan change: identical
    integer hub/authority scores (exact in doubles, so == is right)."""
    e = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10), (3, 11), (3, 12)], "src long, dst long"
    )
    h0, a0 = hits_bipartite(e, iterations=3)
    h1, a1 = hits_bipartite(e, iterations=3, broadcast_scores=True)
    assert {(r["id"], r["hub"]) for r in h0.collect()} == {
        (r["id"], r["hub"]) for r in h1.collect()
    }
    assert {(r["id"], r["auth"]) for r in a0.collect()} == {
        (r["id"], r["auth"]) for r in a1.collect()
    }
