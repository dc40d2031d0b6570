"""Round-7 verdict item 2: no catalog query builder issues a driver-side
action before returning its DataFrame.

A `queries()` entry should CONSTRUCT a lazy plan. A `.count()` inside a
builder forces an extra job and an extra source scan per scalar, and bakes
a driver round-trip into what should be one submitted plan — metadata
scalars (corpus size, edge count, dim rows) belong in the plan as 1-row
aggregates crossJoined into the result (graph/pagerank.py:65-67 is the
canonical shape; round 7 converted text_extra/graph/sketch/parity sites).

This sweep instruments every eager DataFrame entry point
(advisor.record_driver_actions) and builds ALL registered catalog queries.
Any action recorded outside the documented allowlist fails — a new query
with a stray .count() breaks here on the day it is added.

The allowlist is the set of genuinely iterative / trained builders, where
an action IS the algorithm (not a metadata shortcut):

- connected-components fixpoints: each round's convergence test reads a
  1-row aggregate signature (count + bit_xor) — bounded, and the loop
  cannot be expressed lazily (data-dependent round count);
- KMeans/PQ index training: spark.ml fit + sample-collected codebooks
  (bounded by k and sample size, not corpus);
- query-vector fetch: a .first() on a 1-row filtered frame (the serving
  pattern — the query point must reach the driver to broadcast);
- two-phase prefix-sum packing: phase one collects ONE row per partition
  (parallelism-sized, not data-sized) to seed phase two's offsets.
"""

from __future__ import annotations



from sri_spark.plans import all_queries

SF_DIR = "/root/testdata/sf0.001"

# builder -> why an action during construction is the algorithm, not a leak
ITERATIVE_OK = {
    "agg_weighted_median_price": "weighted-quantile range narrowing: driver-paced rounds read ONE max(nd) scalar each (operators/median.py::weighted_quantile_by_group — weighted ranks have no GK sketch, so the loop cannot be expressed lazily)",
    "corpus_pack_sequences": "two-phase packing: phase-1 per-partition offsets (one row per partition)",
    "dedup_cluster_keep_best": "connected-components fixpoint convergence checks",
    "dedup_cluster_size_histogram": "connected-components fixpoint convergence checks",
    "dedup_clusters_star": "large-star/small-star fixpoint signature per round",
    "dedup_corpus_end_to_end": "composed pipeline includes the components fixpoint",
    "dedup_duplicate_clusters": "min-label propagation fixpoint convergence checks",
    "dedup_semantic_clusters": "components fixpoint over embedding near-pairs",
    "graph_components_trade": "components fixpoint (dimension-sized trade graph)",
    "similarity_ann_margin_multiprobe_topk": "1-row query projections/bucket fetch: probe enumeration is index metadata, like IVF centroids",
    "similarity_ann_multiprobe_topk": "1-row query-vector fetch for broadcast",
    "similarity_ivf_pq_pipeline": "KMeans fit + sample-trained PQ codebooks + query fetch",
    "similarity_ivf_topk": "KMeans coarse-quantizer training",
    "similarity_pq_topk": "sample-trained PQ codebooks + query fetch",
}


def test_catalog_builders_are_action_free(catalog_builds):
    """Every catalog query built under the action recorder (once, via the
    shared catalog_builds fixture); outside the allowlist, zero driver
    actions are tolerated — and a build that crashes is an offender too,
    never a silent skip."""
    offenders: dict[str, list[str]] = {}
    for name, rec in catalog_builds.items():
        if rec["error"]:
            offenders[name] = [f"build failed: {rec['error']}"]
            continue
        if rec["actions"] and name not in ITERATIVE_OK:
            offenders[name] = rec["actions"]
    assert not offenders, (
        "catalog builders issued driver-side actions during plan "
        f"construction: {offenders} — move scalars into the plan as 1-row "
        "aggregate crossJoins (graph/pagerank.py pattern) or document the "
        "builder in ITERATIVE_OK with its justification"
    )


def test_allowlist_entries_still_exist():
    """A renamed/removed query must not leave a stale allowlist row."""
    registered = set(all_queries())
    stale = sorted(set(ITERATIVE_OK) - registered)
    assert not stale, f"ITERATIVE_OK names not in the registry: {stale}"
