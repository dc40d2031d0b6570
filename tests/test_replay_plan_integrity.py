"""Plan-integrity gate over every bench replay family (r11 verdict item 2).

Round 11's one real defect: graph_replay_10x timed
`pagerank(...).count()`, and Catalyst legally join-eliminates PageRank's
unique-key left joins under a count — the measured plan kept 1 join /
6 aggregates of the real 13 / 29 and ran >20x faster than the honest
noop-sink evaluation, so three rounds of published decade growths
characterized the pruned distinct/degree skeleton, not the rank
recurrence. That bug was caught by hand; this gate makes the next one
structural:

1. For every replay family in REPLAY_BLOCKS, the measured action's
   optimized plan must retain at least the frame's own
   join/window/aggregate/generate operator counts (full-materialization
   actions — noop sink, parquet write, collect — retain them by
   construction; a count does not).
2. The registry's claimed action is bound to the replay source via
   `measure_marker` substrings, so silently swapping the evaluation back
   to `.count()` without updating bench.replay_plan_probes fails here.
3. A meta-test re-creates the r11 bug (pagerank under a count action)
   and asserts the detector FLAGS it — the gate is proven non-vacuous.
4. The graph family is additionally pinned against the catalog query
   (r11 verdict item 1's done-criterion): the replay action's plan must
   retain >= graph_pagerank_trade's join/aggregate counts.
"""

from __future__ import annotations

import inspect
import os

import pytest
from pyspark.sql import functions as F

import bench

# honor the same fixture-location override every other test goes through
# (tests/conftest.py) instead of hard-coding the driver host's path
SF = os.environ.get("SRI_SPARK_TEST_SF_DIR", "/root/testdata/sf0.001")

# logical operators whose disappearance under a measuring action means the
# measurement no longer executes the work the replay claims to time
OPS = ("Join", "Aggregate", "Window", "Generate", "Expand")


@pytest.fixture(autouse=True)
def _small_sf(monkeypatch):
    monkeypatch.setattr(bench, "SF_DIR", SF)


def _op_counts(df) -> dict[str, int]:
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    counts = dict.fromkeys(OPS, 0)
    for line in plan.splitlines():
        s = line.lstrip(" :+-")
        for op in OPS:
            if s.startswith(op + " ") or s.rstrip("\n ") == op:
                counts[op] += 1
    return counts


def _count_action_counts(df) -> dict[str, int]:
    """Operator counts of the plan Dataset.count() actually executes —
    a global count over the frame, which invites column pruning and
    unique-key left-join elimination."""
    return _op_counts(df.groupBy().agg(F.count(F.lit(1)).alias("n")))


@pytest.fixture(scope="module")
def probes(spark):
    old = bench.SF_DIR
    bench.SF_DIR = SF
    try:
        return bench.replay_plan_probes(spark)
    finally:
        bench.SF_DIR = old


def test_probe_registry_covers_every_replay_block(probes):
    import sys

    sys.path.insert(0, "scripts")
    from compare_replay_growth import REPLAY_BLOCKS

    assert set(probes) == set(REPLAY_BLOCKS)


def test_registry_actions_are_full_materializing(probes):
    # the gate's premise: every claimed action executes the frame's
    # complete plan. "count" is deliberately NOT in this set.
    assert all(p["action"] in ("noop", "write", "collect") for p in probes.values())


# what each action type actually executes: noop/write/collect run the
# frame's own optimized plan; a count runs the prunable global-count plan.
# "count" stays in this map so a registry edit relaxing the action ban is
# still MEASURED against the full plan rather than slipping through.
_ACTION_PLANS = {
    "noop": _op_counts,
    "write": _op_counts,
    "collect": _op_counts,
    "count": _count_action_counts,
}


def test_measure_markers_bind_registry_to_source(probes):
    """Every family's claimed evaluation must literally appear in the
    replay function it describes — and no replay may time a bare
    `.count()` as its measuring action (counts for artifact row fields
    must come from _noop_counted or untimed follow-ups)."""
    for family, probe in probes.items():
        src = inspect.getsource(getattr(bench, family))
        for marker in probe["measure_marker"]:
            assert marker in src, f"{family}: marker {marker!r} not in source"


def test_measured_action_plan_retains_all_operators(probes):
    for family, probe in probes.items():
        acted_counts = _ACTION_PLANS[probe["action"]]
        for label, df in probe["frames"]:
            full = _op_counts(df)
            acted = acted_counts(df)
            for op in OPS:
                assert acted[op] >= full[op], (
                    f"{family}/{label}: measured action loses {op} "
                    f"({acted[op]} < {full[op]})"
                )


def test_detector_catches_the_r11_count_bug(probes):
    """Meta-test: the r11 defect re-created. Under a count action,
    PageRank's optimized plan must lose joins and aggregates relative to
    the full plan — if this stops failing the comparison, the detector
    itself has gone blind and the gate above is vacuous."""
    (label, df), = probes["graph_replay_10x"]["frames"]
    full = _op_counts(df)
    counted = _count_action_counts(df)
    assert counted["Join"] < full["Join"], (full, counted)
    assert counted["Aggregate"] < full["Aggregate"], (full, counted)


def test_graph_replay_plan_matches_catalog_query(spark, probes):
    """r11 verdict item 1's done-criterion: the replay action's optimized
    plan retains >= the catalog query graph_pagerank_trade's
    join/aggregate counts (same operator, same iteration count)."""
    from sri_spark.plans import all_queries

    catalog = all_queries()["graph_pagerank_trade"](spark, SF)
    cat = _op_counts(catalog)
    (_, replay_df), = probes["graph_replay_10x"]["frames"]
    rep = _op_counts(replay_df)
    assert rep["Join"] >= cat["Join"], (rep, cat)
    assert rep["Aggregate"] >= cat["Aggregate"], (rep, cat)
    # and both must carry the full rank recurrence: >= 3 joins + 1
    # aggregate per iteration plus the degree/node prologue
    from sri_spark.plans.graph_queries import PR_ITERS

    assert rep["Join"] >= 3 * PR_ITERS
    assert rep["Aggregate"] >= PR_ITERS + 2
