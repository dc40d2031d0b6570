"""Physical-plan advisor: the repo's 100 TB plan rules, executable.

`tests/test_plan_shapes.py` hard-asserts these rules for known catalog
queries; this module generalizes them into a reusable check a user can run
on ANY DataFrame before submitting it to a large cluster:

    from sri_spark.plans.advisor import advise
    for f in advise(df):
        print(f["severity"], f["rule"], "—", f["detail"])

Each rule detects a plan shape that is survivable at fixture scale and
fatal at 100 TB. Findings are advice, not errors — a bounded-by-
construction single-partition window (e.g. stats_ks_two_sample's 100-bin
ECDF) is legitimate, and the corresponding finding documents exactly the
question a reviewer should ask of it.

Detection works on explain() text, so it needs no private APIs and sees
the SAME plan the engine runs (post-Catalyst, pre-AQE-finalization).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

# base tables that grow with the data — a *forced* broadcast of any of
# these is the round-2 verdict's scale-killer class
SF_GROWING = (
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _plan_text(df: DataFrame) -> str:
    qe = df._jdf.queryExecution()
    return qe.executedPlan().toString()


def advise(df: DataFrame, *, max_exchanges: int = 6) -> list[dict]:
    """Scan the physical plan for scale hazards. Returns a list of
    findings: {rule, severity, detail}; empty list = nothing to flag."""
    plan = _plan_text(df)
    findings: list[dict] = []

    if "CartesianProduct" in plan:
        findings.append(
            {
                "rule": "cartesian-product",
                "severity": "fatal",
                "detail": "all-pairs join in the plan — O(n*m) rows; "
                "add an equi-join key (bucketing/banding for near-dup "
                "workloads).",
            }
        )
    if "BroadcastNestedLoopJoin" in plan:
        findings.append(
            {
                "rule": "nested-loop-join",
                "severity": "warn",
                "detail": "non-equi join fell back to a nested loop; fine "
                "for a 1-row side (query-vector pattern), fatal for two "
                "growing sides — rewrite as range-bin or as-of join.",
            }
        )
    if "Exchange SinglePartition" in plan:
        findings.append(
            {
                "rule": "single-partition-exchange",
                "severity": "warn",
                "detail": "a stage collapses to ONE partition (global "
                "sort/window/limit). Legitimate only when the frame is "
                "bounded by construction (dimension-sized or fixed bin "
                "count); otherwise use partitioned windows or "
                "TakeOrderedAndProject.",
            }
        )

    # forced broadcast of an SF-growing base table: a BroadcastExchange
    # whose subtree scans one of the growing tables
    for m in re.finditer(r"BroadcastExchange", plan):
        tail = plan[m.start() : m.start() + 2000]
        scanned = [t for t in SF_GROWING if re.search(rf"\b{t}\b", tail)]
        if scanned:
            findings.append(
                {
                    "rule": "broadcast-of-growing-table",
                    "severity": "warn",
                    "detail": f"broadcast subtree scans {sorted(set(scanned))}; "
                    "if this came from an explicit broadcast() hint it will "
                    "OOM at scale — drop the hint and let AQE decide.",
                }
            )
            break

    n_exchanges = plan.count("Exchange") - plan.count("BroadcastExchange")
    if n_exchanges > max_exchanges:
        findings.append(
            {
                "rule": "many-shuffles",
                "severity": "info",
                "detail": f"{n_exchanges} shuffle exchanges; check for a "
                "reusable partitioning (persist a pre-partitioned frame, "
                "as graph/pagerank.py does) or bucketed inputs.",
            }
        )

    # row-at-a-time Python in the hot path: BatchEvalPython is the slow
    # per-row UDF operator (ArrowEvalPython / mapInPandas are the fast ones)
    if "BatchEvalPython" in plan:
        findings.append(
            {
                "rule": "row-at-a-time-python",
                "severity": "fatal",
                "detail": "a row-at-a-time Python UDF sits in the plan "
                "(BatchEvalPython); replace with native Column expressions "
                "or an Arrow-batched pandas UDF (10-100x).",
            }
        )
    return findings
