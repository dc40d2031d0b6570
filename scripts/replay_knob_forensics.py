"""Layout-knob forensics for the two superlinear 100x replay points
(round-11 verdict item 2 — the events_hundred_m treatment applied to ETL
and graph).

The r10 artifact records two decade growths above 10x:
`sri_etl_replay_100x.growth_vs_10x` = 13.18 and
`graph_replay_10x.time_growth_10x_to_100x` = 12.5. The events family got
the knob experiment that PROVED its 100M-row spill capacity-bound (byte-
stable under every layout, docs/EVENTS_100M_r10*.json); ETL and graph had
only the inference. This script measures each family's 100x point under
two shuffle-partition layouts (32 = cores = the bench config, and 128 =
the tuning.py prescription at this volume), recording wall plus the
layout-INVARIANT stage metrics (shuffle/spill bytes) from the UI REST
API, and classifies:

- capacity_bound: spill bytes byte-stable (<=30% apart) across layouts —
  the working set exceeds the host's fixed execution-memory pool however
  it is sliced; only more aggregate memory (a real cluster) removes it.
  The superlinear decade growth is a single-host artifact.
- layout_bound: a layout moves spill >30% (or wall >25% with spill
  present) — the growth is at least partly fixable locally and the bench
  config should change.

Usage (run SOLO on the host, one family at a time):

    SPARK_GRAFT_DRIVER_MEM=24g python scripts/replay_knob_forensics.py etl
    python scripts/replay_knob_forensics.py graph
    python scripts/replay_knob_forensics.py events   # 100x window_agg (r12)

Writes docs/{ETL,GRAPH,EVENTS}_100X_knobs_r{N}.json; docs/SCALE.md
carries the conclusion; scripts/compare_replay_growth.py pins the
growth bands.

r12 measurement fixes: graph evaluates through bench._noop_counted (the
r11 `.count()` join-eliminated the rank rounds), and the ETL point runs
at the sweep's OWN layout (shuffle_partitions=None) instead of being
silently forced to 128 by the bench pin.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LAYOUTS = (32, 128)


def _etl_point(spark) -> dict:
    import bench

    # shuffle_partitions=None: honor the builder-level layout _run_layout
    # set — ADVICE r11 found the replay's own unconditional 128 override
    # silently defeated the sweep (both labeled layouts actually ran 128)
    return bench.sri_etl_replay_100x(spark, shuffle_partitions=None)


def _graph_point(spark) -> dict:
    import bench
    from sri_spark.graph.pagerank import pagerank
    from sri_spark.operators.caching import unpersist_all
    from sri_spark.plans.graph_queries import PR_ITERS

    pairs = bench._trade_pairs(spark).persist()
    n_pairs = pairs.count()
    edges = bench._trade_edges(pairs, 100)
    # r11 verdict item 1: evaluate through the bench's noop-counted helper,
    # never `.count()` — under a count Catalyst join-eliminates pagerank's
    # unique-key left joins (1 join / 6 aggs remain of 13 / 29; >20x faster
    # than the real plan), so the r11 knob conclusions characterized the
    # pruned distinct/degree skeleton, not the rank recurrence.
    t0 = time.perf_counter()
    n_nodes = bench._noop_counted(pagerank(edges, iterations=PR_ITERS))
    sec = round(time.perf_counter() - t0, 4)
    pairs.unpersist()
    unpersist_all()
    return {
        "sec": sec,
        "n_nodes": n_nodes,
        "edges": n_pairs * 200,
        "iterations": PR_ITERS,
        "action": "noop_sink",
    }


def _events_point(spark) -> dict:
    """The events family's superlinear cell only (r11 verdict item 5): the
    100x (10M-event at sf0.1) hourly window_agg, noop-counted — sessionize
    already carried a per-stage attribution; window_agg's 10x->100x growth
    (7.07x in r11, measured via a sum-pruning `.count()`) did not."""
    import bench

    base = bench._events_base(spark)
    n1 = base.count()
    corpus = bench._events_corpus(base, 100)
    t0 = time.perf_counter()
    n_rows = bench._noop_counted(bench._events_window_agg(corpus))
    sec = round(time.perf_counter() - t0, 4)
    return {
        "sec": sec,
        "n_window_rows": n_rows,
        "rows": n1 * 100,
        "action": "noop_sink",
    }


_POINTS = {"etl": _etl_point, "graph": _graph_point, "events": _events_point}


def _run_layout(family: str, parts: int, ui_port: int) -> dict:
    from pyspark.sql import SparkSession

    from dump_shuffle import _stages
    from sri_spark.session import get_spark

    base = get_spark(f"{family}-knob")
    conf = dict(base.sparkContext.getConf().getAll())
    base.stop()
    # NOTE: spark.driver.memory deliberately not copied — heap was fixed at
    # the first JVM launch (SPARK_GRAFT_DRIVER_MEM); a post-stop() rebuild
    # reuses that JVM (ADVICE r10)
    b = SparkSession.builder.master(conf.get("spark.master", "local[*]"))
    for k, v in conf.items():
        if k.startswith("spark.sql") or k == "spark.serializer":
            b = b.config(k, v)
    spark = (
        b.config("spark.sql.shuffle.partitions", str(parts))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(ui_port))
        .appName(f"{family}-knob-{parts}")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    try:
        # stage snapshot BEFORE the point so setup stages (none today, but
        # the guard is free) never inflate this layout's totals (ADVICE r10)
        time.sleep(1.0)
        seen = set(_stages(ui, app))
        block = _POINTS[family](spark)
        time.sleep(2.0)  # async listener bus: let finished stages land
        fresh = [s for k, s in _stages(ui, app).items() if k not in seen]
        block.update(
            {
                "shuffle_partitions": parts,
                "n_stages": len(fresh),
                "load_avg_1m": round(os.getloadavg()[0], 2),
                "shuffle_write_mb": round(
                    sum(s["shuffleWriteBytes"] for s in fresh) / 2**20, 2
                ),
                "shuffle_read_mb": round(
                    sum(s["shuffleReadBytes"] for s in fresh) / 2**20, 2
                ),
                "spill_disk_mb": round(
                    sum(s["diskBytesSpilled"] for s in fresh) / 2**20, 2
                ),
                "spill_mem_mb": round(
                    sum(s["memoryBytesSpilled"] for s in fresh) / 2**20, 2
                ),
                "executor_run_sec": round(
                    sum(s.get("executorRunTime", 0) for s in fresh) / 1e3, 1
                ),
            }
        )
        return block
    finally:
        spark.stop()


def _classify(runs: dict[str, dict]) -> dict:
    blocks = list(runs.values())
    spills = [b["spill_disk_mb"] + b["spill_mem_mb"] for b in blocks]
    walls = [b["sec"] for b in blocks]
    spill_ratio = (
        round(max(spills) / min(spills), 3) if min(spills) > 1.0 else None
    )
    wall_ratio = round(max(walls) / min(walls), 3)
    any_spill = max(spills) > 1.0
    spill_stable = spill_ratio is not None and spill_ratio <= 1.3
    if not any_spill:
        conclusion = "no_spill_either_layout"
    elif spill_stable and wall_ratio <= 1.25:
        conclusion = "capacity_bound"
    elif spill_stable:
        conclusion = "capacity_bound_spill_layout_sensitive_wall"
    else:
        conclusion = "layout_bound"
    return {
        "spill_ratio_max_over_min": spill_ratio,
        "wall_ratio_max_over_min": wall_ratio,
        "spill_byte_stable": spill_stable if any_spill else None,
        "conclusion": conclusion,
    }


def main() -> None:
    family = sys.argv[1] if len(sys.argv) > 1 else "etl"
    assert family in _POINTS, family
    os.environ["SPARK_GRAFT_REPLAY_REPEATS"] = "1"  # single-shot points

    import bench

    runs = {}
    for parts, port in zip(LAYOUTS, (4051, 4052)):
        print(f"== {family} 100x point, shuffle.partitions={parts} ==")
        runs[f"partitions_{parts}"] = _run_layout(family, parts, port)
        print(json.dumps(runs[f"partitions_{parts}"]))

    doc = {
        "unit": "MiB",
        "experiment": (
            f"{family} 100x replay point under shuffle partition layouts "
            f"{LAYOUTS} (round-11 verdict item 2; single-shot byte-audit "
            "mode; the layout-INVARIANT columns are the signal)"
        ),
        "runs": runs,
        "classification": _classify(runs),
    }
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    n = bench._current_round()
    path = os.path.join(
        here, "docs", f"{family.upper()}_100X_knobs_r{n:02d}.json"
    )
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc["classification"]))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
