"""Per-stage spill attribution for the graph 100x replay point
(round-12 verdict item 5).

docs/GRAPH_100X_knobs_r12.json established the honest (noop-sink) 100x
PageRank point spills 2.2 GiB disk / 20.5 GiB memory at the evidence-
backed 32-partition layout, but only as a TOTAL — the ETL and events
families got per-stage attribution (which stage spills), graph did not.
This script closes that: it runs the 117M-arc point single-shot with the
UI REST API on and records EVERY fresh stage's shuffle/spill bytes AND
its name/description, so the spill lands on a named plan operation (the
per-round arcs⋈ranks sort-merge join vs the contribution aggregate vs
the degree build).

It then re-runs the identical point with `pagerank(broadcast_ranks=
True)` — the knob the attribution motivates: each round's ranks frame is
node-sized (~26 MiB at 1.6M nodes), and broadcasting it keeps the
persisted dst-partitioned arc table exchange- and sort-free per round,
which should remove the SMJ sort state entirely. The artifact records
both runs plus a verdict:

- "smj_sort_bound_broadcast_fixes": the top spilling stages in the
  baseline are the per-round join sorts AND the broadcast variant
  removes >70% of spill or >25% of wall — bench/graph docs should
  recommend broadcast_ranks at node counts that fit executor memory.
- "capacity_bound_layout_optimal": broadcasting moves neither spill nor
  wall meaningfully — the r12 "32-partition layout is optimal" verdict
  stands unqualified.

Run SOLO (never concurrently with bench.py):

    python scripts/graph_spill_attribution.py

Writes docs/GRAPH_SPILL_ATTRIB_r{N}.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"),
)

COPIES = 100
TOP_STAGES = 8


def _point(spark, broadcast_ranks: bool) -> dict:
    import bench
    from sri_spark.graph.pagerank import pagerank
    from sri_spark.operators.caching import unpersist_all
    from sri_spark.plans.graph_queries import PR_ITERS

    pairs = bench._trade_pairs(spark).persist()
    n_pairs = pairs.count()
    edges = bench._trade_edges(pairs, COPIES)
    t0 = time.perf_counter()
    n_nodes = bench._noop_counted(
        pagerank(edges, iterations=PR_ITERS, broadcast_ranks=broadcast_ranks)
    )
    sec = round(time.perf_counter() - t0, 4)
    pairs.unpersist()
    unpersist_all()
    return {
        "sec": sec,
        "n_nodes": n_nodes,
        "edges": n_pairs * 2 * COPIES,
        "iterations": PR_ITERS,
        "broadcast_ranks": broadcast_ranks,
        "action": "noop_sink",
    }


def _run(variant: str, broadcast_ranks: bool, ui_port: int) -> dict:
    from pyspark.sql import SparkSession

    from dump_shuffle import _stages
    from sri_spark.session import get_spark

    base = get_spark("graph-attrib")
    conf = dict(base.sparkContext.getConf().getAll())
    base.stop()
    b = SparkSession.builder.master(conf.get("spark.master", "local[*]"))
    for k, v in conf.items():
        if k.startswith("spark.sql") or k == "spark.serializer":
            b = b.config(k, v)
    spark = (
        b.config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(ui_port))
        .appName(f"graph-attrib-{variant}")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    try:
        time.sleep(1.0)
        seen = set(_stages(ui, app))
        block = _point(spark, broadcast_ranks)
        time.sleep(2.0)  # async listener bus: let finished stages land
        fresh = [s for k, s in _stages(ui, app).items() if k not in seen]
        spillers = sorted(
            fresh,
            key=lambda s: s["diskBytesSpilled"] + s["memoryBytesSpilled"],
            reverse=True,
        )
        block.update(
            {
                "shuffle_partitions": 32,
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
                # the attribution the verdict asked for: top stages by
                # spill, each with its plan-site name so the bytes land on
                # a named operation
                "top_stages_by_spill": [
                    {
                        "stage": s["stageId"],
                        "name": s.get("name", "")[:120],
                        "spill_disk_mb": round(s["diskBytesSpilled"] / 2**20, 2),
                        "spill_mem_mb": round(
                            s["memoryBytesSpilled"] / 2**20, 2
                        ),
                        "shuffle_write_mb": round(
                            s["shuffleWriteBytes"] / 2**20, 2
                        ),
                        "shuffle_read_mb": round(
                            s["shuffleReadBytes"] / 2**20, 2
                        ),
                        "run_sec": round(s.get("executorRunTime", 0) / 1e3, 1),
                    }
                    for s in spillers[:TOP_STAGES]
                ],
            }
        )
        return block
    finally:
        spark.stop()


def _verdict(base: dict, bcast: dict) -> dict:
    spill = lambda b: b["spill_disk_mb"] + b["spill_mem_mb"]  # noqa: E731
    s0, s1 = spill(base), spill(bcast)
    spill_drop = round(1 - s1 / s0, 3) if s0 > 1 else None
    wall_drop = round(1 - bcast["sec"] / base["sec"], 3)
    if (spill_drop is not None and spill_drop > 0.7) or wall_drop > 0.25:
        conclusion = "smj_sort_bound_broadcast_fixes"
    else:
        conclusion = "capacity_bound_layout_optimal"
    return {
        "spill_drop_frac": spill_drop,
        "wall_drop_frac": wall_drop,
        "conclusion": conclusion,
    }


def main() -> None:
    os.environ["SPARK_GRAFT_REPLAY_REPEATS"] = "1"
    runs = {}
    for variant, bc, port in (
        ("baseline", False, 4061),
        ("broadcast_ranks", True, 4062),
    ):
        print(f"== graph 100x point, variant={variant} ==")
        runs[variant] = _run(variant, bc, port)
        print(json.dumps({k: v for k, v in runs[variant].items()}))

    doc = {
        "unit": "MiB",
        "experiment": (
            "graph 100x replay point per-stage spill attribution + "
            "broadcast-ranks variant (round-12 verdict item 5; "
            "single-shot byte-audit mode, 32 partitions)"
        ),
        "runs": runs,
        "classification": _verdict(runs["baseline"], runs["broadcast_ranks"]),
    }
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    import bench

    out = os.path.join(
        here, "docs", f"GRAPH_SPILL_ATTRIB_r{bench._current_round():02d}.json"
    )
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
    print("wrote", out)
    print(json.dumps(doc["classification"]))


if __name__ == "__main__":
    main()
