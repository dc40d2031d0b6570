"""Per-leg wall + shuffle/spill attribution for the 100x ETL replay
(round-13 verdict item 1).

The 100x star build (46,055,000 source rows, 7.3 GB CSV) read 234 s in
r12's two runs but 410-566 s in r11 and every r13-era run — with ZERO
changes to sri_spark/etl/ or the replay function between those rounds.
The verdict flagged the delta as unexplained (~60% of total bench wall).
This script decomposes the replay into its sequential legs, each with
its own wall time and fresh-stage shuffle/spill/runtime bytes from the
UI REST API, so the delta lands on a named leg instead of "the replay":

  1. csv_scan      — parse + persist + count the 46M-row source
  2. dim_vehiculo  — distinct + scalable surrogate keys (data-sized dim)
  3. dims_small    — transaccion + ubicacion + tiempo (lookup-sized)
  4. fact_build    — 4 lookups + scalable ID_Registro, noop sink
  5. star_write    — write_star (range-shuffled clustered fact + dims)

Legs run in replay order inside ONE session with the replay's exact
config (mode=fixed, scalable_keys=True, broadcast_lookups=False,
128 shuffle partitions), so their sum brackets the replay's single-shot
wall. Because dims/fact are persisted by run_pipeline, each leg's
fresh-stage set is disjoint: later legs read earlier legs' caches.

Run SOLO (never concurrently with bench.py):

    python scripts/etl_stage_attribution.py [--copies 100]

Writes docs/ETL_STAGE_ATTRIB_r{N}.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"),
)

TOP_STAGES = 6


def _fresh_block(ui: str, app: str, seen: set) -> tuple[dict, set]:
    from dump_shuffle import _stages

    time.sleep(2.0)  # async listener bus: let finished stages land
    allst = _stages(ui, app)
    fresh = [s for k, s in allst.items() if k not in seen]
    spillers = sorted(
        fresh,
        key=lambda s: s["diskBytesSpilled"] + s["memoryBytesSpilled"],
        reverse=True,
    )
    block = {
        "n_stages": len(fresh),
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
        # executorRunTime - executorCpuTime ~= blocked time (I/O waits,
        # lock waits, fetch waits) — the I/O-vs-compute discriminator the
        # verdict asked for
        "executor_cpu_sec": round(
            sum(s.get("executorCpuTime", 0) for s in fresh) / 1e9, 1
        ),
        "top_stages_by_runtime": [
            {
                "stage": s["stageId"],
                "name": s.get("name", "")[:100],
                "run_sec": round(s.get("executorRunTime", 0) / 1e3, 1),
                "cpu_sec": round(s.get("executorCpuTime", 0) / 1e9, 1),
                "spill_disk_mb": round(s["diskBytesSpilled"] / 2**20, 2),
                "spill_mem_mb": round(s["memoryBytesSpilled"] / 2**20, 2),
                "shuffle_write_mb": round(s["shuffleWriteBytes"] / 2**20, 2),
                "shuffle_read_mb": round(s["shuffleReadBytes"] / 2**20, 2),
            }
            for s in sorted(
                fresh,
                key=lambda s: s.get("executorRunTime", 0),
                reverse=True,
            )[:TOP_STAGES]
        ],
        "top_stage_by_spill": (
            {
                "stage": spillers[0]["stageId"],
                "spill_mem_mb": round(
                    spillers[0]["memoryBytesSpilled"] / 2**20, 2
                ),
            }
            if spillers
            else None
        ),
    }
    return block, set(allst)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=100)
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    import shutil

    from pyspark.sql import SparkSession

    import bench
    from sri_spark.session import get_spark

    base = get_spark("etl-attrib-probe")
    conf = dict(base.sparkContext.getConf().getAll())
    base.stop()
    b = SparkSession.builder.master(conf.get("spark.master", "local[*]"))
    for k, v in conf.items():
        if k.startswith("spark.sql") or k in (
            "spark.serializer",
            "spark.driver.memory",
        ):
            b = b.config(k, v)
    spark = (
        b.config("spark.sql.shuffle.partitions", "128")  # the replay's layout
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4063")
        .appName("etl-attrib")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId

    from sri_spark.etl import EtlConfig
    from sri_spark.etl.dims import (
        build_dim_tiempo,
        build_dim_transaccion,
        build_dim_ubicacion,
        build_dim_vehiculo,
    )
    from sri_spark.etl.fact import build_fact
    from sri_spark.etl.pipeline import write_star
    from sri_spark.etl.source import read_sri_csv
    from tests.sri_fixture import write_sri_csv

    n = 460_550 * args.copies
    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".bench_cache",
    )
    os.makedirs(cache, exist_ok=True)
    csv_path = os.path.join(cache, f"sri_{n // 1000}k.csv")
    if not os.path.exists(csv_path):
        write_sri_csv(
            csv_path,
            n=n,
            seed=20250702,
            n_codes=660_000 * args.copies,
            chunk_rows=250_000,
            workers=min(16, os.cpu_count() or 1),
        )
    out_dir = os.path.join(cache, "sri_star_out_attrib")
    shutil.rmtree(out_dir, ignore_errors=True)

    cfg = EtlConfig(mode="fixed", scalable_keys=True, broadcast_lookups=False)
    legs: dict[str, dict] = {}
    seen: set = set()
    time.sleep(1.0)
    from dump_shuffle import _stages

    seen = set(_stages(ui, app))
    t_total0 = time.perf_counter()

    def _leg(name: str, fn) -> None:
        nonlocal seen
        spark.sparkContext.setJobDescription(f"etl-attrib:{name}")
        t0 = time.perf_counter()
        extra = fn() or {}
        wall = round(time.perf_counter() - t0, 2)
        block, seen = _fresh_block(ui, app, seen)
        block["wall_sec"] = wall
        block.update(extra)
        legs[name] = block
        print(f"-- {name}: {wall}s", flush=True)

    # 1. source scan (the pipeline persists it; count materializes the cache)
    src_holder = {}

    def _scan():
        src = read_sri_csv(spark, csv_path).persist()
        src_holder["src"] = src
        return {"rows": src.count()}

    _leg("csv_scan", _scan)
    src = src_holder["src"]

    dims = {}

    def _dim_veh():
        dims["dim_vehiculo"] = build_dim_vehiculo(src, cfg).persist()
        return {"rows": dims["dim_vehiculo"].count()}

    _leg("dim_vehiculo", _dim_veh)

    def _dims_small():
        dims["dim_tiempo"] = build_dim_tiempo(spark).persist()
        dims["dim_transaccion"] = build_dim_transaccion(src, cfg).persist()
        dims["dim_ubicacion"] = build_dim_ubicacion(src, cfg).persist()
        return {
            "rows": sum(
                dims[k].count()
                for k in ("dim_tiempo", "dim_transaccion", "dim_ubicacion")
            )
        }

    _leg("dims_small", _dims_small)

    fact_holder = {}

    def _fact():
        fact = build_fact(
            src,
            dims["dim_tiempo"],
            dims["dim_vehiculo"],
            dims["dim_transaccion"],
            dims["dim_ubicacion"],
            cfg,
        ).persist()
        fact_holder["fact"] = fact
        bench._noop(fact)
        return {}

    _leg("fact_build", _fact)

    def _write():
        tables = {**dims, "fact_registro_vehiculos": fact_holder["fact"]}
        write_star(tables, out_dir)
        return {}

    _leg("star_write", _write)
    total = round(time.perf_counter() - t_total0, 2)

    doc = {
        "unit": "MiB",
        "experiment": (
            "100x ETL replay per-leg wall+shuffle+spill attribution "
            "(round-13 verdict item 1; single-shot, 128 partitions, "
            "replay config: fixed/scalable_keys/no-broadcast-lookups)"
        ),
        "copies": args.copies,
        "source_rows": n,
        "total_wall_sec": total,
        "load_avg_1m_5m_15m": [round(x, 2) for x in os.getloadavg()],
        "legs": legs,
    }
    spark.catalog.clearCache()
    shutil.rmtree(out_dir, ignore_errors=True)
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(
        here, "docs", f"ETL_STAGE_ATTRIB_r{bench._current_round():02d}.json"
    )
    with open(path, "w") as f:
        json.dump(doc, f, indent=2)
    print(json.dumps({"written": path, "total_wall_sec": total}))
    spark.stop()


if __name__ == "__main__":
    main()
