"""Is the 100x ETL's single-host spill a KNOB or a structural cost?
(round-9 verdict item 7)

The 100x star build (46M source rows, 36.7M-row vehicle dim) spills
~140 GiB memory / ~50 GiB disk on one 128 GiB host — docs/SCALE.md argues
that is inherent to cramming a >cluster-sized working set into one
machine. This experiment proves the spill responds to the documented
tuning lever rather than being hardwired: run the SAME 100x build under
the default shuffle partitioning (32 = cores, bench's config) and under
4x finer partitioning (128 — what sri_spark/tuning.py::shuffle_partitions
prescribes at this shuffle volume: ~38 GiB / 128 MiB-per-task ~ 300,
capped here to keep task-launch overhead visible), and record the
wall/spill tradeoff from the stage metrics REST API.

Writes docs/ETL_SPILL_KNOB_r09.json; SCALE.md summarizes the verdict and
which configuration a 1000-executor cluster would pick.

Run sequentially with nothing else on the host (two 100x builds,
~20 minutes total):

    SPARK_GRAFT_DRIVER_MEM=16g python scripts/etl_spill_knob.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _run_once(shuffle_partitions: int, ui_port: int) -> dict:
    from pyspark.sql import SparkSession

    import bench
    from dump_shuffle import _stages
    from sri_spark.session import get_spark

    base = get_spark("etl-spill-knob")
    conf = dict(base.sparkContext.getConf().getAll())
    base.stop()
    b = SparkSession.builder.master(conf.get("spark.master", "local[*]"))
    for k, v in conf.items():
        if k.startswith("spark.sql") or k in ("spark.serializer", "spark.driver.memory"):
            b = b.config(k, v)
    spark = (
        b.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(ui_port))
        .appName(f"etl-spill-knob-{shuffle_partitions}")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    try:
        block = bench.sri_etl_replay_100x(spark)
        time.sleep(2.0)  # async listener bus: let finished stages land
        stages = list(_stages(ui, app).values())
        block.update(
            {
                "shuffle_partitions": shuffle_partitions,
                "n_stages": len(stages),
                "shuffle_write_mb": round(
                    sum(s["shuffleWriteBytes"] for s in stages) / 2**20, 2
                ),
                "shuffle_read_mb": round(
                    sum(s["shuffleReadBytes"] for s in stages) / 2**20, 2
                ),
                "spill_disk_mb": round(
                    sum(s["diskBytesSpilled"] for s in stages) / 2**20, 2
                ),
                "spill_mem_mb": round(
                    sum(s["memoryBytesSpilled"] for s in stages) / 2**20, 2
                ),
            }
        )
        return block
    finally:
        # a stopped JVM releases its port/metrics; the next config starts clean
        spark.stop()


def main() -> None:
    results = {}
    for parts, port in ((32, 4049), (128, 4050)):
        print(f"== 100x build, spark.sql.shuffle.partitions={parts} ==")
        results[f"partitions_{parts}"] = _run_once(parts, port)
        print(json.dumps(results[f"partitions_{parts}"]))

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base, tuned = results["partitions_32"], results["partitions_128"]
    doc = {
        "unit": "MiB",
        "experiment": "sri_etl_replay_100x under 32 vs 128 shuffle partitions",
        "runs": results,
        "tradeoff": {
            "wall_ratio_128_vs_32": round(tuned["sec"] / base["sec"], 3),
            "disk_spill_ratio_128_vs_32": round(
                tuned["spill_disk_mb"] / max(base["spill_disk_mb"], 0.01), 3
            ),
            "mem_spill_ratio_128_vs_32": round(
                tuned["spill_mem_mb"] / max(base["spill_mem_mb"], 0.01), 3
            ),
        },
    }
    path = os.path.join(here, "docs", "ETL_SPILL_KNOB_r09.json")
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc["tradeoff"]))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
