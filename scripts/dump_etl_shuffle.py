"""Shuffle audit of the star-ETL replays (round-7 verdict item 3's second
half): run the 1x / 10x / 100x SRI star builds in a UI-enabled session and
record each run's ACTUAL shuffle read/write bytes and spill, so the
growth-curve claim ("near-linear, zero spill blow-up") is measured stage
metrics, not prose. Writes docs/SHUFFLE_ETL_r{N}.json.

Run (sequentially with nothing else on the host — the 100x point holds
~46M rows through a 5-table star build and takes ~10 minutes):

    python scripts/dump_etl_shuffle.py

Interpretation: shuffle bytes should grow ~linearly with source rows
(each growth step multiplies both the fact and the code pool by 10), and
`spill_disk_mb` should stay 0 — the scalable-keys path exists precisely
so the build never funnels through a single sort buffer.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import SparkSession

    import bench
    from dump_shuffle import _stages  # same REST helpers / same metrics
    from sri_spark.session import get_spark

    base = get_spark("etl-shuffle-audit")
    conf = dict(base.sparkContext.getConf().getAll())
    base.stop()
    b = SparkSession.builder.master(conf.get("spark.master", "local[*]"))
    for k, v in conf.items():
        if k.startswith("spark.sql") or k in ("spark.serializer", "spark.driver.memory"):
            b = b.config(k, v)
    spark = (
        b.config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4048")
        .appName("etl-shuffle-audit")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId

    replays = {
        "sri_etl_replay": bench.sri_etl_replay,
        "sri_etl_replay_10x": bench.sri_etl_replay_10x,
        "sri_etl_replay_100x": bench.sri_etl_replay_100x,
    }
    out: dict[str, dict] = {}
    seen: set = set()
    for name, fn in replays.items():
        block = fn(spark)
        time.sleep(2.0)  # async listener bus: let finished stages land
        stages = _stages(ui, app)
        fresh = [s for k, s in stages.items() if k not in seen]
        seen |= set(stages)
        block.update(
            {
                "n_stages": len(fresh),
                "input_mb": round(sum(s["inputBytes"] for s in fresh) / 2**20, 2),
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
            }
        )
        out[name] = block
        print(json.dumps({name: block}))

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    n = bench._current_round()
    path = os.path.join(here, "docs", f"SHUFFLE_ETL_r{n:02d}.json")
    ten, hundred = out["sri_etl_replay_10x"], out["sri_etl_replay_100x"]
    doc = {
        "unit": "MiB",
        "replays": out,
        "growth_10x_to_100x": {
            "sec": round(hundred["sec"] / ten["sec"], 2),
            "shuffle_bytes": round(
                (hundred["shuffle_write_mb"] + hundred["shuffle_read_mb"])
                / max(ten["shuffle_write_mb"] + ten["shuffle_read_mb"], 0.01),
                2,
            ),
        },
    }
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc["growth_10x_to_100x"]))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
