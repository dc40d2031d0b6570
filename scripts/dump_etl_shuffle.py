"""Shuffle audit of the star-ETL replays (round-7 verdict item 3's second
half): run the 1x / 10x / 100x SRI star builds in a UI-enabled session and
record each run's ACTUAL shuffle read/write bytes and spill, so the
growth-curve claim ("near-linear, zero spill blow-up") is measured stage
metrics, not prose. Writes docs/SHUFFLE_ETL_r{N}.json.

Run (sequentially with nothing else on the host — the 100x point holds
~46M rows through a 5-table star build and takes ~10 minutes):

    python scripts/dump_etl_shuffle.py

Interpretation: shuffle bytes should grow ~linearly with source rows
(each growth step multiplies both the fact and the code pool by 10).
`spill_disk_mb` should stay 0 at the 1x and 10x points; the 100x point
legitimately spills tens of GiB on ONE host (the working set exceeds a
single machine — docs/SCALE.md quantifies why that is correct single-host
behavior and what a 1000-executor cluster does instead), so the gate
below bounds its GROWTH (max(1 GiB, 1.2x the prior round's spill))
rather than demanding zero.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    # byte-audit mode: one execution per replay point. The bench's
    # median-of-3 timing repeats would otherwise multiply every audited
    # shuffle/spill byte by the repeat count (r9: the gate's first armed
    # run "regressed" 3-4.4x purely from counting three builds per point).
    os.environ["SPARK_GRAFT_REPLAY_REPEATS"] = "1"

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
        "regression": _etl_regression_block(here, n, out),
    }
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc["growth_10x_to_100x"]))
    if doc["regression"]:
        print(json.dumps({"etl_shuffle_regression": doc["regression"]["counts"]}))
    print(f"wrote {path}")
    if doc["regression"] and doc["regression"]["counts"]["regressed"]:
        sys.exit(1)


def _etl_regression_block(here: str, this_round: int, out: dict) -> dict | None:
    """Same deterministic gate as dump_shuffle.shuffle_regression_block,
    applied per replay: total shuffle (write+read) must not grow >20% AND
    >100 MiB against the newest committed prior-round ETL audit (the
    absolute floor is 100 MiB here — these runs move GiBs, and kilobyte
    jitter in the 1x point must not trip), and disk spill must not exceed
    max(1 GiB, 1.2x the floor's spill) — the 100x point legitimately
    spills ~50 GiB on one host (docs/SCALE.md), so the gate bounds its
    GROWTH instead of forbidding it."""
    import glob
    import re

    floors = sorted(
        (int(re.search(r"SHUFFLE_ETL_r(\d+)", p).group(1)), p)
        for p in glob.glob(os.path.join(here, "docs", "SHUFFLE_ETL_r*.json"))
        if int(re.search(r"SHUFFLE_ETL_r(\d+)", p).group(1)) < this_round
    )
    if not floors:
        return None
    floor_round, floor_path = floors[-1]
    with open(floor_path) as f:
        floor = json.load(f)["replays"]
    per, counts = {}, {"ok": 0, "regressed": 0, "new": 0}
    for name, m in sorted(out.items()):
        base = floor.get(name)
        if base is None:
            counts["new"] += 1
            per[name] = "new"
            continue
        cur = m["shuffle_write_mb"] + m["shuffle_read_mb"]
        ref = base["shuffle_write_mb"] + base["shuffle_read_mb"]
        base_spill = base.get("spill_disk_mb", 0) or 0
        spilled = m["spill_disk_mb"] > max(1024.0, base_spill * 1.2)
        grew = cur > ref * 1.2 and cur - ref > 100.0
        ratio = round(cur / ref, 2) if ref else None
        shown = f"{ratio}x" if ratio is not None else "from 0 MiB"
        if grew or spilled:
            counts["regressed"] += 1
            per[name] = (
                f"REGRESSED shuffle:{shown}"
                f" spill:{m['spill_disk_mb']} vs {base_spill} MiB"
            )
        else:
            counts["ok"] += 1
            per[name] = f"ok:{shown}"
    return {
        "floor": os.path.basename(floor_path),
        "threshold": "shuffle(write+read) > 1.2x floor and > +100 MiB, "
        "or spill > max(1 GiB, 1.2x floor spill)",
        "counts": counts,
        "per_replay": per,
    }


if __name__ == "__main__":
    main()
