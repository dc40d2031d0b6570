"""Third-decade events scale replay: sessionize + window-agg at 100M rows.

The bench's events_replay_10x measures the state/window family across two
decades (1x -> 10x -> 100x, 10M events at sf0.1). This one-off pushes a
third decade — 100,000,000 events — single-shot (byte-audit mode, no
repeats), recording wall, session/window-row counts, and actual
shuffle/spill bytes per point from the UI REST API. Writes
docs/EVENTS_100M_r{N}.json.

Replication differs from the bench's _replicated_union on purpose: a
1000-branch union spends minutes in plan analysis at this width, so the
corpus is built as events x broadcast(range(copies)) with the same
disjoint-key shifts (user_id + copy*1e8, event_id + copy*1e11) — one
narrow broadcast nested loop that multiplies rows partition-locally with
zero shuffle, the plan a 1000-executor cluster would want for synthetic
fan-out. Every copy keeps the original per-user event streams, so the
corpus has 1000x users with IDENTICAL session structure: healthy growth
is ~10x wall / ~10x shuffle bytes per decade (per-user partitions, no
global sort), and n_sessions / n_window_rows are the deterministic
scale-soundness columns.

Run alone on the host — the 100M sessionize shuffle holds ~4 GiB.

    python scripts/events_hundred_m.py [shuffle_partitions] [input_parts]

The optional arguments drive the layout-knob experiment (the ETL 100x
recipe, SCALE.md). Measured r10 findings at the 100M point:

- spill is CAPACITY-driven, not layout-driven: disk/memory spill bytes
  are identical (~3.27 GiB / ~18.2 GiB) under 32 vs 128 reducers AND
  32 vs 256 input splits — the window/sort state (~21 GiB for 100M
  rows) exceeds the host's fixed shared execution-memory pool by the
  same margin however it is sliced. Only more aggregate memory (more
  executors) removes it, which is the cluster reading.
- wall IS layout-driven: `input_parts` (repartition the BASE before
  the multiply, so each task inflates a small slice — what many real
  128 MB splits give for free) cut sessionize 64.4 s -> 22.7 s and
  window-agg 17.9 s -> 3.0 s. Repartitioning the inflated corpus
  instead is strictly worse (adds a 5 GiB shuffle whose map side
  streams the same inflated splits: 209 s, more spill).

With either arg set, output lands in
docs/EVENTS_100M_r{N}_p{P}[_i{I}].json instead of the standing
artifact.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _corpus(spark, base, n_copies: int):
    from pyspark.sql import functions as F

    copies = F.broadcast(spark.range(n_copies).select(F.col("id").alias("_c")))
    return base.crossJoin(copies).select(
        (F.col("event_id") + F.col("_c") * F.lit(100_000_000_000)).alias(
            "event_id"
        ),
        "ts",
        (F.col("user_id") + F.col("_c") * F.lit(100_000_000)).alias("user_id"),
        "event_type",
        "value",
    )


def main() -> None:
    os.environ["SPARK_GRAFT_REPLAY_REPEATS"] = "1"  # single-shot points

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    import bench
    from dump_shuffle import _stages
    from sri_spark.session import get_spark

    base_sess = get_spark("events-100m")
    conf = dict(base_sess.sparkContext.getConf().getAll())
    base_sess.stop()
    # NOTE: spark.driver.memory is deliberately NOT copied — get_spark
    # already launched the gateway JVM, and a session built after stop()
    # reuses that JVM, so heap was fixed at first launch (controlled by
    # SPARK_GRAFT_DRIVER_MEM); copying the conf here would be a no-op that
    # misleads about what governs memory (ADVICE r10).
    b = SparkSession.builder.master(conf.get("spark.master", "local[*]"))
    for k, v in conf.items():
        if k.startswith("spark.sql") or k == "spark.serializer":
            b = b.config(k, v)
    parts = int(sys.argv[1]) if len(sys.argv) > 1 else None
    if parts:
        b = b.config("spark.sql.shuffle.partitions", str(parts))
    spark = (
        b.config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4048")
        .appName("events-100m")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId

    from sri_spark.plans.events_queries import sessionize
    from sri_spark.sources.testdata import load_table

    base = load_table(spark, bench.SF_DIR, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    n1 = base.count()

    def window_agg(df):
        return df.groupBy(F.window("ts", "1 hour"), "event_type").agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )

    input_parts = int(sys.argv[2]) if len(sys.argv) > 2 else None
    if input_parts:
        base = base.repartition(input_parts)

    out: dict[str, dict] = {}
    # snapshot stages BEFORE the loop: base.count() (and any input_parts
    # repartition stages) already ran, and booking them into the first
    # point's `fresh` inflates its n_stages/shuffle totals (ADVICE r10)
    time.sleep(2.0)
    seen: set = set(_stages(ui, app))
    for name, copies in (("hundred_x", 100), ("thousand_x", 1000)):
        corpus = _corpus(spark, base, copies)
        # r12: noop-counted full-plan evaluation (bench._noop_counted) —
        # under a bare count Catalyst prunes window_agg's sum(value)
        # expression and the value-column scan, so pre-r12 window walls
        # under-measured the real aggregate (r11 verdict item 1's lesson
        # applied to every measurement script)
        t0 = time.perf_counter()
        n_sessions = bench._noop_counted(sessionize(corpus))
        sess_sec = round(time.perf_counter() - t0, 4)
        t0 = time.perf_counter()
        n_window_rows = bench._noop_counted(window_agg(corpus))
        win_sec = round(time.perf_counter() - t0, 4)
        time.sleep(2.0)  # async listener bus: let finished stages land
        stages = _stages(ui, app)
        fresh = [s for k, s in stages.items() if k not in seen]
        seen |= set(stages)
        out[name] = {
            "rows": n1 * copies,
            "sessionize_sec": sess_sec,
            "n_sessions": n_sessions,
            "window_agg_sec": win_sec,
            "n_window_rows": n_window_rows,
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
        }
        print(json.dumps({name: out[name]}))

    h, t = out["hundred_x"], out["thousand_x"]
    doc = {
        "unit": "MiB",
        "note": (
            "single-shot walls (byte-audit mode); the DETERMINISTIC "
            "columns (n_sessions, n_window_rows) are the scale signal — "
            "walls on this multi-tenant host carry load noise"
        ),
        "points": out,
        "growth_100x_to_1000x": {
            "sessionize_sec": round(t["sessionize_sec"] / h["sessionize_sec"], 2),
            "window_agg_sec": round(t["window_agg_sec"] / h["window_agg_sec"], 2),
            "n_sessions": round(t["n_sessions"] / h["n_sessions"], 4),
            "shuffle_bytes": round(
                (t["shuffle_write_mb"] + t["shuffle_read_mb"])
                / max(h["shuffle_write_mb"] + h["shuffle_read_mb"], 0.01),
                2,
            ),
        },
    }
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    n = bench._current_round()
    suffix = (f"_p{parts}" if parts else "") + (
        f"_i{input_parts}" if input_parts else ""
    )
    doc["shuffle_partitions"] = parts or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    doc["input_parts"] = input_parts
    path = os.path.join(here, "docs", f"EVENTS_100M_r{n:02d}{suffix}.json")
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc["growth_100x_to_1000x"]))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
