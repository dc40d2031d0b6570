"""Third-decade dedup scale replay: MinHash-LSH candidates at 1000x.

The bench's dedup_replay_10x measures the linear-candidates claim across
two decades (1x -> 10x -> 100x, ~500k docs at sf0.1). This one-off pushes
a third decade — 1000 salted copies, ~5M docs — single-shot (byte-audit
mode, no repeats), recording wall, candidate/verified-pair counts, and
the actual shuffle/spill bytes per point from the UI REST API. Writes
docs/DEDUP_1000X_r{N}.json.

The deterministic columns are the scale-soundness signal: healthy banded
LSH grows candidates ~10x per decade (salted copies share no shingles, so
cross-copy bucket collisions are impossible by construction); a
super-linear jump would mean the band/bucket keying broke. Run alone on
the host — the 1000x point holds ~250M shingle rows.

    python scripts/dedup_thousand_x.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    os.environ["SPARK_GRAFT_REPLAY_REPEATS"] = "1"  # single-shot points

    from pyspark.sql import SparkSession

    import bench
    from dump_shuffle import _stages
    from sri_spark.operators.caching import unpersist_all

    from sri_spark.session import get_spark

    base = get_spark("dedup-1000x")
    conf = dict(base.sparkContext.getConf().getAll())
    base.stop()
    b = SparkSession.builder.master(conf.get("spark.master", "local[*]"))
    for k, v in conf.items():
        if k.startswith("spark.sql") or k in ("spark.serializer", "spark.driver.memory"):
            b = b.config(k, v)
    spark = (
        b.config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4047")
        .appName("dedup-1000x")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId

    from sri_spark.dedup.minhash import minhash_lsh_pairs

    _, corpus100, n1 = bench._salted_docs_corpus(spark, 100)
    _, corpus1000, _ = bench._salted_docs_corpus(spark, 1000)

    out: dict[str, dict] = {}
    seen: set = set()
    for name, corpus, copies in (
        ("hundred_x", corpus100, 100),
        ("thousand_x", corpus1000, 1000),
    ):
        t0 = time.perf_counter()
        pairs = minhash_lsh_pairs(corpus).count()
        sec = round(time.perf_counter() - t0, 4)
        unpersist_all(spark)
        candidates = bench._dedup_lsh_candidates(corpus)
        unpersist_all(spark)
        time.sleep(2.0)  # async listener bus: let finished stages land
        stages = _stages(ui, app)
        fresh = [s for k, s in stages.items() if k not in seen]
        seen |= set(stages)
        out[name] = {
            "rows": n1 * copies,
            "sec": sec,
            "pairs": pairs,
            "candidates": candidates,
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
            "columns (candidates, pairs) are the scale signal — walls on "
            "this multi-tenant host carry load noise"
        ),
        "points": out,
        "growth_100x_to_1000x": {
            "sec": round(t["sec"] / h["sec"], 2),
            "candidates": (
                round(t["candidates"] / h["candidates"], 2)
                if h["candidates"]
                else None
            ),
            "pairs": round(t["pairs"] / h["pairs"], 2) if h["pairs"] else None,
            "shuffle_bytes": round(
                (t["shuffle_write_mb"] + t["shuffle_read_mb"])
                / max(h["shuffle_write_mb"] + h["shuffle_read_mb"], 0.01),
                2,
            ),
        },
    }
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    n = bench._current_round()
    path = os.path.join(here, "docs", f"DEDUP_1000X_r{n:02d}.json")
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc["growth_100x_to_1000x"]))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
