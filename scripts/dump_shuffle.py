"""Measured shuffle evidence: run the headline catalog queries and record
ACTUAL per-query shuffle read/write bytes, input bytes, and spill from
Spark's status REST API — the "minimize shuffles" claims as numbers, not
plan-shape prose. Writes docs/SHUFFLE_r{N}.json.

Run: python scripts/dump_shuffle.py   (own Spark session, UI enabled —
the engine session keeps the UI off; metrics need it).

Caveat: `input_mb` (stage inputBytes) underreports DSv2 columnar parquet
scans on some paths — treat it as a lower bound; the shuffle and spill
columns are the authoritative ones and are what the scale argument rests
on (shuffle bytes ≪ input bytes on every rollup; zero spill anywhere).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

QUERIES = [
    "flagship_star_rollup",
    "agg_overview",
    "metrics_by_region",
    "star_integrity_count",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_cluster_keep_best",
    "text_tfidf_top_terms",
    "text_zipf_stats",
    "similarity_cosine_topk",
    "events_sessionize",
    "events_window_agg",
    "corpus_select_training",
    "warehouse_cdc_compaction",
    "retrieval_phrase_top_docs",
    "tpch_q9_product_profit",
    "graph_triangle_count",
    "join_bloom_prefilter",
]


def _stages(ui: str, app: str) -> dict[int, dict]:
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app}/stages?status=complete"
    ) as r:
        data = json.load(r)
    return {(s["stageId"], s["attemptId"]): s for s in data}


def main() -> None:
    from pyspark.sql import SparkSession

    from sri_spark.plans import all_queries
    from sri_spark.operators.caching import unpersist_all
    from sri_spark.session import get_spark  # for its conf defaults

    # UI-enabled twin of the engine session: metrics come from the REST API
    base = get_spark("shuffle-audit")  # configures defaults
    conf = dict(base.sparkContext.getConf().getAll())
    base.stop()
    b = SparkSession.builder.master(conf.get("spark.master", "local[*]"))
    for k, v in conf.items():
        if k.startswith("spark.sql") or k in ("spark.serializer",):
            b = b.config(k, v)
    spark = (
        b.config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4049")
        .appName("shuffle-audit")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    qs = all_queries()

    out: dict[str, dict] = {}
    seen: set = set()
    for name in QUERIES:
        if name not in qs:
            continue
        qs[name](spark, SF).write.format("noop").mode("overwrite").save()
        unpersist_all()
        # the status store is fed by an async listener bus: give it a
        # beat so finished stages land in THIS query's snapshot, not the
        # next one's
        time.sleep(1.5)
        stages = _stages(ui, app)
        fresh = [s for k, s in stages.items() if k not in seen]
        seen |= set(stages)
        out[name] = {
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

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    import glob
    import re

    rounds = [
        int(re.search(r"BENCH_r(\d+)", p).group(1))
        for p in glob.glob(os.path.join(here, "BENCH_r*.json"))
    ]
    n = (max(rounds) + 1) if rounds else 0
    path = os.path.join(here, "docs", f"SHUFFLE_r{n:02d}.json")
    doc = {"sf_dir": SF, "unit": "MiB", "queries": out}
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
