"""Benchmark harness: runs the headline catalog queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed with a no-op sink (format('noop')) so the measurement
is engine work — scan, shuffle, join, aggregate — not driver-side row
collection.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# headline set: the flagship star rollup + the heaviest operator families
HEADLINE = [
    "flagship_star_rollup",
    "metrics_by_brand",
    "metrics_by_region",
    "metrics_by_year",
    "star_integrity_count",
    "agg_overview",
    "join_left_composite",
    "dim_build_distinct",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "text_quality_score",
    "similarity_cosine_topk",
    "similarity_lsh_near_pairs",
    "events_window_agg",
    "events_sessionize",
    "events_pivot_by_type",
    "text_tfidf_top_terms",
    "embeddings_label_centroids",
    "agg_percentiles",
    "corpus_select_training",
    "join_asof_attribution",
    "join_range_price_bands",
]


def main() -> None:
    from sri_spark.plans import all_queries
    from sri_spark.session import get_spark

    spark = get_spark("sri_spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    names = [n for n in HEADLINE if n in queries]

    from sri_spark.operators.caching import unpersist_all

    # warm-up pass (JIT, codegen caches, file-footer reads) — untimed, so the
    # timed pass measures steady-state engine work
    for name in names:
        queries[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        unpersist_all()

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        queries[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 4)
        unpersist_all()  # release per-query scoped caches (dedup shingles etc.)

    m = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(m.group(1).rstrip(".")) if m else None
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
