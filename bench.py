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


# round-3 additions benched separately: EXTENDED changes as operators land,
# so its queries never pollute the cross-round-comparable headline total
EXTENDED = [
    "graph_pagerank_trade",
    "dedup_corpus_end_to_end",
    "text_chunk_windows",
    "text_bigram_lm_score",
    "corpus_curation_funnel",
    "events_ewma",
    "events_anomaly_mad",
    "metrics_pricing_summary",
    "orders_basket_pairs",
    "corpus_source_overlap",
]


def sri_etl_replay(spark) -> dict:
    """BASELINE.md's one reference-derived target: the full 5-table star
    build over a production-scale SRI-shaped CSV (460,550 rows, vehicle-code
    pool sized so dim_vehiculo lands at the reference's recorded ~331k
    distinct combos). The reference's recorded per-dim work totalled ≈41 s
    (Colab, pandas + BigQuery round-trips) and its fact task never completed;
    the replay times read_csv → 4 dims → fact → partitioned/clustered star
    write, end to end, on local parquet."""
    import shutil

    from sri_spark.etl import EtlConfig, run_pipeline
    from sri_spark.etl.pipeline import write_star
    from tests.sri_fixture import write_sri_csv

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")
    os.makedirs(cache, exist_ok=True)
    csv_path = os.path.join(cache, "sri_460k.csv")
    if not os.path.exists(csv_path):
        write_sri_csv(csv_path, n=460550, seed=20250702, n_codes=660000)
    out_dir = os.path.join(cache, "sri_star_out")
    shutil.rmtree(out_dir, ignore_errors=True)

    t0 = time.perf_counter()
    tables = run_pipeline(spark, csv_path, EtlConfig(mode="fixed"))
    write_star(tables, out_dir)
    elapsed = time.perf_counter() - t0
    n_fact = spark.read.parquet(
        os.path.join(out_dir, "fact_registro_vehiculos")
    ).count()
    n_veh = tables["dim_vehiculo"].count()
    spark.catalog.clearCache()  # releases the 5 star tables AND the src scan
    return {
        "sec": round(elapsed, 4),
        "fact_rows": n_fact,
        "dim_vehiculo_rows": n_veh,
        "source_rows": 460550,
    }


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


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

    ext_names = [n for n in EXTENDED if n in queries]
    for name in ext_names:  # warm-up, as for the headline set
        queries[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        unpersist_all()
    ext_timings: dict[str, float] = {}
    for name in ext_names:
        t0 = time.perf_counter()
        queries[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        ext_timings[name] = round(time.perf_counter() - t0, 4)
        unpersist_all()

    # production-scale ETL replay (BASELINE.md's reference-derived target);
    # runs after the timed query pass so it never contends with it. Kept out
    # of the headline total so `value` stays comparable across rounds.
    replay = sri_etl_replay(spark)

    # CPU self-calibration: a fixed JVM-side workload whose time depends only
    # on host speed, not on this repo's code. Cross-round bench comparisons
    # divide by this to separate code regressions from host-speed changes
    # (observed: identical code measured ~2x apart across round drivers).
    calib = min(
        _timed(lambda: spark.range(500_000_000).selectExpr("sum(id * 2)").collect())
        for _ in range(3)
    )

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
                "sri_etl_replay": replay,
                "extended_queries": ext_timings,
                "calibration": {"range_sum_500m_sec": round(calib, 4)},
            }
        )
    )


if __name__ == "__main__":
    main()
