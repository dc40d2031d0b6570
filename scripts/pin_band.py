"""Quiet-host band measurement for watch-list queries (PLANS.md recipe).

For each named catalog query: one untimed warm-up, then N timed
executions through the noop sink (scoped persists released between
runs), reporting min/median/max wall plus the plan's shuffle exchange
count — the inputs the PLANS.md expected-band entries pin. Run alone on
the host (any concurrent Spark work inflates readings 30%+).

    python scripts/pin_band.py flagship_star_rollup events_sessionize [-n 5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("-n", "--repeats", type=int, default=5)
    args = ap.parse_args()

    from sri_spark.operators.caching import unpersist_all
    from sri_spark.plans import all_queries
    from sri_spark.session import get_spark

    spark = get_spark("pin-band")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    for name in args.names:
        fn = queries[name]

        def run():
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            unpersist_all()

        run()  # warm-up
        times = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            run()
            times.append(round(time.perf_counter() - t0, 4))
        times.sort()
        plan = fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        print(
            json.dumps(
                {
                    "query": name,
                    "repeats": args.repeats,
                    "min": times[0],
                    "median": times[len(times) // 2],
                    "max": times[-1],
                    "all": times,
                    "shuffle_exchanges": plan.count("Exchange")
                    - plan.count("BroadcastExchange")
                    - plan.count("ReusedExchange"),
                }
            )
        )


if __name__ == "__main__":
    main()
