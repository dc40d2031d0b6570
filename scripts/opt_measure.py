"""Per-query optimization harness for the optimization rounds.

Times named catalog queries with EXACTLY the bench methodology (untimed
warm-up pass, then median-of-3 noop-sink executions, unpersist_all between
runs) so numbers here are comparable to bench.py's, and optionally dumps
`explain('formatted')` to plans/r13/<query>_<tag>.txt — the before/after
evidence the optimization round commits.

Usage:
    python scripts/opt_measure.py q1 q2 ...            # time only
    python scripts/opt_measure.py --explain before q1  # also dump plans
    python scripts/opt_measure.py --repeats 5 q1
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--explain", default=None, metavar="TAG",
                    help="dump explain('formatted') to plans/r{N}/<q>_<TAG>.txt "
                         "(N = the current round, from bench._current_round)")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    from sri_spark.operators.caching import unpersist_all
    from sri_spark.plans import all_queries
    from sri_spark.session import get_spark

    spark = get_spark("sri_spark-opt-measure")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    import bench

    plans_dir = os.path.join(here, "plans", f"r{bench._current_round()}")

    out: dict[str, float] = {}
    for name in args.queries:
        if name not in queries:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"opt:{name}")
        if args.explain:
            os.makedirs(plans_dir, exist_ok=True)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                queries[name](spark, SF_DIR).explain("formatted")
            with open(os.path.join(plans_dir, f"{name}_{args.explain}.txt"), "w") as f:
                f.write(buf.getvalue())
            unpersist_all()

        def run():
            queries[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            unpersist_all()

        run()  # warm-up, untimed (JIT, codegen caches, footer reads)
        ts = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            run()
            ts.append(time.perf_counter() - t0)
        ts.sort()
        out[name] = round(ts[len(ts) // 2], 4)
        print(f"{name}: median {out[name]}s  (all: {[round(t, 3) for t in ts]})",
              flush=True)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
