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


def _benched_queries() -> list[str]:
    """Round-7 verdict item 7: the audit covers EVERY benched query —
    bench.py's HEADLINE + EXTENDED sets plus text_zipf_stats (audited
    since round 5; kept so its floor history stays comparable) — so the
    deterministic shuffle-bytes gate spans the whole bench surface, not a
    hand-picked subset."""
    import bench

    names = list(bench.HEADLINE) + list(bench.EXTENDED)
    if "text_zipf_stats" not in names:
        names.append("text_zipf_stats")
    return names


QUERIES = _benched_queries()


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
    # round derivation is owned by bench._current_round — one definition,
    # one fallback (a fresh checkout writes SHUFFLE_r01 next to
    # BENCH_full_r01, never r00)
    import bench

    n = bench._current_round()
    path = os.path.join(here, "docs", f"SHUFFLE_r{n:02d}.json")
    doc = {
        "sf_dir": SF,
        "unit": "MiB",
        "queries": out,
        "regression": shuffle_regression_block(here, n, out),
    }
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc))
    print(f"wrote {path}")
    reg = doc["regression"]
    if reg and reg["counts"]["regressed"]:
        sys.exit(1)


def shuffle_regression_block(here: str, this_round: int, out: dict) -> dict | None:
    """Deterministic scale-cost gate (round-5 verdict item 2): shuffle
    bytes — unlike wall time — do not jitter with host load, so a >20%
    growth against the newest committed prior-round audit is a real plan
    change, not noise. A query regresses if its total shuffle traffic
    (write + read) grows >20% AND >1 MiB (the absolute floor keeps
    kilobyte-scale metadata queries from tripping on rounding), or if its
    disk spill exceeds max(1 MiB, 1.2x the floor's spill) — the absolute
    1 MiB arm catches new spill where the floor had none, the relative arm
    catches growth of existing spill without a nonzero floor permanently
    disabling detection. Floor queries absent from the current
    audit are reported as `missing` (visible coverage shrink, not a
    failure — an intentional rename clears on the next floor)."""
    import glob
    import re

    floors = sorted(
        (int(re.search(r"SHUFFLE_r(\d+)", p).group(1)), p)
        for p in glob.glob(os.path.join(here, "docs", "SHUFFLE_r*.json"))
        if int(re.search(r"SHUFFLE_r(\d+)", p).group(1)) < this_round
    )
    if not floors:
        return None
    floor_round, floor_path = floors[-1]
    with open(floor_path) as f:
        floor = json.load(f)["queries"]
    per_query, counts = {}, {"ok": 0, "regressed": 0, "new": 0, "missing": 0}
    for name in sorted(set(floor) - set(out)):
        counts["missing"] += 1
        per_query[name] = "missing (in floor, not in this audit)"
    for name, m in sorted(out.items()):
        base = floor.get(name)
        if base is None:
            counts["new"] += 1
            per_query[name] = "new"
            continue
        cur = m["shuffle_write_mb"] + m["shuffle_read_mb"]
        ref = base["shuffle_write_mb"] + base["shuffle_read_mb"]
        # spill trips when current spill exceeds max(1 MiB, 1.2x the
        # floor's spill) — a nonzero (even sub-MiB) floor spill must not
        # permanently disable detection, and growth of EXISTING spill
        # (2 -> 200 MiB) is exactly the regression this gate is for
        base_spill = base.get("spill_disk_mb", 0) or 0
        spilled = m["spill_disk_mb"] > max(1.0, base_spill * 1.2)
        grew = cur > ref * 1.2 and cur - ref > 1.0
        ratio = round(cur / ref, 2) if ref else None
        shown = f"{ratio}x" if ratio is not None else "from 0 MiB"
        if grew or spilled:
            counts["regressed"] += 1
            why = "spill" if spilled else shown
            per_query[name] = f"regressed:{why} ({ref}->{round(cur, 2)} MiB)"
        else:
            counts["ok"] += 1
            per_query[name] = f"ok:{shown}"
    return {
        "floor": os.path.basename(floor_path),
        "threshold": (
            "shuffle(write+read) > 1.2x floor and > +1 MiB, "
            "or spill > max(1 MiB, 1.2x floor spill)"
        ),
        "counts": counts,
        "per_query": per_query,
    }


if __name__ == "__main__":
    main()
