"""Bench regression gate: compare a fresh bench.py run against the recorded
floor and fail (exit 1) if any headline query regressed.

Floor = the newest BENCH_r*.json in the repo root (BENCH_r01.json is the
round-1 floor: 23 queries, 18.75 s total at sf0.1 on local[32]) unless a
baseline path is given explicitly.

A query REGRESSES when it is both >2x its floor time AND >0.5 s absolutely
slower — the absolute guard keeps sub-100 ms queries from tripping the gate
on scheduler jitter. New queries (no floor entry) are reported, not failed.

Usage:
    python bench.py > /tmp/bench_new.json
    python scripts/bench_regression.py /tmp/bench_new.json [BASELINE.json]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RATIO_LIMIT = 2.0
ABS_SLACK_SEC = 0.5


def latest_floor() -> str:
    candidates = sorted(
        glob.glob(os.path.join(REPO, "BENCH_r*.json")),
        key=lambda p: int(re.search(r"BENCH_r(\d+)", p).group(1)),
    )
    if not candidates:
        raise SystemExit("no BENCH_r*.json floor found in repo root")
    return candidates[-1]


def load(path: str) -> dict:
    with open(path) as f:
        text = f.read()
    # either the raw bench line (possibly amid log noise) or the driver's
    # BENCH_r*.json wrapper, which embeds the line in a "tail" string
    try:
        doc = json.loads(text)
        if "queries" in doc:
            return doc
        text = doc.get("tail", "")
    except json.JSONDecodeError:
        pass
    out = None
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                cand = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "queries" in cand:
                out = cand
    if out is None:
        raise SystemExit(f"{path}: no JSON bench line found")
    # r4+ artifacts merge the former extended set into `queries`; merge here
    # too so r1-r3 floors compare per-query instead of reporting NEW rows
    out["queries"] = {**out["queries"], **out.get("extended_queries", {})}
    return out


def main() -> None:
    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    new = load(sys.argv[1])
    floor_path = sys.argv[2] if len(sys.argv) > 2 else latest_floor()
    floor = load(floor_path)

    nq, fq = new["queries"], floor["queries"]

    # Host-speed normalization: both artifacts carry a CPU self-calibration
    # (a fixed spark.range sum whose time depends only on the host), so a
    # uniformly slower machine doesn't read as a code regression. Floor
    # times are scaled by the calibration ratio; artifacts without one
    # (rounds 1-2) compare raw.
    host = 1.0
    nc = (new.get("calibration") or {}).get("range_sum_500m_sec")
    fc = (floor.get("calibration") or {}).get("range_sum_500m_sec")
    if nc and fc:
        host = nc / fc
    else:
        # floors recorded before the calibration field existed: estimate the
        # host factor as the MEDIAN per-query ratio — robust, because a
        # uniform host slowdown moves the median while a genuine single-query
        # regression cannot. Only applied when the shift is clearly
        # host-shaped (median ratio > 1.1 across >= 10 common queries).
        import statistics

        ratios = [
            nq[k] / fq[k] for k in nq.keys() & fq.keys() if fq.get(k)
        ]
        if len(ratios) >= 10:
            med = statistics.median(ratios)
            if med > 1.1:
                # CAP the inferred factor: an uncapped median would also
                # normalize away a genuine broad code regression (e.g. a
                # session-wide config change slowing most queries ~1.2x).
                # Calibrated artifacts (r3+) never take this branch.
                MEDIAN_CAP = 2.5
                host = min(med, MEDIAN_CAP)
                over = sum(1 for r in ratios if r > RATIO_LIMIT)
                print(
                    f"WARNING: no calibration in floor — applying MEDIAN "
                    f"per-query ratio {med:.2f}x (capped at {MEDIAN_CAP}x) as "
                    f"host factor; {over}/{len(ratios)} common queries exceed "
                    f"the {RATIO_LIMIT}x limit PRE-normalization. If this is "
                    f"not a known slow host, treat as a broad regression."
                )

    regressions, improved, added = [], [], []
    for name, t in sorted(nq.items()):
        base = fq.get(name)
        if base is None:
            added.append(name)
            continue
        base = base * host
        if t > base * RATIO_LIMIT and t - base > ABS_SLACK_SEC:
            regressions.append((name, base, t))
        elif t < base * 0.8:
            improved.append((name, base, t))

    print(f"floor: {os.path.basename(floor_path)} total={floor['value']}s; "
          f"new total={new['value']}s"
          + (f"; host-speed factor {host:.2f}x applied to floor" if host != 1.0 else ""))
    for name in added:
        print(f"  NEW      {name}: {nq[name]}s (no floor entry)")
    for name, base, t in improved:
        print(f"  IMPROVED {name}: {base}s -> {t}s")
    for name, base, t in regressions:
        print(f"  REGRESSED {name}: {base}s -> {t}s (> {RATIO_LIMIT}x + "
              f"{ABS_SLACK_SEC}s)")
    if regressions:
        sys.exit(1)
    print("bench regression gate: PASS")


if __name__ == "__main__":
    main()
