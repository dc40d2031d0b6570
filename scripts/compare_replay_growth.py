"""Replay growth-ratio reproducibility check (round-9 verdict item 1's
done-criterion): two same-host bench runs must agree within 25% on every
published replay growth ratio.

    python scripts/compare_replay_growth.py runA.json runB.json

Each argument is a full bench artifact (docs/BENCH_full_r*.json or a
saved bench stdout's last line). Compares every scalar field whose name
contains "growth" inside the replay blocks, plus the replay `sec`
medians themselves (informational). Exit 1 if any growth ratio differs
by more than 25% between the runs; exit 2 if a replay block carries an
`error` key in either run or a growth field exists in only one run —
a crashed or partially-missing replay family must not pass the
reproducibility gate vacuously (ADVICE r9).
"""

from __future__ import annotations

import json
import sys

REPLAY_BLOCKS = (
    "sri_etl_replay",
    "sri_etl_replay_10x",
    "sri_etl_replay_100x",
    "dedup_replay_10x",
    "events_replay_10x",
    "graph_replay_10x",
    "ann_replay_10x",
    "keepbest_replay_10x",
)
TOLERANCE = 0.25


def _load(path: str) -> dict:
    with open(path) as f:
        text = f.read().strip()
    return json.loads(text.splitlines()[-1])


def _growth_fields(block: dict, prefix: str) -> dict[str, float]:
    out = {}
    for k, v in block.items():
        if isinstance(v, (int, float)) and "growth" in k:
            out[f"{prefix}.{k}"] = float(v)
    return out


def main() -> int:
    a, b = _load(sys.argv[1]), _load(sys.argv[2])
    failures, structural, rows = [], [], []
    for name in REPLAY_BLOCKS:
        blk_a, blk_b = a.get(name) or {}, b.get(name) or {}
        if "error" in blk_a or "error" in blk_b:
            rows.append({"field": name, "status": "ERROR-BLOCK", "a": blk_a.get("error"), "b": blk_b.get("error")})
            structural.append(f"{name} (error block)")
            continue
        ga, gb = _growth_fields(blk_a, name), _growth_fields(blk_b, name)
        # a growth field present in only ONE run means that family crashed
        # or was skipped mid-way in the other — that is a structural failure,
        # not a silent skip (a block absent from BOTH runs is fine: older
        # artifacts legitimately predate newer replay families)
        for field in sorted(set(ga) ^ set(gb)):
            rows.append({"field": field, "status": "ONE-SIDED",
                         "run_a": ga.get(field), "run_b": gb.get(field)})
            structural.append(f"{field} (one-sided)")
        for field in sorted(set(ga) & set(gb)):
            va, vb = ga[field], gb[field]
            if va <= 0 or vb <= 0:
                continue
            rel = abs(va - vb) / min(va, vb)
            ok = rel <= TOLERANCE
            rows.append(
                {
                    "field": field,
                    "run_a": va,
                    "run_b": vb,
                    "rel_diff": round(rel, 4),
                    "ok": ok,
                }
            )
            if not ok:
                failures.append(field)
    print(json.dumps({"tolerance": TOLERANCE, "checks": rows}, indent=1))
    if structural:
        print(f"FAIL (structural): {len(structural)} replay block/field(s) "
              f"crashed or one-sided: {structural}")
        return 2
    if failures:
        print(f"FAIL: {len(failures)} growth ratio(s) beyond 25%: {failures}")
        return 1
    n = sum(1 for r in rows if r.get("ok"))
    print(f"OK: all {n} shared growth ratios agree within 25%")
    return 0


if __name__ == "__main__":
    sys.exit(main())
