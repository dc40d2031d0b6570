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
    # r14 (round-13 verdict item 7): exact n-gram Jaccard — the quadratic-
    # in-collisions baseline — gets the same decade evidence as its LSH
    # approximation
    "jaccard_replay_10x",
    # r13 (round-12 verdict item 4): span-grain dedup, the most
    # shuffle-intensive dedup grain, gets the same decade evidence
    "spans_replay_10x",
    "events_replay_10x",
    "graph_replay_10x",
    "ann_replay_10x",
    "keepbest_replay_10x",
    # r12: the composed corpus pipeline is a replay block too — it carries
    # no growth ratios (single-point), but listing it here puts it under
    # the error-block check and the plan-integrity gate
    # (tests/test_replay_plan_integrity.py) like every other family
    "corpus_pipeline_replay",
)
TOLERANCE = 0.25

# Round-11 verdict item 2: absolute bands for decade growths whose
# superlinearity is a MEASURED single-host artifact (knob forensics:
# docs/ETL_100X_knobs_r11.json, docs/GRAPH_100X_knobs_r12.json,
# conclusion in docs/SCALE.md). Observed quiet-host range: ETL 9.15-13.18
# across r8-r10 (10.69 at the r11 128-reducer layout). Graph was RE-PINNED
# in r12: every pre-r12 graph number measured a count-pruned plan (the r11
# verdict's one real defect); the honest noop-sink evaluation measures
# 10x->100x growth 9.74 on a quiet host (1x 5.9 s / 10x 26.0 s / 100x
# 253.3 s, 117M arcs), so the same (4, 15) band holds with real evidence
# behind it. The CEILING catches a plan regression that makes the 100x
# point grow worse than the documented envelope; the floor catches a
# structurally broken point (a skipped or truncated 100x build reads near
# 1x). Lower values inside the band are improvements, never failures.
# r12 adds the events window_agg band after its knob forensics (the r11
# watch item): see docs/EVENTS_100X_knobs_r12.json.
GROWTH_BANDS: dict[str, tuple[float, float]] = {
    "sri_etl_replay_100x.growth_vs_10x": (4.0, 15.0),
    "graph_replay_10x.time_growth_10x_to_100x": (4.0, 15.0),
    # r11 watch item, resolved r12: the honest (noop-sink) window_agg
    # decade reads 5.81 and its 100x point is ZERO-spill at both layouts
    # with a 10-12 MiB map-side-combined shuffle
    # (docs/EVENTS_100X_knobs_r12.json) — the r11 7.07x reading came from
    # the count-pruned plan plus overhead-washout on sub-second smaller
    # points. Generous first-reading band; tighten after a second quiet
    # reading per the r10 convention.
    "events_replay_10x.window_agg_growth_10x_to_100x": (2.0, 12.0),
}


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
    # absolute band check: each pinned growth must sit inside its band in
    # BOTH runs (independent of how well the two runs agree)
    for field, (lo, hi) in sorted(GROWTH_BANDS.items()):
        block = field.split(".", 1)[0]
        for run_label, artifact in (("run_a", a), ("run_b", b)):
            blk = artifact.get(block) or {}
            val = blk.get(field.split(".", 1)[1])
            if val is None:
                continue  # older artifact without this point: not checked
            ok = lo <= float(val) <= hi
            rows.append(
                {
                    "field": f"band:{field}",
                    "run": run_label,
                    "value": val,
                    "band": [lo, hi],
                    "ok": ok,
                }
            )
            if not ok:
                failures.append(f"band:{field}:{run_label}")
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
