"""Round-9 verdict item 2: the committed docs/BENCH_full_r{K}.json must be
the SAME run whose output the driver's BENCH_r{K}.json captured — round 8
closed with a different same-HEAD run committed at HEAD while the real
final run sat uncommitted, making the next round's regression floor
ambiguous.

For the newest round K with both artifacts present, assert the driver's
captured tail is a fragment of the committed full line. The driver keeps
only the TAIL of bench's stdout (often truncating the artifact line's
head), so fragment containment is the strongest available equality: every
byte the driver saw must appear verbatim in the committed copy.

Exit 0 = equal or nothing to check; exit 1 = the committed full copy is a
different run (re-run `python bench.py` and commit docs/BENCH_full_r{K}.json,
or restore the one from the driver's round-close commit).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    rounds = []
    for path in glob.glob(os.path.join(HERE, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if m:
            rounds.append((int(m.group(1)), path))
    for k, tail_path in sorted(rounds, reverse=True):
        full_path = os.path.join(HERE, "docs", f"BENCH_full_r{k:02d}.json")
        if not os.path.exists(full_path):
            continue
        with open(tail_path) as f:
            rec = json.load(f)
        tail = (rec.get("tail") or "") + (rec.get("output") or "")
        if rec.get("rc") not in (0, None) or not tail.strip():
            print(f"bench-artifact check: r{k:02d} driver run rc="
                  f"{rec.get('rc')} / empty tail — nothing to compare")
            return 0
        # the artifact line is the LAST line bench prints; compare the
        # tail's final line-fragment against the committed full line
        frag = tail.strip().splitlines()[-1]
        with open(full_path) as f:
            full = f.read()
        if frag in full:
            print(f"bench-artifact check: r{k:02d} OK — driver tail "
                  f"({len(frag)} bytes) matches committed "
                  f"docs/BENCH_full_r{k:02d}.json")
            return 0
        print(f"bench-artifact check FAILED: BENCH_r{k:02d}.json's tail is "
              f"NOT from the run committed as docs/BENCH_full_r{k:02d}.json "
              f"— the regression floor is ambiguous. Commit the driver's "
              f"final run.")
        return 1
    print("bench-artifact check: no round with both artifacts — skipped")
    return 0


if __name__ == "__main__":
    sys.exit(main())
