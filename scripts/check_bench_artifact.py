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
or restore the one from the driver's round-close commit); exit 2 = the
captured fragment is too short to vouch for anything (ADVICE r9: a
closing-brace-sized fragment would be a substring of ANY run — require a
minimum fragment length, falling back to comparing the artifact's `value`
field when the fragment happens to contain it).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# below this the containment test degenerates (generic JSON fragments like
# '}}' or a repeated key match any run of the same bench)
MIN_FRAGMENT_BYTES = 200


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
        if len(frag) < MIN_FRAGMENT_BYTES:
            # too short for containment to mean anything; a stable scalar
            # like the artifact's total `value` still identifies the run
            m_frag = re.search(r'"value":\s*([0-9.]+)', frag)
            m_full = re.search(r'"value":\s*([0-9.]+)', full)
            if m_frag and m_full:
                if m_frag.group(1) == m_full.group(1):
                    print(f"bench-artifact check: r{k:02d} OK — short "
                          f"fragment ({len(frag)} bytes) but the artifact "
                          f"'value' field matches ({m_frag.group(1)})")
                    return 0
                print(f"bench-artifact check FAILED: r{k:02d} short fragment "
                      f"carries value={m_frag.group(1)} but the committed "
                      f"copy has value={m_full.group(1)} — different run.")
                return 1
            print(f"bench-artifact check INCONCLUSIVE: r{k:02d} driver tail "
                  f"fragment is only {len(frag)} bytes (<{MIN_FRAGMENT_BYTES}) "
                  f"and carries no comparable 'value' field — cannot vouch "
                  f"that the committed docs/BENCH_full_r{k:02d}.json is the "
                  f"same run. Inspect both by hand.")
            return 2
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
