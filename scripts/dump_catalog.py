"""Regenerate CATALOG.md: an index of every registered catalog query —
name, module, first docstring line, oracle status."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as e

qs, os_ = e.queries(), e.oracle_sql()

HEADER = """# CATALOG — the query/operator registry

One row per `__spark_entry__.queries()` entry (regenerate with
`python scripts/dump_catalog.py`). Every query is paired with a DuckDB
oracle (`oracle_sql()`), so the driver's correctness gate value-hashes each
one against an independent engine at sf0.01; `CORRECTNESS_full_r{N}.json`
records the full sweep.

| # | Query | Module | What it computes |
|---|---|---|---|
"""

rows = []
for i, name in enumerate(sorted(qs), 1):
    fn = qs[name]
    mod = fn.__module__.replace("sri_spark.plans.", "")
    doc = (fn.__doc__ or "").strip().split("\n")[0].strip()
    oracle = "" if name in os_ else " **(rows-only)**"
    rows.append(f"| {i} | `{name}` | {mod} | {doc}{oracle} |")

with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "CATALOG.md"), "w") as fh:
    fh.write(HEADER + "\n".join(rows) + "\n")
print(f"wrote CATALOG.md ({len(rows)} queries, {len(os_)} oracles)")
