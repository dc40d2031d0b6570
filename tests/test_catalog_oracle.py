"""Every catalog query vs its DuckDB oracle (local replica of the driver's
correctness gate), at sf0.001 by default."""

from __future__ import annotations

import pytest

# r14: slow tier — duplicates the driver's own per-round CORRECTNESS
# sweep and scripts/driver_sim.py; re-proven at round close (pytest.ini)
pytestmark = pytest.mark.slow

from sri_spark.plans import all_oracles, all_queries
from tests.oracle_harness import compare_query


def _pairs():
    q = all_queries()
    o = all_oracles()
    return sorted(o.keys() & q.keys())


@pytest.mark.parametrize("name", _pairs())
def test_query_matches_oracle(spark, sf_dir, name):
    compare_query(spark, name, all_queries()[name], all_oracles()[name], sf_dir)


def test_every_query_has_entry():
    q = all_queries()
    assert len(q) >= 15
    missing_oracle = sorted(set(q) - set(all_oracles()))
    # non-SQL-expressible ops are allowed to be rows-only; keep the list visible
    print("rows-only queries:", missing_oracle)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == [
        "Anio",
        "Nacion",
        "Segmento",
        "total_registros",
        "precio_promedio",
        "monto_total",
    ]
