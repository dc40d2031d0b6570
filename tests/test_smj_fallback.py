"""EtlConfig.broadcast_lookups=False — the scale flag's path, exercised.

The fact build broadcasts its dimension lookups by default (right for
dims up to a few hundred MB). The config documents a fallback for dims
that outgrow executor memory: broadcast_lookups=False drops the hints and
lets Catalyst/AQE pick the strategy (sort-merge with skew splitting).
Round-5 verdict item 8: prove the flag's path is EXERCISED, not just
documented — the fallback plan really sort-merge-joins when broadcast is
off the table, and it produces the identical fact table.
"""

from __future__ import annotations

import datetime as dt

import pytest

from sri_spark.etl import EtlConfig, run_pipeline

from tests.sri_fixture import write_sri_csv

RUN_DATE = dt.date(2025, 7, 2)


@pytest.fixture(scope="module")
def csv_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("sri_smj") / "sri_vehiculos.csv"
    write_sri_csv(str(path), n=1500, seed=23)
    return str(path)


def _fact_rows(tables):
    fact = tables["fact_registro_vehiculos"]
    return sorted(
        tuple(r) for r in fact.select(sorted(fact.columns)).collect()
    )


def test_smj_fallback_plan_and_parity(spark, csv_path):
    """With broadcast hints off AND autoBroadcast disabled (the situation
    the flag exists for: no dim fits in memory), the executed fact plan
    must contain SortMergeJoin and zero broadcast joins — and the rows
    must match the broadcast path exactly."""
    baseline = _fact_rows(
        run_pipeline(spark, csv_path, EtlConfig(mode="fixed", run_date=RUN_DATE))
    )
    # hint nodes are erased in plan canonicalization, so the hint-free
    # rebuild would silently reuse the broadcast-built fact CACHE instead
    # of planning its own joins — drop it to force a real re-plan
    spark.catalog.clearCache()

    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        tables = run_pipeline(
            spark,
            csv_path,
            EtlConfig(
                mode="fixed", run_date=RUN_DATE, broadcast_lookups=False
            ),
        )
        fact = tables["fact_registro_vehiculos"]
        plan = fact._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "BroadcastHashJoin" not in plan, plan
        assert _fact_rows(tables) == baseline
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)


def test_broadcast_hint_still_wins_when_enabled(spark, csv_path):
    """The default path must keep broadcasting even under a disabled
    autoBroadcast threshold — that is what the explicit hint is FOR
    (dimension-sized sides should never sort-merge at any threshold)."""
    spark.catalog.clearCache()  # same canonicalization trap as above
    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        tables = run_pipeline(
            spark, csv_path, EtlConfig(mode="fixed", run_date=RUN_DATE)
        )
        plan = (
            tables["fact_registro_vehiculos"]
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)


def _table_rows(tables, name):
    df = tables[name]
    rows = [tuple(r) for r in df.select(sorted(df.columns)).collect()]
    # NULLs sort first: Python can't compare None with non-None directly.
    return sorted(rows, key=lambda t: tuple((v is not None, v) for v in t))


def test_scalable_keys_identical_star(spark, csv_path):
    """EtlConfig.scalable_keys swaps the global-sort surrogate keys — the
    fact's ID_Registro AND the data-sized dim_vehiculo's ID_Vehiculo — for
    the sort-free two-phase ranking (operators.keys.add_surrogate_key_scalable).
    Same total order by contract, so every key VALUE, every dim row, and
    every joined fact row must be identical to the default window path."""
    base = run_pipeline(
        spark, csv_path, EtlConfig(mode="fixed", run_date=RUN_DATE)
    )
    baseline = {
        name: _table_rows(base, name)
        for name in ("dim_vehiculo", "fact_registro_vehiculos")
    }
    spark.catalog.clearCache()  # drop the persisted star before re-planning
    scal = run_pipeline(
        spark,
        csv_path,
        EtlConfig(mode="fixed", run_date=RUN_DATE, scalable_keys=True),
    )
    for name, want in baseline.items():
        assert _table_rows(scal, name) == want, name
    spark.catalog.clearCache()


def test_scalable_keys_identical_dim_parity_mode(spark, csv_path):
    """Parity mode orders dim_vehiculo keys by first-occurrence file order
    (min __src_id) — also a unique total order, so the scalable keyer must
    reproduce the exact parity key assignment too."""
    base = run_pipeline(
        spark, csv_path, EtlConfig(mode="parity", run_date=RUN_DATE)
    )
    want = _table_rows(base, "dim_vehiculo")
    spark.catalog.clearCache()
    scal = run_pipeline(
        spark,
        csv_path,
        EtlConfig(mode="parity", run_date=RUN_DATE, scalable_keys=True),
    )
    assert _table_rows(scal, "dim_vehiculo") == want
    spark.catalog.clearCache()
