"""Quality-gate failure paths: the thresholds actually reject bad data."""

from __future__ import annotations

import pytest

from sri_spark.etl.quality import QualityThresholds, quality_report


def _star(spark, fact_rows):
    tiempo = spark.createDataFrame(
        [(1, "2024-01-01")], "ID_Tiempo long, FechaCompleta string"
    ).selectExpr("ID_Tiempo", "CAST(FechaCompleta AS DATE) AS FechaCompleta",
                 "2024L AS Anio")
    veh = spark.createDataFrame([(1, "HINO", "CAMION")],
                                "ID_Vehiculo long, Marca string, Clase string")
    tra = spark.createDataFrame([(1, "COMPRA LOCAL")],
                                "ID_Transaccion long, TipoTransaccion string")
    ubi = spark.createDataFrame([(1, "AZUAY", "SIERRA")],
                                "ID_Ubicacion long, Provincia string, Region string")
    fact = spark.createDataFrame(
        fact_rows,
        "ID_Registro long, ID_Tiempo long, ID_Vehiculo long, "
        "ID_Transaccion long, ID_Ubicacion long, CantidadRegistros long, "
        "MontoAvaluo double",
    )
    return {
        "dim_tiempo": tiempo, "dim_vehiculo": veh, "dim_transaccion": tra,
        "dim_ubicacion": ubi, "fact_registro_vehiculos": fact,
    }


def test_min_records_threshold_rejects(spark):
    t = _star(spark, [(1, 1, 1, 1, 1, 1, 10.0)])
    with pytest.raises(AssertionError, match="min_records_threshold"):
        quality_report(t, QualityThresholds(min_records_threshold=1000), enforce=True)
    # and passes when the threshold admits the data
    rep = quality_report(t, QualityThresholds(min_records_threshold=1), enforce=True)
    assert rep["registros_con_integridad"] == 1


def test_duplicate_ids_reject(spark):
    rows = [(1, 1, 1, 1, 1, 1, 10.0)] * 2
    t = _star(spark, rows)
    with pytest.raises(AssertionError, match="duplicate"):
        quality_report(t, QualityThresholds(min_records_threshold=1), enforce=True)


def test_null_fk_gate_observable_without_fill(spark, tmp_path):
    """With fill_missing_fk=False, out-of-calendar dates leave ID_Tiempo null
    and the max_null_percentage threshold actually fires (the reference's
    fill-then-validate order made this check vacuous)."""
    import csv as csvmod

    from sri_spark.etl import EtlConfig, run_pipeline
    from tests.sri_fixture import HEADER, generate_sri_rows

    rows = generate_sri_rows(200, seed=3)
    date_idx = HEADER.index("FECHA PROCESO (DD/MM/AA)")
    for r in rows:
        r[date_idx] = "6/15/2030"  # parses fine; outside the 2020-2025 calendar
    path = tmp_path / "futuro.csv"
    with open(path, "w", newline="", encoding="utf-8") as f:
        w = csvmod.writer(f)
        w.writerow(HEADER)
        w.writerows(rows)

    t = run_pipeline(
        spark, str(path), EtlConfig(mode="fixed", fill_missing_fk=False)
    )
    with pytest.raises(AssertionError, match="max_null_percentage"):
        quality_report(t, QualityThresholds(min_records_threshold=1), enforce=True)

    # default reference semantics: same data passes (fills mask the misses)
    t2 = run_pipeline(spark, str(path), EtlConfig(mode="fixed"))
    rep = quality_report(t2, QualityThresholds(min_records_threshold=1), enforce=True)
    assert rep["fact_registro_vehiculos"]["registros_sin_tiempo"] == 0
