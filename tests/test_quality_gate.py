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
