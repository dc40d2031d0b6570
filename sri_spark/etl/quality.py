"""Data-quality validation (reference dags/sri_vehiculos_etl_dag.py:647-760).

The reference computes these metrics and only logs them; the declared
thresholds in config/variables.yaml:44-48 are consumed by nothing (SURVEY
§5.1). Here the same metrics are computed Spark-side and the thresholds are
actually enforced when ``enforce=True`` (SURVEY §5.2 quality gate).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class QualityThresholds:
    # values the reference declares in config/variables.yaml:44-48
    max_null_percentage: float = 10.0
    min_records_threshold: int = 1000
    duplicate_check: bool = True


def quality_report(
    tables: dict[str, DataFrame],
    thresholds: QualityThresholds | None = None,
    *,
    enforce: bool = False,
) -> dict:
    """Compute the reference's validation metrics; optionally assert."""
    t = tables
    report: dict = {}

    report["dim_tiempo"] = (
        t["dim_tiempo"]
        .agg(
            F.count("*").alias("total_registros"),
            F.countDistinct("Anio").alias("anios_unicos"),
            F.date_format(F.min("FechaCompleta"), "yyyy-MM-dd").alias("fecha_min"),
            F.date_format(F.max("FechaCompleta"), "yyyy-MM-dd").alias("fecha_max"),
        )
        .first()
        .asDict()
    )
    report["dim_vehiculo"] = (
        t["dim_vehiculo"]
        .agg(
            F.count("*").alias("total_registros"),
            F.countDistinct("Marca").alias("marcas_unicas"),
            F.countDistinct("Clase").alias("clases_unicas"),
        )
        .first()
        .asDict()
    )
    report["dim_transaccion"] = (
        t["dim_transaccion"]
        .agg(
            F.count("*").alias("total_registros"),
            F.countDistinct("TipoTransaccion").alias("tipos_transaccion"),
        )
        .first()
        .asDict()
    )
    report["dim_ubicacion"] = (
        t["dim_ubicacion"]
        .agg(
            F.count("*").alias("total_registros"),
            F.countDistinct("Provincia").alias("provincias_unicas"),
            F.countDistinct("Region").alias("regiones_unicas"),
        )
        .first()
        .asDict()
    )
    fact = t["fact_registro_vehiculos"]
    report["fact_registro_vehiculos"] = fact.agg(
        F.count("*").alias("total_registros"),
        F.sum("CantidadRegistros").alias("total_cantidad"),
        F.avg("MontoAvaluo").alias("avaluo_promedio"),
        F.count(F.when(F.col("ID_Tiempo").isNull(), 1)).alias("registros_sin_tiempo"),
        F.count(F.when(F.col("ID_Vehiculo").isNull(), 1)).alias("registros_sin_vehiculo"),
    ).first().asDict()

    # referential-integrity probe: 4-way inner star join count (:735-748);
    # bounded dims (tiempo/transaccion/ubicacion) are hint-broadcast;
    # dim_vehiculo grows with the data, so AQE decides its join strategy
    ri = (
        fact.join(F.broadcast(t["dim_tiempo"].select("ID_Tiempo")), "ID_Tiempo")
        .join(t["dim_vehiculo"].select("ID_Vehiculo"), "ID_Vehiculo")
        .join(F.broadcast(t["dim_transaccion"].select("ID_Transaccion")), "ID_Transaccion")
        .join(F.broadcast(t["dim_ubicacion"].select("ID_Ubicacion")), "ID_Ubicacion")
        .count()
    )
    report["registros_con_integridad"] = ri

    if enforce:
        th = thresholds or QualityThresholds()
        errors = []
        fact_n = report["fact_registro_vehiculos"]["total_registros"]
        if fact_n < th.min_records_threshold:
            errors.append(
                f"fact rows {fact_n} < min_records_threshold {th.min_records_threshold}"
            )
        for fk in ("registros_sin_tiempo", "registros_sin_vehiculo"):
            nulls = report["fact_registro_vehiculos"][fk]
            pct = 100.0 * nulls / max(fact_n, 1)
            if pct > th.max_null_percentage:
                errors.append(f"{fk} {pct:.1f}% > max_null_percentage")
        if th.duplicate_check:
            dup = fact_n - t["fact_registro_vehiculos"].select("ID_Registro").distinct().count()
            if dup:
                errors.append(f"{dup} duplicate ID_Registro values")
        if errors:
            raise AssertionError("; ".join(errors))
    return report
