"""Business metrics (reference dags/sri_vehiculos_etl_dag.py:762-844) —
the three grouped rollups, as DataFrames over the in-session star tables.
Each is fact ⋈ dim → partial+final hash aggregate → top-k via
TakeOrderedAndProject.

Broadcast policy: bounded dims (dim_tiempo is calendar-bounded — one row per
day; dim_ubicacion is the fixed 17-canton map) carry explicit broadcast
hints. dim_vehiculo grows with the data (331k rows from a 460k-row input in
the reference run) so its join strategy is AQE-decided — broadcast at runtime
only when genuinely under the threshold."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def metricas_por_anio(tables: dict[str, DataFrame]) -> DataFrame:
    """Reference :772-783 (ORDER BY Anio DESC LIMIT 5)."""
    fact, tiempo = tables["fact_registro_vehiculos"], tables["dim_tiempo"]
    return (
        fact.join(F.broadcast(tiempo.select("ID_Tiempo", "Anio")), "ID_Tiempo")
        .groupBy("Anio")
        .agg(
            F.count("*").alias("total_registros"),
            F.round(F.sum("MontoAvaluo"), 2).alias("monto_total_avaluo"),
            F.round(F.avg("MontoAvaluo"), 4).alias("monto_promedio_avaluo"),
        )
        .orderBy(F.desc("Anio"))
        .limit(5)
    )


def metricas_por_marca(tables: dict[str, DataFrame]) -> DataFrame:
    """Reference :788-798 (top-10 marcas by count)."""
    fact, veh = tables["fact_registro_vehiculos"], tables["dim_vehiculo"]
    return (
        fact.join(veh.select("ID_Vehiculo", "Marca"), "ID_Vehiculo")
        .groupBy("Marca")
        .agg(
            F.count("*").alias("total_registros"),
            F.round(F.avg("MontoAvaluo"), 4).alias("avaluo_promedio"),
        )
        .orderBy(F.desc("total_registros"), F.asc("Marca"))
        .limit(10)
    )


def metricas_por_provincia(tables: dict[str, DataFrame]) -> DataFrame:
    """Reference :803-814 (top-10 provincias by count)."""
    fact, ubi = tables["fact_registro_vehiculos"], tables["dim_ubicacion"]
    return (
        fact.join(
            F.broadcast(ubi.select("ID_Ubicacion", "Provincia", "Region")), "ID_Ubicacion"
        )
        .groupBy("Provincia", "Region")
        .agg(
            F.count("*").alias("total_registros"),
            F.round(F.sum("MontoAvaluo"), 2).alias("monto_total"),
        )
        .orderBy(F.desc("total_registros"), F.asc("Provincia"), F.asc("Region"))
        .limit(10)
    )
