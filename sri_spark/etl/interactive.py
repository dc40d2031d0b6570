"""Interactive (notebook-style) task-by-task ETL runner — the analogue of
the reference notebook's mock-Airflow path
(notebook/SRI_Vehiculos_ETL_DAG.ipynb cells 9-15: per-dimension execution
with status lines, fact build, validation, table verification, example
query), without any scheduler.

Where the notebook re-runs each `etl_dim_*` as an isolated task that
round-trips through BigQuery, this runner materializes the same task
sequence over ONE lazy plan (each "task" action warms the shared caches the
next task reuses) and reports per-task wall time and row counts. Semantics
are the pipeline's (`run_pipeline`/`write_star`/`quality_report`); this
module only adds the interactive task protocol around them.
"""

from __future__ import annotations

import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from sri_spark.etl.config import EtlConfig
from sri_spark.etl.metrics import (
    metricas_por_anio,
    metricas_por_marca,
    metricas_por_provincia,
)
from sri_spark.etl.pipeline import run_pipeline, write_star
from sri_spark.etl.quality import quality_report

EXPECTED_TABLES = [
    "dim_tiempo",
    "dim_vehiculo",
    "dim_transaccion",
    "dim_ubicacion",
    "fact_registro_vehiculos",
]


def run_interactive(
    spark: SparkSession,
    source: str | DataFrame,
    out_dir: str | None = None,
    cfg: EtlConfig | None = None,
    log: Callable[[str], None] = print,
) -> dict:
    """Execute the notebook's task sequence; returns a run report dict:
    per-task seconds + row counts, table verification, metric heads, and
    the example (flagship-analogue) query rows."""
    report: dict = {"tasks": [], "tables": {}, "ok": True}

    def task(name: str, fn: Callable[[], int | None]) -> None:
        t0 = time.perf_counter()
        try:
            rows = fn()
            dt = time.perf_counter() - t0
            report["tasks"].append({"task": name, "sec": round(dt, 3), "rows": rows})
            log(f"[ok] {name}: {rows if rows is not None else '-'} rows, {dt:.2f}s")
        except Exception as ex:  # notebook prints and continues; we fail fast
            report["tasks"].append({"task": name, "error": str(ex)[:200]})
            report["ok"] = False
            log(f"[FAIL] {name}: {ex}")
            raise

    tables = run_pipeline(spark, source, cfg)
    # cells 9-10: one task per dimension, then the fact — counting each
    # materializes it into the shared cache exactly once
    for name in EXPECTED_TABLES:
        task(f"etl_{name}", lambda n=name: tables[n].count())
    # cell 11: validation + metrics
    task(
        "validar_calidad_datos",
        lambda: len(quality_report(tables, enforce=True)),
    )
    for mname, metric in [
        ("metricas_por_anio", metricas_por_anio),
        ("metricas_por_marca", metricas_por_marca),
        ("metricas_por_provincia", metricas_por_provincia),
    ]:
        task(mname, lambda m=metric: m(tables).count())
    # cell 12-13: persist + verify expected tables exist with rows
    if out_dir is not None:
        task("write_star", lambda: write_star(tables, out_dir))
        for name in EXPECTED_TABLES:
            n = spark.read.parquet(os.path.join(out_dir, name)).count()
            report["tables"][name] = n
            log(f"[verify] {name}: {n} rows")
        if any(v == 0 for v in report["tables"].values()):
            report["ok"] = False
    # cell 15: the example warehouse query (flagship analogue) over the
    # in-session star
    fact, tiempo = tables["fact_registro_vehiculos"], tables["dim_tiempo"]
    veh, ubi = tables["dim_vehiculo"], tables["dim_ubicacion"]
    from pyspark.sql import functions as F

    ejemplo = (
        fact.join(tiempo.select("ID_Tiempo", "Anio"), "ID_Tiempo")
        .join(veh.select("ID_Vehiculo", "Marca"), "ID_Vehiculo")
        .join(
            F.broadcast(ubi.select("ID_Ubicacion", "Provincia")), "ID_Ubicacion"
        )
        .groupBy("Anio", "Marca", "Provincia")
        .agg(
            F.count("*").alias("total_registros"),
            F.round(F.avg("MontoAvaluo"), 2).alias("avaluo_promedio"),
        )
        .orderBy(F.desc("total_registros"), "Anio", "Marca", "Provincia")
        .limit(10)
    )
    report["ejemplo"] = [r.asDict() for r in ejemplo.collect()]
    log(f"[ok] consulta_ejemplo: {len(report['ejemplo'])} rows")
    return report
