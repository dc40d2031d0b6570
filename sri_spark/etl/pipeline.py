"""One-application star pipeline (SURVEY §3.1 'Spark shape').

The reference's six tasks (4 dim ETLs -> barrier -> fact -> validation)
collapse into one lazy plan: the CSV is scanned once per consumer with column
pruning, dims never round-trip through an external warehouse, and the fact's
four lookups broadcast the freshly-built dims.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sri_spark.etl.config import EtlConfig
from sri_spark.etl.dims import (
    build_dim_tiempo,
    build_dim_transaccion,
    build_dim_ubicacion,
    build_dim_vehiculo,
)
from sri_spark.etl.fact import build_fact, check_fanout
from sri_spark.etl.source import read_sri_csv, with_src_id


def run_pipeline(
    spark: SparkSession,
    source: str | DataFrame,
    cfg: EtlConfig | None = None,
) -> dict[str, DataFrame]:
    """Build the five star tables. `source` is a CSV path or a pre-loaded
    DataFrame with the SRI schema (tests pass DataFrames)."""
    cfg = cfg or EtlConfig()
    src = read_sri_csv(spark, source) if isinstance(source, str) else with_src_id(source)
    # the source feeds 5 consumers — cache the (narrow) scan once
    src = src.persist()

    dims = {
        "dim_tiempo": build_dim_tiempo(spark),
        "dim_vehiculo": build_dim_vehiculo(src, cfg),
        "dim_transaccion": build_dim_transaccion(src, cfg),
        "dim_ubicacion": build_dim_ubicacion(src, cfg),
    }
    # dims feed both their sink and the fact's broadcast lookups; the fact
    # feeds the sink, the quality gate and every metric — persist all five so
    # downstream actions don't re-run the CSV scan + joins per consumer
    # (persist BEFORE check_fanout so its actions warm the cache instead of
    # computing the dims a throwaway time)
    dims = {k: v.persist() for k, v in dims.items()}
    if cfg.parity:
        check_fanout(dims["dim_vehiculo"], dims["dim_transaccion"], cfg)
    fact = build_fact(
        src,
        dims["dim_tiempo"],
        dims["dim_vehiculo"],
        dims["dim_transaccion"],
        dims["dim_ubicacion"],
        cfg,
    ).persist()
    return {**dims, "fact_registro_vehiculos": fact}


def write_star(
    tables: dict[str, DataFrame],
    out_dir: str,
    *,
    partition_fact_by_year: bool = True,
    clustering_fields: tuple[str, ...] = ("Anio", "Marca"),
    fmt: str = "parquet",
) -> None:
    """Persist the star — truncate-load semantics (mode='overwrite', the
    reference's WRITE_TRUNCATE).

    `fmt` selects a registered sink (sources/sinks.py): 'parquet' (default)
    writes a local/lake star; 'bigquery' targets the reference's warehouse
    through the spark-bigquery-connector (`out_dir` is then
    `project.dataset`; needs the connector jar + GCP credentials, so tests
    exercise it through a registered connector-shaped fake instead).

    `partition_fact_by_year` + `clustering_fields` activate the physical
    design the reference declared but never consumed
    (config/variables.yaml:18-19 `clustering_fields: ["Anio", "Marca"]`,
    `partitioning_field`; the DAG at dags/sri_vehiculos_etl_dag.py never
    reads either — SURVEY §1.3 Q6). The Spark-lake equivalent of BigQuery's
    date-partition + clustering:

    - **Partition** the fact by ``Anio`` (the year of its tiempo FK) —
      directory-level partition pruning, so a year-filtered scan at 100 TB
      touches only that year's files (PartitionFilters in the scan node).
    - **Cluster** within each partition by the remaining clustering fields
      (``Marca``, denormalized from dim_vehiculo exactly as BigQuery
      clustering requires the column in the table): rows are range-routed on
      (Anio, Marca) and sorted within every output file, so parquet
      row-group min/max stats make brand-filtered scans skip row groups.

    Scale shape: one range shuffle (`repartitionByRange` samples boundaries,
    so hot years split across many tasks instead of one file per year) + a
    per-task sort; the Marca lookup join is AQE-decided (dim_vehiculo grows
    with the data — 331k rows from the reference's 460k-row input — so no
    forced broadcast).
    """
    from sri_spark.sources.sinks import get_sink

    sink = get_sink(fmt)
    for name, df in tables.items():
        if name == "fact_registro_vehiculos" and partition_fact_by_year:
            anio = tables["dim_tiempo"].select("ID_Tiempo", "Anio")
            df = (
                df.join(F.broadcast(anio), "ID_Tiempo", "left").na.fill({"Anio": 0})
            )
            cluster = [c for c in clustering_fields if c != "Anio"]
            if "Marca" in cluster and "Marca" not in df.columns:
                marca = tables["dim_vehiculo"].select("ID_Vehiculo", "Marca")
                df = df.join(marca, "ID_Vehiculo", "left")
            cluster = [c for c in cluster if c in df.columns]
            if cluster:
                df = df.repartitionByRange("Anio", *cluster).sortWithinPartitions(
                    "Anio", *cluster
                )
            writer = df.write.mode("overwrite").partitionBy("Anio")
        else:
            writer = df.write.mode("overwrite")
        sink(writer, out_dir, name)
