"""Sink contract tests: write_star through a registered connector-shaped
fake BigQuery sink (reference S2 — `load_table_from_dataframe(df,
"project.dataset.table", WRITE_TRUNCATE)` at
dags/sri_vehiculos_etl_dag.py:98-114,199-203).

The real spark-bigquery-connector needs a jar + GCP credentials, so the
fake implements the same sink interface (format name, `project.dataset`
namespace, per-table save target, overwrite semantics) and materializes to
parquet — proving write_star's non-parquet dispatch path end-to-end:
table naming, truncate-load replacement, fact partition column.
"""

from __future__ import annotations

import datetime as dt
import os

import pytest

from sri_spark.etl import EtlConfig, run_pipeline
from sri_spark.etl.pipeline import write_star
from sri_spark.sources.sinks import get_sink, register_sink
from tests.sri_fixture import write_sri_csv

RUN_DATE = dt.date(2025, 7, 2)

STAR_TABLES = [
    "dim_tiempo",
    "dim_vehiculo",
    "dim_transaccion",
    "dim_ubicacion",
    "fact_registro_vehiculos",
]


@pytest.fixture(scope="module")
def tables(spark, tmp_path_factory):
    path = tmp_path_factory.mktemp("sri_sink") / "sri_vehiculos.csv"
    write_sri_csv(str(path), n=500, seed=7)
    return run_pipeline(spark, str(path), EtlConfig(mode="fixed", run_date=RUN_DATE))


class FakeBigQuerySink:
    """Connector-shaped sink: records every call the way the BigQuery
    connector would receive it and materializes the frame under a directory
    keyed by the fully-qualified table id."""

    def __init__(self, root: str):
        self.root = root
        self.calls: list[dict] = []

    def __call__(self, writer, out_dir: str, name: str) -> None:
        table_id = f"{out_dir}.{name}"  # project.dataset.table
        # the DataFrameWriter arrives fully configured (mode, partitioning);
        # the sink owns only the target binding — same division of labour as
        # the real connector's writer.format("bigquery").save(table_id)
        self.calls.append({"table_id": table_id})
        writer.parquet(os.path.join(self.root, table_id))


@pytest.fixture()
def fake_bq(tmp_path):
    sink = FakeBigQuerySink(str(tmp_path))
    register_sink("fake_bigquery", sink)
    return sink


def test_unknown_sink_rejected():
    with pytest.raises(ValueError, match="unknown sink format"):
        get_sink("no_such_format")


def test_write_star_through_connector_shaped_sink(spark, tables, fake_bq):
    write_star(tables, "proyecto.sri_vehiculos_dw", fmt="fake_bigquery")

    # one save per star table, addressed as project.dataset.table
    assert sorted(c["table_id"] for c in fake_bq.calls) == sorted(
        f"proyecto.sri_vehiculos_dw.{t}" for t in STAR_TABLES
    )

    # read-back: row counts and (for the fact) the partition column
    for t in STAR_TABLES:
        back = spark.read.parquet(
            os.path.join(fake_bq.root, f"proyecto.sri_vehiculos_dw.{t}")
        )
        assert back.count() == tables[t].count(), t
    fact_back = spark.read.parquet(
        os.path.join(fake_bq.root, "proyecto.sri_vehiculos_dw.fact_registro_vehiculos")
    )
    assert "Anio" in fact_back.columns  # Q6 partition design activated


def test_write_star_truncate_load_semantics(spark, tables, fake_bq):
    """WRITE_TRUNCATE analogue: a second run replaces, never appends."""
    write_star(tables, "proyecto.sri_vehiculos_dw", fmt="fake_bigquery")
    first = {
        t: spark.read.parquet(
            os.path.join(fake_bq.root, f"proyecto.sri_vehiculos_dw.{t}")
        ).count()
        for t in STAR_TABLES
    }
    write_star(tables, "proyecto.sri_vehiculos_dw", fmt="fake_bigquery")
    for t in STAR_TABLES:
        again = spark.read.parquet(
            os.path.join(fake_bq.root, f"proyecto.sri_vehiculos_dw.{t}")
        ).count()
        assert again == first[t], f"{t}: truncate-load appended instead of replacing"


def test_orc_round_trip(spark, sf_dir, tmp_path):
    """ORC is the other columnar built-in (no extra jars): a star dim
    written as ORC must read back bit-equal, proving the sink surface
    isn't parquet-only."""
    src = spark.read.parquet(f"{sf_dir}/nation.parquet")
    out = str(tmp_path / "nation_orc")
    src.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    assert back.schema == src.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))
