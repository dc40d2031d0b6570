"""Credentialed GCP smoke tests + CLI failure-propagation contract.

The reference reads `gs://` blobs (dags/sri_vehiculos_etl_dag.py:136-141)
and truncate-loads BigQuery (:199-203). The sandbox has neither credentials
nor connector jars, so the real-integration tests here are gated on env
vars and skip cleanly otherwise (docs/GCP_INTEGRATION.md §4 documents the
setup). The exit-code test is NOT gated: it is the hook the scheduler-level
retry contract (reference :20-39 — retries=2, 5-min delay) attaches to.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_GCS_PATH = os.environ.get("SRI_GCS_CSV_PATH")  # gs://bucket/raw-data/x.csv
_BQ_DATASET = os.environ.get("SRI_BQ_DATASET")  # project.dataset


def _gcp_session():
    """A session with the GCS + BigQuery connectors on the classpath.

    Built fresh (not the shared fixture session) because jars must be on
    the classpath before the JVM starts. Needs network for --packages."""
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master("local[4]")
        .appName("sri-gcp-smoke")
        .config(
            "spark.jars.packages",
            "com.google.cloud.bigdataoss:gcs-connector:hadoop3-2.2.26,"
            "com.google.cloud.spark:spark-bigquery-with-dependencies_2.13:0.41.0",
        )
        .config(
            "spark.hadoop.fs.gs.impl",
            "com.google.cloud.hadoop.fs.gcs.GoogleHadoopFileSystem",
        )
        .config(
            "spark.hadoop.fs.AbstractFileSystem.gs.impl",
            "com.google.cloud.hadoop.fs.gcs.GoogleHadoopFS",
        )
        .getOrCreate()
    )


@pytest.mark.skipif(
    not _GCS_PATH, reason="SRI_GCS_CSV_PATH not set (credentialed GCS smoke)"
)
def test_gcs_read_sri_csv():
    """read_sri_csv over a real gs:// URI — the reference's S1 extract."""
    from sri_spark.etl.source import read_sri_csv

    spark = _gcp_session()
    df = read_sri_csv(spark, _GCS_PATH)
    assert df.limit(1).count() == 1
    assert "CodigoVehiculo" in df.columns


@pytest.mark.skipif(
    not _BQ_DATASET, reason="SRI_BQ_DATASET not set (credentialed BigQuery smoke)"
)
def test_bigquery_sink_roundtrip():
    """The real bigquery sink writes a tiny table and reads it back —
    the reference's S2 truncate-load through the Storage Write API."""
    from sri_spark.sources.sinks import get_sink

    spark = _gcp_session()
    df = spark.createDataFrame([(1, "A"), (2, "B")], "id long, marca string")
    get_sink("bigquery")(
        df.write.mode("overwrite"), _BQ_DATASET, "smoke_sri_spark"
    )
    back = (
        spark.read.format("bigquery")
        .load(f"{_BQ_DATASET}.smoke_sri_spark")
        .count()
    )
    assert back == 2


def test_cli_exit_code_propagates_failure(tmp_path):
    """`python -m sri_spark.etl.run` must exit non-zero on failure — the
    contract Airflow/cron retries hang off (reference DAG retries=2).
    A missing source file is the cheapest deterministic failure."""
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "sri_spark.etl.run",
            "--source",
            str(tmp_path / "does_not_exist.csv"),
            "--out",
            str(tmp_path / "star"),
        ],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=180,
    )
    assert proc.returncode != 0
    assert "does_not_exist" in proc.stderr + proc.stdout
