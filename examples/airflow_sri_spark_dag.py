"""Example Airflow DAG wrapping the sri_spark CLI — the reference's
orchestration contract (dags/sri_vehiculos_etl_dag.py:20-39: @daily,
retries=2, 5-minute retry delay, catchup=False, max_active_runs=1) mapped
onto ONE task.

The reference needs six PythonOperators because each pandas stage runs in
its own worker and ferries state through BigQuery; here the whole star
build is one lazy Spark plan, so the DAG's only jobs are scheduling and
retry (G1) — both hang off the CLI's exit code, which propagates failure
(tests/test_gcp_gated.py::test_cli_exit_code_propagates_failure).

This file is an EXAMPLE for deployments that run Airflow; the engine repo
itself does not depend on Airflow (import-guarded below, and the module
lives under examples/, outside the package). A cron equivalent:

    */5 retries are cron-external; use systemd's Restart=on-failure or
    0 2 * * * cd /opt/sri && spark-submit ... -m sri_spark.etl.run \
        --source gs://bucket/raw-data/sri_vehiculos.csv --out ... || \
        notify-failure

Cite: reference default_args (retries/retry_delay/start_date) at
dags/sri_vehiculos_etl_dag.py:20-28, DAG args at :30-39.
"""

from __future__ import annotations

from datetime import datetime, timedelta

try:
    from airflow import DAG
    from airflow.operators.bash import BashOperator
except ImportError:  # engine repo has no airflow — example only
    DAG = None

SPARK_SUBMIT = (
    "spark-submit "
    "--packages com.google.cloud.bigdataoss:gcs-connector:hadoop3-2.2.26,"
    "com.google.cloud.spark:spark-bigquery-with-dependencies_2.13:0.41.0 "
    "--conf spark.hadoop.fs.gs.impl="
    "com.google.cloud.hadoop.fs.gcs.GoogleHadoopFileSystem "
)

if DAG is not None:
    default_args = {
        "owner": "sri_data_engineer",
        "depends_on_past": False,
        "start_date": datetime(2024, 1, 1),
        "email_on_failure": False,
        "email_on_retry": False,
        "retries": 2,  # reference: retries=2
        "retry_delay": timedelta(minutes=5),  # reference: 5-min delay
    }

    with DAG(
        "sri_vehiculos_etl_spark",
        default_args=default_args,
        description="SRI vehicle star build on Spark (single-task DAG)",
        schedule_interval="@daily",
        catchup=False,
        tags=["sri", "vehiculos", "etl", "spark"],
        max_active_runs=1,
    ) as dag:
        run_star_build = BashOperator(
            task_id="run_star_build",
            # non-zero CLI exit -> task failure -> Airflow retries (G1)
            bash_command=(
                SPARK_SUBMIT
                + "python -m sri_spark.etl.run "
                "--source gs://{{ var.value.sri_bucket }}/raw-data/sri_vehiculos.csv "
                "--out {{ var.value.sri_out_dir }} --mode fixed "
                "--run-date {{ ds }}"
            ),
        )
