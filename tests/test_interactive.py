"""Notebook-style interactive runner (etl/interactive.py) — the analogue of
the reference notebook's mock-Airflow cells 9-15: per-task execution with
status lines, table verification, and the example warehouse query."""

from __future__ import annotations

import datetime as dt

from sri_spark.etl import EtlConfig
from sri_spark.etl.interactive import EXPECTED_TABLES, run_interactive

from tests.sri_fixture import write_sri_csv


def test_run_interactive_full_sequence(spark, tmp_path):
    csv = tmp_path / "sri.csv"
    write_sri_csv(str(csv), n=1500, seed=3)
    lines: list[str] = []
    report = run_interactive(
        spark,
        str(csv),
        out_dir=str(tmp_path / "star"),
        cfg=EtlConfig(mode="fixed", run_date=dt.date(2025, 7, 2)),
        log=lines.append,
    )
    assert report["ok"]
    # one task line per dim/fact + validation + 3 metrics + write
    task_names = [t["task"] for t in report["tasks"]]
    for name in EXPECTED_TABLES:
        assert f"etl_{name}" in task_names
    assert "validar_calidad_datos" in task_names
    assert "metricas_por_marca" in task_names
    assert "write_star" in task_names
    assert all("error" not in t for t in report["tasks"])
    # cell-12 analogue: all five expected tables written with rows
    assert set(report["tables"]) == set(EXPECTED_TABLES)
    assert all(v > 0 for v in report["tables"].values())
    # cell-15 analogue: the example query returns the top-10 rollup
    assert 0 < len(report["ejemplo"]) <= 10
    row = report["ejemplo"][0]
    assert {"Anio", "Marca", "Provincia", "total_registros", "avaluo_promedio"} <= set(
        row
    )
    # the interactive protocol logged ok-lines for every task
    assert sum(1 for ln in lines if ln.startswith("[ok]")) >= 9
