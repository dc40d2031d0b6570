"""CLI entry point for the SRI star pipeline — the orchestration layer
(SURVEY §2.10 G1–G5) collapsed into one Spark application.

The reference's Airflow DAG exists to sequence six isolated pandas tasks and
ferry state through BigQuery; in Spark the dependency graph is the lazy plan
itself, so 'orchestration' reduces to: run the app (G1 scheduling and G1
retries belong to whatever scheduler invokes spark-submit), enforce the
quality gate (G3), emit metrics (G4), and log completion (G5).

Usage:
    python -m sri_spark.etl.run --source sri.csv --out /tmp/star \
        [--mode parity|fixed] [--run-date YYYY-MM-DD] [--no-enforce]
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
import logging
import time


def main(argv: list[str] | None = None) -> None:
    parser = argparse.ArgumentParser(description="SRI star-schema ETL")
    parser.add_argument("--source", required=True, help="SRI CSV path")
    parser.add_argument("--out", required=True, help="output directory (parquet star)")
    parser.add_argument("--mode", default="fixed", choices=["parity", "fixed"])
    parser.add_argument("--run-date", default="2025-07-02")
    parser.add_argument("--no-enforce", action="store_true", help="skip quality gate")
    parser.add_argument(
        "--interactive",
        action="store_true",
        help="notebook-style task-by-task run: per-task timing/rows, table "
        "verification, example query (etl/interactive.py)",
    )
    args = parser.parse_args(argv)

    from sri_spark.etl import EtlConfig, run_pipeline
    from sri_spark.etl.metrics import (
        metricas_por_anio,
        metricas_por_marca,
        metricas_por_provincia,
    )
    from sri_spark.etl.pipeline import write_star
    from sri_spark.etl.quality import quality_report
    from sri_spark.session import get_spark

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    log = logging.getLogger("sri_spark.etl")

    t0 = time.perf_counter()
    spark = get_spark("sri-star-etl")
    cfg = EtlConfig(mode=args.mode, run_date=dt.date.fromisoformat(args.run_date))

    if args.interactive:
        from sri_spark.etl.interactive import run_interactive

        report = run_interactive(
            spark, args.source, out_dir=args.out, cfg=cfg, log=log.info
        )
        log.info(
            "interactive run %s in %.1fs",
            "completed" if report["ok"] else "FAILED",
            time.perf_counter() - t0,
        )
        return

    tables = run_pipeline(spark, args.source, cfg)
    write_star(tables, args.out)
    report = quality_report(tables, enforce=not args.no_enforce)
    log.info("quality: %s", json.dumps(report, default=str))
    for name, metric in (
        ("por_anio", metricas_por_anio),
        ("por_marca", metricas_por_marca),
        ("por_provincia", metricas_por_provincia),
    ):
        rows = [r.asDict() for r in metric(tables).collect()]
        log.info("metricas_%s: %s", name, json.dumps(rows, default=str))
    log.info("ETL completed in %.1fs (mode=%s, out=%s)",
             time.perf_counter() - t0, args.mode, args.out)


if __name__ == "__main__":
    main()
