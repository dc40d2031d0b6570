"""CLI entry point + truncate-load (WRITE_TRUNCATE) rerun semantics."""

from __future__ import annotations

import os

from tests.sri_fixture import write_sri_csv


def test_cli_end_to_end_and_idempotent_rerun(spark, tmp_path):
    csv = str(tmp_path / "sri.csv")
    write_sri_csv(csv, n=500, seed=7)
    out = str(tmp_path / "star")

    from sri_spark.etl.run import main

    main(["--source", csv, "--out", out, "--mode", "fixed", "--no-enforce"])
    first = {
        name: spark.read.parquet(os.path.join(out, name)).count()
        for name in os.listdir(out)
    }
    assert set(first) == {
        "dim_tiempo", "dim_vehiculo", "dim_transaccion", "dim_ubicacion",
        "fact_registro_vehiculos",
    }
    assert first["dim_tiempo"] == 2192

    # rerun = truncate-load: identical table states, no appends
    main(["--source", csv, "--out", out, "--mode", "fixed", "--no-enforce"])
    second = {
        name: spark.read.parquet(os.path.join(out, name)).count()
        for name in os.listdir(out)
    }
    assert second == first
