"""Local replica of the driver's Spark-vs-DuckDB correctness gate.

Runs a catalog query through Spark and its oracle SQL through DuckDB on the
same parquet tables, then compares row count, column names, and
order-insensitive values (sorted by all columns; doubles compared with
tolerance — the driver hashes exact values, which is why catalog queries
round any float that passed through aggregation on BOTH sides).
"""

from __future__ import annotations

import datetime as _dt
import math
import os

import duckdb

from sri_spark.sources.testdata import TABLES


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con.execute(sql).fetchdf()


def _norm(v):
    import numbers
    from decimal import Decimal

    import numpy as np

    if v is None:
        return (0, "")
    if isinstance(v, (bool, np.bool_)):
        return (1, float(v))
    if isinstance(v, (numbers.Real, Decimal)):
        f = float(v)
        if math.isnan(f):
            return (0, "")
        return (1, round(f, 6))
    if isinstance(v, _dt.datetime):
        return (2, v.isoformat(sep=" "))
    if isinstance(v, _dt.date):
        return (2, v.isoformat())
    if isinstance(v, (list, tuple, np.ndarray)):
        return (3, tuple(_norm(x) for x in v))
    return (4, str(v))


def compare_query(spark, name: str, query_fn, oracle: str, sf_dir: str) -> None:
    sdf = query_fn(spark, sf_dir)
    spark_cols = sorted(sdf.columns)
    spark_rows = [tuple(_norm(row[c]) for c in spark_cols) for row in sdf.collect()]

    odf = run_oracle(oracle, sf_dir)
    oracle_cols = sorted(odf.columns.tolist())
    orecs = odf.where(odf.notna(), None).to_dict("records")
    oracle_rows = [tuple(_norm(r[c]) for c in oracle_cols) for r in orecs]

    assert spark_cols == oracle_cols, (
        f"{name}: column mismatch spark={spark_cols} oracle={oracle_cols}"
    )
    assert len(spark_rows) == len(oracle_rows), (
        f"{name}: row count mismatch spark={len(spark_rows)} oracle={len(oracle_rows)}"
    )
    for i, (s, o) in enumerate(zip(sorted(spark_rows), sorted(oracle_rows))):
        assert _rows_close(s, o), f"{name}: row {i} mismatch\n spark={s}\n oracle={o}"


def _rows_close(a, b) -> bool:
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        tx, vx = x
        ty, vy = y
        if tx != ty:
            return False
        if tx == 1:  # numeric
            if not math.isclose(float(vx), float(vy), rel_tol=1e-9, abs_tol=1e-6):
                return False
        elif x != y:
            return False
    return True
