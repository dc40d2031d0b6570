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


# Verbatim-reference LIMIT queries whose ORDER BY key can TIE across the
# cut at this harness' tiny sf0.001 (refsql_metrics_por_marca: three
# brands share total_registros=253 but only one fits in the LIMIT 10, so
# the selected top-10 SET is legitimately engine-dependent there). The
# statement is byte-verbatim from the reference so no deterministic
# tiebreak can be added. Before relaxing anything, the harness PROVES the
# ambiguity: it re-runs the oracle with the final LIMIT stripped and
# counts how many groups carry the boundary key value corpus-wide — only
# when more candidates exist than the result includes are boundary rows
# compared count-only (everything above the cut stays exact). At tie-free
# scale factors (the driver's sf0.01) the candidate count equals the
# included count and the comparison remains fully strict.
# value = (tie column, sort direction). The direction picks which edge of
# the LIMIT cut the boundary sits on (DESC -> min of the included values,
# ASC -> max) and is verified against the statement's ORDER BY text so a
# future entry with the wrong direction fails loudly instead of silently
# relaxing the wrong rows.
TIE_BOUNDED_LIMIT = {"refsql_metrics_por_marca": ("total_registros", "desc")}


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
    if name in TIE_BOUNDED_LIMIT and spark_rows:
        import re

        tie_col, direction = TIE_BOUNDED_LIMIT[name]
        assert direction in ("asc", "desc")
        # fail loudly if the statement does not actually order by the tie
        # column in the declared direction (an ASC query relaxed with a
        # DESC entry would compare the wrong edge of the cut)
        order_pat = rf"ORDER\s+BY\s+{tie_col}\s+{direction}"
        assert re.search(order_pat, oracle, flags=re.I), (
            f"{name}: TIE_BOUNDED_LIMIT declares {tie_col} {direction} but "
            f"the oracle statement has no matching ORDER BY clause"
        )
        edge_fn = min if direction == "desc" else max
        idx = spark_cols.index(tie_col)
        s_edge = edge_fn(r[idx] for r in spark_rows)
        o_edge = edge_fn(r[idx] for r in oracle_rows)
        assert s_edge == o_edge, f"{name}: boundary value differs {s_edge} vs {o_edge}"
        s_keep = [r for r in spark_rows if r[idx] != s_edge]
        o_keep = [r for r in oracle_rows if r[idx] != o_edge]
        assert len(s_keep) == len(o_keep), f"{name}: tied-boundary row counts differ"
        # prove the ambiguity before relaxing: strip the statement's final
        # LIMIT and count the groups carrying the boundary value — more
        # candidates than included rows means the cut's membership really
        # is engine-dependent. Tie-free scale factors stay fully strict.
        included = len(spark_rows) - len(s_keep)
        unlimited = re.sub(r"LIMIT\s+\d+\s*$", "", oracle.strip(), flags=re.I)
        full = run_oracle(unlimited, sf_dir)
        candidates = sum(
            1 for v in full[tie_col].tolist() if _norm(v) == s_edge
        )
        assert candidates >= included, f"{name}: boundary probe inconsistent"
        if candidates > included:
            spark_rows, oracle_rows = s_keep, o_keep
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
