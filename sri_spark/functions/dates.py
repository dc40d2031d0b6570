"""Date-part extraction and Spanish calendar names.

Reference behavior (SURVEY §2.3 E1–E3): the reference extracts
year/quarter/month/day from dates and renders month/weekday names in Spanish
via explicit 12- and 7-entry dicts (reference
`dags/sri_vehiculos_etl_dag.py:72-95`). We reproduce the explicit mapping —
never JVM-locale-dependent formatting — as chained `when` expressions on
`month()`/`dayofweek()` ordinals so the whole thing stays inside whole-stage
codegen (no UDF, no locale drift).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# month ordinal -> Spanish name (reference dags/sri_vehiculos_etl_dag.py:81-86)
MESES_ES = {
    1: "Enero",
    2: "Febrero",
    3: "Marzo",
    4: "Abril",
    5: "Mayo",
    6: "Junio",
    7: "Julio",
    8: "Agosto",
    9: "Septiembre",
    10: "Octubre",
    11: "Noviembre",
    12: "Diciembre",
}

# ISO weekday ordinal (1=Monday..7=Sunday) -> Spanish name (reference :88-92)
DIAS_ES = {
    1: "Lunes",
    2: "Martes",
    3: "Miércoles",
    4: "Jueves",
    5: "Viernes",
    6: "Sábado",
    7: "Domingo",
}


def _map_ordinal(ordinal: Column, mapping: dict[int, str]) -> Column:
    expr = F.lit(None).cast("string")
    # build when-chain in reverse so the first entries are outermost
    for k, v in reversed(list(mapping.items())):
        expr = F.when(ordinal == k, F.lit(v)).otherwise(expr)
    return expr


def nombre_mes_es(date_col: Column) -> Column:
    """Spanish month name of a date column (E2+E3)."""
    return _map_ordinal(F.month(date_col), MESES_ES)


def nombre_dia_es(date_col: Column) -> Column:
    """Spanish weekday name of a date column (E2+E3).

    Uses `weekday()` (0=Monday..6=Sunday) + 1 for an ISO ordinal, matching the
    reference's `strftime('%A')` + dict translation.
    """
    return _map_ordinal(F.weekday(date_col) + F.lit(1), DIAS_ES)


def date_parts(date_col: Column) -> dict[str, Column]:
    """year/quarter/month/day extraction (E1), cast to long to match the
    BigQuery/DuckDB INTEGER→BIGINT convention used by the oracle."""
    return {
        "Anio": F.year(date_col).cast("long"),
        "Trimestre": F.quarter(date_col).cast("long"),
        "Mes": F.month(date_col).cast("long"),
        "Dia": F.dayofmonth(date_col).cast("long"),
    }
