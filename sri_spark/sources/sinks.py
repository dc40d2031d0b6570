"""Pluggable star-schema sinks (reference S2 — BigQuery truncate-load,
`dags/sri_vehiculos_etl_dag.py:98-114,199-203`).

The reference's entire load layer is `load_table_from_dataframe(df,
"project.dataset.table", WRITE_TRUNCATE)`. The Spark-native analogue is a
`DataFrameWriter` in overwrite mode handed to a *sink*: a callable
``(writer, out_dir, table_name) -> None`` that owns only the final
format/target binding. Sinks are looked up by format name so deployments
choose parquet (local/lake) or bigquery (spark-bigquery-connector) without
touching pipeline code — and tests register a connector-shaped fake to
exercise the non-parquet path (the real connector needs a jar + GCP
credentials, unavailable here).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrameWriter

Sink = Callable[[DataFrameWriter, str, str], None]


def _parquet_sink(writer: DataFrameWriter, out_dir: str, name: str) -> None:
    writer.parquet(os.path.join(out_dir, name))


def _bigquery_sink(writer: DataFrameWriter, out_dir: str, name: str) -> None:
    # out_dir is `project.dataset`; direct write (BigQuery Storage Write API)
    # skips the GCS staging bucket the indirect method needs
    writer.format("bigquery").option("writeMethod", "direct").save(
        f"{out_dir}.{name}"
    )


_SINKS: dict[str, Sink] = {"parquet": _parquet_sink, "bigquery": _bigquery_sink}


def register_sink(fmt: str, sink: Sink) -> None:
    """Register/override a sink implementation for a format name."""
    _SINKS[fmt] = sink


def get_sink(fmt: str) -> Sink:
    try:
        return _SINKS[fmt]
    except KeyError:
        raise ValueError(
            f"unknown sink format {fmt!r}; registered: {sorted(_SINKS)}"
        ) from None
