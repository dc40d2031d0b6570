"""Custom stateful streaming operator via applyInPandasWithState
(mandate item: custom stateful operators beyond built-in windowed aggs).

`user_running_totals` keeps one (count, total) state cell per user and emits
the updated running totals every micro-batch — the minimal template for
arbitrary per-key streaming state (feature aggregation, CDC merge,
session carry-over). State is per-key and explicit, so it scales with
|users|, not input volume; pair with a state-store TTL (GroupStateTimeout)
in production to bound it.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [StructField("n_events", LongType()), StructField("total_value", DoubleType())]
)
OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def _update_totals(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    # state keeps the RAW accumulated float — rounding state every
    # micro-batch would re-round cumulatively and drift from the true sum
    # over a long stream; round only at emission
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
    )


def user_running_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum) maintained in explicit group state."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stateful_stream(
    spark, events_dir: str, checkpoint_dir: str, *, query_name: str = "user_totals"
) -> DataFrame:
    from sri_spark.streaming.jobs import read_events_stream

    stream = read_events_stream(spark, events_dir)
    q = (
        user_running_totals(stream)
        .writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


EWMA_ALPHA = 0.3

EWMA_STATE_SCHEMA = StructType([StructField("ewma", DoubleType())])
EWMA_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("value", DoubleType()),
        StructField("ewma", DoubleType()),
    ]
)


def _update_ewma(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    prev = state.get[0] if state.exists else None
    pdf = pd.concat(list(pdfs), ignore_index=True)
    pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
    smoothed = []
    for v in pdf["value"]:
        v = float(v)
        prev = v if prev is None else EWMA_ALPHA * v + (1.0 - EWMA_ALPHA) * prev
        smoothed.append(prev)
    state.update((prev,))
    yield pd.DataFrame(
        {
            "user_id": pdf["user_id"].astype("int64"),
            "event_id": pdf["event_id"].astype("int64"),
            "value": pdf["value"].astype("float64"),
            "ewma": [round(x, 9) for x in smoothed],
        }
    )


def user_ewma(events: DataFrame) -> DataFrame:
    """TRUE recursive EWMA per user (ewma' = a·v + (1-a)·ewma) — the
    infinite recurrence a batch window cannot express without truncation
    (the batch catalog's events_ewma is the bounded-lag approximation; this
    is the exact operator, carried in one double of state per user).

    Ordering contract: rows are folded in (ts, event_id) order within each
    micro-batch, and state chains batches in arrival order — correct when
    the source delivers per-key batches in time order (file source with
    ordered files, or an upstream watermark+sort stage). A disordered
    source needs buffering state keyed by watermark, a different operator."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_ewma,
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_ewma_stream(
    spark, events_dir: str, checkpoint_dir: str, *, query_name: str = "user_ewma"
) -> DataFrame:
    from sri_spark.streaming.jobs import read_events_stream

    stream = read_events_stream(spark, events_dir)
    q = (
        user_ewma(stream)
        .writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)
