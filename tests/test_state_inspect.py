"""State data source contracts: checkpoint state must reconcile exactly
with the streaming query's own output, metadata must describe the
operator, and the skew summary must account for every state row."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sri_spark.sources.testdata import normalize_event_ts
from sri_spark.streaming.jobs import run_windowed_stream
from sri_spark.streaming.state_inspect import (
    read_state,
    state_metadata,
    state_skew_summary,
)


@pytest.fixture(scope="module")
def finished_stream(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("state_inspect")
    events_dir = str(base / "in")
    normalize_event_ts(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).coalesce(1).write.parquet(events_dir)
    ckpt = str(base / "ckpt")
    result = run_windowed_stream(
        spark, events_dir, ckpt, query_name="state_inspect_windowed"
    )
    return ckpt, result.collect()


def test_state_rows_reconcile_with_query_output(spark, finished_stream):
    ckpt, result_rows = finished_stream
    st = read_state(spark, ckpt).select(
        F.date_format("key.window.start", "yyyy-MM-dd HH:mm:ss").alias("ws"),
        F.col("key.event_type").alias("et"),
        F.col("value.count").alias("n"),
        F.round(F.col("value.sum"), 6).alias("s"),
    )
    got = {(r["ws"], r["et"]): (r["n"], r["s"]) for r in st.collect()}
    want = {
        (r["window_start"], r["event_type"]): (
            r["n_events"],
            round(r["total_value"], 6),
        )
        for r in result_rows
    }
    assert got == want
    assert len(got) > 10


def test_state_metadata_describes_the_aggregation(spark, finished_stream):
    ckpt, _ = finished_stream
    rows = state_metadata(spark, ckpt).collect()
    assert len(rows) == 1
    m = rows[0]
    assert m["operatorName"] == "stateStoreSave"
    assert m["numPartitions"] > 0
    assert m["maxBatchId"] >= m["minBatchId"] >= 0


def test_skew_summary_accounts_for_all_rows(spark, finished_stream):
    ckpt, _ = finished_stream
    st_total = read_state(spark, ckpt).count()
    summary = state_skew_summary(spark, ckpt).collect()
    assert sum(r["n_rows"] for r in summary) == st_total
    assert abs(sum(r["share"] for r in summary) - 1.0) < 1e-3
    # ordered hottest-first
    counts = [r["n_rows"] for r in summary]
    assert counts == sorted(counts, reverse=True)


def test_state_time_travel_earlier_batch_is_subset(spark, finished_stream):
    """Pinning batchId=0 returns the state as of the FIRST micro-batch —
    with one input file there is exactly one batch, so it equals the
    final state; the contract exercised is the batchId option itself."""
    ckpt, _ = finished_stream
    first = read_state(spark, ckpt, batch_id=0).count()
    final = read_state(spark, ckpt).count()
    assert 0 < first <= final
