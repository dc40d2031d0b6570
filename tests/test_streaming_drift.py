"""Streaming drift monitor: the stream's final sink must equal the batch
twin scored with the same reference, and replaying the stream from scratch
must not change the sink (idempotent overwrite)."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from sri_spark.sources.testdata import load_table, normalize_event_ts
from sri_spark.streaming.drift import (
    drift_scores,
    reference_histogram,
    run_drift_monitor_stream,
    windowed_value_histogram,
)


@pytest.fixture()
def stream_in(spark, sf_dir, tmp_path):
    raw = normalize_event_ts(spark.read.parquet(f"{sf_dir}/events.parquet"))
    out = tmp_path / "stream_in"
    raw.coalesce(2).write.parquet(str(out))
    return str(out)


def _sink_rows(spark, sink):
    return sorted(
        (str(r["window_start"]), r["jsd"], r["ks_gap"])
        for r in spark.read.parquet(sink).collect()
    )


def test_stream_drift_equals_batch_twin(spark, sf_dir, tmp_path, stream_in):
    ev = load_table(spark, sf_dir, "events")
    ref = reference_histogram(ev)

    sink = str(tmp_path / "sink")
    run_drift_monitor_stream(
        spark, stream_in, str(tmp_path / "ckpt"), sink, ref
    )
    got = _sink_rows(spark, sink)

    batch = drift_scores(windowed_value_histogram(ev), ref)
    want = sorted(
        (str(r["window_start"]), r["jsd"], r["ks_gap"]) for r in batch.collect()
    )
    assert got == want
    assert len(got) > 1

    # sanity on the scores themselves: JSD bounded [0, 1] bits, KS in [0, 1]
    for _, jsd, ks in got:
        assert 0.0 <= jsd <= 1.0
        assert 0.0 <= ks <= 1.0


def test_stream_drift_replay_is_idempotent(spark, sf_dir, tmp_path, stream_in):
    ev = load_table(spark, sf_dir, "events")
    ref = reference_histogram(ev)
    sink = str(tmp_path / "sink")

    run_drift_monitor_stream(spark, stream_in, str(tmp_path / "ck1"), sink, ref)
    first = _sink_rows(spark, sink)
    # fresh checkpoint = full replay; the overwrite sink must converge to
    # the same table, not accumulate duplicates
    shutil.rmtree(str(tmp_path / "ck1"))
    run_drift_monitor_stream(spark, stream_in, str(tmp_path / "ck2"), sink, ref)
    assert _sink_rows(spark, sink) == first


def test_drift_score_zero_against_self(spark, sf_dir):
    """Scoring a distribution against itself: JSD ~ 0 for windows whose
    histogram matches the global mix; the GLOBAL aggregate must be exactly
    the reference, so pooled drift is ~0 by construction. Checked via a
    single all-data window (coarse 10-year window)."""
    ev = load_table(spark, sf_dir, "events")
    ref = reference_histogram(ev)
    pooled = windowed_value_histogram(ev, window="3650 days")
    scored = drift_scores(pooled, ref).collect()
    assert len(scored) == 1
    assert scored[0]["jsd"] < 1e-4
    assert scored[0]["ks_gap"] < 1e-3


def test_update_mode_merges_across_incremental_batches(spark, sf_dir, tmp_path):
    """The unbounded-deployment variant: update output mode + merge sink.
    Feed the events in two separate availableNow runs sharing one
    checkpoint (the second run sees ONLY the new file); the merged scores
    must equal the batch twin over ALL data — proving the sink merges a
    window's stored bins with each batch's partial updates instead of
    zeroing the bins the batch didn't touch."""
    from sri_spark.streaming.drift import run_drift_monitor_stream_update

    ev = load_table(spark, sf_dir, "events")
    ref = reference_histogram(ev)

    # split by EVENT TIME (not id parity): the checkpoint carries the
    # watermark across runs, so a second pass over old timestamps would be
    # correctly discarded as late data. Time-ordered halves mean nothing
    # is late, and the boundary window receives bins from BOTH runs —
    # which is precisely the merge under test.
    median = ev.agg(F.median(F.unix_micros("ts"))).first()[0]
    half_a = ev.filter(F.unix_micros("ts") <= median)
    half_b = ev.filter(F.unix_micros("ts") > median)
    indir = tmp_path / "incremental_in"
    half_a.coalesce(1).write.mode("append").parquet(str(indir))

    sink = str(tmp_path / "upd_sink")
    ckpt = str(tmp_path / "upd_ckpt")
    run_drift_monitor_stream_update(spark, str(indir), ckpt, sink, ref)
    n_first = len(_sink_rows(spark, f"{sink}/scores"))
    assert n_first > 0

    # second ingest: same checkpoint -> only the new file is processed;
    # its rows UPDATE windows the first run already wrote
    half_b.coalesce(1).write.mode("append").parquet(str(indir))
    run_drift_monitor_stream_update(spark, str(indir), ckpt, sink, ref)

    got = _sink_rows(spark, f"{sink}/scores")
    batch = drift_scores(
        windowed_value_histogram(ev).withColumn(
            "window_start",
            F.date_format("window_start", "yyyy-MM-dd HH:mm:ss"),
        ),
        ref,
    )
    want = sorted(
        (str(r["window_start"]), r["jsd"], r["ks_gap"]) for r in batch.collect()
    )
    assert got == want
