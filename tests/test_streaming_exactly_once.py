"""Exactly-once semantics of the foreachBatch MERGE sink across restarts.

Contract under test (streaming/jobs.py run_foreach_batch_merge_stream):
at-least-once foreachBatch × idempotent latest-wins merge × staged-rename
publish = exactly-once observable state on a non-transactional parquet
target. Three restarts of the same checkpointed query must (1) pick up only
new files, (2) be a no-op when nothing is new, and (3) recover the
accumulated table after a simulated crash between the publish renames.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from sri_spark.sources.testdata import load_table
from sri_spark.streaming.jobs import (
    latest_event_per_user,
    run_foreach_batch_merge_stream,
)


def _rows(df):
    return sorted(
        (r["user_id"], r["event_id"], r["ts"], r["event_type"]) for r in df.collect()
    )


@pytest.fixture()
def split_events(spark, sf_dir, tmp_path):
    """events split into three single-file slices by ts tercile."""
    from sri_spark.sources.testdata import normalize_event_ts

    raw = normalize_event_ts(spark.read.parquet(f"{sf_dir}/events.parquet"))
    ts = F.col("ts")
    q1, q2 = (
        raw.select(
            F.percentile_approx(ts, 1 / 3), F.percentile_approx(ts, 2 / 3)
        ).first()
    )
    parts = []
    for name, pred in [
        ("a", ts <= q1),
        ("b", (ts > q1) & (ts <= q2)),
        ("c", ts > q2),
    ]:
        out = tmp_path / f"slice_{name}"
        raw.filter(pred).coalesce(1).write.parquet(str(out))
        parts.append(next(out.glob("part-*.parquet")))
    return parts


def test_merge_sink_exactly_once_across_restarts(
    spark, sf_dir, tmp_path, split_events
):
    events_dir = tmp_path / "stream_in"
    events_dir.mkdir()
    target = str(tmp_path / "target")
    ckpt = str(tmp_path / "ckpt")
    ev = load_table(spark, sf_dir, "events")

    # run 1: slices a+b available
    shutil.copy(split_events[0], events_dir / "a.parquet")
    shutil.copy(split_events[1], events_dir / "b.parquet")
    got1 = run_foreach_batch_merge_stream(spark, str(events_dir), target, ckpt)
    cutoff = ev.select(F.percentile_approx("ts", 2 / 3)).first()[0]
    want1 = latest_event_per_user(ev.filter(F.col("ts") <= cutoff))
    assert _rows(got1) == _rows(want1)

    # run 2 (restart, same checkpoint): only slice c is new — the already
    # processed files must NOT replay into duplicated effects
    shutil.copy(split_events[2], events_dir / "c.parquet")
    got2 = run_foreach_batch_merge_stream(spark, str(events_dir), target, ckpt)
    want_all = latest_event_per_user(ev)
    assert _rows(got2) == _rows(want_all)

    # run 3 (restart, nothing new): a strict no-op
    got3 = run_foreach_batch_merge_stream(spark, str(events_dir), target, ckpt)
    assert _rows(got3) == _rows(want_all)


def test_merge_sink_recovers_from_crashed_swap(spark, sf_dir, tmp_path, split_events):
    events_dir = tmp_path / "stream_in"
    events_dir.mkdir()
    target = str(tmp_path / "target")
    ckpt = str(tmp_path / "ckpt")

    shutil.copy(split_events[0], events_dir / "a.parquet")
    run_foreach_batch_merge_stream(spark, str(events_dir), target, ckpt)
    before = _rows(spark.read.parquet(target))

    # simulate a crash between the two publish renames: target moved to
    # backup, staging never promoted (and left behind half-written)
    os.rename(target, target + ".backup")
    os.makedirs(target + ".staging-99", exist_ok=True)

    shutil.copy(split_events[1], events_dir / "b.parquet")
    got = run_foreach_batch_merge_stream(spark, str(events_dir), target, ckpt)

    # accumulated state survived: users only in slice a are still present
    got_users = {r[0] for r in _rows(got)}
    assert {r[0] for r in before} <= got_users
    assert not os.path.exists(target + ".backup")
