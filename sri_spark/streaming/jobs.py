"""Structured Streaming over the `events` fixture (mandate item — the
reference is schedule-driven full-refresh batch with no incremental state,
SURVEY §2.9; this is the additive streaming path).

Design: the transformation (`windowed_event_counts`) is a plain
DataFrame->DataFrame function applied identically to batch and streaming
inputs — Structured Streaming's core idea. The streaming wrapper adds the
incremental machinery: file source, event-time watermark (late-data policy:
rows later than the watermark are dropped and their windows finalized), and
an availableNow trigger for deterministic catch-up runs.

State sizing at scale: the only state is one row per (1h window × event
type); the watermark bounds it to ~watermark/window_size × |types| entries
per key range, so state stays O(small) regardless of input volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

def _events_raw_schema(events_dir: str) -> StructType:
    """Declared file-source schema for the events stream.

    A stream needs its schema up front, but the fixture's `ts` physical type
    has changed across driver regenerations (timestamp[ns] vs timestamp[us],
    see sources.testdata.normalize_event_ts). Probe ONE parquet footer
    (metadata-sized, driver-side, once per stream definition — not a data
    scan) and declare `ts` accordingly; normalize_event_ts then converts
    whatever arrives to session-zoned TimestampType.
    """
    import glob
    import os

    from pyspark.sql.types import TimestampNTZType, TimestampType

    ts_field: StructField
    files = sorted(glob.glob(os.path.join(events_dir, "*.parquet")))
    if not files:
        ts_field = StructField("ts", TimestampType())
    else:
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(files[0])
        phys = next(
            (
                pf.schema.column(i).physical_type
                for i in range(len(pf.schema))
                if pf.schema.column(i).name == "ts"
            ),
            None,
        )
        t = pf.schema_arrow.field("ts").type
        if phys == "INT96":
            # legacy Spark-written timestamps (pyarrow reports them as ns,
            # but nanosAsLong does NOT apply to INT96 — Spark reads them as
            # plain TIMESTAMP)
            ts_field = StructField("ts", TimestampType())
        elif t.unit == "ns":
            ts_field = StructField("ts", LongType())  # via nanosAsLong
        elif t.tz is None:
            ts_field = StructField("ts", TimestampNTZType())
        else:
            ts_field = StructField("ts", TimestampType())
    return StructType(
        [
            StructField("event_id", LongType()),
            ts_field,
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )


def read_events_stream(spark: SparkSession, events_dir: str) -> DataFrame:
    """File-source stream over a directory of events parquet files."""
    from sri_spark.sources.testdata import normalize_event_ts

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = (
        spark.readStream.schema(_events_raw_schema(events_dir))
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
    )
    return normalize_event_ts(raw)


def windowed_event_counts(
    events: DataFrame, *, watermark: str | None = "1 hour"
) -> DataFrame:
    """Tumbling 1-hour counts/sums per event type. Works unchanged on batch
    (watermark=None) and streaming inputs — one definition, two runtimes."""
    if watermark is not None and events.isStreaming:
        events = events.withWatermark("ts", watermark)
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def dedupe_events_stream(events: DataFrame, *, watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup on event_id with watermark-bounded state:
    duplicates arriving within the watermark horizon are dropped by the
    state store; rows older than the watermark are late data and never
    re-emitted. State size is bounded by (arrival rate x watermark), not by
    stream history — the streaming twin of dedup.exact."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def click_view_interval_join(
    clicks: DataFrame,
    views: DataFrame,
    *,
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Pair every click with the same user's views from the preceding hour —
    a time-interval join. One definition, two runtimes: on batch inputs it is
    a sort-merge join with a range residual; on streaming inputs the
    watermarks plus the two-sided time bound let Spark expire join state, so
    each side buffers only ~watermark worth of rows per key (the unbounded
    state a condition-free stream-stream join would otherwise need).

    how="left_outer" additionally emits view-less clicks; in streaming they
    surface only once the watermark passes the click's match window (Spark
    must prove no matching view can still arrive), so a terminal batch is
    needed to flush the tail — see the sentinel pattern in the tests.

    Inputs must carry (click_id, click_ts, user_id) / (view_id, view_ts,
    v_user_id) — see prepare_click_view_streams.
    """
    if clicks.isStreaming:
        clicks = clicks.withWatermark("click_ts", watermark)
        views = views.withWatermark("view_ts", watermark)
    cond = (
        (clicks["user_id"] == views["v_user_id"])
        & (views["view_ts"] <= clicks["click_ts"])
        & (views["view_ts"] >= clicks["click_ts"] - F.expr("INTERVAL 1 HOUR"))
    )
    return clicks.join(views, cond, how).select(
        "click_id",
        "view_id",
        "user_id",
        (F.unix_micros("click_ts") - F.unix_micros("view_ts")).alias("lag_us"),
    )


def prepare_click_view_streams(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split an events frame (batch or stream) into the join's two sides."""
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
        "user_id",
    )
    views = events.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
        F.col("user_id").alias("v_user_id"),
    )
    return clicks, views


def enrich_events_with_dim(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static join: enrich each event with a slowly-changing
    dimension (here the customer segment keyed by user_id). Stateless on
    the stream side — no watermark, no join state: each micro-batch hash-
    joins against the static side, which Spark re-plans per batch (a
    broadcast at dimension scale). The third join shape beside
    stream-stream (click_view_interval_join) and batch-batch."""
    d = dim.select(
        F.col("c_custkey").alias("__dim_key"),
        F.col("c_mktsegment").alias("segmento"),
    )
    joined = events.join(
        F.broadcast(d), events["user_id"] == d["__dim_key"], "left"
    )
    return joined.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.coalesce(F.col("segmento"), F.lit("SIN_SEGMENTO")).alias("segmento"),
    )


def run_enriched_stream(
    spark: SparkSession,
    events_dir: str,
    dim: DataFrame,
    checkpoint_dir: str,
    *,
    query_name: str = "enriched_events",
) -> DataFrame:
    """Run the stream-static enrichment to completion (availableNow),
    append mode — stateless, so every event is emitted exactly once."""
    stream = read_events_stream(spark, events_dir)
    q = (
        enrich_events_with_dim(stream, dim)
        .writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


def run_interval_join_stream(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    *,
    query_name: str = "click_view_pairs",
) -> DataFrame:
    """Stream-stream self-join over the events directory (availableNow),
    append mode — each pair is emitted exactly once when the watermark
    passes its bound."""
    clicks, views = prepare_click_view_streams(read_events_stream(spark, events_dir))
    joined = click_view_interval_join(clicks, views)
    q = (
        joined.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


def run_dedupe_stream(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    *,
    query_name: str = "deduped_events",
) -> DataFrame:
    stream = dedupe_events_stream(read_events_stream(spark, events_dir))
    q = (
        stream.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


def run_windowed_stream(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    *,
    query_name: str = "windowed_events",
) -> DataFrame:
    """Run the windowed aggregation as a stream until all available input is
    processed (Trigger.AvailableNow), then return the result table.

    Complete output mode keeps every window in the in-memory sink so the
    result is comparable with the batch run; a production job would use
    append mode + a durable sink, emitting each window once its watermark
    passes.
    """
    stream = read_events_stream(spark, events_dir)
    agg = windowed_event_counts(stream)
    query = (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(query_name)


def session_window_counts(
    events: DataFrame, *, gap: str = "30 minutes", watermark: str | None = "1 hour"
) -> DataFrame:
    """Native session_window(gap) per user — one definition for batch and
    stream (the batch catalog twin is events_session_window_native). In a
    stream the watermark bounds session state: a session closes (and its
    state is dropped) once the watermark passes its end + gap."""
    if watermark is not None and events.isStreaming:
        events = events.withWatermark("ts", watermark)
    return (
        events.groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            "n_events",
            "total_value",
        )
    )


def run_session_window_stream(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    *,
    query_name: str = "session_windows",
) -> DataFrame:
    """Streaming sessionization over the file source (availableNow). Complete
    mode keeps all sessions in the memory sink for batch comparison; a
    production job uses append + watermark-expired emission."""
    stream = read_events_stream(spark, events_dir)
    agg = session_window_counts(stream)
    q = (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


def latest_event_per_user(events: DataFrame) -> DataFrame:
    """Per-user latest event (max ts, ties by event_id) — one definition
    for the batch twin and the per-micro-batch increment. max_by keeps it
    a single hash aggregate (partial + final), no window."""
    tie = F.struct(F.col("ts"), F.col("event_id"))
    return events.groupBy("user_id").agg(
        F.max_by(F.col("event_id"), tie).alias("event_id"),
        F.max(F.col("ts")).alias("ts"),
        F.max_by(F.col("event_type"), tie).alias("event_type"),
        F.max_by(F.col("value"), tie).alias("value"),
    )


def _swap_dirs(target_dir: str, staging_dir: str) -> None:
    """Replace `target_dir` with `staging_dir` via rename, never deleting
    the only complete copy: target -> backup, staging -> target, drop
    backup. A crash at any point leaves a complete table at target or at
    backup (see `_recover_swap`). Local-FS semantics — a cluster deployment
    swaps this whole mechanism for a transactional table-format commit."""
    import os
    import shutil

    backup = target_dir + ".backup"
    shutil.rmtree(backup, ignore_errors=True)
    if os.path.exists(target_dir):
        os.rename(target_dir, backup)
    os.rename(staging_dir, target_dir)
    shutil.rmtree(backup, ignore_errors=True)


def _recover_swap(target_dir: str) -> None:
    """If a previous run crashed between the two renames (target moved to
    backup, staging not yet promoted), restore the backup so the replayed
    batch merges into the accumulated state instead of starting empty."""
    import os
    import shutil

    backup = target_dir + ".backup"
    if not os.path.exists(target_dir) and os.path.exists(backup):
        os.rename(backup, target_dir)
    # stale backup alongside an intact target is garbage, as are staging
    # dirs left by crashed attempts (their batch replays into a new staging)
    if os.path.exists(target_dir):
        shutil.rmtree(backup, ignore_errors=True)
    import glob

    for stale in glob.glob(target_dir + ".staging-*"):
        shutil.rmtree(stale, ignore_errors=True)


def run_foreach_batch_merge_stream(
    spark: SparkSession,
    events_dir: str,
    target_dir: str,
    checkpoint_dir: str,
) -> DataFrame:
    """foreachBatch incremental sink: maintain a per-user latest-event
    table by MERGE-ing each micro-batch into a parquet target
    (operators/merge.py). The latest-wins update condition makes replays
    and out-of-order batches idempotent — the pattern for exactly-once
    semantics onto a non-transactional store (at-least-once foreachBatch ×
    idempotent merge). A production deployment swaps the
    staging-directory rename for a transactional table format commit.

    The merged result is written to a STAGING directory and promoted with
    renames (`_swap_dirs`) — the target being read is never overwritten in
    place, so an executor loss or cache eviction mid-write can only fail the
    batch (which foreachBatch replays), never corrupt or truncate the
    accumulated table.

    Returns the final merged table."""
    import os

    from sri_spark.operators.merge import merge_upsert

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        _recover_swap(target_dir)
        batch_latest = latest_event_per_user(batch_df)
        staging = f"{target_dir}.staging-{batch_id}"
        if os.path.exists(target_dir):
            current = spark.read.parquet(target_dir)
            newer = (F.col("s.ts") > F.col("t.ts")) | (
                (F.col("s.ts") == F.col("t.ts"))
                & (F.col("s.event_id") >= F.col("t.event_id"))
            )
            merged = merge_upsert(
                current,
                batch_latest,
                key="user_id",
                update_condition=newer,
            )
        else:
            merged = batch_latest
        # reads from target, writes to staging — no read-then-overwrite race
        merged.write.mode("overwrite").parquet(staging)
        _swap_dirs(target_dir, staging)

    stream = read_events_stream(spark, events_dir)
    q = (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(target_dir)
